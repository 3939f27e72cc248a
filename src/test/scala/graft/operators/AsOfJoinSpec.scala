package graft.operators

import graft.streaming.SparkSpec

/** Direction/tie semantics for the as-of family: the backward carry's
  * equal-instant inclusion and the nearest variant's two-sided pick
  * with its prefer-backward tie rule. */
class AsOfJoinSpec extends SparkSpec {

  private def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("asOfNearest: picks the closer side; equal distance and equal instant go backward") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, t(100)),  // backward at 90 (d=10) vs forward at 130 (d=30) → 90
      (1L, 101L, t(125)),  // backward at 90 (d=35) vs forward at 130 (d=5) → 130
      (1L, 102L, t(110)),  // EXACT tie: 90 (d=20) vs 130 (d=20) → backward 90
      (1L, 103L, t(90)),   // right row AT the same instant → backward match
      (2L, 200L, t(50)),   // only a forward right row exists
      (3L, 300L, t(50))    // no right rows at all → null
    ).toDF("user_id", "event_id", "ts")
    val right = Seq(
      (1L, t(90), 9.0), (1L, t(130), 13.0),
      (2L, t(70), 7.0)
    ).toDF("user_id", "ts", "value")
    val got = AsOfJoin.asOfNearest(left, right, "user_id", "ts", "ts",
        Seq("value" -> "v"))
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got == Map(100L -> Some(9.0), 101L -> Some(13.0),
      102L -> Some(9.0), 103L -> Some(9.0), 200L -> Some(7.0), 300L -> None),
      s"got $got")
  }

  test("asOf: backward-only carry; a later right row never leaks backward") {
    import spark.implicits._
    val left = Seq((1L, 100L, t(100))).toDF("user_id", "event_id", "ts")
    val right = Seq((1L, t(130), 13.0)).toDF("user_id", "ts", "value")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", "ts",
        Seq("value" -> "v")).collect().head
    assert(got.isNullAt(3), s"backward as-of must not see the future: $got")
  }

  test("equal-instant duplicate right rows resolve deterministically (ADVICE r9)") {
    import spark.implicits._
    // two clicks for the same key at the SAME microsecond: the carry
    // must be the greatest value-pack — identical on every partition
    // layout, input order, and run
    val left = Seq((1L, 100L, t(100))).toDF("user_id", "event_id", "ts")
    val dups = Seq((1L, t(90), 3.0), (1L, t(90), 7.0))
    (1 to 4).foreach { trial =>
      // vary input order and layout; the answer may not move
      val right = (if (trial % 2 == 0) dups else dups.reverse)
        .toDF("user_id", "ts", "value").repartition(trial)
      val a = AsOfJoin.asOf(left, right, "user_id", "ts", "ts",
        Seq("value" -> "v")).collect().head.getDouble(3)
      assert(a == 7.0, s"asOf trial $trial: got $a, want the greatest pack 7.0")
      val n = AsOfJoin.asOfNearest(left, right, "user_id", "ts", "ts",
        Seq("value" -> "v")).collect().head.getDouble(3)
      assert(n == 7.0, s"asOfNearest trial $trial: got $n (backward carry)")
    }
  }
}
