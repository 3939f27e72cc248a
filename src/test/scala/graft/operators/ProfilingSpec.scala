package graft.operators

import graft.streaming.SparkSpec

/** [[Profiling.profile]] semantics: exact counts on planted columns
  * (nulls excluded from distinct, included in n_rows), numeric vs
  * string min/max slotting, and the loud unknown-column contract.
  */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Some(3L), Some(2.5), Some("b")),
    (Some(1L), None, Some("a")),
    (Some(3L), Some(7.25), None),
    (None, Some(2.5), Some("c"))).toDF("num", "dbl", "s")

  test("exact per-column stats with numeric/string slotting") {
    val got = Profiling.profile(df, Seq("num", "dbl", "s"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("num") == (("num", 4L, 1L, 2L, Some(1.0), Some(3.0), None, None)))
    assert(got("dbl") == (("dbl", 4L, 1L, 2L, Some(2.5), Some(7.25), None, None)))
    assert(got("s") == (("s", 4L, 1L, 3L, None, None, Some("a"), Some("c"))))
  }

  test("date columns profile as ISO strings") {
    val d = Seq("2001-08-01", "1995-01-01", "2001-08-01")
      .toDF("raw").selectExpr("CAST(raw AS DATE) AS dt")
    val got = Profiling.profile(d, Seq("dt"))
      .as[(String, Long, Long, Long, Option[Double], Option[Double],
        Option[String], Option[String])].head()
    assert(got == (("dt", 3L, 0L, 2L, None, None,
      Some("1995-01-01"), Some("2001-08-01"))))
  }

  test("unknown column raises loudly") {
    val ex = intercept[IllegalArgumentException] {
      Profiling.profile(df, Seq("nope"))
    }
    assert(ex.getMessage.contains("no column nope"))
  }
}
