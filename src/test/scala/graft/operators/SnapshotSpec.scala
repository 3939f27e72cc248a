package graft.operators

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** [[Snapshot.diff]] semantics: the four status classes, fingerprint
  * visibility, the multi-column separator, and the loud null-key
  * contract.
  */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("added/removed/changed/unchanged classified from the two snapshots") {
    val oldSnap = Seq((1L, "same"), (2L, "before"), (3L, "gone")).toDF("k", "t")
    val newSnap = Seq((1L, "same"), (2L, "after"), (4L, "fresh")).toDF("k", "t")
    val got = Snapshot.diff(oldSnap, newSnap, "k", Seq("t"))
      .as[(Long, String, Option[String], Option[String])].collect()
      .map(r => (r._1, r._2)).toSet
    assert(got == Set((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "added")))
    val fps = Snapshot.diff(oldSnap, newSnap, "k", Seq("t"))
      .as[(Long, String, Option[String], Option[String])].collect()
      .map(r => r._1 -> ((r._3.isDefined, r._4.isDefined))).toMap
    assert(fps(3L) == ((true, false)) && fps(4L) == ((false, true)))
    assert(fps(1L) == ((true, true)))
  }

  test("multi-column fingerprint: separator keeps (ab, c) distinct from (a, bc)") {
    val oldSnap = Seq((1L, "ab", "c")).toDF("k", "x", "y")
    val newSnap = Seq((1L, "a", "bc")).toDF("k", "x", "y")
    val got = Snapshot.diff(oldSnap, newSnap, "k", Seq("x", "y"))
      .select("status").as[String].head()
    assert(got == "changed")
  }

  test("null content column fingerprints identically on both sides") {
    val oldSnap = Seq((1L, Option.empty[String], Some("v"))).toDF("k", "x", "y")
    val newSnap = Seq((1L, Option.empty[String], Some("v"))).toDF("k", "x", "y")
    val got = Snapshot.diff(oldSnap, newSnap, "k", Seq("x", "y"))
      .select("status").as[String].head()
    assert(got == "unchanged")
  }

  test("applyLog: latest version wins, delete drops, insert adds, rest pass through") {
    val base = Seq((1L, "keep"), (2L, "update-me"), (3L, "delete-me"),
      (5L, "update-then-delete")).toDF("k", "t")
    val log = Seq(
      (2L, 1L, "U", "v1"), (2L, 2L, "U", "v2"),          // latest U wins
      (3L, 1L, "D", ""),                                  // delete existing
      (4L, 1L, "I", "fresh"),                             // insert new key
      (5L, 1L, "U", "x"), (5L, 2L, "D", ""),              // U then D -> gone
      (9L, 1L, "D", "")                                   // delete absent: no-op
    ).toDF("k", "v", "op", "t")
    val got = Snapshot.applyLog(base, log, "k", "v", "op", Seq("t"))
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set(1L, 2L, 4L))
    def md5s(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(1L) == ((md5s("keep"), "base")))
    assert(got(2L) == ((md5s("v2"), "log")))
    assert(got(4L) == ((md5s("fresh"), "log")))
  }

  test("applyLogStream: final emissions == batch applyLog across out-of-order micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = Seq((1L, "keep"), (2L, "update-me"), (3L, "delete-me"),
      (5L, "update-then-delete")).toDF("k", "t")
    val logRows = Seq(
      (2L, 1L, "U", "v1"), (2L, 2L, "U", "v2"),
      (3L, 1L, "D", ""),
      (4L, 1L, "I", "fresh"),
      (5L, 1L, "U", "x"), (5L, 2L, "D", ""),
      (9L, 1L, "D", ""))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, String, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, (Long, Option[String], String, Boolean))]
    var batchId = 0L
    val q = graft.operators.Snapshot
      .applyLogStream(base, in.toDF().toDF("k", "v", "op", "t"), "k", "v", "op", Seq("t"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        got ++= b.as[(Long, Option[String], String, Boolean)].collect()
          .map(r => r._1 -> ((id, r._2, r._3, r._4)))
        batchId = id
      }.start()
    try {
      // OUT OF ORDER: the delete@2 for key 5 arrives before its U@1;
      // key 2's v2 lands a batch before its stale v1
      in.addData(Seq((5L, 2L, "D", ""), (2L, 2L, "U", "v2")))
      q.processAllAvailable()
      in.addData(Seq((2L, 1L, "U", "v1"), (3L, 1L, "D", ""), (9L, 1L, "D", "")))
      q.processAllAvailable()
      in.addData(Seq((4L, 1L, "I", "fresh"), (5L, 1L, "U", "x")))
      q.processAllAvailable()
    } finally q.stop()

    // last emission per key
    val finalByKey = got.groupBy(_._1).map { case (k, xs) =>
      k -> xs.maxBy(_._2._1)._2
    }
    // batch twin over the SAME complete log
    val want = Snapshot.applyLog(base,
        logRows.toDF("k", "v", "op", "t"), "k", "v", "op", Seq("t"))
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // live final emissions carry exactly the batch rows for touched keys
    val liveFinal = finalByKey.collect { case (k, (_, Some(fp), origin, true)) =>
      k -> ((fp, origin))
    }
    assert(liveFinal == want.filter { case (k, (_, o)) => o == "log" },
      s"live stream state diverged: $liveFinal vs $want")
    // deletes of VISIBLE keys surface as tombstones; the delete of
    // never-existing key 9 is a no-op in the stream exactly as in
    // the batch twin (no phantom event)
    val tombstones = finalByKey.collect { case (k, (_, _, _, false)) => k }.toSet
    assert(tombstones == Set(3L, 5L))
    assert(!finalByKey.contains(9L), "delete-of-absent must not emit")
    // stale key-2 v1 in a LATER batch must not re-emit (no state change)
    val key2Emissions = got.filter(_._1 == 2L)
    assert(key2Emissions.size == 1 && key2Emissions.head._2._2.contains(
      java.security.MessageDigest.getInstance("MD5")
        .digest("v2".getBytes("UTF-8")).map("%02x".format(_)).mkString))
  }

  test("applyLog: unknown op raises loudly") {
    val base = Seq((1L, "a")).toDF("k", "t")
    val log = Seq((1L, 1L, "X", "zap")).toDF("k", "v", "op", "t")
    val ex = intercept[Exception] {
      Snapshot.applyLog(base, log, "k", "v", "op", Seq("t")).collect()
    }
    assert(ex.getMessage.contains("applyLog") ||
      Option(ex.getCause).exists(_.getMessage.contains("applyLog")))
  }

  test("applyLogStream: non-integral key schema refused up front") {
    // r11 ADVICE: a string key would cast('long') to NULL under
    // non-ANSI semantics and collapse every row into one null-keyed
    // state group — refuse the schema instead of corrupting silently
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Long, String, String)]
    val badBase = Seq(("a", "t")).toDF("k", "t")
    val ex = intercept[IllegalArgumentException] {
      Snapshot.applyLogStream(badBase,
        in.toDF().toDF("k", "v", "op", "t"), "k", "v", "op", Seq("t"))
    }
    assert(ex.getMessage.contains("must be integral"))
    val goodBase = Seq((1L, "t")).toDF("k", "t")
    val ex2 = intercept[IllegalArgumentException] {
      Snapshot.applyLogStream(goodBase,
        in.toDF().toDF("k", "v", "op", "t"), "k", "v", "op", Seq("t"))
    }
    assert(ex2.getMessage.contains("log.k must be integral"))
  }

  test("null key raises loudly") {
    val oldSnap = Seq((Option.empty[Long], "t")).toDF("k", "t")
    val newSnap = Seq((Option(1L), "t")).toDF("k", "t")
    val ex = intercept[Exception] {
      Snapshot.diff(oldSnap, newSnap, "k", Seq("t")).collect()
    }
    assert(ex.getMessage.contains("Snapshot.diff") ||
      Option(ex.getCause).exists(_.getMessage.contains("Snapshot.diff")))
  }
}
