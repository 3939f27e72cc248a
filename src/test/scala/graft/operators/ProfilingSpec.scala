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

  test("windowedProfile: golden per-window stats, exact micro-unit mean, null slot") {
    val rows = Seq(
      (ts(0L), Some(2.5), Some(10L)),
      (ts(30 * 60000L), None, Some(30L)),
      (ts(3600000L + 1), Some(7.25), None)) // second hour window
    val got = Profiling.windowedProfile(
        rows.toDF("t", "dbl", "num"), "t", "1 hour", "0 seconds", Seq("dbl", "num"))
      .as[(java.sql.Timestamp, String, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => (r._1.getTime, r._2) -> ((r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got((0L, "dbl")) == ((2L, 1L, Some(2.5), Some(2.5), Some(2.5))))
    assert(got((0L, "num")) == ((2L, 0L, Some(10.0), Some(30.0), Some(20.0))))
    assert(got((3600000L, "dbl")) == ((1L, 0L, Some(7.25), Some(7.25), Some(7.25))))
    assert(got((3600000L, "num")) == ((1L, 1L, None, None, None)))
    // non-numeric column refused
    val ex = intercept[IllegalArgumentException] {
      Profiling.windowedProfile(Seq((ts(0), "s")).toDF("t", "c"),
        "t", "1 hour", "0 seconds", Seq("c"))
    }
    assert(ex.getMessage.contains("numeric columns only"))
    // duplicate columns and a missing ts column refused loudly
    assert(intercept[IllegalArgumentException] {
      Profiling.windowedProfile(rows.toDF("t", "dbl", "num"),
        "t", "1 hour", "0 seconds", Seq("dbl", "dbl"))
    }.getMessage.contains("duplicate columns"))
    assert(intercept[IllegalArgumentException] {
      Profiling.windowedProfile(rows.toDF("t", "dbl", "num"),
        "typo", "1 hour", "0 seconds", Seq("dbl"))
    }.getMessage.contains("no column typo"))
  }

  test("windowedProfile: NaN, out-of-range values and NULL ts raise in-plan") {
    def run(rows: Seq[(java.sql.Timestamp, Option[Double])]): Unit =
      Profiling.windowedProfile(rows.toDF("t", "v"),
        "t", "1 hour", "0 seconds", Seq("v")).collect(): Unit
    val exNan = intercept[Exception] { run(Seq((ts(0), Some(Double.NaN)))) }
    assert(exNan.getMessage.contains("windowedProfile") ||
      Option(exNan.getCause).exists(_.getMessage.contains("windowedProfile")))
    val exBig = intercept[Exception] { run(Seq((ts(0), Some(1.0e10)))) }
    assert(exBig.getMessage.contains("micro range") ||
      Option(exBig.getCause).exists(_.getMessage.contains("micro range")))
    val exTs = intercept[Exception] {
      Profiling.windowedProfile(
        Seq((Option.empty[java.sql.Timestamp], Option(1.0))).toDF("t", "v"),
        "t", "1 hour", "0 seconds", Seq("v")).collect()
    }
    assert(exTs.getMessage.contains("NULL t") ||
      Option(exTs.getCause).exists(_.getMessage.contains("NULL t")))
  }

  test("windowedProfile stream == batch on closed windows, across uneven batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = Seq(
      (ts(10L), Some(1.0), Some(5L)), (ts(20L), Some(3.0), None),
      (ts(3600000L + 5), None, Some(7L)), (ts(3600000L + 6), Some(4.5), Some(9L)),
      (ts(2 * 3600000L + 1), Some(0.25), Some(1L)))
    val sentinel = (ts(10 * 3600000L), Some(0.0), Some(0L))

    val want = Profiling.windowedProfile(
        data.toDF("t", "dbl", "num"), "t", "1 hour", "0 seconds", Seq("dbl", "num"))
      .as[(java.sql.Timestamp, String, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSet

    val in = MemoryStream[(java.sql.Timestamp, Option[Double], Option[Long])]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(java.sql.Timestamp, String, Long, Long, Option[Double], Option[Double], Option[Double])]
    val q = Profiling.windowedProfile(
        in.toDF().toDF("t", "dbl", "num"), "t", "1 hour", "0 seconds", Seq("dbl", "num"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.as[(java.sql.Timestamp, String, Long, Long,
          Option[Double], Option[Double], Option[Double])].collect()
        ()
      }.start()
    try {
      in.addData(data.take(2))
      q.processAllAvailable()
      in.addData(data.drop(2))
      q.processAllAvailable()
      in.addData(Seq(sentinel)) // advance the watermark: close all real windows
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet == want, s"stream ${got.size} rows vs batch ${want.size}")
  }

  test("expectations: per-check verdicts, null predicate fails, duplicates refused") {
    import org.apache.spark.sql.functions._
    val prof = Profiling.profile(df, Seq("num", "dbl", "s"))
    val got = Profiling.expectations(prof, Seq(
      ("num_no_nulls", "num", col("n_null") === 0L),          // false (1 null)
      ("num_card", "num", col("n_distinct") >= 2L),           // true
      ("dbl_range", "dbl", col("min_num") >= 0.0),            // true
      // min_num is NULL for a string column -> failed, not passed
      ("s_bad_field", "s", col("min_num") >= 0.0)))
      .as[(String, String, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got == Map("num_no_nulls" -> false, "num_card" -> true,
      "dbl_range" -> true, "s_bad_field" -> false))
    val ex = intercept[IllegalArgumentException] {
      Profiling.expectations(prof, Seq(
        ("dup", "num", col("n_null") === 0L), ("dup", "dbl", col("n_null") === 0L)))
    }
    assert(ex.getMessage.contains("duplicate expectation names"))
  }

  test("expectations: a check on a column absent from the profile FAILS, never vanishes") {
    import org.apache.spark.sql.functions._
    // r11 ADVICE: the old inner join dropped the row entirely, so a
    // typo'd column name made a 'block on any pass=false' gate pass
    // vacuously — now the check survives with pass=false
    val prof = Profiling.profile(df, Seq("num"))
    val got = Profiling.expectations(prof, Seq(
      ("num_rows", "num", col("n_rows") === 4L),
      ("typo_gate", "nmu", col("n_null") === 0L)))
      .as[(String, String, Boolean)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got == Map("num_rows" -> true, "typo_gate" -> false))
  }

  test("windowedExpectations: per-window verdicts, stream == batch on closed windows") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val data = Seq(
      (ts(10L), Some(1.0), Some(5L)), (ts(20L), Some(3.0), None),
      (ts(3600000L + 5), None, Some(7L)), (ts(3600000L + 6), Some(4.5), Some(9L)))
    val checks = Seq(
      ("dbl_ceiling", "dbl", col("max_num") <= 4.0),  // h0 true, h1 false
      ("num_complete", "num", col("n_null") === 0L),  // h0 false, h1 true
      // mean is NULL for h1's all-null dbl? (dbl has one value in h1)
      // — range check exercises the mean column per window
      ("dbl_mean_low", "dbl", col("mean") <= 2.0))    // h0 true, h1 false

    val want = Profiling.windowedExpectations(
        data.toDF("t", "dbl", "num"), "t", "1 hour", "0 seconds",
        Seq("dbl", "num"), checks)
      .as[(java.sql.Timestamp, String, String, Boolean)].collect().toSet
    // golden, not just stream-equal: the batch twin's verdicts
    val wantMap = want.map(r => (r._1.getTime, r._2) -> r._4).toMap
    assert(wantMap == Map(
      (0L, "dbl_ceiling") -> true, (3600000L, "dbl_ceiling") -> false,
      (0L, "num_complete") -> false, (3600000L, "num_complete") -> true,
      (0L, "dbl_mean_low") -> true, (3600000L, "dbl_mean_low") -> false))

    val in = MemoryStream[(java.sql.Timestamp, Option[Double], Option[Long])]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(java.sql.Timestamp, String, String, Boolean)]
    val q = Profiling.windowedExpectations(
        in.toDF().toDF("t", "dbl", "num"), "t", "1 hour", "0 seconds",
        Seq("dbl", "num"), checks)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= b.as[(java.sql.Timestamp, String, String, Boolean)].collect()
        ()
      }.start()
    try {
      in.addData(data.take(1))
      q.processAllAvailable()
      in.addData(data.drop(1))
      q.processAllAvailable()
      in.addData(Seq((ts(10 * 3600000L), Some(0.0), Some(0L)))) // close windows
      q.processAllAvailable()
    } finally q.stop()
    assert(got.toSet == want, s"stream ${got.size} rows vs batch ${want.size}")

    // unknown check column raises up front in this form (the profiled
    // set is an argument, so validation is static)
    val ex = intercept[IllegalArgumentException] {
      Profiling.windowedExpectations(data.toDF("t", "dbl", "num"),
        "t", "1 hour", "0 seconds", Seq("dbl", "num"),
        Seq(("bad", "nmu", col("n_null") === 0L)))
    }
    assert(ex.getMessage.contains("unprofiled columns"))
  }

  test("unknown column raises loudly") {
    val ex = intercept[IllegalArgumentException] {
      Profiling.profile(df, Seq("nope"))
    }
    assert(ex.getMessage.contains("no column nope"))
  }
}
