package graft.operators

import org.apache.spark.sql.functions.col

import graft.streaming.SparkSpec

/** Hand-computed SAX goldens: an ascending ramp z-normalizes to the
  * canonical "abcd", its mirror to "dcba", and a constant window to
  * the 'flat' sentinel; the motif picks the most frequent word with
  * the smallest-word tiebreak. */
class TimeSeriesSpec extends SparkSpec {

  private def sax(values: Seq[Double]): Seq[(Int, String)] = {
    import spark.implicits._
    val rows = values.zipWithIndex.map { case (v, i) =>
      (1L, new java.sql.Timestamp(1000L * i), i.toLong, v)
    }
    TimeSeries.saxWords(rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", Seq("ts", "event_id"), "value")
      .collect().map(r => r.getInt(1) -> r.getString(2)).toSeq.sortBy(_._1)
  }

  test("ascending ramp is 'abcd', descending 'dcba', constant 'flat'") {
    // ramp 1..8: PAA (1.5,3.5,5.5,7.5), mean 4.5, sd ≈ 2.2913,
    // z ≈ (-1.31, -0.44, +0.44, +1.31) → a,b,c,d
    assert(sax((1 to 8).map(_.toDouble)) == Seq(8 -> "abcd"))
    assert(sax((1 to 8).reverse.map(_.toDouble)) == Seq(8 -> "dcba"))
    assert(sax(Seq.fill(8)(3.25)) == Seq(8 -> "flat"))
  }

  test("out-of-contract magnitude fails loudly in both kernels") {
    // |value| > ~1073.74 would overflow the 8-tap squared sum: the
    // batch path must raise, not wrap-and-diverge from the oracle
    val ex = intercept[Exception] { sax(Seq.fill(8)(2000.0)) }
    assert(ex.getMessage.contains("1073.74") ||
      Option(ex.getCause).exists(_.getMessage.contains("1073.74")),
      s"expected the magnitude guard, got: ${ex.getMessage}")
    // in-contract boundary still computes (|value| just below the cap)
    assert(sax(Seq(1000.0, 1001, 1002, 1003, 1004, 1005, 1006, 1007)).nonEmpty)
    // streaming kernel shares the contract through saxWord's require
    val ex2 = intercept[IllegalArgumentException] {
      TimeSeries.saxWord(Vector.fill(8)(2000L * 1000000L))
    }
    assert(ex2.getMessage.contains("1073.74"))
    // Long.MinValue must NOT slip through an abs() wrap: an extreme
    // value raises LOUDLY on every path — under ANSI (the Spark 4
    // default) the double->long cast itself throws CAST_OVERFLOW
    // before the guard; under non-ANSI the cast saturates to
    // Long.MinValue and the two-sided bounds (not abs, which wraps
    // negative there) catch it
    val ex3 = intercept[Exception] { sax(Seq.fill(8)(-1e13)) }
    val all3 = ex3.getMessage + Option(ex3.getCause).map(_.getMessage).getOrElse("")
    assert(all3.contains("1073.74") || all3.contains("CAST_OVERFLOW"),
      s"extreme magnitude must raise loudly, got: ${ex3.getMessage}")
    val ex4 = intercept[IllegalArgumentException] {
      TimeSeries.saxWord(Vector.fill(8)(Long.MinValue))
    }
    assert(ex4.getMessage.contains("1073.74"))
  }

  test("null values pass through the guard instead of aborting the query") {
    import spark.implicits._
    val rows = Seq[(Long, Long, java.lang.Double)](
      (1L, 1L, 5.0), (1L, 2L, null), (1L, 3L, 6.0))
    val out = TimeSeries.saxWords(rows.toDF("user_id", "ts", "value"),
      "user_id", Seq("ts"), "value")
    // 3 rows never fill an 8-window; the point is execution does NOT
    // raise on the null row (the pre-guard pipeline propagated nulls)
    assert(out.collect().isEmpty)
  }

  test("sliding windows emit one word per full window") {
    // 10 values → windows ending at rows 8, 9, 10
    val words = sax((1 to 10).map(_.toDouble))
    assert(words.map(_._1) == Seq(8, 9, 10))
    assert(words.forall(_._2 == "abcd"), s"every ramp window is 'abcd': $words")
  }

  test("motif takes the most frequent word, ties to the smallest") {
    import spark.implicits._
    val saxDf = Seq(
      (1L, 8, "abcd"), (1L, 9, "abcd"), (1L, 10, "dcba"),
      (2L, 8, "dcba"), (2L, 9, "abcd") // tie → smallest word wins
    ).toDF("user_id", "rn", "sax")
    val got = TimeSeries.motifs(saxDf, "user_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "abcd", 2L), (2L, "abcd", 1L)))
  }
}
