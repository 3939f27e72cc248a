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

  private def zRef(baseline: Seq[Long], vc: Long): Double = {
    // plain-Scala replica of the rollingZ double tree (same op order)
    val s = baseline.sum
    val s2 = baseline.map(t => t * t).sum
    val mean = s.toDouble / 8.0
    val sd = math.sqrt((s2.toDouble - s.toDouble * s.toDouble / 8.0) / 8.0)
    (vc.toDouble - mean) / sd
  }

  test("rollingZ scores against the trailing-8 baseline and flags spikes") {
    import spark.implicits._
    val values = (1 to 8).map(_.toDouble) ++ Seq(100.0, 5.0)
    val rows = values.zipWithIndex.map { case (v, i) =>
      (1L, new java.sql.Timestamp(1000L * i), i.toLong, v)
    }
    val got = TimeSeries.rollingZ(
        rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", Seq("ts", "event_id"), "value", "event_id")
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(3)))
      .sortBy(_._1).toSeq
    // rows 1..8 have no full baseline; rows 9 (spike) and 10 remain
    val micro = values.map(v => math.round(v * 1000000))
    val exp9 = zRef(micro.slice(0, 8), micro(8))
    val exp10 = zRef(micro.slice(1, 9), micro(9))
    assert(got == Seq((8L, exp9, true), (9L, exp10, false)), s"got $got")
    assert(exp9 > 3.0 && math.abs(exp10) < 3.0)
  }

  test("rollingZ zero-variance baseline yields NULL z and FALSE flag") {
    import spark.implicits._
    val rows = (0 until 9).map(i =>
      (1L, new java.sql.Timestamp(1000L * i), i.toLong, 4.5))
    val got = TimeSeries.rollingZ(
        rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", Seq("ts", "event_id"), "value", "event_id").collect()
    assert(got.length == 1)
    assert(got(0).isNullAt(2) && !got(0).getBoolean(3))
  }

  test("rollingZ: a NULL value scores NULL z and FALSE flag, never aborts") {
    import spark.implicits._
    // null at the scored row AND null inside a later baseline — both
    // propagate to NULL z with the flag coalesced FALSE (the oracle
    // mirrors with COALESCE(..., FALSE))
    val rows = (0 until 11).map { i =>
      val v: java.lang.Double = if (i == 8) null else (i + 1).toDouble
      (1L, new java.sql.Timestamp(1000L * i), i.toLong, v)
    }
    val got = TimeSeries.rollingZ(
        rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", Seq("ts", "event_id"), "value", "event_id")
      .collect().map(r => (r.getLong(1), r.isNullAt(2), r.getBoolean(3))).toSeq
      .sortBy(_._1)
    // rows 9,10,11 (ids 8,9,10): id 8 IS the null row; ids 9,10 have
    // the null in their baseline — all NULL z, FALSE flag
    assert(got == Seq((8L, true, false), (9L, true, false), (10L, true, false)),
      s"got $got")
  }

  test("resampleLinear interpolates hour marks, hits exact points, ties to max id") {
    import spark.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val rows = Seq(
      // user 1: bracket interpolation at 3600s between (1800s, 10.0) and (5400s, 20.0)
      (1L, t(1800), 0L, 10.0), (1L, t(5400), 1L, 20.0),
      // user 2: grid mark ON an event (3600s) + a second bracket at 7200s
      (2L, t(3600), 2L, 7.0), (2L, t(9000), 3L, 9.0),
      // user 3: single event — span holds no aligned instant
      (3L, t(1000), 4L, 1.0),
      // user 4: same-microsecond tie collapses to the max-id event
      (4L, t(0), 5L, 1.0), (4L, t(0), 6L, 3.0), (4L, t(7200), 7L, 5.0))
    val got = TimeSeries.resampleLinear(
        rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "value", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val u2At7200 = (7000000.0 + (9000000.0 - 7000000.0)
      * (3600000000.0 / 5400000000.0)) / 1000000.0
    val u4At3600 = (3000000.0 + (5000000.0 - 3000000.0)
      * (3600000000.0 / 7200000000.0)) / 1000000.0
    assert(got == Set(
      (1L, 3600L, 15.0),
      (2L, 3600L, 7.0), (2L, 7200L, u2At7200),
      (4L, 0L, 3.0), (4L, 3600L, u4At3600), (4L, 7200L, 5.0)), s"got $got")
  }

  /** Plain-Scala replica of the autocorr double tree (same op order). */
  private def acfRef(values: Seq[Double], maxLag: Int): Seq[Option[Double]] = {
    val vc = values.map(v => math.round(v * 100))
    val n = vc.length
    val s1 = vc.sum
    val s2 = vc.map(x => x * x).sum
    val mu = s1.toDouble / n.toDouble
    val den = s2.toDouble - s1.toDouble * s1.toDouble / n.toDouble
    (1 to maxLag).map { l =>
      if (n <= l || den == 0.0) None
      else {
        val c = (l until n).map(i => vc(i) * vc(i - l)).sum
        val ab = (l until n).map(vc).sum + (0 until n - l).map(vc).sum
        Some((c.toDouble - mu * ab.toDouble
          + (n - l).toDouble * mu * mu) / den)
      }
    }
  }

  test("autocorr matches the reference; periodic, constant, short keys") {
    import spark.implicits._
    // key 1: period-4 wave (strong negative lag-2); key 2: constant
    // (zero variance → all NULL); key 3: two points (lag 2,3 NULL)
    val series = Map(
      1L -> Seq(1.0, 2.0, 3.0, 2.0, 1.0, 2.0, 3.0, 2.0, 1.0, 2.0),
      2L -> Seq.fill(6)(7.25),
      3L -> Seq(4.0, 9.0))
    val rows = series.toSeq.flatMap { case (k, vs) =>
      vs.zipWithIndex.map { case (v, i) =>
        (k, new java.sql.Timestamp(1000L * i), i.toLong, v)
      }
    }
    val got = TimeSeries.autocorr(
        rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", Seq("ts", "event_id"), "value")
      .collect().map { r =>
        r.getLong(0) -> ((r.getLong(1),
          (2 to 4).map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i)))))
      }.toMap
    series.foreach { case (k, vs) =>
      val (n, acfs) = got(k)
      assert(n == vs.length)
      assert(acfs == acfRef(vs, 3), s"key $k: got $acfs want ${acfRef(vs, 3)}")
    }
    // the wave really is anti-correlated at half period
    assert(got(1L)._2(1).exists(_ < -0.5))
    assert(got(2L)._2 == Seq(None, None, None))
  }

  test("autocorr out-of-contract magnitude fails loudly") {
    import spark.implicits._
    val rows = (0 until 4).map(i =>
      (1L, new java.sql.Timestamp(1000L * i), i.toLong, 4.0e7))
    val ex = intercept[Exception] {
      TimeSeries.autocorr(rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", Seq("ts", "event_id"), "value").collect()
    }
    val all = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(all.contains("centi tap"), s"expected the magnitude guard, got: $all")
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

  test("motif: null words are excluded; an all-null key emits no row; bad words raise") {
    import spark.implicits._
    val saxDf = Seq(
      (1L, 8, Some("abcd")), (1L, 9, None), (1L, 10, Some("flat")),
      (2L, 8, None), (2L, 9, None) // every word null → key absent
    ).toDF("user_id", "rn", "sax")
    val got = TimeSeries.motifs(saxDf, "user_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "abcd", 1L)), s"got $got")
    // out-of-vocabulary words fail loudly, never mis-encode
    val bad = Seq((1L, 8, "abce")).toDF("user_id", "rn", "sax")
    val ex = intercept[Exception] {
      TimeSeries.motifs(bad, "user_id").collect()
    }
    val all = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(all.contains("outside the SAX vocabulary"), all)
  }

  /** Independent Holt reference: explicit Vector fold (a different
    * structure from the kernel's streaming iterator), SAME IEEE tree. */
  private def refHolt(xs: Seq[Double], a: Double, b: Double): (Double, Double) =
    xs.tail.foldLeft((xs.head, 0.0)) { case ((l, t), x) =>
      val nl = a * x + (1.0 - a) * (l + t)
      (nl, b * (nl - l) + (1.0 - b) * t)
    }

  private def runHolt(series: Map[Long, Seq[Double]]): Map[Long, (Double, Double, Double)] = {
    import spark.implicits._
    val rows = series.toSeq.flatMap { case (k, xs) =>
      xs.zipWithIndex.map { case (v, i) =>
        (k, new java.sql.Timestamp(1000L * i), i.toLong, v)
      }
    }
    TimeSeries.holtFinal(rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "event_id", "value")
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
  }

  test("holtFinal: an exact linear ramp forecasts the next step dead-on direction") {
    val series = Map(
      1L -> (1 to 20).map(_ * 2.0),     // clean trend: b converges toward 2
      2L -> Seq(5.0),                   // single point: level=x, trend=0
      3L -> Seq(10.0, 12.0, 15.0))      // the hand-replayed fixture
    val got = runHolt(series)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    series.foreach { case (k, xs) =>
      val (l, t) = refHolt(xs, 0.2, 0.1)
      assert(got(k) == ((r6(l), r6(t), r6(l + t))), s"key $k")
    }
    assert(got(2L) == ((5.0, 0.0, 5.0)))
    // the ramp's trend is positive and its forecast above its level
    assert(got(1L)._2 > 0.0 && got(1L)._3 > got(1L)._1)
    // hand replay of key 3: l=10.4,b=0.04 after 12; l=11.352 after 15
    assert(got(3L)._1 == 11.352)
  }

  test("weeklyProfile: integer dow buckets, exact means, peak flagged with dow tiebreak") {
    import spark.implicits._
    def at(day: Long) = new java.sql.Timestamp(day * 86400L * 1000L)
    // epoch day % 7: day 0 → dow 0, day 1 → dow 1, day 7 → dow 0
    val rows = Seq(
      (1L, at(0), 10.0), (1L, at(7), 20.0),  // dow 0: n=2 mean 15
      (1L, at(1), 15.0),                     // dow 1: n=1 mean 15 (tie → dow 0 peaks)
      (1L, at(2), 1.0),                      // dow 2: n=1 mean 1
      (2L, at(3), 5.0))                      // dow 3 only
    val got = TimeSeries.weeklyProfile(rows.toDF("user_id", "ts", "value"),
        "user_id", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSet
    assert(got == Set(
      (1L, 0L, 2L, 15.0, true), (1L, 1L, 1L, 15.0, false),
      (1L, 2L, 1L, 1.0, false), (2L, 3L, 1L, 5.0, true)), s"got $got")
  }

  test("cusumChangepoint: a planted level shift peaks at the last pre-shift row") {
    import spark.implicits._
    def t(i: Int) = new java.sql.Timestamp(1000L * i)
    val rows =
      (0 until 10).map(i => (1L, t(i), i.toLong, 1.0)) ++     // low regime
      (10 until 20).map(i => (1L, t(i), i.toLong, 5.0)) ++    // shifted
      (0 until 6).map(i => (2L, t(i), i.toLong, 3.25)) :+     // constant: dropped
      (3L, t(0), 0L, 7.0)                                     // single row: d=0, dropped
    val got = TimeSeries.cusumChangepoint(
        rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    // |n·S_t − t·T| peaks at t=10 (event_id 9): Σ(x−x̄) = 10·(1−3) = −20
    assert(got == Seq((1L, 9L, 10L, 20.0)), s"got $got")
  }

  test("cusumChangepoint: argmax ties break to the smallest event id") {
    import spark.implicits._
    def t(i: Int) = new java.sql.Timestamp(1000L * i)
    // symmetric bump: deviations ±1 around mean 0 → |d| ties at the
    // two inner rows; the smaller event_id must win
    val rows = Seq((1L, t(0), 0L, 1.0), (1L, t(1), 1L, 1.0),
      (1L, t(2), 2L, -1.0), (1L, t(3), 3L, -1.0))
    val got = TimeSeries.cusumChangepoint(
        rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    // S_t−t·x̄ (x̄=0): 1, 2, 1, 0 → unique max at t=2 (id 1); with the
    // planted tie removed this pins the deterministic argmax instead
    assert(got == Seq((1L, 2L)), s"got $got")
  }

  test("crossCorrPairs: planted co-movement found, constants and thin overlaps dropped") {
    import spark.implicits._
    def t(hr: Int) = new java.sql.Timestamp(hr * 3600L * 1000L)
    val base = Seq(1.0, 3.0, 2.0, 5.0, 4.0, 6.0)
    val rows =
      base.zipWithIndex.map { case (v, h) => (1L, t(h), v) } ++          // x
      base.zipWithIndex.map { case (v, h) => (2L, t(h), 2 * v + 1) } ++  // 2x+1: corr +1
      base.zipWithIndex.map { case (v, h) => (3L, t(h), 10 - v) } ++     // 10-x: corr -1
      base.zipWithIndex.map { case (v, h) => (4L, t(h), 7.5) } ++        // constant: dx=0
      Seq((5L, t(0), 1.0), (5L, t(1), 9.0))                              // 2 hours < minOverlap
    val got = TimeSeries.crossCorrPairs(rows.toDF("user_id", "ts", "value"),
        "user_id", "ts", "value", topSeries = 5, minOverlap = 3, topPairs = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    // pairs among {1,2,3} only; |corr| = 1 for all three, ties by (ka, kb)
    assert(got == Seq((1L, 2L, 6L, 1.0), (1L, 3L, 6L, -1.0), (2L, 3L, 6L, -1.0)),
      s"got $got")
  }

  test("crossCorrPairs: activity top-K bounds the pair set") {
    import spark.implicits._
    def t(hr: Int) = new java.sql.Timestamp(hr * 3600L * 1000L)
    // keys 1,2 have 6 hourly points; key 3 only 4 (drops at topSeries=2)
    val rows = (0 until 6).flatMap(h => Seq(
        (1L, t(h), h * 1.0), (2L, t(h), h * 3.0))) ++
      (0 until 4).map(h => (3L, t(h), h * 1.0))
    val got = TimeSeries.crossCorrPairs(rows.toDF("user_id", "ts", "value"),
        "user_id", "ts", "value", topSeries = 2, minOverlap = 3, topPairs = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L)), s"got $got")
  }

  test("holtFinal: order comes from (ts, id), not input order") {
    import spark.implicits._
    val t0 = new java.sql.Timestamp(0L)
    // same ts for ids 1 and 2 — id breaks the tie; rows arrive shuffled
    val rows = Seq(
      (1L, new java.sql.Timestamp(2000L), 3L, 30.0),
      (1L, t0, 2L, 20.0),
      (1L, t0, 1L, 10.0))
    val got = TimeSeries.holtFinal(rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).head
    val (l, t) = refHolt(Seq(10.0, 20.0, 30.0), 0.2, 0.1)
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got == ((r6(l), r6(t))))
  }
}
