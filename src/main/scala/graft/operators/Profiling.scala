package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

import graft.functions.StrMinMax

/** Column profiling — the data-validation pass every ingest runs
  * before a corpus is allowed near training: per column, row count,
  * null count, EXACT distinct count, and min/max (numeric columns as
  * rounded doubles, string/date columns as strings).
  *
  * Scale shape: one narrow aggregate PER COLUMN, unioned — k
  * single-column passes, each pruned to exactly one parquet column
  * (`ReadSchema` shows one field per branch), each with a partial
  * distinct aggregate that map-side-combines before its one
  * exchange. This is deliberately NOT one wide agg with k
  * `count(distinct …)`s: Catalyst plans multi-distinct via Expand —
  * k+1 row replicas of the full scan through one shuffle — which is
  * the worse plan at any scale where profiling matters. String
  * min/max goes through [[graft.functions.StrMinMax]] (bounded
  * two-string ObjectHashAggregate buffer): the built-in declarative
  * min/max over a string bars HashAggregate and, under the distinct
  * rewrite, degrades the whole keyed partial chain to SortAggregate
  * + a REAL sort of the value stream — the r10 bug class PlanSweep
  * gates, and the reason ds_profile stays out of its allowlist. A
  * sketch profile (`kmv_distinct` per column, bounded buffers) is
  * the approximate alternative already in the catalog
  * (agg_kmv_distinct); this operator is the exact contract.
  */
object Profiling {

  /** One row per profiled column:
    * (column, n_rows, n_null, n_distinct, min_num, max_num, min_s,
    * max_s). Numeric columns fill min_num/max_num (round 6) and leave
    * the string slots null; string columns min/max as-is; date/
    * timestamp/boolean columns min/max through their mutable-buffer
    * aggregate, cast to string after (dates → ISO 'yyyy-MM-dd',
    * identical across engines). Distinct counts exclude NULL (both
    * engines' count(distinct) contract). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Profiling.profile: no columns declared")
    val schema = df.schema
    cols.map { c =>
      require(schema.fieldNames.contains(c), s"Profiling.profile: no column $c")
      val base = df.select(col(c).as("v"))
      val counts = Seq(
        count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col("v")).as("n_distinct"))
      val agg = schema(c).dataType match {
        case _: NumericType => base.agg(counts.head, counts.tail ++ Seq(
          round(min(col("v")).cast("double"), 6).as("min_num"),
          round(max(col("v")).cast("double"), 6).as("max_num"),
          lit(null).cast("string").as("min_s"),
          lit(null).cast("string").as("max_s")): _*)
        case StringType => base.agg(counts.head, counts.tail ++ Seq(
          StrMinMax.strMinMax(col("v")).as("mm")): _*)
          .select(col("n_rows"), col("n_null"), col("n_distinct"),
            lit(null).cast("double").as("min_num"),
            lit(null).cast("double").as("max_num"),
            col("mm.min_s").as("min_s"), col("mm.max_s").as("max_s"))
        case _ => base.agg(counts.head, counts.tail ++ Seq(
          min(col("v")).cast("string").as("min_s"),
          max(col("v")).cast("string").as("max_s")): _*)
          .select(col("n_rows"), col("n_null"), col("n_distinct"),
            lit(null).cast("double").as("min_num"),
            lit(null).cast("double").as("max_num"),
            col("min_s"), col("max_s"))
      }
      agg.select(lit(c).as("column"), col("n_rows"), col("n_null"),
        col("n_distinct"), col("min_num"), col("max_num"),
        col("min_s"), col("max_s"))
    }.reduce(_.unionAll(_))
  }

  /** Windowed NUMERIC drift profile — the monitoring face of
    * [[profile]]: per event-time window per column, row/null counts,
    * min/max, and an exact-integer-micro-unit mean (the emb_centroid
    * summation idiom, so batch and every oracle sum in one order).
    * Serves batch frames and streams through the SAME expression
    * (kata03 discipline: the watermark attaches only when the input
    * streams) — ProfilingSpec pins stream ≡ batch on closed windows.
    *
    * Shape: ONE narrow explode to (ts, column, v) rows and ONE
    * windowed aggregate. Deliberately not k per-column aggregates
    * unioned (the batch [[profile]] plan): a streaming query allows
    * one stateful operator, and k× the window state buys nothing —
    * the explode's k× rows collapse map-side. Numeric columns only
    * BY CONTRACT (string min/max per window would drag object state
    * into every window; the drift-monitor shape is numeric). */
  /** Declarative data-quality gate over a [[profile]] frame — the
    * expectations pattern: each check is (name, column, predicate
    * over that column's profile row), and the result is one
    * (expectation, column, pass) row per check. The ingest contract
    * this enables: compute the profile ONCE, evaluate every
    * expectation against its k-row output, block the corpus on any
    * `pass = false` — no expectation re-scans data.
    *
    * Plan: ONE evaluation of the profile joined (broadcast, from the
    * spec side LEFT OUTER so every declared check appears in the
    * output exactly once) with the literal spec frame; the
    * per-expectation predicates compile into one when-chain keyed on
    * the expectation name. A NULL predicate result (e.g. a range
    * check against a null min) is a FAILED expectation, not a silent
    * pass — and a check naming a column ABSENT from the profile frame
    * is likewise a FAILED expectation (its profile row is all-null,
    * so the predicate coalesces to false), never a silently dropped
    * row: a 'block on any pass=false' gate cannot pass vacuously on a
    * typo'd column name (r11 ADVICE). */
  def expectations(profile: DataFrame,
                   checks: Seq[(String, String, org.apache.spark.sql.Column)]): DataFrame = {
    val (spec, passExpr) = specAndPass(profile.sparkSession, "expectations", checks)
    // spec drives the join: k-row profile broadcasts, every declared
    // check survives to the output even when its column is absent from
    // the profile (all-null profile row → predicate null → pass=false)
    spec.join(broadcast(profile), Seq("column"), "left_outer")
      .select(col("expectation"), col("column"), passExpr.as("pass"))
  }

  /** The ONE compilation of a check spec — shared by [[expectations]]
    * and [[windowedExpectations]] so the NULL-predicate-fails contract
    * can never diverge between the batch and windowed gates: the
    * literal (expectation, column) spec frame plus the when-chain
    * whose per-expectation predicate coalesces NULL to FALSE. */
  private def specAndPass(spark: org.apache.spark.sql.SparkSession, who: String,
                          checks: Seq[(String, String, org.apache.spark.sql.Column)])
      : (DataFrame, org.apache.spark.sql.Column) = {
    require(checks.nonEmpty, s"Profiling.$who: no checks declared")
    require(checks.map(_._1).distinct.size == checks.size,
      s"Profiling.$who: duplicate expectation names")
    import spark.implicits._
    val spec = checks.map { case (n, c, _) => (n, c) }.toDF("expectation", "column")
    val passExpr = checks.foldRight(lit(null).cast("boolean")) {
      case ((n, _, pred), acc) =>
        when(col("expectation") === n, coalesce(pred, lit(false))).otherwise(acc)
    }
    (spec, passExpr)
  }

  /** The streaming face of [[expectations]] (VERDICT r11 #7): the
    * same declarative checks evaluated per CLOSED event-time window
    * over a [[windowedProfile]] — drift monitoring with verdicts
    * instead of raw stats. One (window_start, expectation, column,
    * pass) row per window per check; a NULL predicate result is a
    * FAILED expectation, exactly as in the batch form.
    *
    * Plan: [[windowedProfile]]'s one stateful windowed aggregate plus
    * ONE broadcast join with the literal spec frame — no new
    * stateful operator, so stream ≡ batch on closed windows by
    * construction (ProfilingSpec pins it). Check predicates range
    * over the windowed profile's columns (n_rows, n_null, min_num,
    * max_num, mean). Unknown check columns raise UP FRONT against
    * the declared `cols` (this form can validate statically — the
    * profiled column set is an argument, so the batch form's
    * absent-column-fails-loudly fallback is never needed here). */
  def windowedExpectations(df: DataFrame, tsCol: String, windowDur: String,
                           watermark: String, cols: Seq[String],
                           checks: Seq[(String, String, org.apache.spark.sql.Column)])
      : DataFrame = {
    val unknown = checks.map(_._2).filterNot(cols.contains)
    require(unknown.isEmpty,
      s"Profiling.windowedExpectations: checks name unprofiled columns: ${unknown.distinct.mkString(", ")}")
    val (spec, passExpr) = specAndPass(df.sparkSession, "windowedExpectations", checks)
    val prof = windowedProfile(df, tsCol, windowDur, watermark, cols)
    prof.join(broadcast(spec), Seq("column"))
      .select(col("window_start"), col("expectation"), col("column"),
        passExpr.as("pass"))
  }

  /** Largest |value| whose micro-unit tap round(v·10⁶) stays inside
    * double's 2⁵³ exact-integer range — beyond it the product itself
    * loses integer exactness before any cast (the
    * [[TimeSeries.MaxCentiTap]] posture, at micro scale). */
  val MaxMicroValue: Double = 9.0e9

  def windowedProfile(df: DataFrame, tsCol: String, windowDur: String,
                      watermark: String, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Profiling.windowedProfile: no columns declared")
    require(cols.distinct.size == cols.size,
      s"Profiling.windowedProfile: duplicate columns in ${cols.mkString(", ")}")
    val schema = df.schema
    require(schema.fieldNames.contains(tsCol),
      s"Profiling.windowedProfile: no column $tsCol")
    cols.foreach { c =>
      require(schema.fieldNames.contains(c),
        s"Profiling.windowedProfile: no column $c")
      require(schema(c).dataType.isInstanceOf[NumericType],
        s"Profiling.windowedProfile: numeric columns only, $c is ${schema(c).dataType}")
    }
    // loud per-row domain guards (the rangeBucket/autocorr posture):
    // NaN/±Inf would ride round() into a silent 0/saturated long under
    // the non-ANSI cast (mean corrupt, no error), |v| past the 2^53
    // micro bound loses exactness before the cast, and a NULL
    // timestamp is silently DROPPED by Spark's window() while the
    // oracle's date_trunc would keep it as a NULL group — all three
    // raise instead of diverging
    val inRange = !isnan(col("v")) &&
      col("v") >= lit(-MaxMicroValue) && col("v") <= lit(MaxMicroValue)
    val stacked = df.select(
        when(col(tsCol).isNull, raise_error(lit(
          s"windowedProfile: NULL $tsCol has no window (the oracle would " +
            "keep a NULL group; filter upstream)")))
          .otherwise(col(tsCol)).as("ts"),
        explode(array(cols.map(c =>
          struct(lit(c).as("column"), col(c).cast("double").as("v"))): _*)).as("cv"))
      .select(col("ts"), col("cv.column").as("column"), col("cv.v").as("v"))
      .withColumn("vc",
        when(col("v").isNull, lit(null).cast("long"))
          .when(inRange, round(col("v") * 1000000).cast("long"))
          .otherwise(raise_error(concat(lit(
            s"windowedProfile: value outside exact micro range [-$MaxMicroValue, " +
              s"$MaxMicroValue] (or NaN): "), col("v").cast("string")))))
    val wm = if (stacked.isStreaming) stacked.withWatermark("ts", watermark)
             else stacked
    val nonNull = col("n_rows") - col("n_null")
    // decimal(38,0) partial sums: a window of 2^53-scale taps must not
    // wrap a long (DuckDB's sum(BIGINT) promotes to HUGEINT — same
    // exactness class)
    wm.groupBy(window(col("ts"), windowDur), col("column"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        min(col("v")).as("min_num"), max(col("v")).as("max_num"),
        sum(col("vc").cast("decimal(38,0)")).as("sum_micro"))
      .select(col("window.start").as("window_start"), col("column"),
        col("n_rows"), col("n_null"), col("min_num"), col("max_num"),
        when(nonNull === 0L, lit(null).cast("double"))
          .otherwise(round(col("sum_micro").cast("double") / (nonNull * 1000000.0), 6))
          .as("mean"))
  }
}
