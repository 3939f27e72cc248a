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
}
