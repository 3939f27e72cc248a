package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-file compaction planner — the table-maintenance step every
  * standing 100 TB lake needs: a long-running ingest leaves thousands
  * of under-sized files per partition, and scan cost degrades with
  * file COUNT (task scheduling, footer reads, open/close) even when
  * total bytes are unchanged. The planner turns a file inventory
  * (key, size) into output-bin assignments: files sorted by their
  * layout key, then chunked into consecutive ~target-size groups, so
  * every output file inherits a TIGHT key range (min/max survive as
  * parquet footer stats — compaction never un-sorts a sorted layout,
  * the same promise [[graft.tools.ZOrderLayout]] makes for curve
  * cells).
  *
  * Policy: file f with exclusive prefix size P(f) (sum of sizes of
  * all keys before it) lands in bin ⌊P(f)/target⌋ — the standard
  * "chunk a sorted run by cumulative size" plan. Bins are filled to
  * ≥ target by the first file that crosses the boundary (a bin can
  * exceed target by at most one file), and a file larger than target
  * still lands in exactly one bin — the planner never splits a file.
  *
  * Scale shape: the inventory is METADATA (one row per file — still
  * millions of rows on a big lake), and the naive plan,
  * `sum(sz) over (order by key)`, funnels all of it through ONE
  * reducer. This uses [[PrefixSum.globalRunningSum]]'s two-pass form
  * instead: range-partition + per-partition totals (numPartitions
  * longs to the driver) + broadcast offsets — no global sort, no
  * single reducer. The bin arithmetic is exact integer `div` (a
  * double floor drifts past 2⁵³ of cumulative bytes — real at
  * 100 TB).
  *
  * Scale receipt (`BenchScale compaction`, 4M/16M/64M synthetic
  * inventories, r13): top rung 144.8 s two-pass vs 390.7 s for the
  * single-reducer window twin (whose ONE task ran 376 s), plans
  * bit-equal at every rung by an exceptAll gate, exponent 1.106. On
  * local[32] the crossover sits between 16M and 64M files — below it
  * a single in-memory sort of ≤16M longs is cheap either way; above
  * it the window form is wall-clock-bound by its one reducer, which
  * on a real cluster does not scale at all.
  */
object Compaction {

  /** One row per output bin: `out_bin, n_files, size_total, key_min,
    * key_max`. `keyCol` must be UNIQUE per inventory row (it is the
    * file's layout key — duplicate keys would make the prefix order,
    * and thus the plan, engine-defined) and sizes must be
    * NONNEGATIVE (a negative prefix would also split the engines:
    * Spark's `div` truncates toward zero, DuckDB's `//` floors) —
    * both contracts are enforced loudly, not assumed (review r13):
    * duplicates fail inside the prefix sum's pass-1 scan, negative
    * sizes via the assert_true guard below. */
  def plan(inventory: DataFrame, keyCol: String, szCol: String,
           targetSize: Long): DataFrame = {
    require(targetSize > 0, s"Compaction.plan: targetSize must be positive, got $targetSize")
    // assert_true returns NULL when the guard holds, so the coalesce
    // adds exactly 0 to every valid size (the shuffleRank idiom)
    val sz = col(szCol).cast("long")
    val guard = coalesce(assert_true(sz >= 0,
      concat(lit("Compaction.plan: negative size for key "),
        col(keyCol).cast("string"), lit(": "), sz.cast("string")))
      .cast("long"), lit(0L))
    val guarded = inventory.select(col(keyCol), (sz + guard).as(szCol))
    PrefixSum.globalRunningSum(guarded, keyCol, szCol,
        requireUniqueKeys = true)
      .withColumn("out_bin", expr(s"(running - v) div ${targetSize}L"))
      .groupBy(col("out_bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("v")).as("size_total"),
        min(col("k")).as("key_min"), max(col("k")).as("key_max"))
  }
}
