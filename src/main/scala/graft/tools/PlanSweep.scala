package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry

/** Global plan sweep: explain EVERY catalog query at sf0.001 and flag
  * scale-killer shapes — the whole-catalog generalization of
  * PlanAuditSpec's targeted gates. Invariants:
  *
  *  - `CartesianProduct` appears ONLY in ann_brute_force (the
  *    deliberate exact baseline).
  *  - `BroadcastNestedLoopJoin` appears ONLY in queries from the
  *    declared scalar-broadcast list — the pattern where a ONE-ROW
  *    global aggregate (a max, a total, a trained sketch) joins the
  *    stream via a non-equi condition; the build side is a constant
  *    row at any corpus size, so the "nested loop" is a map-side
  *    probe, not a quadratic join.
  *
  * Any other occurrence fails the run (exit 1): a refactor that turns
  * an equi join into a cross product anywhere in the 146-query
  * catalog gets caught here even if no targeted gate covers it.
  * `runMain graft.tools.PlanSweep [sfDir]` prints one JSON line.
  */
object PlanSweep {

  /** Queries whose plan legitimately carries a broadcast nested-loop
    * probe — the EXACT set observed in the 2026-08-14 sweep, pinned:
    * the ANN family (brute force's deliberate broadcast cross join;
    * the index shapes' one-row LUT/centroid probes) and the global
    * scalar/sketch/threshold one-row broadcasts. A query gaining a
    * BNLJ outside this set fails the sweep; one losing its BNLJ (an
    * improvement) still passes. */
  val scalarBroadcast: Set[String] = Set(
    "ann_brute_force", "ann_external", "ann_ivf", "ann_ivfpq",
    "ann_ivfpq_rerank", "ann_pq",
    "agg_cms", "agg_bloom", "ds_temperature", "ta_unigram", "ta_backoff",
    // ta_colloc: the one-row n_total broadcast feeding the PMI ratio
    // (the ta_backoff total-join shape)
    "ta_colloc",
    // g_hits: two one-row max-normalizer broadcasts per HITS round
    "g_hits",
    // ta_bm25: the one-row corpus-stats (N, Σdl, df) broadcast
    "ta_bm25",
    // ta_moorelewis: TWO one-row n_total broadcasts (in-domain and
    // general LM) — the ta_backoff total-join shape twice
    "ta_moorelewis",
    // q_assoc: the one-row basket-count broadcast feeding the lift
    "q_assoc",
    // q_pareto: the one-row revenue-total broadcast feeding the shares
    "q_pareto",
    "q11_share_threshold", "q20_excess_shippers", "q22_idle_customers")

  /** Queries whose plan legitimately carries a SortAggregate — the r10
    * bug CLASS this gate exists for: an aggregation buffer that is not
    * fixed-width (array/struct value or ordering) silently bars the
    * hash aggregate, and a SortAggregate over a join-exploded stream
    * sorts pair-scale data to disk (the n×k assignment sorted ~50 GB
    * at 2M vectors before the encoded-argmax fix; the 4M rung died on
    * ENOSPC). Populated after sweeping all 185 plans — TO BE KEPT
    * EMPTY OR JUSTIFIED PER ENTRY:
    *  - g_labelprop: struct-ordering min_by over the ALREADY-AGGREGATED
    *    (dst, lbl, c) counts, ≤|E| 24 B rows riding the exchange the
    *    argmax needs anyway; unbounded caller label ids bar the
    *    fixed-width encoding (documented at the call site).
    *  - ts_motif: struct argmax whose VALUE is a string word — not
    *    long-encodable — but the aggregated input is bounded by the
    *    SAX vocabulary (≤ 7⁴ words per key), so the sort never sees a
    *    corpus-scale frame. */
  val sortAggDeclared: Set[String] = Set("g_labelprop", "ts_motif")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var cart = List.empty[String]
    var bnlj = List.empty[String]
    var sortAgg = List.empty[String]
    var errs = List.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        if (plan.contains("CartesianProduct")) cart ::= name
        if (plan.contains("BroadcastNestedLoopJoin")) bnlj ::= name
        if (plan.contains("SortAggregate")) sortAgg ::= name
      } catch { case e: Throwable =>
        errs ::= s"$name: ${e.getClass.getSimpleName}"
      }
    }
    val badCart = cart.filterNot(_ == "ann_brute_force")
    val badBnlj = bnlj.filterNot(scalarBroadcast)
    val badSortAgg = sortAgg.filterNot(sortAggDeclared)
    def js(xs: List[String]) = xs.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"plan_sweep","queries":${SparkEntry.queries.size},""" +
      s""""cartesian":${js(cart)},"bnlj":${js(bnlj)},"sort_agg":${js(sortAgg)},""" +
      s""""unexpected_cartesian":${js(badCart)},"unexpected_bnlj":${js(badBnlj)},""" +
      s""""unexpected_sort_agg":${js(badSortAgg)},""" +
      s""""errors":${js(errs)}}""")
    spark.stop()
    if (badCart.nonEmpty || badBnlj.nonEmpty || badSortAgg.nonEmpty || errs.nonEmpty)
      sys.exit(1)
  }
}
