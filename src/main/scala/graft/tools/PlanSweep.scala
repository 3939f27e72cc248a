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
  * an equi join into a cross product anywhere in the catalog gets
  * caught here even if no targeted gate covers it.
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
    * EMPTY OR JUSTIFIED PER ENTRY. EMPTY since r11: g_labelprop fell
    * to the dense node-id remap (labels < 2³² pack into
    * EncodedArgmax), and ts_motif's SAX vocabulary ({a..d}⁴ ∪ "flat")
    * maps to lex-order-preserving integers ≤ 256 — the catalog now
    * hash-aggregates every argmax. */
  val sortAggDeclared: Set[String] = Set.empty

  /** Pinned per-query shuffle-Exchange budget (VERDICT r10 #6 — the
    * SortAggregate gate's generalization): the sweep counts DISTINCT
    * shuffle `Exchange` nodes in each query's formatted plan and
    * fails on any INCREASE over this committed file. A deliberate
    * plan change refreshes the file with `runMain graft.tools.PlanSweep
    * <sfDir> write` and justifies the diff in the commit. Decreases
    * (improvements) are reported, never fail. BroadcastExchange is NOT
    * counted — broadcasts are the cure, not the disease. */
  val budgetPath = "dev/exchange_budget.json"

  /** Distinct shuffle-exchange node count in a formatted plan: node
    * ids of `(N) Exchange` (tree and details repeat the same ids —
    * dedup by id; `(N) BroadcastExchange` deliberately unmatched). */
  def exchangeCount(plan: String): Int =
    raw"\((\d+)\) Exchange\b".r.findAllMatchIn(plan)
      .map(_.group(1)).toSet.size

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val writeBudget = args.lift(1).contains("write")
    val spark = graft.GraftSession.builderFromEnv("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var cart = List.empty[String]
    var bnlj = List.empty[String]
    var sortAgg = List.empty[String]
    var errs = List.empty[String]
    val exchanges = scala.collection.mutable.TreeMap.empty[String, Int]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        if (plan.contains("CartesianProduct")) cart ::= name
        if (plan.contains("BroadcastNestedLoopJoin")) bnlj ::= name
        if (plan.contains("SortAggregate")) sortAgg ::= name
        exchanges(name) = exchangeCount(plan)
      } catch { case e: Throwable =>
        errs ::= s"$name: ${e.getClass.getSimpleName}"
      }
    }
    val badCart = cart.filterNot(_ == "ann_brute_force")
    val badBnlj = bnlj.filterNot(scalarBroadcast)
    val badSortAgg = sortAgg.filterNot(sortAggDeclared)

    // exchange budget: fail on growth or an un-budgeted query; report
    // shrinkage so the budget can be deliberately refreshed
    val budgetFile = java.nio.file.Paths.get(budgetPath)
    var overBudget = List.empty[String]
    var underBudget = List.empty[String]
    if (writeBudget) {
      val json = exchanges.map { case (k, v) => s""""$k":$v""" }
        .mkString("{\n", ",\n", "\n}\n")
      java.nio.file.Files.writeString(budgetFile, json)
      System.err.println(s"[plan_sweep] wrote ${exchanges.size} budgets to $budgetPath")
    } else if (java.nio.file.Files.exists(budgetFile)) {
      val budget = raw""""([^"]+)":(\d+)""".r
        .findAllMatchIn(java.nio.file.Files.readString(budgetFile))
        .map(m => m.group(1) -> m.group(2).toInt).toMap
      exchanges.foreach { case (name, n) =>
        budget.get(name) match {
          case Some(b) if n > b => overBudget ::= s"$name: $n > $b"
          case Some(b) if n < b => underBudget ::= s"$name: $n < $b"
          case None => overBudget ::= s"$name: $n > unbudgeted (refresh $budgetPath)"
          case _ =>
        }
      }
    } else {
      System.err.println(s"[plan_sweep] no $budgetPath - run with 'write' to pin")
    }

    def js(xs: List[String]) = xs.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"plan_sweep","queries":${SparkEntry.queries.size},""" +
      s""""cartesian":${js(cart)},"bnlj":${js(bnlj)},"sort_agg":${js(sortAgg)},""" +
      s""""unexpected_cartesian":${js(badCart)},"unexpected_bnlj":${js(badBnlj)},""" +
      s""""unexpected_sort_agg":${js(badSortAgg)},""" +
      s""""exchange_over_budget":${js(overBudget)},""" +
      s""""exchange_under_budget":${js(underBudget)},""" +
      s""""errors":${js(errs)}}""")
    spark.stop()
    if (badCart.nonEmpty || badBnlj.nonEmpty || badSortAgg.nonEmpty ||
        overBudget.nonEmpty || errs.nonEmpty)
      sys.exit(1)
  }
}
