package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import QueryCatalog.{moneySum, Q}

/** The rest of the classic TPC-H query suite, adapted to the reduced
  * testdata schema (no partsupp table; no l_commitdate/l_receiptdate/
  * l_shipmode/p_container/c_phone/o_comment columns — see TESTDATA.md).
  * Each query keeps the ORIGINAL's plan *shape* — the thing the
  * optimizer is graded on — while substituting available columns for
  * missing ones (lateness := l_shipdate vs o_orderdate + N days;
  * country code := c_nationkey % 10; part-supplier relation :=
  * distinct (l_partkey, l_suppkey) observed in lineitem):
  *
  *  - q4: EXISTS decorrelated to a left-semi join with a non-equi
  *        residual condition
  *  - q7/q8: selective dims pruned FIRST (nation-filtered supplier /
  *        region-filtered customer), then the fact join chain
  *  - q10: aggregate the fact table BEFORE joining the wide customer
  *        dim (the join input shrinks from |lineitem| to |customers|)
  *  - q11/q15/q22: global scalar (total / max / avg) computed once and
  *        broadcast back — one extra one-row exchange, no re-scan
  *  - q12: case-aggregation after an equi join
  *  - q13: left-outer count + count-distribution (two hash aggs)
  *  - q14/q19: broadcast part dim; q19's OR-of-ANDs stays a residual
  *        filter over the extracted equi key (never a nested loop)
  *  - q16: anti join against the "complaint" supplier set + distinct
  *        count over the observed part-supplier pairs
  *  - q17: the correlated per-part average decorrelated to a
  *        broadcast-joined pre-aggregation, compared in EXACT integers
  *        (2·qty·n < Σqty ⟺ qty < avg/2 — no fp divergence possible)
  *  - q21: one late-lines frame reused for both the EXISTS (other
  *        supplier on the order) semi join and the NOT EXISTS (other
  *        LATE supplier) anti join
  *  - q2: min-cost-supplier-per-part as ONE min(struct(cost, supp))
  *        aggregate — Spark's idiomatic decorrelation of the
  *        correlated-min subquery (ties break to the smallest suppkey
  *        deterministically, no join-back needed)
  *
  * Money/cents arithmetic follows [[QueryCatalog.moneySum]]: per-row
  * round to integer cents, exact integer sums, one final division —
  * the only cross-engine-stable contract for money at corpus scale.
  */
object TpchCatalog {

  /** Per-row discounted-price cents: the exact-integer revenue unit. */
  private def discCents: Column =
    round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("long")

  /** TPC-H Q4 shape — order-priority checking: orders in a window
    * having at least one lineitem shipped > 120 days after the order
    * date (the commit/receipt lateness analog). The EXISTS plans as a
    * left-semi join on the order key with the lateness residual, so
    * each order is emitted at most once regardless of how many
    * qualifying lines it has, and the priority count is a tiny
    * broadcastable aggregate. */
  val q4Priority: Q = (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 120 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))

  /** TPC-H Q7 shape — volume shipping between two nations, both
    * directions, by ship year. The nation filter is applied to the
    * TINY dims first (supplier/customer joined to their broadcast
    * nation rows and pruned to the two named nations), so the fact
    * join chain only ever carries the two nations' traffic — at
    * 100 TB this prunes ~92 % of the corpus before the big joins. */
  val q7TradeFlows: Q = (s, d) => {
    val pair = Seq("NATION_3", "NATION_8")
    val sup = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .filter(col("supp_nation").isin(pair: _*))
      .select(col("s_suppkey"), col("supp_nation"))
    val cust = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cnk"))
      .filter(col("cust_nation").isin(pair: _*))
      .select(col("c_custkey"), col("cust_nation"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_8") ||
        (col("supp_nation") === "NATION_8" && col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
  }

  /** TPC-H Q8 shape — national market share: of the PROMO-part revenue
    * sold to ASIA-region customers, the fraction supplied by NATION_3,
    * by order year. Both the numerator and denominator accumulate
    * EXACT integer cents (a conditional sum + a total, one pass) and
    * the share is one final division of identical integers. The
    * region-restricted customer set participates as a left-semi join
    * (membership only — no customer columns needed downstream). */
  val q8MarketShare: Q = (s, d) => {
    val promoParts = Tables.part(s, d)
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val sup = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .select(col("s_suppkey"), col("supp_nation"))
    val asiaCust = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("cnk"), col("n_regionkey"))),
        col("c_nationkey") === col("cnk"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select(col("c_custkey"))
    Tables.lineitem(s, d)
      .join(broadcast(promoParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1998-01-01"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_3", discCents).otherwise(lit(0L)))
          .as("nation_cents"),
        sum(discCents).as("total_cents"))
      .select(col("o_year"),
        round(col("nation_cents").cast("double") / col("total_cents").cast("double"), 6)
          .as("mkt_share"))
  }

  /** TPC-H Q10 shape — top returned-revenue customers in a quarter.
    * The fact side aggregates to per-customer revenue BEFORE touching
    * the customer dim — the join then moves |customers| rows, not
    * |lineitem| — and the top-20 plans as TakeOrderedAndProject
    * (per-partition heaps; revenue is exact 2-decimal money, custkey
    * breaks ties). */
  val q10Returns: Q = (s, d) =>
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1997-01-01") &&
            col("o_orderdate") < lit("1997-07-01"))
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        round(col("c_acctbal"), 2).as("acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey")).limit(20)

  /** TPC-H Q11 shape — revenue concentration: parts whose total
    * revenue exceeds 1.5× the MEAN part revenue (a relative
    * threshold, so the witness is non-vacuous at every SF — the
    * original's fixed 0.0001 fraction selects nothing on a uniform
    * synthetic corpus). The global (total, count) scalar is ONE extra
    * one-row exchange over the same per-part aggregate (no second
    * corpus scan) broadcast back as the HAVING threshold; the
    * comparison 2·pc·n > 3·total runs entirely in decimal(38,0)
    * integers (DuckDB's HUGEINT twin) so neither overflow nor fp
    * rounding can flip a row at any corpus size. */
  val q11ShareThreshold: Q = (s, d) => {
    val byPart = Tables.lineitem(s, d).groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("part_cents"))
    val total = byPart.agg(sum(col("part_cents").cast("decimal(38,0)")).as("total_cents"),
      count(lit(1)).cast("decimal(38,0)").as("n_parts"))
    byPart.join(broadcast(total),
        col("part_cents").cast("decimal(38,0)") * col("n_parts") * 2
          > col("total_cents") * 3)
      .select(col("l_partkey"), (col("part_cents") / 100.0).as("value"))
  }

  /** TPC-H Q12 shape — shipping buckets × order priority: a case
    * aggregation over the order join, bucketing lines shipped > 90
    * days after the order date as LATE (the shipmode analog). One
    * equi join, one two-column conditional aggregate. */
  val q12LatePriority: Q = (s, d) => {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "LATE").otherwise("ONTIME").as("ship_bucket"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_count"))
  }

  /** TPC-H Q13 shape — customer order-count distribution: left-outer
    * join (customers with no qualifying orders count as 0), then two
    * hash aggregations (per-customer count → count distribution).
    * Priority <> '4-NOT SPECIFIED' stands in for the original's
    * comment-pattern exclusion. */
  val q13CountDistribution: Q = (s, d) =>
    Tables.customer(s, d).select(col("c_custkey"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
          .select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))

  /** TPC-H Q14 shape — promo revenue share in a month: broadcast part
    * dim, conditional + total EXACT-cents sums in one pass, one final
    * division (identical IEEE operands in both engines). */
  val q14Promo: Q = (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-03-01") &&
        col("l_shipdate") < lit("1997-04-01"))
      .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(sum(when(col("p_type") === "PROMO", discCents).otherwise(lit(0L)))
          .as("promo_cents"),
        sum(discCents).as("total_cents"))
      .select(round(lit(100.0) * col("promo_cents").cast("double")
        / col("total_cents").cast("double"), 6).as("promo_share"))

  /** TPC-H Q15 shape — top supplier(s) by quarterly revenue: the
    * per-supplier aggregate computed ONCE, its max taken as a one-row
    * broadcast, and the equality join returns every supplier at the
    * max (exact integer cents — no fp equality hazard). */
  val q15TopSupplier: Q = (s, d) => {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1997-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(discCents).as("rev_cents"))
    val maxRev = rev.agg(max(col("rev_cents")).as("max_cents"))
    rev.join(broadcast(maxRev), col("rev_cents") === col("max_cents"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("rev_cents") / 100.0).as("total_rev"))
  }

  /** TPC-H Q16 shape — supplier counts per part attribute group, with
    * the part-supplier relation observed from lineitem (no partsupp
    * table) and negative-balance suppliers standing in for the
    * complaint exclusion: broadcast-pruned part dim, broadcast ANTI
    * join against the tiny excluded-supplier set, then a distinct
    * count per (brand, type, size). */
  val q16SupplierCount: Q = (s, d) => {
    val parts = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val excluded = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q17 shape — small-quantity revenue for one brand: the
    * correlated per-part average decorrelated into a broadcast-joined
    * pre-aggregation over the SAME brand-pruned line set, with the
    * "qty < avg/2" predicate evaluated in exact integers
    * (2·qty·n < Σqty — quantities are integral by data contract), so
    * no engine's division order can flip a row. Output is the
    * original's avg yearly loss: Σ extendedprice / 7 years. */
  val q17SmallQty: Q = (s, d) => {
    val brandLines = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
          .filter(col("p_brand") === "Brand#3").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
    val perPart = brandLines.groupBy(col("l_partkey").as("ak"))
      .agg(sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
        count(lit(1)).as("n_lines"))
    brandLines.join(broadcast(perPart), col("l_partkey") === col("ak"))
      .filter(lit(2L) * round(col("l_quantity")).cast("long") * col("n_lines")
        < col("sum_qty"))
      .agg(round(sum(round(col("l_extendedprice") * 100).cast("long")) / 700.0, 2)
        .as("avg_yearly"))
  }

  /** TPC-H Q9 shape — product-type profit by supplier nation and
    * year: profit := discounted revenue − supply cost × quantity,
    * with unit supply cost derived as 60 % of p_retailprice (the
    * partsupp.ps_supplycost analog from the available part dim —
    * the join DAG is the original's: lineitem ⋈ part ⋈ supplier ⋈
    * nation ⋈ orders). All money in exact integer cents per row
    * before the sum, so profit (which may be negative) is
    * bit-stable at any corpus size. */
  val q9Profit: Q = (s, d) => {
    val p = Tables.part(s, d).filter(col("p_type") === "ECONOMY")
      .select(col("p_partkey"),
        round(col("p_retailprice") * 60).cast("long").as("cost_cents"))
    Tables.lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg((sum(discCents
        - col("cost_cents") * round(col("l_quantity")).cast("long")) / 100.0)
        .as("profit"))
  }

  /** TPC-H Q20 shape — excess shippers: suppliers whose total shipped
    * quantity of PROMO parts exceeds 1.05× the mean per-supplier
    * total (the availqty > ½ Σqty analog — uniform synthetic data
    * concentrates per-supplier totals within ~4 % of the mean, so the
    * classic ×1.5 margin selects nothing at any SF; 1.05 keeps the
    * witness non-empty everywhere). The nested-IN chain of the
    * original: part-pruned aggregate → global (Σ, n) as a one-row
    * broadcast → threshold in decimal(38,0) integers → left-semi join
    * into the supplier dim. */
  val q20ExcessShippers: Q = (s, d) => {
    val promoQty = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
          .filter(col("p_type") === "PROMO").select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_quantity")).cast("long")).as("sq"))
    val tot = promoQty.agg(sum(col("sq").cast("decimal(38,0)")).as("gs"),
      count(lit(1)).cast("decimal(38,0)").as("ns"))
    val excess = promoQty.join(broadcast(tot),
        col("sq").cast("decimal(38,0)") * col("ns") * 20 > col("gs") * 21)
      .select(col("l_suppkey"))
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
  }

  /** TPC-H Q19 shape — disjunctive brand/size/quantity predicates: the
    * planner extracts the common l_partkey = p_partkey equi key (one
    * broadcast hash join — NEVER a nested loop) and evaluates the
    * OR-of-ANDs as a residual filter inside the join. */
  val q19Disjunctive: Q = (s, d) =>
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey") && (
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#24" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30))))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))

  /** TPC-H Q21 shape — suppliers who were the ONLY late shipper on a
    * finished multi-supplier order (late := shipped > 180 days after
    * the order date). ONE late-lines frame feeds both quantifiers:
    * the EXISTS (another supplier on the order) as a left-semi join
    * against all lines, the NOT EXISTS (another LATE supplier) as a
    * left-anti self-join — both on the order key with a suppkey
    * inequality residual, so nothing is ever quadratic in the corpus
    * (per-order fan-out only). */
  val q21SoleLate: Q = (s, d) => {
    val lines = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val late = lines
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 180 DAYS"))
      .select(col("l_orderkey").as("k1"), col("l_suppkey").as("sk1"))
    late
      .join(lines.select(col("l_orderkey").as("k2"), col("l_suppkey").as("sk2")),
        col("k1") === col("k2") && col("sk2") =!= col("sk1"), "left_semi")
      .join(late.select(col("k1").as("k3"), col("sk1").as("sk3")),
        col("k1") === col("k3") && col("sk3") =!= col("sk1"), "left_anti")
      .join(broadcast(Tables.supplier(s, d)), col("sk1") === col("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name")).limit(20)
  }

  /** TPC-H Q22 shape — well-funded customers with no LARGE order
    * (every fixture customer has *some* order, so the unfiltered
    * anti join is vacuous — the j_anti lesson; the > 300k threshold
    * keeps the witness non-empty at every SF): the global average
    * positive balance as a one-row broadcast scalar (exact cents sum,
    * one division — identical operands both engines), a left-anti
    * join against the large orders, grouped by the nationkey-derived
    * country code (the phone-prefix analog). */
  val q22IdleCustomers: Q = (s, d) => {
    val cust = Tables.customer(s, d)
      .withColumn("bal_cents", round(col("c_acctbal") * 100).cast("long"))
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg((sum(col("bal_cents")).cast("double") / count(lit(1))).as("avg_cents"))
    cust.join(broadcast(avgBal), col("bal_cents").cast("double") > col("avg_cents"))
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000)
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy((col("c_nationkey") % 10).as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        (sum(col("bal_cents")) / 100.0).as("totacctbal"))
  }

  /** TPC-H Q2 shape — minimum-cost supplier per part: the observed
    * unit price (exact integer cents, per-row division — identical
    * IEEE in both engines) aggregated per (part, supplier), then the
    * correlated-min subquery decorrelated into ONE min(struct(cost,
    * suppkey)) aggregate — Spark's idiomatic form: the struct min
    * both selects the cheapest cost AND breaks exact-cost ties to the
    * smallest suppkey in the same pass, with no join-back against the
    * min. Supplier/nation dims broadcast onto the per-part winners. */
  val q2MinCost: Q = (s, d) => {
    val unitCents = round(col("l_extendedprice") / col("l_quantity") * 100).cast("long")
    val perSupp = Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
          .filter(col("p_type") === "STANDARD" && col("p_size") >= 40)
          .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(unitCents).as("unit_cents"))
    // encoded argmin (r10 — see EncodedArgmax): min(struct(...))
    // carried a struct buffer → SortAggregate over the per-(part,
    // supp) minima stream; the packed long keeps both aggs hash
    perSupp.groupBy(col("l_partkey"))
      .agg(min(graft.operators.EncodedArgmax.minScoreMinId(
        col("unit_cents"), col("l_suppkey"))).as("enc"))
      .select(col("l_partkey"),
        graft.operators.EncodedArgmax.decodeScore(col("enc")).as("best_cents"),
        graft.operators.EncodedArgmax.decodeMinId(col("enc")).as("best_supp"))
      .join(broadcast(Tables.supplier(s, d)), col("best_supp") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("l_partkey").as("p_partkey"), col("s_name"), col("n_name"),
        (col("best_cents") / 100.0).as("unit_cost"))
  }
}
