package graft.tools

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** The bucketed-layout receipt: writing both fact tables bucketed by
  * the join key makes the lineitem⋈orders join plan with ZERO shuffle
  * Exchange, and the result is identical to the plain join. Broadcast
  * is disabled (runtime conf — the suite session is shared, so
  * builder-time configs would be ignored) so the gate tests the
  * shuffle question, not a broadcast shortcut. */
class BucketedJoinSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // written once, demanded by whichever test runs first
  private lazy val layout: Unit =
    BucketedLayout.writeTradeTables(spark, sfDir, numBuckets = 8)

  /** Pin runtime confs for one test body, restoring previous values. */
  private def withConfs[T](kvs: (String, String)*)(body: => T): T = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.get(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("bucketed lineitem joins bucketed orders with zero Exchange") {
    layout
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = BucketedLayout.colocatedJoin(spark)
        .select(col("l_orderkey"), col("l_extendedprice"), col("o_totalprice"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // same join unbucketed: both sides exchange
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("o_totalprice"))
      assert("Exchange".r.findAllIn(plain.queryExecution.executedPlan.toString).size >= 2,
        "control: the unbucketed join should shuffle both sides")
      // identical results (row count + exact integer-cents checksum)
      def fp(df: org.apache.spark.sql.DataFrame) = df.agg(
        count(lit(1)),
        sum(round(col("l_extendedprice") * 100).cast("decimal(38,0)")),
        sum(round(col("o_totalprice") * 100).cast("decimal(38,0)"))).head().toSeq
      assert(fp(joined) == fp(plain))
    }
  }

  test("j_bucketed_colo: the whole join+agg plans with zero Exchange") {
    // The catalog entry's showcase: the order-grain aggregation reuses
    // the join's bucket partitioning (groupBy key = bucket key), so
    // NOT EVEN THE AGG shuffles — zero Exchange anywhere in the plan.
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val q = graft.queries.ExtensionCatalog.jBucketedColo(spark, sfDir)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected a sort-merge join:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join+agg must not shuffle anywhere:\n$plan")
      assert(q.count() > 0, "HAVING threshold must keep a non-empty witness")
    }
  }

  test("repeated writeTradeTables calls reuse one stable location") {
    layout
    val loc1 = spark.sql("DESCRIBE FORMATTED graft_bkt_orders")
      .filter(col("col_name") === "Location").head().getString(1)
    BucketedLayout.writeTradeTables(spark, sfDir, numBuckets = 8)
    val loc2 = spark.sql("DESCRIBE FORMATTED graft_bkt_orders")
      .filter(col("col_name") === "Location").head().getString(1)
    assert(loc1 == loc2, s"layout must not leak a new directory per call: $loc1 vs $loc2")
    assert(spark.table("graft_bkt_orders").count() > 0)
  }

  test("bucket pruning: an equality probe on the bucket key reads one bucket") {
    layout
    // DisableUnnecessaryBucketedScan turns bucketed reading off for
    // filter-only plans (it only weighs partitioning needs, not bucket
    // pruning) — keep bucketed scans on so the pruning gate is testable
    withConfs("spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val probe = spark.table("graft_bkt_orders").filter(col("o_orderkey") === 42L)
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
        s"bucket pruning lost — probe scans all buckets:\n$plan")
    }
  }
}
