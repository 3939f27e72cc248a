package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketed-layout receipt: writing both fact tables bucketed by
  * the join key makes the lineitem⋈orders join plan with ZERO shuffle
  * Exchange, and the result is identical to the plain join. Broadcast
  * is disabled so the gate tests the shuffle question, not a
  * broadcast shortcut. */
class BucketedJoinSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val warehouse =
    java.nio.file.Files.createTempDirectory("graft-warehouse").toString

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    // DisableUnnecessaryBucketedScan turns bucketed reading off for
    // filter-only plans (it only weighs partitioning needs, not bucket
    // pruning) — keep bucketed scans on so the pruning gate is testable
    .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // written once, demanded by whichever test runs first
  private lazy val layout: Unit =
    BucketedLayout.writeTradeTables(spark, sfDir, numBuckets = 8)

  test("bucketed lineitem joins bucketed orders with zero Exchange") {
    layout
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

  test("bucket pruning: an equality probe on the bucket key reads one bucket") {
    layout
    // filter on the bucket column turns into a bucket-subset scan —
    // the SelectedBucketsCount marker in the scan node
    val probe = spark.table("graft_bkt_orders").filter(col("o_orderkey") === 42L)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
      s"bucket pruning lost — probe scans all buckets:\n$plan")
  }
}
