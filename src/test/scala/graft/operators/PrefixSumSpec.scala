package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** Two-pass global prefix sum: equals the single-reducer window form,
  * regardless of partition count or input layout.
  */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private val rows = {
    val rnd = new scala.util.Random(7)
    (0L until 500L).map(k => (k, rnd.nextInt(50).toLong))
  }

  private def run(numPartitions: Int): Seq[(Long, Long, Long)] =
    PrefixSum.globalRunningSum(
      rows.toDF("doc", "cnt").repartition(11), "doc", "cnt", numPartitions)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("matches the window form exactly") {
    val want = rows.toDF("doc", "cnt")
      .withColumn("running", sum(col("cnt")).over(
        Window.orderBy(col("doc")).rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(run(8) == want)
  }

  test("independent of the two-pass partition count") {
    assert(run(3) == run(17))
  }

  test("single partition degenerates correctly") {
    val got = run(1)
    assert(got.last._3 == rows.map(_._2).sum)
  }

  test("survives a downstream coalesce(1) (stamp travels as data, not task id)") {
    val direct = run(8)
    val coalesced = PrefixSum.globalRunningSum(
      rows.toDF("doc", "cnt"), "doc", "cnt", 8)
      .coalesce(1)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(coalesced == direct)
  }
}
