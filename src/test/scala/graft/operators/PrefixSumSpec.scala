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

  test("requireUniqueKeys fails loudly on a duplicate order key") {
    // equal keys co-locate under the range partitioner, so the check
    // is an adjacent comparison inside pass 1 — no extra job
    val dup = (rows :+ (250L, 9L)).toDF("doc", "cnt")
    val e = intercept[org.apache.spark.SparkException] {
      PrefixSum.globalRunningSum(dup, "doc", "cnt", 8,
        requireUniqueKeys = true).collect()
    }
    assert(e.getMessage.contains("duplicate order key") ||
      Option(e.getCause).exists(_.getMessage.contains("duplicate order key")),
      s"unexpected failure: ${e.getMessage}")
    // the guard is free for unique inputs: flagged run ≡ unflagged
    assert(PrefixSum.globalRunningSum(rows.toDF("doc", "cnt"), "doc",
        "cnt", 8, requireUniqueKeys = true)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq == run(8))
  }

  test("single partition degenerates correctly") {
    val got = run(1)
    assert(got.last._3 == rows.map(_._2).sum)
  }

  test("survives a downstream coalesce(1) (split index, not task id, names the partition)") {
    val direct = run(8)
    val coalesced = PrefixSum.globalRunningSum(
      rows.toDF("doc", "cnt"), "doc", "cnt", 8)
      .coalesce(1)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(coalesced == direct)
  }

  test("materialize=true returns identical rows and a released-input checkpoint") {
    // the result is an eager checkpoint; the shared-shuffle design
    // (r13) keeps no internal checkpoint to free - values must be
    // bit-identical to the lazy form
    val lazyRows = run(8).toSet
    val mat = PrefixSum.globalRunningSum(rows.toDF("k", "v"), "k", "v",
      numPartitions = 8, materialize = true)
    assert(mat.queryExecution.logical
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD],
      "materialize=true must return the checkpoint itself (unpersistable)")
    val got = mat.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == lazyRows)
    Checkpoints.unpersist(mat)
  }

  test("streaming twin: offsets continue across micro-batches and equal the batch form in-order") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val out = PrefixSum.runningSumStream(in.toDF().toDF("doc", "cnt"), "doc", "cnt")
    val q = out.writeStream.format("memory").queryName("psum_s")
      .outputMode("append").start()
    try {
      // batches arrive in ascending doc order (out of order WITHIN a
      // batch — the per-batch sort owns that)
      in.addData((2L, 5L), (0L, 10L), (1L, 7L))
      q.processAllAvailable()
      in.addData((4L, 2L), (3L, 1L))
      q.processAllAvailable()
      val got = spark.table("psum_s").as[(Long, Long, Long)]
        .collect().sortBy(_._1).toSeq
      // equals the batch two-pass over the same rows in doc order
      val want = PrefixSum.globalRunningSum(
        Seq((0L, 10L), (1L, 7L), (2L, 5L), (3L, 1L), (4L, 2L)).toDF("doc", "cnt"),
        "doc", "cnt", 4)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == want)
      // the cross-batch carry is real: batch-2 offsets start at 22
      assert(got.find(_._1 == 3L).get._3 == 23L)
    } finally q.stop()
  }
}
