package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.SparkSpec

/** Streaming exact dedup: first-seen wins across micro-batches;
  * watermarked form re-admits content after its state ages out.
  */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming exact dedup drops repeats across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val out = Dedup.exactStream(in.toDF().toDF("doc_id", "text"), "text")
    val q = out.writeStream.format("memory").queryName("dds")
      .outputMode("append").start()
    try {
      in.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      q.processAllAvailable()
      in.addData((4L, "beta"), (5L, "gamma"))
      q.processAllAvailable()
      val rows = spark.table("dds").as[(Long, String)].collect().sortBy(_._1)
      assert(rows.map(_._2).toSeq == Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("watermarked streaming dedup evicts state beyond the horizon") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = Dedup.exactStream(in.toDF().toDF("doc_id", "ts", "text"),
      "text", tsCol = Some("ts"), horizon = "10 seconds")
    val q = out.writeStream.format("memory").queryName("ddw")
      .outputMode("append").start()
    try {
      // batch 1: duplicate inside the horizon -> dropped
      in.addData((1L, ts(1000), "alpha"), (2L, ts(2000), "alpha"))
      q.processAllAvailable()
      // batch 2: advances the watermark past alpha's expiry (1000+10s)
      in.addData((3L, ts(60000), "beta"))
      q.processAllAvailable()
      // batch 3: alpha state evicted -> re-admitted (bounded state, not
      // forever-dedup — the documented horizon contract)
      in.addData((4L, ts(120000), "alpha"))
      q.processAllAvailable()
      val ids = spark.table("ddw").select("doc_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 3L, 4L))
    } finally q.stop()
  }
}
