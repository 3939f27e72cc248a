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

  test("streaming MinHash-LSH pairs new docs against retained bucket members, capped") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val pairs = Dedup.minHashLshStream(in.toDF().toDF("doc_id", "text"),
      "text", "doc_id", maxBucket = 2)
    val q = pairs.toDF("doc_a", "doc_b").writeStream.format("memory")
      .queryName("lshs").outputMode("append").start()
    def collected(): Set[(Long, Long)] =
      spark.table("lshs").as[(Long, Long)].collect().toSet
    try {
      val t = "alpha beta gamma delta echo foxtrot"
      in.addData((1L, t), (2L, t), (10L, "completely unrelated words zulu"))
      q.processAllAvailable()
      assert(collected() == Set((1L, 2L)))
      // cross-batch: 3 pairs against the retained members from batch 1
      in.addData((3L, t))
      q.processAllAvailable()
      assert(collected() == Set((1L, 2L), (1L, 3L), (2L, 3L)))
      // cap=2: doc 3 was NOT retained, so 5 pairs only against {1, 2}
      in.addData((5L, t))
      q.processAllAvailable()
      assert(collected() == Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 5L), (2L, 5L)))
    } finally q.stop()
  }

  test("per-row array signatures equal the batch explode+agg signatures") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val batch = Dedup.minHashSignatures(docs, "text", "doc_id", k = 16)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val perRow = Dedup.rowMinHashSignatures(docs, "text", "doc_id", k = 16)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(batch.nonEmpty && batch == perRow)
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
