package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.SparkSpec

/** Streaming twins of the multimodal kernels — the last family
  * without one (text/dedup/time-series/graph all carry streaming
  * contracts). The payload synthesizers and the decode/phash kernels
  * are narrow per-row work (mapPartitions over the payload bytes;
  * the repartition is a streaming-legal shuffle), so the SAME
  * operator body runs unchanged over a stream: an image-ingest
  * pipeline dedups/fingerprints frames as they arrive. These specs
  * pin per-micro-batch output equal to the batch output on identical
  * data, across batch boundaries. */
class MultimodalStreamSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "alpha beta gamma delta echo foxtrot golf hotel india"),
    (2L, "a longer document body so the synthesized raster differs in" +
      " both width and height from its neighbors in the fixture"),
    (33L, "same-palette twin of doc 1 via doc_id % 32"),
    (4L, ""))

  test("perceptualHash over a stream equals the batch hashes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = Multimodal.perceptualHash(
        Multimodal.asCellGridPayload(in.toDF().toDF("doc_id", "text"),
          "text", "doc_id"))
      .writeStream.format("memory").queryName("phs").outputMode("append").start()
    try {
      in.addData(docs(0), docs(1))
      q.processAllAvailable()
      in.addData(docs(2), docs(3))
      q.processAllAvailable()
      val got = spark.table("phs").collect().map(_.toSeq).toSet
      val want = Multimodal.perceptualHash(
          Multimodal.asCellGridPayload(docs.toDF("doc_id", "text"),
            "text", "doc_id"))
        .collect().map(_.toSeq).toSet
      assert(got == want && got.size == docs.size)
    } finally q.stop()
  }

  test("decodeImage over a stream equals the batch decode metadata") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = Multimodal.decodeImage(
        Multimodal.asPngPayload(in.toDF().toDF("doc_id", "text"),
          "text", "doc_id"))
      .writeStream.format("memory").queryName("decs").outputMode("append").start()
    try {
      in.addData(docs(0))
      q.processAllAvailable()
      in.addData(docs(1), docs(3))
      q.processAllAvailable()
      val got = spark.table("decs").collect().map(_.toSeq).toSet
      val want = Multimodal.decodeImage(
          Multimodal.asPngPayload(
            docs.filter(_._1 != 33L).toDF("doc_id", "text"), "text", "doc_id"))
        .collect().map(_.toSeq).toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }
}
