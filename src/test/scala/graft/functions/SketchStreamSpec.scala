package graft.functions

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** The native sketch aggregates are streaming-ready: their mergeable
  * O(k) buffers update incrementally across micro-batches, and the
  * streaming result equals the batch result over the same rows —
  * arrival order and batch boundaries don't show through.
  */
class SketchStreamSpec extends SparkSpec {
  import spark.implicits._

  test("kmin_by_hash over micro-batches equals the batch sample") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (1L to 300L).map(i => (i * 7919L % 1009L, i * 1.0))
    val in = MemoryStream[(Long, Double)]
    val agg = in.toDF().toDF("h", "v")
      .agg(KMinByHash.kMinByHash(col("h"), col("v"), 16).as("s"))
    val q = agg.writeStream.format("memory").queryName("kmh")
      .outputMode("complete").start()
    try {
      in.addData(rows.take(100): _*)
      q.processAllAvailable()
      in.addData(rows.drop(100): _*)
      q.processAllAvailable()
      val streamed = spark.table("kmh")
        .select(explode(col("s")).as("e")).select(col("e.h"), col("e.v"))
        .as[(Long, Double)].collect().toSeq
      val batch = rows.toDF("h", "v")
        .agg(KMinByHash.kMinByHash(col("h"), col("v"), 16).as("s"))
        .select(explode(col("s")).as("e")).select(col("e.h"), col("e.v"))
        .as[(Long, Double)].collect().toSeq
      assert(streamed == batch && streamed.size == 16)
    } finally q.stop()
  }

  test("cms_sketch over micro-batches equals the batch sketch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // skewed keys so several counters accumulate across batches
    val rows = (1L to 400L).map(i => i % 37L)
    val in = MemoryStream[Long]
    val hashed = in.toDF().toDF("k")
      .select(Hashing.md5Mod31(col("k").cast("string")).as("hm"))
    val agg = hashed.agg(CmsSketch.cmsSketch(col("hm"), 4, 64).as("sk"))
    val q = agg.writeStream.format("memory").queryName("cms")
      .outputMode("complete").start()
    try {
      in.addData(rows.take(150): _*)
      q.processAllAvailable()
      in.addData(rows.drop(150): _*)
      q.processAllAvailable()
      val streamed = spark.table("cms").head().getSeq[Long](0)
      val batch = rows.toDF("k")
        .select(Hashing.md5Mod31(col("k").cast("string")).as("hm"))
        .agg(CmsSketch.cmsSketch(col("hm"), 4, 64).as("sk"))
        .head().getSeq[Long](0)
      assert(streamed == batch && streamed.sum == 4L * 400)
    } finally q.stop()
  }

  test("bloom_sketch over micro-batches equals the batch filter") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (1L to 300L)
    val in = MemoryStream[Long]
    val hashed = in.toDF().toDF("k")
      .select(Hashing.md5Mod31(col("k").cast("string")).as("hm"))
    val agg = hashed.agg(BloomSketch.bloomSketch(col("hm"), 4096, 3).as("sk"))
    val q = agg.writeStream.format("memory").queryName("bloomstream")
      .outputMode("complete").start()
    try {
      in.addData(rows.take(120): _*)
      q.processAllAvailable()
      in.addData(rows.drop(120): _*)
      q.processAllAvailable()
      val streamed = spark.table("bloomstream").head().getSeq[Long](0)
      val batch = rows.toDF("k")
        .select(Hashing.md5Mod31(col("k").cast("string")).as("hm"))
        .agg(BloomSketch.bloomSketch(col("hm"), 4096, 3).as("sk"))
        .head().getSeq[Long](0)
      assert(streamed == batch && streamed.exists(_ != 0L))
    } finally q.stop()
  }
}
