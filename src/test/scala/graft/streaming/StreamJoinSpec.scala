package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream-stream event-time interval join: in-range pairs emit,
  * out-of-range don't, and the result matches the batch twin's
  * key+range predicate on the same replayed log.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000000000L

  test("watermarked interval join emits exactly the in-range pairs") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val purchases = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = IntervalJoin.within(
      purchases.toDF().toDF("user", "p_id", "p_ts"),
      clicks.toDF().toDF("user", "c_id", "c_ts"),
      keyCol = "user", leftTs = "p_ts", rightTs = "c_ts",
      before = "5 minutes", watermark = "10 minutes")
      .select("user", "p_id", "c_id")
    val q = joined.writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    try {
      val min = 60000L
      clicks.addData(
        (1L, 101L, ts(t0 - 4 * min)), // in range for p@t0 (4 min before)
        (1L, 102L, ts(t0 - 6 * min)), // too early
        (1L, 103L, ts(t0 + 1 * min)), // after the purchase
        (2L, 201L, ts(t0 - 1 * min))) // wrong user for p_id 11
      purchases.addData((1L, 11L, ts(t0)), (2L, 21L, ts(t0)))
      q.processAllAvailable()
      val got = spark.table("ivj").as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 11L, 101L), (2L, 21L, 201L)))

      // a second batch still joins against buffered state in-horizon
      purchases.addData((1L, 12L, ts(t0 + 2 * min)))
      q.processAllAvailable()
      val got2 = spark.table("ivj").as[(Long, Long, Long)].collect().toSet
      // p@t0+2min window is [t0-3min, t0+2min]: clicks 103 (t0+1min) in,
      // 101 (t0-4min) now out of range
      assert(got2 == got + ((1L, 12L, 103L)))
    } finally q.stop()
  }
}
