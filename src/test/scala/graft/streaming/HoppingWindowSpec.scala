package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** a8's streaming twin: hopping windows under Structured Streaming —
  * one event lands in BOTH overlapping windows, and each window emits
  * once the watermark passes its end (Append mode).
  */
class HoppingWindowSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked streaming hopping windows emit one row per overlapping window") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Double)]
    val hops = in.toDF().toDF("ts", "value")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("start"), col("n"), col("total"))
    val q = hops.writeStream.format("memory").queryName("hops")
      .outputMode("append").start()
    try {
      val min = 60000L
      // epoch-aligned so the two expected window starts are exact
      val t0 = 1700000000000L - (1700000000000L % (10 * min))
      // one event at t0+6min -> windows [t0, t0+10) and [t0+5, t0+15);
      // a second at t0+7min joins both
      in.addData((ts(t0 + 6 * min), 1.0), (ts(t0 + 7 * min), 2.0))
      q.processAllAvailable()
      assert(spark.table("hops").count() == 0) // nothing closed yet

      in.addData((ts(t0 + 60 * min), 0.0)) // advance the watermark
      q.processAllAvailable()
      val got = spark.table("hops")
        .as[(java.sql.Timestamp, Long, Double)].collect()
        .map { case (st, n, tot) => (st.getTime, n, tot) }.toSet
      assert(got == Set((t0, 2L, 3.0), (t0 + 5 * min, 2L, 3.0)))
    } finally q.stop()
  }
}
