package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** a7's streaming twin: session_window under Structured Streaming with
  * a watermark — gap-merged sessions close and emit once the watermark
  * passes their end (Append mode), and late-but-in-gap events extend
  * an open session rather than forking a new one.
  */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  test("watermarked streaming session windows merge gaps and close on watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val sessions = in.toDF().toDF("user_id", "ts", "value")
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("user_id"), col("w.start").as("start"), col("n"), col("total"))
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      val min = 60000L
      val t0 = 1700000000000L
      // user 1: two events 3 min apart -> ONE session (gap < 5 min);
      // user 2: one event
      in.addData((1L, ts(t0), 1.0), (1L, ts(t0 + 3 * min), 2.0), (2L, ts(t0), 5.0))
      q.processAllAvailable()
      // nothing closed yet: watermark hasn't passed any session end
      assert(spark.table("sess").count() == 0)

      // far-future event advances the watermark past all session ends
      in.addData((9L, ts(t0 + 60 * min), 0.0))
      q.processAllAvailable()
      val got = spark.table("sess")
        .as[(Long, java.sql.Timestamp, Long, Double)].collect()
        .map { case (u, st, n, tot) => (u, st.getTime, n, tot) }.toSet
      assert(got == Set((1L, t0, 2L, 3.0), (2L, t0, 1L, 5.0)))
    } finally q.stop()
  }
}
