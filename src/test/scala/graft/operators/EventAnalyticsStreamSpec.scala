package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** Streaming funnel/retention twins ≡ batch (VERDICT r9 #6): the same
  * event stream fed over several UNEVEN micro-batches (state carrying
  * stage vectors / cohort state across batch boundaries) must land on
  * exactly the batch kernels' numbers. */
class EventAnalyticsStreamSpec extends SparkSpec {

  private def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  // 6 users with per-user in-order timelines exercising every funnel
  // edge: full conversion, stage skips, strict-equal-instant ties,
  // wrong-order stages, repeats. (user, type, sec)
  private val funnelEvents: Seq[(Long, String, Long)] = Seq(
    (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L), // full
    (2L, "view", 10L), (2L, "click", 10L),  // tie at the same instant: click NOT after view
    (2L, "click", 15L), (2L, "purchase", 14L), // purchase BEFORE the click instant
    (3L, "click", 5L), (3L, "purchase", 6L), // no view at all -> counts nowhere
    (4L, "view", 1L), (4L, "view", 2L), (4L, "click", 3L), // repeat views
    (5L, "view", 7L), (5L, "purchase", 8L), // skips click -> stuck at view
    (6L, "purchase", 1L), (6L, "view", 2L), (6L, "click", 3L),
    (6L, "purchase", 4L) // early purchase ignored, later one converts
  )

  test("funnelStream completions equal the batch funnel across uneven micro-batches") {
    import spark.implicits._
    val stages = Seq("view", "click", "purchase")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String, Long)]
    val sink = EventAnalytics.funnelStream(
        stream.toDS().toDF("user_id", "event_type", "sec")
          .withColumn("ts", timestamp_seconds(col("sec"))),
        "user_id", "event_type", "ts", stages)
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      // uneven batches split users' timelines mid-funnel
      Seq(5, 3, 7, 3).foldLeft(0) { (off, sz) =>
        stream.addData(funnelEvents.slice(off, off + sz): _*)
        sink.processAllAvailable()
        off + sz
      }
    } finally sink.stop()
    val streamedCounts = spark.table("funnel_stream")
      .groupBy(col("stage")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batchRow = EventAnalytics.funnel(
        funnelEvents.toDF("user_id", "event_type", "sec")
          .withColumn("ts", timestamp_seconds(col("sec"))),
        "user_id", "event_type", "ts", stages)
      .collect().head
    val batchCounts = stages.zipWithIndex
      .map { case (st, i) => st -> batchRow.getLong(i) }
      .filter(_._2 > 0).toMap
    assert(streamedCounts == batchCounts,
      s"stream=$streamedCounts batch=$batchCounts")
    // pin the semantics, not just the equality: 1/2/4/5/6 viewed,
    // 1/2/4/6 clicked (2's tie fails strict-after), 1 and 6 purchased
    assert(batchCounts == Map("view" -> 5L, "click" -> 4L, "purchase" -> 2L))
    // each (user, stage) completes at most once across all batches
    val dup = spark.table("funnel_stream")
      .groupBy(col("user_id"), col("stage")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(dup == 0, "a stage completed twice for one user")
  }

  test("retentionStream counts equal the batch retention across uneven micro-batches") {
    import spark.implicits._
    // 4 users, day-granular activity (86400 s/day), non-decreasing
    // per user across batches; duplicate same-day events included
    val ev: Seq[(Long, Long)] = Seq( // (user, sec)
      (1L, 0L), (1L, 10L), (1L, 86400L), (1L, 259200L), // days 0,0,1,3
      (2L, 86400L), (2L, 172800L),                       // days 1,2
      (3L, 0L), (3L, 43200L),                            // day 0 twice
      (4L, 259200L)                                      // day 3 only
    )
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    val sink = EventAnalytics.retentionStream(
        stream.toDS().toDF("user_id", "sec")
          .withColumn("ts", timestamp_seconds(col("sec"))),
        "user_id", "ts")
      .writeStream.format("memory").queryName("retention_stream")
      .outputMode("append").start()
    try {
      Seq(3, 2, 4).foldLeft(0) { (off, sz) =>
        stream.addData(ev.slice(off, off + sz): _*)
        sink.processAllAvailable()
        off + sz
      }
    } finally sink.stop()
    val streamed = spark.table("retention_stream")
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val batch = EventAnalytics.retention(
        ev.toDF("user_id", "sec")
          .withColumn("ts", timestamp_seconds(col("sec"))),
        "user_id", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch, s"stream=$streamed batch=$batch")
    // cohort 0: users 1,3 on day 0; user 1 returns at offsets 1 and 3
    assert(batch((0L, 0L)) == 2L && batch((0L, 1L)) == 1L && batch((0L, 3L)) == 1L)
  }
}
