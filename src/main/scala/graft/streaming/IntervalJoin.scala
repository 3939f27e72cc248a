package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — the canonical Structured
  * Streaming two-input operator: equi-key join plus an event-time
  * range, with watermarks on BOTH sides so each side's buffered state
  * is evicted once the other side's watermark passes the range bound
  * (state is bounded by watermark horizon × arrival rate, not stream
  * length). Batch twin: `QueryCatalog.jInterval` (same key + range
  * predicate, same results on a replayed log).
  */
object IntervalJoin {

  /** Join `left` to `right` rows of the same `keyCol` whose `rightTs`
    * falls in [leftTs - before, leftTs]. Inner join: emitted as soon
    * as both sides are present; rows with no match in the horizon emit
    * nothing (the streaming-completeness-safe default). */
  def within(left: DataFrame, right: DataFrame, keyCol: String,
             leftTs: String, rightTs: String,
             before: String = "5 minutes",
             watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      l(keyCol) === r(keyCol) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $before") &&
        r(rightTs) <= l(leftTs),
      "inner")
      .drop(r(keyCol))
  }
}
