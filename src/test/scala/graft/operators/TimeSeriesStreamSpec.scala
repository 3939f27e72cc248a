package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.streaming.SparkSpec

/** Streaming SAX twin ≡ batch: the same series fed over several
  * micro-batches (state carrying the 7-value window tail across the
  * batch boundary) must emit exactly the batch analytic-window
  * words. */
class TimeSeriesStreamSpec extends SparkSpec {

  test("saxStream equals saxWords on an in-order two-key series") {
    import spark.implicits._
    // two interleaved keys, values chosen to hit a/b/c/d and flat
    val rows = (0 until 24).map { i =>
      val key = (i % 2).toLong + 1
      val v = if (key == 1) (i / 2 + 1).toDouble // ramp
        else if (i < 16) 3.25 else (24 - i).toDouble // flat then descent
      (key, i.toLong, v)
    }
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Double)]
    val sink = TimeSeries.saxStream(
        stream.toDS().toDF("user_id", "event_id", "value"),
        "user_id", "event_id", "value")
      .writeStream.format("memory").queryName("sax_stream")
      .outputMode("append").start()
    try {
      rows.grouped(7).foreach { chunk => // uneven batches cross the window tail
        stream.addData(chunk: _*)
        sink.processAllAvailable()
      }
    } finally sink.stop()
    val streamed = spark.table("sax_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

    val batch = TimeSeries.saxWords(
        rows.toDF("user_id", "event_id", "value")
          .withColumn("ts", col("event_id")),
        "user_id", Seq("ts", "event_id"), "value")
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getString(2))).toSet

    assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
    assert(streamed.nonEmpty && streamed.exists(_._3 == "flat"))
  }

  test("rollingZStream equals rollingZ on an in-order two-key series") {
    import spark.implicits._
    // key 1: steady ramp with a planted spike; key 2: flat (zero
    // variance → NULL z, FALSE flag) then a jump
    val rows = (0 until 26).map { i =>
      val key = (i % 2).toLong + 1
      val v = if (key == 1) { if (i == 20) 400.0 else (i / 2 + 1).toDouble }
        else if (i < 20) 2.5 else 9.0
      (key, i.toLong, v)
    }
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Double)]
    val sink = TimeSeries.rollingZStream(
        stream.toDS().toDF("user_id", "event_id", "value"),
        "user_id", "event_id", "value")
      .writeStream.format("memory").queryName("z_stream")
      .outputMode("append").start()
    try {
      rows.grouped(9).foreach { chunk => // uneven batches cross the tail
        stream.addData(chunk: _*)
        sink.processAllAvailable()
      }
    } finally sink.stop()
    def zOf(r: org.apache.spark.sql.Row): Option[Double] =
      if (r.isNullAt(2)) None else Some(r.getDouble(2))
    val streamed = spark.table("z_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), zOf(r), r.getBoolean(3))).toSet

    val batch = TimeSeries.rollingZ(
        rows.toDF("user_id", "event_id", "value")
          .withColumn("ts", col("event_id")),
        "user_id", Seq("ts", "event_id"), "value", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), zOf(r), r.getBoolean(3))).toSet

    assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
    // the planted structure actually exercised all three cases
    assert(streamed.exists(_._4), "spike flagged")
    assert(streamed.exists(t => t._3.isEmpty && !t._4), "flat NULL-z row")
    assert(streamed.exists(t => t._3.nonEmpty && !t._4), "quiet scored row")
  }

  test("resampleStream equals resampleLinear on an in-order multi-key series") {
    import spark.implicits._
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // the batch-spec fixture: bracket interpolation, on-grid events,
    // a single-event key, a same-instant tie (kept inside one batch)
    val rows = Seq(
      (1L, t(1800), 0L, 10.0), (2L, t(3600), 2L, 7.0),
      (3L, t(1000), 4L, 1.0), (4L, t(0), 5L, 1.0), (4L, t(0), 6L, 3.0),
      (1L, t(5400), 1L, 20.0), (2L, t(9000), 3L, 9.0), (4L, t(7200), 7L, 5.0),
      (1L, t(9000), 8L, 26.0), (2L, t(10800), 9L, 3.0))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val sink = TimeSeries.resampleStream(
        stream.toDS().toDF("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "value", "event_id")
      .writeStream.format("memory").queryName("rs_stream")
      .outputMode("append").start()
    try {
      rows.grouped(5).foreach { chunk => // the tie pair stays in batch 1
        stream.addData(chunk: _*)
        sink.processAllAvailable()
      }
    } finally sink.stop()
    val streamed = spark.table("rs_stream")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val batch = TimeSeries.resampleLinear(
        rows.toDF("user_id", "ts", "event_id", "value"),
        "user_id", "ts", "value", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(streamed == batch, s"stream=$streamed\nbatch=$batch")
    assert(streamed.size >= 8, s"fixture should emit a real grid: $streamed")
  }

  test("holtStream's last emission per key equals holtFinal across uneven batches") {
    import spark.implicits._
    // key 1: noisy trend; key 2: single observation (seed-only);
    // key 3: two observations straddling a batch boundary
    val rows = ((0 until 15).map(i => (1L, i.toLong, (i * 2).toDouble +
        (if (i % 3 == 0) 1.5 else -0.5))) :+
      (2L, 0L, 5.0)) ++ Seq((3L, 0L, 10.0), (3L, 1L, 12.0), (3L, 2L, 15.0))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Long, Double)]
    val sink = TimeSeries.holtStream(
        stream.toDS().toDF("user_id", "event_id", "value"),
        "user_id", "event_id", "value")
      .writeStream.format("memory").queryName("holt_stream")
      .outputMode("append").start()
    try {
      rows.grouped(7).foreach { chunk =>
        stream.addData(chunk: _*)
        sink.processAllAvailable()
      }
    } finally sink.stop()
    // one emission per arrival; the LAST per key is the final state
    val emitted = spark.table("holt_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(emitted.length == rows.length)
    def r6(x: Double) = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val lastPerKey = emitted.groupBy(_._1).map { case (k, es) =>
      val last = es.maxBy(_._2)
      k -> (r6(last._3), r6(last._4), r6(last._3 + last._4))
    }
    val batch = TimeSeries.holtFinal(
        rows.toDF("user_id", "event_id", "value")
          .withColumn("ts", col("event_id")),
        "user_id", "ts", "event_id", "value")
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(lastPerKey == batch, s"stream=$lastPerKey\nbatch=$batch")
    assert(batch(2L) == ((5.0, 0.0, 5.0)), "seed-only key")
  }
}
