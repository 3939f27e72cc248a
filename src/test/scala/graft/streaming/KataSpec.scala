package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.model._

/** Kata golden tests (FIXTURES.md; reference Chapter00-04 assertions),
  * batch and streaming forms.
  */
class KataSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000000000L

  // ------------------------------------------------------------------- K00

  private val k00Input = Seq(
    SharePriceInfo(ts(t0 + 1), 1.0, 3.14),
    SharePriceInfo(ts(t0 + 2), 1.1, 0.42),
    SharePriceInfo(ts(t0 + 3), 0.9, 0.9999),
    SharePriceInfo(ts(t0 + 4), 1.05, 1.0001))

  test("kata00 batch: golden [BUY, SELL, SELL, BUY]") {
    assert(Katas.kata00(spark, k00Input.toDS()).collect().toSeq ==
      Seq("BUY", "SELL", "SELL", "BUY"))
  }

  test("kata00 streaming: golden order via per-batch feed") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[SharePriceInfo]
    val q = Katas.kata00(spark, in.toDS()).writeStream
      .format("memory").queryName("k00").outputMode("append").start()
    try {
      k00Input.foreach { p => in.addData(p); q.processAllAvailable() }
      assert(spark.table("k00").as[String].collect().toSeq ==
        Seq("BUY", "SELL", "SELL", "BUY"))
    } finally q.stop()
  }

  // ------------------------------------------------------------------- K01

  test("kata01: golden [UP, UP, UP, DOWN, DOWN, UP]") {
    val gibbs = Seq(
      Gibb("001", ts(t0 + 1), "#mktd6 this is ignored"),
      Gibb("002", ts(t0 + 2), "#mktd6 #bananacoins are good!!!"),
      Gibb("003", ts(t0 + 3), "#mktd6 #bananacoins make me sad!!"),
      Gibb("004", ts(t0 + 4), "smile happy good !!! (ignored)"),
      Gibb("005", ts(t0 + 5), "#mktd6 smile! #bananacoins")).toDS()
    assert(Katas.kata01(spark, gibbs).collect().toSeq ==
      Seq("UP", "UP", "UP", "DOWN", "DOWN", "UP"))
  }

  // ------------------------------------------------------------------- K02

  test("kata02: routes valid/filtered/invalid per the golden fixture") {
    val raw = Seq(
      s"${t0 + 1} player1 txn01 BUY 5",
      s"${t0 + 2} player2 txn02 BUY 99999",
      s"${t0 + 3} player2 txn03 SELL 8",
      s"${t0 + 4} player3 txn04 INVALID ORDER",
      s"${t0 + 5} player1 txn01 SELL 5").toDS()
    val out = Katas.kata02(spark, raw).collect()
    val byRoute = out.groupBy(_.getString(0))
    assert(byRoute("valid").map(r => (r.getString(2), r.getString(4), r.getInt(5))).toSet ==
      Set(("player1", "BUY", 5), ("player2", "SELL", 8), ("player1", "SELL", 5)))
    assert(byRoute("filtered").map(_.getInt(5)).toSeq == Seq(99999))
    assert(byRoute("invalid").map(_.getString(1)).toSeq ==
      Seq(s"${t0 + 4} player3 txn04 INVALID ORDER"))
  }

  // ------------------------------------------------------------------- K03

  test("kata03 batch: max windowed sum per player = 13 / 8 / 100") {
    // one burst per player inside a single 100 ms window
    val invs = Seq(
      ("player1", Investment(ts(t0), "t1", 1.0)),
      ("player1", Investment(ts(t0 + 10), "t2", 2.0)),
      ("player1", Investment(ts(t0 + 20), "t3", 4.0)),
      ("player1", Investment(ts(t0 + 30), "t4", 6.0)),
      ("player2", Investment(ts(t0 + 5), "t5", 3.0)),
      ("player2", Investment(ts(t0 + 15), "t6", 5.0)),
      ("player3", Investment(ts(t0 + 7), "t7", 100.0))).toDS()
    val out = Katas.kata03(spark, invs)
      .groupBy(col("player")).agg(max(col("invested")).as("m"))
      .as[(String, Double)].collect().toMap
    assert(out == Map("player1" -> 13.0, "player2" -> 8.0, "player3" -> 100.0))
  }

  test("kata03 streaming: windowed sums arrive after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Investment)]
    val q = Katas.kata03(spark, in.toDS()).writeStream
      .format("memory").queryName("k03").outputMode("append").start()
    try {
      in.addData(("player1", Investment(ts(t0), "t1", 1.0)),
        ("player1", Investment(ts(t0 + 10), "t2", 2.0)),
        ("player2", Investment(ts(t0 + 5), "t5", 3.0)))
      q.processAllAvailable()
      // advance event time past the window + watermark to close it
      in.addData(("player3", Investment(ts(t0 + 500), "t7", 100.0)))
      q.processAllAvailable()
      in.addData(("player3", Investment(ts(t0 + 1000), "t8", 1.0)))
      q.processAllAvailable()
      val rows = spark.table("k03").as[(String, Double, String)].collect()
      assert(rows.toSet.contains(("player1", 3.0, "t1")))
      assert(rows.toSet.contains(("player2", 3.0, "t5")))
    } finally q.stop()
  }

  // ------------------------------------------------------------------- K04

  private val k04Want = Seq(1.0, 1.1, 1.29, 1.561, 1.7049, 1.73441, 1.6609690000000001)

  test("kata04 batch: exact EMA doubles") {
    val prices = Seq(1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0).zipWithIndex.map {
      case (c, i) => ("price", SharePriceInfo(ts(t0 + i), c, 1.0))
    }.toDS()
    assert(Katas.kata04(spark, prices).collect().toSeq.map(_._2) == k04Want)
  }

  test("kata04 streaming: exact EMA doubles across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, SharePriceInfo)]
    val q = Katas.kata04(spark, in.toDS()).writeStream
      .format("memory").queryName("k04").outputMode("append").start()
    try {
      val all = Seq(1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0).zipWithIndex.map {
        case (c, i) => ("price", SharePriceInfo(ts(t0 + i), c, 1.0))
      }
      in.addData(all.take(4)); q.processAllAvailable()
      in.addData(all.drop(4)); q.processAllAvailable()
      assert(spark.table("k04").as[(String, Double)].collect().toSeq.map(_._2) == k04Want)
    } finally q.stop()
  }
}
