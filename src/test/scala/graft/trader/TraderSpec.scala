package graft.trader

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model._
import graft.streaming.SparkSpec

/** Trader jobs: T4 follow-forecast, J3 invest budget, J4 champion
  * (MonkeyStockTrader/MonkeyStockChampion semantics).
  */
class TraderSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000000000L

  test("T4 follow-forecast: BUY/SELL 1 with monotonic txn ids per key") {
    val prices = Seq(
      ("A_a", SharePriceInfo(ts(t0 + 1), 10.0, 1.2)),
      ("A_a", SharePriceInfo(ts(t0 + 2), 10.0, 0.8)),
      ("B_b", SharePriceInfo(ts(t0 + 3), 10.0, 1.1))).toDS()
    val out = TraderJobs.followForecast(spark, prices).collect()
      .sortBy(o => (o._1, o._2.time.getTime))
    assert(out.map(_._2.orderType).toSeq == Seq("BUY", "SELL", "BUY"))
    assert(out.map(_._2.txnId).toSeq ==
      Seq("A_a_txn_0", "A_a_txn_1", "B_b_txn_0"))
    assert(out.forall(_._2.shares == 1))
  }

  test("T4 streaming: counter state persists across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, SharePriceInfo)]
    val q = TraderJobs.followForecast(spark, in.toDS()).writeStream
      .format("memory").queryName("t4").outputMode("append").start()
    try {
      in.addData(("A_a", SharePriceInfo(ts(t0 + 1), 10.0, 1.2)))
      q.processAllAvailable()
      in.addData(("A_a", SharePriceInfo(ts(t0 + 2), 10.0, 0.8)))
      q.processAllAvailable()
      val got = spark.table("t4").as[(String, MarketOrder)].collect()
        .sortBy(_._2.time.getTime)
      assert(got.map(_._2.txnId).toSeq == Seq("A_a_txn_0", "A_a_txn_1"))
    } finally q.stop()
  }

  test("J3 invest budget: coins minus latest own price") {
    val coins = Seq(("A_a", ts(t0 + 2), 12.0), ("A_a", ts(t0 + 4), 20.0)).toDS()
    val prices = Seq(("A_a", ts(t0 + 1), 10.0), ("A_a", ts(t0 + 3), 15.0)).toDS()
    val out = TraderJobs.investBudget(spark, coins, prices).collect().sorted
    assert(out.toSeq == Seq(2.0, 5.0)) // 12-10, 20-15
  }

  test("J4 champion: decision rules fire per element over full history") {
    def res(t: Long, coins: Double, shares: Int) =
      ("A_a", ts(t), TxnResult("t", "MARKET",
        TraderState(ts(t), coins, shares, 0, 0, 0), TxnResultType.ACCEPTED))
    def price(t: Long, coins: Double, forecast: Double) =
      ("A_a", ts(t), SharePriceInfo(ts(t), coins, forecast))

    // optimistic market: all forecasts > 1 -> BUY 1
    val out1 = TraderJobs.champion(spark,
      Seq(res(t0 + 1, 8.0, 5)).toDS(),
      Seq(price(t0 + 2, 2.0, 1.1)).toDS()).collect()
    assert(out1.map(o => (o.kind, o.orderType, o.shares)).toSeq ==
      Seq(("MARKET", "BUY", 1)))

    // rich: coins > 10*price -> BUY 3 + INVEST + FEED
    val out2 = TraderJobs.champion(spark,
      Seq(res(t0 + 1, 50.0, 5)).toDS(),
      Seq(price(t0 + 2, 2.0, 1.1)).toDS()).collect().sortBy(_.txnId)
    assert(out2.map(_.kind).toSeq == Seq("MARKET", "INVEST", "FEED"))
    assert(out2.head.shares == 3 && out2(1).invested == 25.0 && out2(2).monkeys == 1)

    // poor with shares: coins<5 && shares>=2 -> SELL 2
    val out3 = TraderJobs.champion(spark,
      Seq(res(t0 + 1, 3.0, 4)).toDS(),
      Seq(price(t0 + 2, 2.0, 1.1)).toDS()).collect()
    assert(out3.map(o => (o.orderType, o.shares)).toSeq == Seq(("SELL", 2)))

    // mixed forecasts, no rich/poor rule -> nothing
    val out4 = TraderJobs.champion(spark,
      Seq(res(t0 + 1, 8.0, 1)).toDS(),
      Seq(price(t0 + 2, 2.0, 1.1), price(t0 + 3, 2.0, 0.9)).toDS()).collect()
    // fires on each element once both sides present: price2 fire sees
    // forecasts {1.1} -> BUY 1; price3 fire sees {1.1, 0.9} -> none
    assert(out4.map(o => (o.orderType, o.shares)).toSeq == Seq(("BUY", 1)))
  }

  test("J4 champion streaming e2e: interleaved sides across micro-batches match the batch twin") {
    def res(t: Long, coins: Double, shares: Int) =
      ("A_a", ts(t), TxnResult(s"r$t", "MARKET",
        TraderState(ts(t), coins, shares, 0, 0, 0), TxnResultType.ACCEPTED))
    def price(t: Long, coins: Double, forecast: Double) =
      ("A_a", ts(t), SharePriceInfo(ts(t), coins, forecast))

    // four micro-batches walking the reference decision table
    // (MonkeyStockChampion.java:172-232) with cross-batch state:
    //  b1: price only (no result yet -> no fire)
    //  b2: modest result -> allGt1 fires BUY 1
    //  b3: rich result + falling-forecast price -> BUY 3 + INVEST +
    //      FEED on the result fire; the price fire breaks allGt1 and
    //      (rich still) fires the rich triple again
    //  b4: poor result with shares -> SELL 2; txn ids keep counting
    val batches = Seq(
      (Seq.empty[(String, java.sql.Timestamp, TxnResult)], Seq(price(t0 + 1, 2.0, 1.1))),
      (Seq(res(t0 + 2, 8.0, 5)), Seq.empty[(String, java.sql.Timestamp, SharePriceInfo)]),
      (Seq(res(t0 + 3, 50.0, 5)), Seq(price(t0 + 4, 2.0, 0.9))),
      (Seq(res(t0 + 5, 3.0, 4)), Seq.empty[(String, java.sql.Timestamp, SharePriceInfo)]))

    implicit val sqlCtx = spark.sqlContext
    val resIn = MemoryStream[(String, java.sql.Timestamp, TxnResult)]
    val priceIn = MemoryStream[(String, java.sql.Timestamp, SharePriceInfo)]
    val q = TraderJobs.champion(spark, resIn.toDS(), priceIn.toDS()).writeStream
      .format("memory").queryName("champ_e2e").outputMode("append").start()
    try {
      batches.foreach { case (rs, ps) =>
        if (rs.nonEmpty) resIn.addData(rs)
        if (ps.nonEmpty) priceIn.addData(ps)
        q.processAllAvailable()
      }
      val streamed = spark.table("champ_e2e").as[TraderJobs.ChampOp].collect()
        .sortBy(o => (o.time.getTime, o.txnId))

      // batch twin over the SAME total input must produce the same ops
      val batch = TraderJobs.champion(spark,
          batches.flatMap(_._1).toDS(), batches.flatMap(_._2).toDS())
        .collect().sortBy(o => (o.time.getTime, o.txnId))
      assert(streamed.toSeq == batch.toSeq)

      // the golden sequence from the reference decision table
      assert(streamed.map(o => (o.kind, o.orderType, o.shares, o.invested, o.monkeys)).toSeq ==
        Seq(("MARKET", "BUY", 1, 0.0, 0),                       // b2 result fire (allGt1)
          ("MARKET", "BUY", 3, 0.0, 0), ("INVEST", "", 0, 25.0, 0), ("FEED", "", 0, 0.0, 1),
          ("MARKET", "BUY", 3, 0.0, 0), ("INVEST", "", 0, 25.0, 0), ("FEED", "", 0, 0.0, 1),
          ("MARKET", "SELL", 2, 0.0, 0)))                       // b4 poor rule
      // txn ids are monotone ACROSS micro-batches
      assert(streamed.map(_.txnId).toSeq ==
        (0 to 7).map(i => s"champ_txn_$i"))
    } finally q.stop()
  }
}
