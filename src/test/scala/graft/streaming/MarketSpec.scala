package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model._

/** Market engine: T1 ledger fold (+A3 totals) and the T2 ROI loop
  * (MarketDataflow.java:284-392 semantics).
  */
class MarketSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = 1700000000000L

  test("ledger streaming: state carries across micro-batches, bailout applies") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, TraderStateUpdater)]
    val q = MarketDataflow.ledger(spark, in.toDS())
      .writeStream.format("memory").queryName("ledger").outputMode("append").start()
    try {
      // batch 1: buy 2 @ 1.0 -> 8 coins, 7 shares
      in.addData(("ALOUATE_a",
        Semantics.marketDelta(MarketOrder(ts(t0 + 1), "t1", "BUY", 2), 1.0)))
      q.processAllAvailable()
      // batch 2: oversell rejected (state from batch 1 retained)
      in.addData(("ALOUATE_a",
        Semantics.marketDelta(MarketOrder(ts(t0 + 2), "t2", "SELL", 100), 1.0)))
      q.processAllAvailable()
      val evs = spark.table("ledger").as[(String, TxnEvent)].collect()
        .sortBy(_._2.txnResult.state.time.getTime)
      assert(evs.length == 2)
      assert(evs(0)._2.txnResult.status == TxnResultType.ACCEPTED)
      assert(evs(0)._2.txnResult.state.coins == 8.0)
      assert(evs(1)._2.txnResult.status == TxnResultType.INSUFFICIENT_SHARES)
      assert(evs(1)._2.txnResult.state.coins == 8.0) // prior state kept
    } finally q.stop()
  }

  test("ledger enriches accepted INVESTs with running totals (A3)") {
    val updates = Seq(
      ("B_b", Semantics.investDelta(Investment(ts(t0 + 1), "t1", 2.0))),
      ("B_b", Semantics.investDelta(Investment(ts(t0 + 2), "t2", 3.0))),
      ("B_b", Semantics.marketDelta(MarketOrder(ts(t0 + 3), "t3", "BUY", 1), 1.0))).toDS()
    val evs = MarketDataflow.ledgerBatch(spark, updates).collect()
      .sortBy(_._2.txnResult.state.time.getTime)
    assert(evs.map(_._2.totalInvestments).toSeq == Seq(2.0, 5.0, -1.0))
    assert(evs.map(_._2.investedCoins).toSeq == Seq(2.0, 3.0, 0.0))
  }

  test("T2 ROI: matured RETURN updater loops back and closes the investment") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, TxnEvent)]
    // deterministic sampler: 10% return regardless of totals
    val out = MarketDataflow.roiReturns(spark, in.toDS(), _ => 0.1)
    val q = out.writeStream.format("memory").queryName("roi").outputMode("append").start()
    try {
      val state = TraderState(ts(t0 + 1), 8.0, 5, 0, 0, 1)
      in.addData(("B_b", TxnEvent(TxnResult("t1", "INVEST", state,
        TxnResultType.ACCEPTED), 2.0, 2.0)))
      // NOTE: processAllAvailable() hangs with ProcessingTimeTimeout —
      // the registered timer keeps the engine scheduling micro-batches,
      // so "all available" never settles. Poll the sink instead; the
      // engine self-triggers and fires the timer on its own.
      val deadline = System.currentTimeMillis() + 60000
      var rows = Array.empty[(String, TraderStateUpdater)]
      while (rows.isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        rows = spark.table("roi").as[(String, TraderStateUpdater)].collect()
      }
      assert(rows.length == 1)
      val (trader, u) = rows.head
      assert(trader == "B_b" && u.updaterType == UpdaterType.RETURN)
      assert(math.abs(u.coinsDiff - 0.2) < 1e-12 && u.investDiff == -1)
    } finally q.stop()
  }

  test("full cycle: priced orders -> ledger -> ROI return -> ledger (loop)") {
    // batch twins wired end-to-end, loop mediated by a local Seq
    val orders = Seq(("B_b", MarketOrder(ts(t0 + 2), "t1", "BUY", 2))).toDS()
    val prices = Seq(SharePriceInfo(ts(t0 + 1), 2.0, 1.0)).toDS()
    val priced = CoProcess.coFlatMapBatch[(String, MarketOrder), Double,
      MarketDataflow.PricingState, (String, TraderStateUpdater)](
      CoProcess.tagged(
        orders.map { case (k, o) => ("FOO", o.time, (k, o)) },
        prices.map(p => ("FOO", p.time, p.coins))),
      MarketDataflow.PricingState.init,
      MarketDataflow.onOrder, MarketDataflow.onPrice)
    val invest = Seq(("B_b", Semantics.investDelta(Investment(ts(t0 + 3), "t2", 1.0)))).toDS()
    val evs = MarketDataflow.ledgerBatch(spark, priced.union(invest)).collect()
      .sortBy(_._2.txnResult.state.time.getTime)
    assert(evs.map(_._2.txnResult.status).distinct.toSeq == Seq(TxnResultType.ACCEPTED))
    // feed the matured return back (loop is broker/dir-mediated in prod)
    val returned = evs.filter(_._2.investedCoins > 0).map { case (k, ev) =>
      MarketDataflow.roiReturn(k, ev, sample = 0.5, ts(t0 + 10))
    }
    val evs2 = MarketDataflow.ledgerBatch(spark,
      (priced.collect().toSeq ++ invest.collect().toSeq ++ returned).toDS()).collect()
      .sortBy(_._2.txnResult.state.time.getTime)
    val finalState = evs2.last._2.txnResult.state
    // init 10/5; BUY 2@2.0 -> 6 coins, 7 shares; invest 1 -> 5 coins; return 0.5 -> 5.5
    assert(finalState.coins == 5.5 && finalState.shares == 7)
    assert(finalState.inFlightInvestments == 0)
  }
}
