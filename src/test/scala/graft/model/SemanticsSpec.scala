package graft.model

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite

class SemanticsSpec extends AnyFunSuite {
  private val t0 = new Timestamp(1000L)

  test("ledger init grants 10 coins / 5 shares") {
    val s = TraderState.init(t0)
    assert(s.coins == 10.0 && s.shares == 5 && s.bailouts == 0)
  }

  test("MARKET delta sign conventions: BUY costs coins, gains shares") {
    val buy = Semantics.marketDelta(MarketOrder(t0, "t1", "BUY", 3), 2.5)
    assert(buy.coinsDiff == -7.5 && buy.sharesDiff == 3)
    val sell = Semantics.marketDelta(MarketOrder(t0, "t2", "SELL", 3), 2.5)
    assert(sell.coinsDiff == 7.5 && sell.sharesDiff == -3)
  }

  test("INVEST and FEED deltas") {
    val inv = Semantics.investDelta(Investment(t0, "t3", 4.0))
    assert(inv.coinsDiff == -4.0 && inv.investDiff == 1)
    val feed = Semantics.feedDelta(FeedMonkeys(t0, "t4", 2))
    assert(feed.sharesDiff == -2 && feed.fedMonkeys == 2)
  }

  test("ledger accepts valid txn and rejects overdrafts keeping prior state") {
    val (s1, r1) = Semantics.updateTrader(None,
      Semantics.marketDelta(MarketOrder(t0, "t1", "BUY", 2), 1.0))
    assert(r1.status == TxnResultType.ACCEPTED)
    assert(s1.coins == 8.0 && s1.shares == 7)

    // overdraft: buy 100 shares at 1.0 with 8 coins -> INSUFFICIENT_COINS
    val (s2, r2) = Semantics.updateTrader(Some(s1),
      Semantics.marketDelta(MarketOrder(t0, "t2", "BUY", 100), 1.0))
    assert(r2.status == TxnResultType.INSUFFICIENT_COINS)
    assert(s2 == s1.copy(time = s2.time) || s2 == s1) // prior state kept

    // overselling -> INSUFFICIENT_SHARES
    val (_, r3) = Semantics.updateTrader(Some(s1),
      Semantics.marketDelta(MarketOrder(t0, "t3", "SELL", 100), 1.0))
    assert(r3.status == TxnResultType.INSUFFICIENT_SHARES)
  }

  test("bailout: inFlight<=0 && coins<=3 && shares<=0 grants +10/+5 before validation") {
    // state: 3 coins, 1 share; sell 1 share at 0 coins => 3 coins, 0 shares -> bailout
    val prior = TraderState(t0, 3.0, 1, 0, 0, 0)
    val (s, r) = Semantics.updateTrader(Some(prior),
      Semantics.feedDelta(FeedMonkeys(t0, "t1", 1)))
    assert(r.status == TxnResultType.ACCEPTED)
    assert(s.coins == 13.0 && s.shares == 5 && s.bailouts == 1 && s.fedMonkeys == 1)
  }

  test("bailout can rescue an otherwise-negative balance (applied before validation)") {
    // 2 coins, 0 shares: feeding a monkey oversells to -1 shares, but the
    // bailout (+10/+5) lands before validation -> ACCEPTED at 12 coins/4 shares
    val prior = TraderState(t0, 2.0, 0, 0, 0, 0)
    val (s, r) = Semantics.updateTrader(Some(prior),
      Semantics.feedDelta(FeedMonkeys(t0, "t1", 1)))
    assert(r.status == TxnResultType.ACCEPTED)
    assert(s.coins == 12.0 && s.shares == 4 && s.bailouts == 1)
    // an INVEST overdraft opens an in-flight investment -> NO bailout -> rejected
    val (s2, r2) = Semantics.updateTrader(Some(prior),
      Semantics.investDelta(Investment(t0, "t2", 4.0)))
    assert(r2.status == TxnResultType.INSUFFICIENT_COINS)
    assert(s2.coins == 2.0)
    // a BUY overdraft holds positive shares -> NO bailout either -> rejected
    val (_, r3) = Semantics.updateTrader(Some(prior),
      Semantics.marketDelta(MarketOrder(t0, "t3", "BUY", 4), 1.0))
    assert(r3.status == TxnResultType.INSUFFICIENT_COINS)
  }

  test("EMA matches kata-04 exact doubles") {
    val got = Semantics.emaSeries(Seq(1, 2, 3, 4, 3, 2, 1).map(_.toDouble))
    val want = Seq(1.0, 1.1, 1.29, 1.561, 1.7049, 1.73441, 1.6609690000000001)
    assert(got == want)
  }

  test("hype tokenizer + lexicons match the reference fixture") {
    val g = Gibb("g1", t0, "very good banana down my throat, i'm happy and love up up up")
    val got = Semantics.hypePieces(g).map(p => (p.word, p.positive))
    val want = Seq("good" -> true, "down" -> false, "happy" -> true,
      "love" -> true, "up" -> true, "up" -> true, "up" -> true)
    assert(got == want)
    assert(got.map { case (_, pos) => if (pos) 1 else -1 }.sum == 5)
  }

  test("kata-01 sentiment and influence explode") {
    assert(Semantics.sentiment("#mktd6 #bananacoins are good!!!") == "POS")
    assert(Semantics.sentiment("#mktd6 #bananacoins make me sad!!") == "NEG")
    assert(Semantics.sentiment("#mktd6 whatever") == "NEUTRAL")
    assert(Semantics.influences("are good!!!", "POS") == Seq("UP", "UP", "UP"))
    assert(Semantics.influences("me sad!!", "NEG") == Seq("DOWN", "DOWN"))
  }

  test("kata-02 order parse: valid and invalid lines") {
    val ok = Semantics.parseOrder("1234 player1 txn01 BUY 5")
    assert(ok == Right(("player1", MarketOrder(new Timestamp(1234L), "txn01", "BUY", 5))))
    assert(Semantics.parseOrder("1234 player3 txn04 INVALID ORDER").isLeft)
    assert(Semantics.parseOrder("").isLeft)
  }

  test("burst machine: damping schedule fires step mults in order") {
    // arm on first event (rng=0 < diff*0.01 requires diff>0)
    var st = Semantics.BurstState.init
    val rngArm = () => 0.0
    val (st1, e1) = Semantics.burstStep(st, 1.0, rngArm)
    assert(e1 == 1.0 && st1.step.contains(0)) // armed, not yet damped
    // subsequent constant input v=2.0: diff damped by 0.95, 0.9, ...
    var s = st1
    val emitted = (0 until 10).map { _ =>
      val (n, e) = Semantics.burstStep(s, 2.0, () => 1.0)
      s = n; e
    }
    assert(emitted.head == (2.0 - 1.0) * 0.95)
    assert(s.step.isEmpty) // schedule exhausted after 10 steps
    // without arming, diff passes through unchanged
    val (_, e2) = Semantics.burstStep(Semantics.BurstState.init, 3.0, () => 1.0)
    assert(e2 == 3.0)
  }

  test("price composition: forecast = ema/newValue, ema seeded with first value") {
    val (ema1, p1) = Semantics.composePrice(t0, 10.0, 0.5, None)
    assert(p1.coins == 10.5 && p1.forecast == 1.0 && ema1 == 10.5)
    val (ema2, p2) = Semantics.composePrice(t0, 12.0, 0.5, Some(ema1))
    assert(p2.coins == 12.5)
    assert(ema2 == 0.1 * 12.5 + 0.9 * 10.5)
    assert(p2.forecast == ema2 / 12.5)
  }

  test("txn event enrichment: investedCoins only for accepted INVEST") {
    val u = Semantics.investDelta(Investment(t0, "t1", 4.0))
    val (_, r) = Semantics.updateTrader(None, u)
    assert(Semantics.toTxnEvent(u, r).investedCoins == 4.0)
    val m = Semantics.marketDelta(MarketOrder(t0, "t2", "BUY", 1), 1.0)
    val (_, r2) = Semantics.updateTrader(None, m)
    assert(Semantics.toTxnEvent(m, r2).investedCoins == 0.0)
  }
}
