package graft.model

import java.sql.Timestamp

/**
 * Pure, deterministic state-transition functions — the engine core.
 *
 * Every stateful operator (batch Aggregator or Structured Streaming
 * flatMapGroupsWithState) delegates to these so that unit tests,
 * batch twins, and streaming dataflows share one source of truth.
 *
 * Semantics derived from the reference:
 *  - ledger:  exchange/model/TraderStateUpdater.java:115-172,
 *             model/trader/TraderState.java:69-83
 *  - EMA:     katas/Chapter04_WorkingWithState.java:168-178,
 *             exchange/priceinfo/SharePriceDataflow.java:253
 *  - hype:    exchange/model/ShareHypePiece.java:23-31,65-84
 *  - burst:   exchange/priceinfo/SharePriceDataflow.java:169-225,
 *             exchange/model/BurstStep.java:9-29
 *  - orders:  katas/Chapter02_SplitSelectUnion.java:237-260
 */
object Semantics {

  // ---------------------------------------------------------------- ledger

  /** Delta for a market order at the given price: BUY n at p costs n*p coins
    * and gains n shares; SELL mirrors (TraderStateUpdater.java:141-150). */
  def marketDelta(order: MarketOrder, price: Double): TraderStateUpdater =
    TraderStateUpdater(
      txnId = order.txnId,
      updaterType = UpdaterType.MARKET,
      time = order.time,
      coinsDiff = MarketOrderType.coinSign(order.orderType) * order.shares * price,
      sharesDiff = MarketOrderType.shareSign(order.orderType) * order.shares,
      addBailout = false,
      fedMonkeys = 0,
      investDiff = 0)

  /** Delta for an investment: coins leave now, one in-flight investment opens
    * (TraderStateUpdater.java:152-161). */
  def investDelta(inv: Investment): TraderStateUpdater =
    TraderStateUpdater(inv.txnId, UpdaterType.INVEST, inv.time,
      coinsDiff = -inv.invested, sharesDiff = 0, addBailout = false,
      fedMonkeys = 0, investDiff = 1)

  /** Delta for feeding monkeys: shares leave, fed count grows
    * (TraderStateUpdater.java:163-172). */
  def feedDelta(feed: FeedMonkeys): TraderStateUpdater =
    TraderStateUpdater(feed.txnId, UpdaterType.FEED, feed.time,
      coinsDiff = 0.0, sharesDiff = -feed.monkeys, addBailout = false,
      fedMonkeys = feed.monkeys, investDiff = 0)

  /** Delta for a matured investment return (loop-back record)
    * (MarketDataflow.java:379-391). */
  def returnDelta(txnId: String, time: Timestamp, returned: Double): TraderStateUpdater =
    TraderStateUpdater(txnId, UpdaterType.RETURN, time,
      coinsDiff = returned, sharesDiff = 0, addBailout = false,
      fedMonkeys = 0, investDiff = -1)

  /** The bailout grant: +10 coins, +5 shares, bailouts+1
    * (TraderStateUpdater.java:17-18). */
  val BailoutUpdater: TraderStateUpdater =
    TraderStateUpdater("bailout", UpdaterType.BAILOUT, new Timestamp(0L),
      coinsDiff = 10.0, sharesDiff = 5, addBailout = true,
      fedMonkeys = 0, investDiff = 0)

  private def applyDelta(s: TraderState, u: TraderStateUpdater): TraderState =
    TraderState(
      time = u.time,
      coins = s.coins + u.coinsDiff,
      shares = s.shares + u.sharesDiff,
      bailouts = s.bailouts + (if (u.addBailout) 1 else 0),
      fedMonkeys = s.fedMonkeys + u.fedMonkeys,
      inFlightInvestments = s.inFlightInvestments + u.investDiff)

  /** Validation: negative coins/shares reject the txn and the prior state is
    * kept (TraderState.java:69-74, TraderStateUpdater.java:134-138). */
  def validate(candidate: TraderState): String =
    if (candidate.coins < 0) TxnResultType.INSUFFICIENT_COINS
    else if (candidate.shares < 0) TxnResultType.INSUFFICIENT_SHARES
    else TxnResultType.ACCEPTED

  private def needsBailout(s: TraderState): Boolean =
    s.inFlightInvestments <= 0 && s.coins <= 3 && s.shares <= 0

  /** The ledger transition (TraderStateUpdater.java:115-138,
    * MarketDataflow.java:284-310): apply the delta, apply the bailout rule
    * to the candidate state (unless the delta IS a bailout), then validate;
    * a rejected txn keeps the prior state. Note the reference applies the
    * bailout BEFORE validation, so a bailed-out state can rescue an
    * otherwise-negative balance. The nested bailout application itself
    * validates (BAILOUT_UPDATER.update), keeping the un-bailed candidate if
    * the grant still leaves a negative balance.
    *
    * @return (new state, txn result for this update)
    */
  def updateTrader(prior: Option[TraderState], u: TraderStateUpdater): (TraderState, TxnResult) = {
    val base = prior.getOrElse(TraderState.init(u.time))
    val candidate = applyDelta(base, u)
    val withBailout =
      if (u.updaterType != UpdaterType.BAILOUT && needsBailout(candidate)) {
        val bailed = applyDelta(candidate, BailoutUpdater.copy(time = u.time))
        if (validate(bailed) == TxnResultType.ACCEPTED) bailed else candidate
      } else candidate
    val status = validate(withBailout)
    val kept = if (status == TxnResultType.ACCEPTED) withBailout else base
    (kept, TxnResult(u.txnId, u.updaterType, kept, status))
  }

  /** TxnEvent enrichment: investedCoins only for accepted INVESTs
    * (MarketDataflow.java:297-307); totalInvestments filled by the running
    * total operator, -1 sentinel otherwise (TxnEvent.java:8-30). */
  def toTxnEvent(u: TraderStateUpdater, result: TxnResult): TxnEvent = {
    val invested =
      if (result.status == TxnResultType.ACCEPTED && u.updaterType == UpdaterType.INVEST)
        math.abs(u.coinsDiff)
      else 0.0
    TxnEvent(result, invested, -1.0)
  }

  // ----------------------------------------------------- running aggregates

  /** EMA recurrence, seeded with the first observation:
    * ema_0 = x_0; ema_n = alpha*x_n + (1-alpha)*ema_(n-1)
    * (Chapter04_WorkingWithState.java:168-178). Fold order is the exact
    * double-arithmetic order of the reference so goldens match bitwise. */
  def emaStep(prior: Option[Double], x: Double, alpha: Double = 0.1): Double =
    prior match {
      case None      => x
      case Some(ema) => alpha * x + (1 - alpha) * ema
    }

  def emaSeries(xs: Seq[Double], alpha: Double = 0.1): Seq[Double] =
    xs.scanLeft(Option.empty[Double])((p, x) => Some(emaStep(p, x, alpha))).flatten

  /** Running product of price multipliers, init 1.0
    * (SharePriceDataflow.java:72-96). */
  def multProductStep(prior: Double, mult: Double): Double = prior * mult

  // ------------------------------------------------------------------ text

  /** 14-word positive / negative hype lexicons
    * (exchange/model/ShareHypePiece.java:23-31). */
  val PositiveWords: Set[String] = Set(
    "yes", "happy", "good", "best", "up", "safe", "buy",
    "like", "love", "high", "nice", "certain", "sure", "solid")
  val NegativeWords: Set[String] = Set(
    "no", "sad", "bad", "worst", "down", "dangerous", "danger",
    "sell", "dislike", "hate", "low", "bubble", "burst", "risk")

  /** Tokenizer: lowercase, strip non [a-z \n], collapse whitespace, split
    * (ShareHypePiece.java:65-84). */
  def tokenize(text: String): Seq[String] =
    text.toLowerCase
      .replaceAll("[^a-z \n]+", "")
      .replaceAll("\\s+", " ")
      .trim
      .split(" ")
      .toSeq
      .filter(_.nonEmpty)

  /** Emit one hype piece per lexicon word in the gibb (SharePriceDataflow
    * P10, ShareHypePiece.java:33-63). */
  def hypePieces(gibb: Gibb): Seq[ShareHypePiece] =
    tokenize(gibb.text).collect {
      case w if PositiveWords(w) => ShareHypePiece(gibb.time, gibb.id, positive = true, w)
      case w if NegativeWords(w) => ShareHypePiece(gibb.time, gibb.id, positive = false, w)
    }

  private val PosRe = ".*\\b(smile|happy|good|yes)\\b.*".r
  private val NegRe = ".*\\b(frown|sad|bad|no)\\b.*".r

  /** Kata-01 sentiment: POS / NEG / NEUTRAL by word-boundary regex
    * (Chapter01_LinearStatelessAnalysis.java:175-182). NOTE: this is a
    * FULL-string match where '.' does not cross newlines — faithfully
    * reproducing the reference's `String.matches`, which returns
    * NEUTRAL for multiline text. The corpus-facing operator
    * (StatelessOps.sentiment) deliberately uses find-semantics (rlike)
    * instead; they differ on multiline inputs by design. */
  def sentiment(text: String): String = text match {
    case PosRe(_) => "POS"
    case NegRe(_) => "NEG"
    case _        => "NEUTRAL"
  }

  /** Kata-01 influence explode: one UP/DOWN per '!' char
    * (Chapter01:184-192). */
  def influences(text: String, sent: String): Seq[String] = {
    val bangs = text.count(_ == '!')
    val dir = if (sent == "POS") "UP" else "DOWN"
    Seq.fill(bangs)(dir)
  }

  // ------------------------------------------------------------ order parse

  private val OrderRe =
    "(?i)^(?<time>[a-z0-9]+) (?<player>[a-z0-9]+) (?<id>[a-z0-9]+) (?<type>BUY|SELL) (?<shares>[0-9]+)$".r

  /** Kata-02 order-line parse: Left(raw) when malformed
    * (Chapter02_SplitSelectUnion.java:237-260). */
  def parseOrder(raw: String): Either[String, (String, MarketOrder)] = raw match {
    case OrderRe(time, player, id, typ, shares) =>
      try Right((player,
        MarketOrder(new Timestamp(java.lang.Long.parseLong(time)), id,
          typ.toUpperCase, shares.toInt)))
      catch { case _: NumberFormatException => Left(raw) }
    case _ => Left(raw)
  }

  // ------------------------------------------------------------------ burst

  /** Hype-bubble state: `prev` is the value emitted for the previous event
    * (the reference keeps it in the "price" ValueState, which it overwrites
    * with the emitted diff at the end of every call,
    * SharePriceDataflow.java:193-222); `step` is the current position in the
    * 10-step damping schedule (None = no active burst). */
  final case class BurstState(prev: Double, step: Option[Int])

  object BurstState { val init: BurstState = BurstState(0.0, None) }

  /** One transition of the bubble-burst machine
    * (SharePriceDataflow.java:169-225): diff = v - prevEmitted; an active
    * burst damps the diff by the step multiplier and advances the schedule;
    * otherwise a burst arms with probability diff*0.01 (this event is NOT
    * yet damped — damping starts on the next one, matching the reference).
    * The uniform RNG is injected for determinism.
    *
    * @return (new state, damped hype component to emit)
    */
  def burstStep(state: BurstState, v: Double, nextUniform: () => Double): (BurstState, Double) = {
    val diff = v - state.prev
    state.step match {
      case Some(i) =>
        val damped = diff * BurstStep.mults(i)
        val next = if (i + 1 >= BurstStep.numSteps) None else Some(i + 1)
        (BurstState(damped, next), damped)
      case None =>
        val armed = if (nextUniform() < diff * 0.01) Some(0) else None
        (BurstState(diff, armed), diff)
    }
  }

  /** J2 price composition (SharePriceDataflow.java:246-264): on each base
    * price, add the latest hype component, fold into the EMA (seeded with
    * the first composed value), and emit price + forecast = ema/price. */
  def composePrice(time: Timestamp, base: Double, hype: Double,
                   priorEma: Option[Double]): (Double, SharePriceInfo) = {
    val newValue = base + hype
    val ema = emaStep(priorEma, newValue)
    (ema, SharePriceInfo(time, newValue, ema / newValue))
  }
}
