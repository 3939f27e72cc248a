package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model._
import graft.model.Semantics.BurstState

/** The price-simulation dataflow (reference SharePriceDataflow.java
  * :45-135, SURVEY §3.2): base price = running product of multipliers
  * (A5); hype = tokenized gibbs → ±0.01 influence (P10/P11) → running
  * sum (A2) → bubble-burst damping (T3); J2 composes base+hype into
  * SharePriceInfo with an EMA forecast.
  *
  * The whole A2→T3→J2 chain fuses into ONE keyed coFlatMap (a single
  * shuffle + one state cell per key) instead of four chained stateful
  * operators — the state is the product of the individual states.
  */
object PriceDataflow {

  /** Fused per-key state of the chain. */
  final case class PriceState(
      multProduct: Double,          // A5 accumulator (init 1.0)
      hypeSum: Double,              // A2 running influence sum
      burstPrev: Double,            // T3 prev emitted value
      burstStep: Option[Int],       // T3 damping position
      dampedHype: Double,           // latest damped hype component (J2 state1)
      ema: Option[Double])          // J2 EMA cell

  object PriceState {
    val init: PriceState = PriceState(1.0, 0.0, 0.0, None, 0.0, None)
  }

  /** One hype-piece arrival: influence → running sum → burst damping
    * (SharePriceDataflow.java:121-124,169-225). Emits nothing — it
    * updates the hype component the next price tick reads. */
  def onHype(rng: () => Double)(s: PriceState, t: Timestamp,
                                influence: Int): (PriceState, Seq[SharePriceInfo]) = {
    val hypeSum = s.hypeSum + influence * 0.01
    val (bs, damped) = Semantics.burstStep(BurstState(s.burstPrev, s.burstStep), hypeSum, rng)
    (s.copy(hypeSum = hypeSum, burstPrev = bs.prev, burstStep = bs.step,
      dampedHype = damped), Seq.empty)
  }

  /** One multiplier tick: base price via running product, then J2
    * composition with the latest damped hype + EMA forecast
    * (SharePriceDataflow.java:72-96,246-264). */
  def onMult(s: PriceState, t: Timestamp, mult: Double): (PriceState, Seq[SharePriceInfo]) = {
    val product = Semantics.multProductStep(s.multProduct, mult)
    val (ema, info) = Semantics.composePrice(t, product, s.dampedHype, s.ema)
    (s.copy(multProduct = product, ema = Some(ema)), Seq(info))
  }

  /** Streaming form: mults + gibbs → SharePriceInfo ticks. The constant
    * key mirrors the reference's global-state keying (P8,
    * SharePriceDataflow.java:137-143) — a deliberate single-key
    * hotspot documented in SURVEY §7.3; multi-instrument deployments
    * key by symbol instead. */
  def run(spark: SparkSession, mults: Dataset[SharePriceMult], gibbs: Dataset[Gibb],
          rng: () => Double): Dataset[SharePriceInfo] = {
    import spark.implicits._
    val hype = gibbs.flatMap(g => Semantics.hypePieces(g))
      .map(p => ("FOO", p.time, p.influence))
    val mult = mults.map(m => ("FOO", m.time, m.mult))
    val tagged = CoProcess.tagged(hype, mult)
    CoProcess.coFlatMap[Int, Double, PriceState, SharePriceInfo](
      tagged, PriceState.init, onHype(rng), onMult)
  }

  /** Batch twin over the same transitions. */
  def runBatch(spark: SparkSession, mults: Dataset[SharePriceMult], gibbs: Dataset[Gibb],
               rng: () => Double): Dataset[SharePriceInfo] = {
    import spark.implicits._
    val hype = gibbs.flatMap(g => Semantics.hypePieces(g))
      .map(p => ("FOO", p.time, p.influence))
    val mult = mults.map(m => ("FOO", m.time, m.mult))
    CoProcess.coFlatMapBatch[Int, Double, PriceState, SharePriceInfo](
      CoProcess.tagged(hype, mult), PriceState.init, onHype(rng), onMult)
  }
}
