package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Two-input keyed stateful processing — Spark's Structured Streaming
  * has no CoProcessFunction (SURVEY §4.1), so the reference's
  * `connect + RichCoFlatMapFunction` operators (J1 MarketDataflow.java
  * :99-112,190-268; J2 SharePriceDataflow.java:125-132,227-266; J3
  * MonkeyStockTrader.java:141-156,208-236) are re-expressed as a
  * tagged union into ONE `flatMapGroupsWithState`.
  *
  * Micro-batch caveat (SURVEY §7.3): rows of both sides arrive
  * unordered within a batch, so each invocation sorts its group's rows
  * by (event time, side) — right/"state" side first at equal
  * timestamps, matching the reference's "state written before the
  * other side reads it" semantics — and replays them through the pure
  * per-event transition. Scales per-key (hash shuffle on the key);
  * a constant key is the reference's own global-state semantics and is
  * documented as the single-key hotspot.
  */
final case class Tagged[L, R](key: String, time: Timestamp,
                              left: Option[L], right: Option[R])

object CoProcess {

  /** Union two keyed streams into one tagged stream. */
  def tagged[L, R](lefts: Dataset[(String, Timestamp, L)],
                   rights: Dataset[(String, Timestamp, R)])(
      implicit e: Encoder[Tagged[L, R]]): Dataset[Tagged[L, R]] = {
    val l = lefts.map { case (k, t, v) => Tagged[L, R](k, t, Some(v), None) }
    val r = rights.map { case (k, t, v) => Tagged[L, R](k, t, None, Some(v)) }
    l.union(r)
  }

  /** The coFlatMap core: replay a time-sorted group through per-event
    * transitions. Pure — shared by the streaming operator and its
    * batch twin, and unit-testable standalone. */
  def replay[L, R, S, O](rows: Seq[Tagged[L, R]], init: S,
                         onLeft: (S, Timestamp, L) => (S, Seq[O]),
                         onRight: (S, Timestamp, R) => (S, Seq[O])): (S, Seq[O]) = {
    val sorted = rows.sortBy(t => (t.time.getTime, t.left.isDefined))
    sorted.foldLeft((init, Vector.empty[O])) { case ((s, acc), row) =>
      val (s2, out) = row match {
        case Tagged(_, t, Some(l), _) => onLeft(s, t, l)
        case Tagged(_, t, _, Some(r)) => onRight(s, t, r)
        case _                        => (s, Seq.empty)
      }
      (s2, acc ++ out)
    }
  }

  /** Streaming coFlatMap over a tagged union: keyed state carried
    * across micro-batches via flatMapGroupsWithState.
    *
    * State-API choice (deliberate): T2's maturation timers use Spark
    * 4's `transformWithState` (MarketDataflow.RoiProcessor) because
    * real registered timers map 1:1 to the reference's onTimer. Plain
    * keyed replay here stays on flatMapGroupsWithState because it is
    * state-store-provider-agnostic — transformWithState hard-requires
    * RocksDB, which would force that provider on every CoProcess user
    * for zero capability gain (no timers, no multi-state). */
  def coFlatMap[L, R, S, O](tagged: Dataset[Tagged[L, R]], init: S,
                            onLeft: (S, Timestamp, L) => (S, Seq[O]),
                            onRight: (S, Timestamp, R) => (S, Seq[O]))(
      implicit se: Encoder[S], oe: Encoder[O],
      ke: Encoder[String], toe: Encoder[(String, O)]): Dataset[O] =
    tagged.groupByKey(_.key)
      .flatMapGroupsWithState[S, O](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[Tagged[L, R]], state: GroupState[S]) =>
          val (s2, out) = replay(it.toSeq, state.getOption.getOrElse(init), onLeft, onRight)
          state.update(s2)
          out.iterator
      }

  /** Batch twin: the same per-event transitions, but as a secondary
    * sort — repartition on the key, sort within partitions by
    * (key, time, side) with the right/"state" side first at equal
    * timestamps (matching replay()'s order), then ONE streaming fold.
    * No per-key buffer: a hot key's history rides Spark's external
    * sort instead of a heap Vector (see graft.operators.SecondarySort). */
  def coFlatMapBatch[L, R, S, O](tagged: Dataset[Tagged[L, R]], init: S,
                                 onLeft: (S, Timestamp, L) => (S, Seq[O]),
                                 onRight: (S, Timestamp, R) => (S, Seq[O]))(
      implicit oe: Encoder[O], ke: Encoder[String]): Dataset[O] = {
    import org.apache.spark.sql.functions.col
    val sorted = tagged
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("time"), col("left").isNotNull)
    graft.operators.SecondarySort.keyedFold(sorted)(_.key, () => init,
      (s: S, row: Tagged[L, R]) => row match {
        case Tagged(_, t, Some(l), _) => onLeft(s, t, l)
        case Tagged(_, t, _, Some(r)) => onRight(s, t, r)
        case _                        => (s, Seq.empty)
      })
  }
}
