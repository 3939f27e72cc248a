package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window, WindowSpec}
import org.apache.spark.sql.functions._

import graft.model.Semantics

/** Batch twins of the reference's running/keyed aggregates
  * (SURVEY §2.5 A1–A6, §2.6): rolling per-key aggregates are
  * `Window.partitionBy(key).orderBy(time).rowsBetween(unboundedPreceding,
  * currentRow)`; the order-sensitive EMA recurrence is a typed
  * `Aggregator` (Catalyst cannot fold a recurrence).
  */
object RunningAggs {

  /** Ordered per-key frame from start to current row — the batch form
    * of Flink's `keyBy(...).sum(...)` rolling aggregate
    * (SharePriceDataflow.java:121-122). `tieBreak` makes the order
    * total so results are deterministic. */
  def runningFrame(partition: Column, order: Column, tieBreak: Column): WindowSpec =
    Window.partitionBy(partition).orderBy(order, tieBreak)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  /** A2/A3 — running sum per key (MarketDataflow.java:319-339). */
  def runningSum(value: Column, partition: Column, order: Column, tieBreak: Column): Column =
    sum(value).over(runningFrame(partition, order, tieBreak))

  /** A5 — running product via exp∘sum∘ln (positive factors only), the
    * batch analog of the mult accumulator (SharePriceDataflow.java:72-96). */
  def runningProduct(factor: Column, partition: Column, order: Column, tieBreak: Column): Column =
    exp(sum(log(factor)).over(runningFrame(partition, order, tieBreak)))

  /** Group-total product (same identity, whole-group frame). */
  def groupProduct(factor: Column): Column = exp(sum(log(factor)))

  /** A4 — EMA recurrence as a typed Aggregator over (orderKey, value)
    * pairs pre-sorted per group. The fold order matches the reference
    * exactly (Chapter04_WorkingWithState.java:168-178) so kata goldens
    * are bitwise-equal. Input rows MUST arrive time-ordered within the
    * group — callers sort inside mapGroups (see emaPerKey). */
  final class EmaAggregator(alpha: Double) extends Aggregator[Double, Option[Double], Double] {
    def zero: Option[Double] = None
    def reduce(b: Option[Double], x: Double): Option[Double] = Some(Semantics.emaStep(b, x, alpha))
    // EMA is not parallel-mergeable; merge only ever sees one non-empty
    // side because callers aggregate within an already-grouped iterator.
    def merge(a: Option[Double], b: Option[Double]): Option[Double] = (a, b) match {
      case (Some(_), Some(_)) =>
        throw new IllegalStateException("EMA cannot merge two partial folds — sort-group first")
      case _ => a.orElse(b)
    }
    def finish(r: Option[Double]): Double = r.getOrElse(Double.NaN)
    def bufferEncoder: Encoder[Option[Double]] = Encoders.product[Tuple1[Option[Double]]]
      .asInstanceOf[Encoder[Option[Double]]] // not used on the mapGroups path
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** A4 — final EMA per key over time-ordered values: shuffles once on
    * the key, sorts within each group, folds sequentially. Scales as a
    * single hash-partitioned pass (no driver collection). */
  def emaPerKey[K: Encoder](ds: Dataset[(K, Long, Double)], alpha: Double = 0.1)(
      implicit tupleEnc: Encoder[(K, Double)]): Dataset[(K, Double)] =
    ds.groupByKey(_._1).mapGroups { (k, it) =>
      val ema = it.toVector.sortBy(r => (r._2, r._3)).map(_._3)
        .foldLeft(Option.empty[Double])((b, x) => Some(Semantics.emaStep(b, x, alpha)))
      (k, ema.getOrElse(Double.NaN))
    }
}
