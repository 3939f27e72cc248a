package graft.operators

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.Encoder

/** Scale-safe batch replay (the secondary-sort pattern): hash-partition
  * on the key, sort within partitions by (key, event order), then
  * stream ONE sequential fold over the partition's rows.
  *
  * The `groupByKey.flatMapGroups` replay twin materializes each key's
  * entire history in a heap Vector before folding — at 100× a hot key
  * (or the reference's deliberate constant-key dataflows, e.g. the
  * keyBy("FOO") market stage) that buffer is the OOM. Here heap usage
  * is one state + one row's emissions regardless of group size, and
  * the ordering work rides Spark's external sort (disk-spilling), so a
  * degenerate key is disk-bounded, not heap-bounded.
  *
  * Callers repartition + sortWithinPartitions FIRST (explicitly, so
  * the ordering contract is visible in the plan) and then fold with
  * [[SecondarySort.keyedFold]].
  */
object SecondarySort {

  /** Per-key streaming fold over key-clustered, key-sorted rows.
    *  - `step` fires per row and may emit;
    *  - `flush` fires at each key boundary (and at the end) for
    *    emit-once-per-group shapes; boundary emissions precede the
    *    first emissions of the next key.
    */
  def keyedFold[T, K, S, O](sorted: Dataset[T])(
      keyOf: T => K, init: () => S,
      step: (S, T) => (S, Seq[O]))(
      implicit oe: Encoder[O]): Dataset[O] =
    keyedFoldFlush(sorted)(keyOf, init, step, (_: K, _: S) => Seq.empty[O])

  /** keyedFold plus a boundary `flush` for emit-once-per-group shapes. */
  def keyedFoldFlush[T, K, S, O](sorted: Dataset[T])(
      keyOf: T => K, init: () => S,
      step: (S, T) => (S, Seq[O]),
      flush: (K, S) => Seq[O])(
      implicit oe: Encoder[O]): Dataset[O] =
    sorted.mapPartitions(rows => new KeyedFoldIterator(rows, keyOf, init, step, flush))

  /** Dedicated iterator class (not Iterator.flatMap chains — shared
    * combinator call sites go megamorphic in a long-lived JVM and
    * deoptimize; see Dedup.PairIterator). */
  private final class KeyedFoldIterator[T, K, S, O](
      rows: Iterator[T], keyOf: T => K, init: () => S,
      step: (S, T) => (S, Seq[O]), flush: (K, S) => Seq[O])
      extends scala.collection.AbstractIterator[O] {
    private var curKey: Option[K] = None
    private var state: S = _
    private var outs: Seq[O] = Vector.empty
    private var oi = 0
    private var done = false
    advance()
    private def advance(): Unit = {
      while (oi >= outs.length && !done) {
        if (rows.hasNext) {
          val row = rows.next()
          val k = keyOf(row)
          val boundary =
            if (curKey.contains(k)) Seq.empty
            else {
              val b = curKey.map(pk => flush(pk, state)).getOrElse(Seq.empty)
              curKey = Some(k)
              state = init()
              b
            }
          val (s2, out) = step(state, row)
          state = s2
          outs = if (boundary.isEmpty) out else boundary ++ out
          oi = 0
        } else {
          done = true
          outs = curKey.map(pk => flush(pk, state)).getOrElse(Seq.empty)
          oi = 0
        }
      }
    }
    override def hasNext: Boolean = oi < outs.length
    override def next(): O = {
      val o = outs(oi)
      oi += 1
      if (oi >= outs.length) advance()
      o
    }
  }
}
