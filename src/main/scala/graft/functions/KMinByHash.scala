package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded deterministic row sample: the k (hash, value) pairs with
  * the smallest hashes, as a native typed-imperative aggregate —
  * O(k) mergeable state, map-side combine, so each partition ships at
  * most k rows regardless of group size.
  *
  * This is the KMV idea ([[KmvDistinct]]) applied to SAMPLING instead
  * of counting: hashing a unique row id gives a uniform permutation of
  * the group, so its k hash-smallest rows are a uniform random sample
  * that is REPEATABLE across runs, partition layouts, cluster sizes
  * and engines (unlike reservoir sampling, whose result depends on
  * encounter order). Quantiles computed over the returned sample are
  * the scale path for order statistics: the exact form
  * ([[graft.queries.QueryCatalog.aggPercentileDisc]]) sorts every
  * group's full history through one window per group — at 100 TB that
  * is a total shuffle+sort of the table, where this aggregate's
  * partials cap the shuffle at k rows per (partition, group) and the
  * DuckDB oracle reproduces the sample bit-for-bit (same md5-derived
  * hash, same (hash, value) tie order).
  *
  * The buffer is a MULTISET (pair → multiplicity): rows with identical
  * (hash, value) — duplicate values under a shared, non-unique hash —
  * are retained as many times as they occur, matching the oracle's
  * row_number semantics row for row.
  *
  * Returns `array<struct<h bigint, v double>>` sorted by (h asc,
  * v asc); null hashes or values are skipped.
  */
case class KMinByHash(left: Expression, right: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KMinByHash.Buf]
    with BinaryLike[Expression] {

  require(k >= 1, "k-min-by-hash needs k >= 1")

  import KMinByHash.{Buf, ord}

  override def createAggregationBuffer(): Buf =
    new Buf(new java.util.TreeMap[(Long, Double), Int](ord), 0)

  private def bump(buf: Buf, key: (Long, Double), by: Int): Unit = {
    val cur = if (buf.m.containsKey(key)) buf.m.get(key) else 0
    buf.m.put(key, cur + by)
  }

  private def add(buf: Buf, h: Long, v: Double, times: Int): Unit = {
    val key = (h, v)
    if (buf.total < k) {
      val take = math.min(times, k - buf.total)
      bump(buf, key, take)
      buf.total += take
      if (times > take) add(buf, h, v, times - take) // falls into else branch
    } else {
      // each insert evicts one copy of the current worst pair; ties
      // with the worst are dropped, like the oracle's rn <= k cut
      var remaining = times
      while (remaining > 0 && ord.compare(key, buf.m.lastKey()) < 0) {
        bump(buf, key, 1)
        val last = buf.m.lastEntry()
        if (last.getValue > 1) last.setValue(last.getValue - 1)
        else buf.m.remove(last.getKey)
        remaining -= 1
      }
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      add(buf, h.asInstanceOf[Long], v.asInstanceOf[Double], 1)
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    val it = other.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(buf, e.getKey._1, e.getKey._2, e.getValue)
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val out = new Array[Any](buf.total)
    val it = buf.m.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      var c = e.getValue
      while (c > 0) {
        out(i) = new GenericInternalRow(Array[Any](e.getKey._1, e.getKey._2))
        i += 1; c -= 1
      }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.m.size * 20)
    bb.putInt(buf.m.size)
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey._1); bb.putDouble(e.getKey._2); bb.putInt(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val h = bb.getLong; val v = bb.getDouble; val c = bb.getInt
      buf.m.put((h, v), c)
      buf.total += c
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmin_by_hash"
  override def withNewMutableAggBufferOffset(n: Int): KMinByHash =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KMinByHash =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): KMinByHash =
    copy(left = newLeft, right = newRight)
}

object KMinByHash {
  /** Multiset of retained pairs: sorted map (h, v) → multiplicity,
    * plus the total multiplicity (bounded by k). */
  final class Buf(val m: java.util.TreeMap[(Long, Double), Int], var total: Int)

  private[functions] val ord: java.util.Comparator[(Long, Double)] =
    (a: (Long, Double), b: (Long, Double)) => {
      val c = java.lang.Long.compare(a._1, b._1)
      if (c != 0) c else java.lang.Double.compare(a._2, b._2)
    }

  /** Column form: the k hash-smallest (h, v) pairs per group. */
  def kMinByHash(hash: Column, value: Column, k: Int): Column =
    GraftSqlBridge.toColumn(KMinByHash(
      GraftSqlBridge.toExpression(hash),
      GraftSqlBridge.toExpression(value), k).toAggregateExpression())
}
