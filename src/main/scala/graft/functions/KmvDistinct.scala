package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * typed-imperative aggregate — the real distributed-sketch shape:
  * bounded O(k) state per group, mergeable partials (map-side combine
  * merges two TreeSets), one shuffle of k longs per group regardless
  * of input size.
  *
  * Unlike HLL++ (`approx_count_distinct`, whose sketch is
  * engine-specific and therefore only rows-checkable), KMV over the
  * cross-engine md5 hash is EXACTLY reproducible in SQL: the estimate
  * is `(k-1) * (2^31-1) / kth_smallest_distinct_hash` (truncated
  * integer division in both engines), or the exact distinct count
  * while fewer than k hashes have been seen. The DuckDB twin ranks
  * distinct hashes per group and reads the k-th
  * (see Oracles "agg_kmv_distinct").
  *
  * Input must be the PRE-HASHED long column (`Hashing.md5Mod31`) —
  * hashing is hoisted into a projection per the measured rule that
  * compound expressions inside aggregates balloon codegen.
  */
case class KmvDistinct(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with UnaryLike[Expression] {

  private val P31 = 2147483647L

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], h: Long): Unit =
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h) && buf.size > k) { buf.pollLast(); () }
    }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    // kth smallest of exactly k retained minima; guard a (cosmically
    // unlikely) zero hash so both engines stay division-safe
    else (k - 1).toLong * P31 / math.max(buf.last(), 1L)

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"
  override def withNewMutableAggBufferOffset(n: Int): KmvDistinct =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvDistinct =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

object KmvDistinct {
  /** Column form over a pre-hashed long column (Hashing.md5Mod31). */
  def kmvDistinct(hashed: Column, k: Int = 64): Column =
    GraftSqlBridge.toColumn(
      KmvDistinct(GraftSqlBridge.toExpression(hashed), k).toAggregateExpression())
}
