package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra-Gries heavy-hitters sketch over hashed items — O(k) state,
  * mergeable partials, with the classic guarantee: every item whose
  * true count exceeds n/(k+1) is RETAINED (counts are lower bounds and
  * merge-order-dependent; the retained SET's superset property is
  * what's deterministic and what consumers rely on).
  *
  * The scale pattern mirrors [[BloomContains]]: finding frequent
  * tokens exactly means shuffling every token occurrence into a
  * corpus-wide groupBy; the sketch reduces each partition to ≤ k
  * counters, the ≤ k candidates broadcast back to prune the token
  * stream, and the exact count runs over candidate occurrences only —
  * same final answer as the full groupBy, with the shuffle cut to the
  * heavy items' share. No false negatives at thresholds above
  * n/(k+1), and false positives die in the exact confirm.
  *
  * Returns `array<struct<h bigint, c bigint>>` sorted by h asc.
  */
case class MisraGries(child: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Long, Long]]
    with UnaryLike[Expression] {

  require(k >= 1, "misra-gries needs k >= 1")

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long](k * 2)

  /** The decrement step: drop every counter by the (k+1)-th largest
    * amount needed to fit k counters — the standard mergeable
    * generalization of single-item decrements. */
  private def shrink(buf: java.util.HashMap[Long, Long]): Unit = {
    if (buf.size <= k) return
    val counts = new Array[Long](buf.size)
    var i = 0
    val it0 = buf.values().iterator()
    while (it0.hasNext) { counts(i) = it0.next(); i += 1 }
    java.util.Arrays.sort(counts)
    val dec = counts(buf.size - k - 1) // (k+1)-th largest
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue - dec
      if (c <= 0) it.remove() else e.setValue(c)
    }
  }

  override def update(buf: java.util.HashMap[Long, Long],
                      input: InternalRow): java.util.HashMap[Long, Long] = {
    val h = child.eval(input)
    if (h != null) {
      val key = h.asInstanceOf[Long]
      val cur = buf.get(key)
      buf.put(key, if (buf.containsKey(key)) cur + 1L else 1L)
      if (buf.size > k) shrink(buf)
    }
    buf
  }

  override def merge(buf: java.util.HashMap[Long, Long],
                     other: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (buf.containsKey(e.getKey)) cur + e.getValue else e.getValue)
    }
    shrink(buf)
    buf
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any = {
    val keys = new Array[Long](buf.size)
    var i = 0
    val it0 = buf.keySet().iterator()
    while (it0.hasNext) { keys(i) = it0.next(); i += 1 }
    java.util.Arrays.sort(keys)
    val out = new Array[Any](keys.length)
    i = 0
    while (i < keys.length) {
      out(i) = new GenericInternalRow(Array[Any](keys(i), buf.get(keys(i)).longValue()))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); bb.putLong(e.getKey); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.put(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"
  override def withNewMutableAggBufferOffset(n: Int): MisraGries =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): MisraGries =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)
}

object MisraGries {
  /** Column form: ≤ k (hash, lower-bound-count) heavy-hitter candidates. */
  def misraGries(hash: Column, k: Int): Column =
    GraftSqlBridge.toColumn(MisraGries(
      GraftSqlBridge.toExpression(hash), k).toAggregateExpression())
}
