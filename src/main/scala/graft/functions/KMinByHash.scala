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
  * Returns `array<struct<h bigint, v double>>` sorted by (h asc,
  * v asc); null hashes or values are skipped.
  */
case class KMinByHash(left: Expression, right: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Long, Double)]]
    with BinaryLike[Expression] {

  require(k >= 1, "k-min-by-hash needs k >= 1")

  private val ord: Ordering[(Long, Double)] = Ordering.Tuple2[Long, Double]

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Double)] =
    new java.util.TreeSet[(Long, Double)](ord)

  private def add(buf: java.util.TreeSet[(Long, Double)], h: Long, v: Double): Unit = {
    if (buf.size < k) { buf.add((h, v)); () }
    else if (ord.compare((h, v), buf.last()) < 0) {
      if (buf.add((h, v))) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[(Long, Double)],
                      input: InternalRow): java.util.TreeSet[(Long, Double)] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      add(buf, h.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: java.util.TreeSet[(Long, Double)],
                     other: java.util.TreeSet[(Long, Double)]): java.util.TreeSet[(Long, Double)] = {
    val it = other.iterator()
    while (it.hasNext) { val (h, v) = it.next(); add(buf, h, v) }
    buf
  }

  override def eval(buf: java.util.TreeSet[(Long, Double)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (h, v) = it.next()
      out(i) = new GenericInternalRow(Array[Any](h, v))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (h, v) = it.next(); bb.putLong(h); bb.putDouble(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Double)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getLong, bb.getDouble)); i += 1 }
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
  /** Column form: the k hash-smallest (h, v) pairs per group. */
  def kMinByHash(hash: Column, value: Column, k: Int): Column =
    GraftSqlBridge.toColumn(KMinByHash(
      GraftSqlBridge.toExpression(hash),
      GraftSqlBridge.toExpression(value), k).toAggregateExpression())
}
