package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k (score desc, id asc) as a native typed-imperative
  * aggregate — the distributed-top-k shape: O(k) state per group,
  * mergeable partials, so map-side combine reduces every partition's
  * candidate stream to k rows BEFORE the shuffle.
  *
  * This is what makes top-k-per-query survive scale: the window form
  * (`row_number() over (partition by query)`) ships every scored
  * candidate of the corpus to one task per query and sorts it there —
  * with 20 queries over a 10⁹-vector corpus that is 20 reducers
  * sorting ~10⁹ rows. The aggregate ships ≤ k rows per (partition,
  * query) and merges heaps.
  *
  * Determinism contract (same as the former window + the DuckDB
  * oracle): callers pass the ROUNDED score, and ordering ties break on
  * ascending id, so the retained set and its order are unique.
  *
  * Returns `array<struct<score double, id bigint>>` sorted by
  * (score desc, id asc) — posexplode's position is the dense rank.
  *
  * SESSION CAVEAT (r10): every TypedImperativeAggregate plans as
  * ObjectHashAggregate, which falls back to SORT-BASED aggregation
  * past `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  * DISTINCT KEYS per partition — default 128. A query batch larger
  * than that silently SORTS the whole candidate stream per partition
  * (the 5M-vector ivfpq probe read 27.9 s vs 1.31 s with the
  * fallback lifted). Sessions running many-query ANN workloads should
  * raise the threshold (the repo's mains set 8192; state is ~200 B
  * per key here, so the in-memory map stays a few MB).
  */
case class TopKPairs(left: Expression, right: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]]
    with BinaryLike[Expression] {

  require(k >= 1, "top-k needs k >= 1")

  // (score desc, id asc): "smallest" element under this ordering is
  // the best; TreeSet.last() is the current worst retained
  private val ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (s, id) => (-s, id) }

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](ord)

  private def add(buf: java.util.TreeSet[(Double, Long)], s: Double, id: Long): Unit = {
    if (buf.size < k) { buf.add((s, id)); () }
    else if (ord.compare((s, id), buf.last()) < 0) {
      if (buf.add((s, id))) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[(Double, Long)],
                      input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val s = left.eval(input)
    val id = right.eval(input)
    if (s != null && id != null)
      add(buf, s.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[(Double, Long)],
                     other: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    val it = other.iterator()
    while (it.hasNext) { val (s, id) = it.next(); add(buf, s, id) }
    buf
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val (s, id) = it.next()
      out(i) = new GenericInternalRow(Array[Any](s, id))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (s, id) = it.next(); bb.putDouble(s); bb.putLong(id) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_pairs"
  override def withNewMutableAggBufferOffset(n: Int): TopKPairs =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): TopKPairs =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): TopKPairs =
    copy(left = newLeft, right = newRight)
}

object TopKPairs {
  /** Column form: top-k (score desc, id asc) pairs per group. */
  def topKPairs(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.toColumn(TopKPairs(
      GraftSqlBridge.toExpression(score),
      GraftSqlBridge.toExpression(id), k).toAggregateExpression())
}
