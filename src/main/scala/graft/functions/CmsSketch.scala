package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a native
  * Catalyst typed-imperative aggregate — the frequency-sketch family
  * member whose POINT estimates are exactly reproducible cross-engine:
  * the bucket hashes are the same md5-derived affine family the
  * MinHash oracle already mirrors ([[Hashing.affine]]), so a DuckDB
  * twin can rebuild every counter with GROUP BYs and take the same
  * row-wise min ("agg_cms" in Oracles). Contrast with [[MisraGries]]
  * (candidate set + lower bounds) and HLL (engine-specific sketch,
  * rows-only checkable): CMS answers point frequency queries for ANY
  * key, overestimates only (never under), with error ≤ εN w.h.p. for
  * width ≈ e/ε.
  *
  * Distributed shape: bounded depth×width long counters per group —
  * constant state regardless of input rows — merged by elementwise
  * ADD (map-side combine collapses every partition to one sketch
  * before the shuffle). The eval result is the raw counter array
  * `[row-major: j*width + bucket]`; probing is a narrow expression
  * over the (broadcast) array — see ExtensionCatalog "aggCms".
  *
  * Input must be the PRE-HASHED mod-2³¹ long column
  * ([[Hashing.md5Mod31]]) — hashing hoisted out of the aggregate per
  * the measured codegen rule (see [[KmvDistinct]]).
  */
case class CmsSketch(child: Expression, depth: Int, width: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, s"cms depth out of [1,16]: $depth")
  require(width >= 2 && width <= 65536, s"cms width out of [2,65536]: $width")

  private val P31 = 2147483647L

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < depth) {
        // the j-th affine permutation, then the width fold — identical
        // integer arithmetic to Hashing.affine and the SQL twin
        val bucket = (((2L * j + 1) * h + 12345L * (j + 1)) % P31 % width).toInt
        buf(j * width + bucket) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"
  override def withNewMutableAggBufferOffset(n: Int): CmsSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): CmsSketch =
    copy(child = newChild)
}

object CmsSketch {
  /** Column form over a pre-hashed long column (Hashing.md5Mod31). */
  def cmsSketch(hashed: Column, depth: Int = 4, width: Int = 256): Column =
    GraftSqlBridge.toColumn(
      CmsSketch(GraftSqlBridge.toExpression(hashed), depth, width)
        .toAggregateExpression())

  /** Point estimate of `hashed`'s frequency from a sketch ARRAY built
    * with the same (depth, width): min over the depth rows of the
    * probed counters — a narrow expression over the array column.
    *
    * CONTRACT (ADVICE r6): (depth, width) here must equal the
    * (depth, width) the sketch was built with — the flat array
    * carries no shape header. A mismatch is a loud runtime error
    * (size(sketch) guard below), never a silent wrong estimate: with
    * no guard, out-of-range element_at returns NULL and least()
    * SKIPS nulls, so a misaligned probe would return a min over
    * fewer/wrong counters and look plausible. */
  def cmsEstimate(sketch: Column, hashed: Column,
                  depth: Int = 4, width: Int = 256): Column = {
    import org.apache.spark.sql.functions._
    // assert_true returns NULL when the guard holds, so coalesce adds
    // exactly 0 to every valid estimate (the shuffleRank idiom)
    val guard = coalesce(assert_true(size(sketch) === depth * width,
      concat(lit(s"cmsEstimate: sketch size "), size(sketch).cast("string"),
        lit(s" != depth*width = ${depth * width} — probe (depth,width) must match the build")))
      .cast("long"), lit(0L))
    val perRow = (0 until depth).map { j =>
      val bucket = (hashed * lit(2L * j + 1) + lit(12345L * (j + 1))) %
        lit(2147483647L) % lit(width.toLong)
      element_at(sketch, (lit(j.toLong * width) + bucket + 1).cast("int"))
    }
    least(perRow: _*) + guard
  }
}
