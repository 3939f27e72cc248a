package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Bloom filter (Bloom 1970) as a native mergeable aggregate whose BIT
  * PATTERN is exactly reproducible cross-engine: positions come from
  * the same md5-derived affine family as [[CmsSketch]]
  * (`((2j+1)·h + 12345·(j+1)) mod P31 mod numBits`), so a DuckDB twin
  * rebuilds the identical set-bit set with GROUP BYs and answers the
  * identical membership bools — no false negatives ever, false
  * positives deterministic, not just statistically similar. Contrast
  * with [[BloomContains]] (j_bloom_semi), which probes Spark's own
  * `df.stat.bloomFilter` — the right tool to SHED rows before a join,
  * but engine-specific bits, so its parity is plan-level only. This
  * aggregate is the portable/serving form: build once (map-side
  * OR-combine, constant `numBits/64` longs of state per group at any
  * corpus size), broadcast the words, probe as a narrow expression.
  *
  * Input must be the PRE-HASHED mod-2³¹ long column
  * ([[Hashing.md5Mod31]]) — hashing hoisted out of the aggregate per
  * the measured codegen rule (see [[KmvDistinct]]).
  */
case class BloomSketch(child: Expression, numBits: Int, numHashes: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(numBits >= 64 && numBits <= (1 << 26) && numBits % 64 == 0,
    s"bloom numBits out of [64, 2^26] or not a multiple of 64: $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"bloom numHashes out of [1,16]: $numHashes")

  private val P31 = 2147483647L

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < numHashes) {
        val pos = (((2L * j + 1) * h + 12345L * (j + 1)) % P31 % numBits).toInt
        buf(pos >> 6) |= 1L << (pos & 63)
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
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
  override def prettyName: String = "bloom_sketch"
  override def withNewMutableAggBufferOffset(n: Int): BloomSketch =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomSketch =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): BloomSketch =
    copy(child = newChild)
}

/** Membership probe against a [[BloomSketch]] word array: true iff all
  * `numHashes` positions for the hashed key are set. Native binary
  * expression (codegen'd bit tests — shift-by-column has no Column
  * API, and the JVM test is branch-free anyway).
  *
  * CONTRACT (the cmsEstimate precedent): (numBits, numHashes) must
  * match the build; a word-array length mismatch is a LOUD runtime
  * error, never a silently-wrong membership answer. */
case class BloomMaybe(left: Expression, right: Expression,
                      numBits: Int, numHashes: Int)
    extends BinaryExpression with BinaryLike[Expression] {

  private val P31 = 2147483647L

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_maybe expects (array<bigint>, bigint), got ($l, $r)")
    }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(sketch: Any, hashed: Any): Any =
    compute(sketch.asInstanceOf[ArrayData], hashed.asInstanceOf[Long])

  /** Public: called from generated code. */
  def compute(words: ArrayData, h: Long): Boolean = {
    if (words.numElements() != numBits / 64)
      throw new IllegalArgumentException(
        s"bloom_maybe: sketch has ${words.numElements()} words, build used " +
          s"numBits=$numBits (${numBits / 64} words) — (numBits, numHashes) must match the build")
    var j = 0
    while (j < numHashes) {
      val pos = (((2L * j + 1) * h + 12345L * (j + 1)) % P31 % numBits).toInt
      if ((words.getLong(pos >> 6) >>> (pos & 63) & 1L) == 0L) return false
      j += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomMaybeKernel", this, classOf[BloomMaybe].getName)
    nullSafeCodeGen(ctx, ev, (s, h) => s"${ev.value} = $ref.compute($s, $h);")
  }

  override def prettyName: String = "bloom_maybe"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMaybe =
    copy(left = newLeft, right = newRight)
}

object BloomSketch {
  /** Column form over a pre-hashed long column (Hashing.md5Mod31). */
  def bloomSketch(hashed: Column, numBits: Int = 4096, numHashes: Int = 3): Column =
    GraftSqlBridge.toColumn(
      BloomSketch(GraftSqlBridge.toExpression(hashed), numBits, numHashes)
        .toAggregateExpression())

  /** Membership probe — (numBits, numHashes) must match the build. */
  def bloomMaybe(sketch: Column, hashed: Column,
                 numBits: Int = 4096, numHashes: Int = 3): Column =
    GraftSqlBridge.toColumn(
      BloomMaybe(GraftSqlBridge.toExpression(sketch),
        GraftSqlBridge.toExpression(hashed), numBits, numHashes))
}
