package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Rademacher sign-LSH bucket id over an `Array[Float]` embedding, as
  * ONE native expression with an internal loop.
  *
  * The Column form this replaces built the bucket as an nBits × dim
  * tree of `element_at(...).cast(double) * ±1.0` terms: ~1.3 MB of
  * generated code at nBits=5 (sf0.1), and since `adaptiveNBits` grows
  * with corpus size (24 bits at 10⁹ vectors), the tree grows linearly
  * with scale — straight into the measured Janino/JIT method-size
  * cliff exactly where the engine is supposed to shine. The loop form
  * is constant-size codegen at any nBits.
  *
  * Bit-exact parity contract (DuckDB oracle unchanged): per bit, the
  * projection is the LEFT-ASSOCIATED sum over dims of
  * `(double) emb[d] * sign(bit, d)` — float→double casts and ±1.0
  * multiplies are exact, and the loop accumulates in the same order as
  * both the former Column reduce and the oracle's literal sum. Signs
  * come from [[graft.operators.Similarity.hyperplaneSign]] — the ONE
  * source of truth the oracle also inlines.
  *
  * Null when the embedding has fewer than `dim` elements (the former
  * `element_at` chain nulled the whole sum there too).
  */
case class HyperplaneBucket(child: Expression, nBits: Int, dim: Int)
    extends UnaryExpression {

  require(nBits >= 1 && nBits <= 63 && dim >= 1, "need 1 <= nBits <= 63, dim >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket expects array<float>, got $other")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  // flat [bit * dim + d] sign matrix; recomputed lazily per JVM after
  // expression (de)serialization — nBits × dim seeded md5s, negligible
  @transient private lazy val signs: Array[Double] = {
    val s = new Array[Double](nBits * dim)
    var b = 0
    while (b < nBits) {
      var d = 0
      while (d < dim) {
        s(b * dim + d) = graft.operators.Similarity.hyperplaneSign(b, d).toDouble
        d += 1
      }
      b += 1
    }
    s
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Public: called from generated code. Returns null (boxed) when the
    * array is shorter than `dim`. */
  def compute(arr: ArrayData): java.lang.Long = {
    if (arr.numElements() < dim) return null
    val sg = signs
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      var proj = 0.0
      val base = b * dim
      var d = 0
      while (d < dim) {
        proj += arr.getFloat(d).toDouble * sg(base + d)
        d += 1
      }
      if (proj > 0) bucket += (1L << b)
      b += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hyperplaneKernel", this, classOf[HyperplaneBucket].getName)
    val boxed = ctx.freshName("boxedBucket")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $boxed = $ref.compute($c);
      ${ev.isNull} = $boxed == null;
      if (!${ev.isNull}) ${ev.value} = $boxed.longValue();""")
  }

  override def prettyName: String = "hyperplane_bucket"
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

object HyperplaneBucket {
  def hyperplaneBucket(emb: Column, nBits: Int, dim: Int): Column =
    GraftSqlBridge.toColumn(
      HyperplaneBucket(GraftSqlBridge.toExpression(emb), nBits, dim))
}
