package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Database-friendly random projection (Achlioptas 2003 / the
  * Johnson-Lindenstrauss lemma with a Rademacher ±1 matrix): project a
  * `dim`-dim `Array[Float]` embedding to `outDims` signed sums, as ONE
  * native expression with an internal loop — the [[HyperplaneBucket]]
  * codegen-cliff lesson applied at birth (an outDims × dim Column tree
  * would be ~1 MB of generated code and grow with dim).
  *
  * Exact-integer parity contract: each input component is first
  * micro-unit-rounded — `xm_d = round(1e6 · (double) emb[d])`, the
  * standardize/quantize idiom — and output j is the INTEGER sum
  * `Σ_d sign(j, d) · xm_d`. Long addition is order-independent, so no
  * accumulation order can diverge from the DuckDB twin, which inlines
  * the same [[graft.operators.Similarity.hyperplaneSign]] constants
  * (one source of truth) over the same rounded integers.
  *
  * Sign row j reuses the hyperplane family at row offset `signRow0 + j`
  * — rows 0..15 are sign-LSH's own planes (this IS the same projection
  * sign-LSH thresholds; here the values survive), so `signRow0` lets a
  * caller pick planes independent of any bucket id in the pipeline
  * (default 16 = Oracles.MaxBits, past every bucket bit in use).
  *
  * Scale shape: narrow per-row arithmetic, no shuffle, constant-size
  * codegen at any (outDims, dim); 100 TB of embeddings project at scan
  * bandwidth. Null when the embedding has fewer than `dim` elements
  * (the HyperplaneBucket contract).
  */
case class HyperplaneProject(child: Expression, outDims: Int, dim: Int,
                             signRow0: Int)
    extends UnaryExpression {

  require(outDims >= 1 && outDims <= 256 && dim >= 1 && signRow0 >= 0,
    "need 1 <= outDims <= 256, dim >= 1, signRow0 >= 0")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_project expects array<float>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  // flat [j * dim + d] sign matrix; lazily rebuilt per JVM after
  // expression (de)serialization — outDims × dim seeded md5s
  @transient private lazy val signs: Array[Long] = {
    val s = new Array[Long](outDims * dim)
    var j = 0
    while (j < outDims) {
      var d = 0
      while (d < dim) {
        s(j * dim + d) =
          graft.operators.Similarity.hyperplaneSign(signRow0 + j, d).toLong
        d += 1
      }
      j += 1
    }
    s
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Public: called from generated code. Null when shorter than dim. */
  def compute(arr: ArrayData): GenericArrayData = {
    if (arr.numElements() < dim) return null
    val sg = signs
    val out = new Array[Long](outDims)
    // micro-unit rounding happens ONCE per component, outside the j
    // loop — half-AWAY-FROM-ZERO like Spark round() (HALF_UP
    // BigDecimal) and DuckDB round(); Math.round is floor(x+0.5)
    // which differs on exact negative .5 ties
    val xm = new Array[Long](dim)
    var d = 0
    while (d < dim) {
      val v = arr.getFloat(d).toDouble * 1000000.0
      xm(d) = (if (v >= 0) Math.floor(v + 0.5) else Math.ceil(v - 0.5)).toLong
      d += 1
    }
    var j = 0
    while (j < outDims) {
      var acc = 0L
      val base = j * dim
      d = 0
      while (d < dim) {
        acc += sg(base + d) * xm(d)
        d += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("projKernel", this, classOf[HyperplaneProject].getName)
    val res = ctx.freshName("projResult")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.GenericArrayData $res = $ref.compute($c);
      ${ev.isNull} = $res == null;
      if (!${ev.isNull}) ${ev.value} = $res;""")
  }

  override def prettyName: String = "hyperplane_project"
  override protected def withNewChildInternal(newChild: Expression): HyperplaneProject =
    copy(child = newChild)
}

object HyperplaneProject {
  def hyperplaneProject(emb: Column, outDims: Int, dim: Int,
                        signRow0: Int = 16): Column =
    GraftSqlBridge.toColumn(
      HyperplaneProject(GraftSqlBridge.toExpression(emb), outDims, dim, signRow0))
}
