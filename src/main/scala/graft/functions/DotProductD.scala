package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native double-precision dot product over two `Array[Double]`
  * columns — the [[CosineSimilarity]] capability applied to the ONE
  * per-pair expression left on the interpreted path in the ANN
  * training/assignment loops. Those n×k inner loops (kmeansTrain's
  * argmax pass, ivfAssign's inverted-list build — up to ~10¹⁰ pairs
  * at adaptive k = ⌈√n⌉ on a 5M corpus) evaluated
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`, which allocates an
  * intermediate products ARRAY plus a closure frame per element, per
  * pair, on the interpreted lambda path.
  *
  * BIT-PARITY contract: the fused loop accumulates
  * `s += a(i) * b(i)` left to right — each product is an independent
  * IEEE operation and the additions happen in the same sequence as
  * the zip_with-then-fold form, so results are bit-equal to the HOF
  * (DotProductDSpec pins exact equality on random vectors), which
  * keeps the trained centroids — and every oracle-checked ANN result
  * derived from them — unchanged to the bit. The interpreted
  * nullSafeEval mirrors the generated loop for the same reason.
  *
  * Norms are NOT fused here ([[CosineSimilarity]]'s shape): the
  * callers hoist |v| and |c| out of the pair loop already — the dot
  * product is the only inherent per-pair cost, which is exactly why
  * it is the expression worth making native. */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product_d expects array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) {
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductD {
  /** Column-level entry point (classic-mode Expression→Column bridge). */
  def dotD(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(DotProductD(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))
}
