package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native exact integer micro-unit L2² over two `Array[Long]`
  * columns — the [[DotProductD]] treatment for the PQ family's inner
  * distance: pqArgmin scans ksub candidate centroids per subspace per
  * vector (m × ksub = 128 distance evaluations per corpus row at the
  * default shape), and each evaluation previously built a zip_with
  * products array and folded it through interpreted lambda frames.
  * The enclosing candidate fold is a higher-order function (never
  * whole-stage-codegen'd), so this expression's win is its
  * allocation-free interpreted eval; the codegen path exists for any
  * future non-HOF caller. Integer arithmetic is exact and
  * order-independent — results are identical by construction
  * (MicroL2Spec pins equality against the HOF fold anyway). */
case class MicroL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"micro_l2 expects array<bigint> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L; var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MicroL2 {
  /** Column-level entry point (classic-mode Expression→Column bridge). */
  def microL2(a: Column, b: Column): Column =
    GraftSqlBridge.toColumn(MicroL2(
      GraftSqlBridge.toExpression(a), GraftSqlBridge.toExpression(b)))
}
