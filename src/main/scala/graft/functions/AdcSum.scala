package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, IntegerType, LongType, ShortType}

/** The ADC inner loop as ONE native expression: given a query's packed
  * LUT (an m·ksub long array, entry [sub·ksub + cent] = micro-unit L2²
  * of the query's sub-vector to that sub-centroid) and a corpus row's
  * m stored codes, returns Σ_j lut[j·ksub + code_j] — the asymmetric
  * PQ distance (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011, Eq. 13).
  *
  * Replaces the m-way `element_at(lutv, c_j + j·ksub + 1) + …` chain
  * (r10): each element_at paid one-based/null/bounds ceremony per
  * lookup — measured ~100 ns per lookup on the 5M ivfpq ladder
  * (790 CPU-s for 8·10⁹ lookups; the ADC probe LOST to the
  * exact-cosine IVF probe, inverting the index family's cost story).
  * Here the array reference is evaluated once per row and the m
  * lookups are an unrolled run of primitive `getLong` reads inside
  * whole-stage codegen.
  *
  * Null semantics: null LUT or any null code → null, as the replaced
  * chain. Codes are trusted in-range by the encode contract (pqAssign
  * emits 0..ksub−1); an out-of-range code fails loudly on the array
  * bounds rather than silently wrapping. Values are exact integer
  * sums — bit-identical to the element_at chain (AdcSumSpec pins the
  * equality), so every ANN oracle is unchanged.
  */
case class AdcSum(children: Seq[Expression], ksub: Int) extends Expression {

  private def lut: Expression = children.head
  private def codes: Seq[Expression] = children.tail

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 2)
      return TypeCheckResult.TypeCheckFailure("adc_sum needs a LUT array and >= 1 code")
    if (ksub < 1)
      return TypeCheckResult.TypeCheckFailure(s"adc_sum: ksub must be >= 1, got $ksub")
    lut.dataType match {
      case ArrayType(LongType, _) =>
      case other => return TypeCheckResult.TypeCheckFailure(
        s"adc_sum expects an array<bigint> LUT, got $other")
    }
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    codes.zipWithIndex.collectFirst {
      case (c, i) if !integral(c.dataType) =>
        TypeCheckResult.TypeCheckFailure(
          s"adc_sum code $i must be integral, got ${c.dataType}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def eval(input: InternalRow): Any = {
    val lutV = lut.eval(input)
    if (lutV == null) return null
    val arr = lutV.asInstanceOf[ArrayData]
    var sum = 0L
    var j = 0
    while (j < codes.length) {
      val c = codes(j).eval(input)
      if (c == null) return null
      sum += arr.getLong(j * ksub + c.asInstanceOf[Number].intValue())
      j += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutGen = lut.genCode(ctx)
    val isNull = ctx.freshName("adcIsNull")
    val value = ctx.freshName("adcValue")
    val lookups = codes.zipWithIndex.map { case (c, j) =>
      val cg = c.genCode(ctx)
      s"""
         |if (!$isNull) {
         |  ${cg.code}
         |  if (${cg.isNull}) { $isNull = true; }
         |  else { $value += ${lutGen.value}.getLong(${j * ksub} + (int) ${cg.value}); }
         |}""".stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        ${lutGen.code}
        boolean $isNull = ${lutGen.isNull};
        long $value = 0L;
        $lookups
        """,
      isNull = JavaCode.isNullVariable(isNull),
      value = JavaCode.variable(value, LongType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AdcSum = copy(children = newChildren)

  override def prettyName: String = "adc_sum"
}

object AdcSum {
  /** Column wrapper: Σ_j lut[j·ksub + codes(j)], 0-based codes. */
  def adcSum(lut: Column, codes: Seq[Column], ksub: Int): Column =
    GraftSqlBridge.toColumn(AdcSum(
      GraftSqlBridge.toExpression(lut) +: codes.map(GraftSqlBridge.toExpression),
      ksub))
}
