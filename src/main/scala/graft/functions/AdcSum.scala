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
  * Null semantics: null LUT, any null code, or a null LUT SLOT →
  * null, as the replaced element_at chain. Codes are range-CHECKED
  * (ADVICE r10): the internal encode contract (pqAssign emits
  * 0..ksub−1) makes the check free in practice, but the function is
  * SQL-registered, and on UnsafeArrayData the JVM's own bounds checks
  * are assert-only — an out-of-range code would silently read
  * adjacent memory. Out-of-domain codes throw a descriptive
  * IllegalArgumentException in both eval and codegen (a too-short LUT
  * is caught by the same check against the array length). Values are
  * exact integer sums — bit-identical to the element_at chain
  * (AdcSumSpec pins the equality), so every ANN oracle is unchanged.
  */
case class AdcSum(children: Seq[Expression], ksub: Int) extends Expression {

  private def lut: Expression = children.head
  // cached once: children.tail on the interpreted path would
  // re-materialize and linearly traverse the list per access (ADVICE
  // r10 — O(m²) per row in eval's loop)
  private lazy val codeExprs: IndexedSeq[Expression] = children.tail.toIndexedSeq
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
  // a null LUT SLOT propagates null (the element_at semantics), so
  // the array's containsNull makes the result nullable even when no
  // child is (review r11: a non-nullable declaration would let
  // consumers skip the isNull check and read the partial sum)
  override def nullable: Boolean = children.exists(_.nullable) ||
    (lut.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    })

  override def eval(input: InternalRow): Any = {
    val lutV = lut.eval(input)
    if (lutV == null) return null
    val arr = lutV.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var sum = 0L
    var j = 0
    while (j < codeExprs.length) {
      val c = codeExprs(j).eval(input)
      if (c == null) return null
      // range-check the UNTRUNCATED value: intValue() on a long code
      // >= 2^32 wraps into [0, ksub) and would read the wrong slot
      val codeL = c.asInstanceOf[Number].longValue()
      if (codeL < 0L || codeL >= ksub)
        throw new IllegalArgumentException(
          s"adc_sum: code $j = $codeL outside [0, $ksub)")
      val idx = j * ksub + codeL.toInt
      if (idx >= n)
        throw new IllegalArgumentException(
          s"adc_sum: LUT has $n entries, need > $idx (m*ksub with ksub=$ksub)")
      if (arr.isNullAt(idx)) return null
      sum += arr.getLong(idx)
      j += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lutGen = lut.genCode(ctx)
    val isNull = ctx.freshName("adcIsNull")
    val value = ctx.freshName("adcValue")
    val lutLen = ctx.freshName("adcLutLen")
    val idx = ctx.freshName("adcIdx")
    // same domain checks as eval: range-check the code (UnsafeArrayData
    // getLong is unchecked in production), length-check the LUT, and
    // propagate a null slot as null (the element_at semantics)
    val lookups = codes.zipWithIndex.map { case (c, j) =>
      val cg = c.genCode(ctx)
      s"""
         |if (!$isNull) {
         |  ${cg.code}
         |  if (${cg.isNull}) { $isNull = true; }
         |  else {
         |    if (${cg.value} < 0L || ${cg.value} >= ${ksub}L) {
         |      throw new IllegalArgumentException(
         |        "adc_sum: code $j = " + ${cg.value} + " outside [0, $ksub)");
         |    }
         |    int $idx = ${j * ksub} + (int) ${cg.value};
         |    if ($idx >= $lutLen) {
         |      throw new IllegalArgumentException(
         |        "adc_sum: LUT has " + $lutLen + " entries, need > " + $idx +
         |        " (m*ksub with ksub=$ksub)");
         |    }
         |    if (${lutGen.value}.isNullAt($idx)) { $isNull = true; }
         |    else { $value += ${lutGen.value}.getLong($idx); }
         |  }
         |}""".stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        ${lutGen.code}
        boolean $isNull = ${lutGen.isNull};
        long $value = 0L;
        int $lutLen = $isNull ? 0 : ${lutGen.value}.numElements();
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
