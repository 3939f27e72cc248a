package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Morton/Z-order bit interleave of k integral columns as ONE native
  * expression: output bit `i·k + (k−1−j)` is bit `i` of column `j`,
  * i.e. within each level the FIRST column is the most significant —
  * the standard Morton layout (z = … a₁b₁a₀b₀ for two columns), the
  * multi-dimensional clustering key behind data-skipping layouts
  * (Morton 1966; the OPTIMIZE ZORDER BY discipline of modern
  * lakehouse table formats). Sorting by the interleaved value gives
  * every prefix of the curve a bounded range in EVERY input column,
  * so parquet row-group min/max stats prune box predicates on any
  * dimension — not just the leading sort column (receipt:
  * ZOrderLayoutSpec's recordsRead comparison).
  *
  * Domain contract, enforced LOUDLY in-plan (house rule, same as
  * [[graft.operators.EncodedArgmax]]): every value in [0, 2^bits) and
  * k·bits ≤ 63 (result stays a non-negative long, so long order ==
  * unsigned curve order). Out-of-range values throw a descriptive
  * IllegalArgumentException in both eval and codegen — a silent mask
  * would fold distant keys onto the same curve position and quietly
  * destroy the locality the layout exists to provide. NULL input →
  * NULL output (built-in scalar semantics; a null clustering key has
  * no curve position and stays visible to the caller as null).
  */
case class InterleaveBits(children: Seq[Expression], bits: Int) extends Expression {

  private def k: Int = children.length

  // cached: children.toIndexedSeq per eval-loop access would traverse
  // a list per bit column (the AdcSum r10 lesson)
  private lazy val colExprs: IndexedSeq[Expression] = children.toIndexedSeq

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 2)
      return TypeCheckResult.TypeCheckFailure(
        s"interleave_bits needs >= 2 columns to interleave, got ${children.size}")
    if (bits < 1)
      return TypeCheckResult.TypeCheckFailure(
        s"interleave_bits: bits must be >= 1, got $bits")
    if (k.toLong * bits > 63)
      return TypeCheckResult.TypeCheckFailure(
        s"interleave_bits: $k columns x $bits bits = ${k * bits} > 63 output bits")
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    children.zipWithIndex.collectFirst {
      case (c, i) if !integral(c.dataType) =>
        TypeCheckResult.TypeCheckFailure(
          s"interleave_bits column $i must be integral, got ${c.dataType}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  /** Range-check + bit-spread one column's value; public: called from
    * generated code. `offset` = k−1−j (column j's bit position within
    * each level). */
  def checkedSpread(v: Long, j: Int): Long = {
    if (v < 0L || v >= (1L << bits))
      throw new IllegalArgumentException(
        s"interleave_bits: column $j value $v outside [0, ${1L << bits}) " +
          s"(bits=$bits) - rescale or bucket the column upstream")
    var z = 0L
    var i = 0
    val offset = k - 1 - j
    while (i < bits) {
      z |= ((v >> i) & 1L) << (i * k + offset)
      i += 1
    }
    z
  }

  override def eval(input: InternalRow): Any = {
    var z = 0L
    var j = 0
    while (j < colExprs.length) {
      val v = colExprs(j).eval(input)
      if (v == null) return null
      z |= checkedSpread(v.asInstanceOf[Number].longValue(), j)
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("zKernel", this, classOf[InterleaveBits].getName)
    val isNull = ctx.freshName("zIsNull")
    val value = ctx.freshName("zValue")
    val spreads = children.zipWithIndex.map { case (c, j) =>
      val cg = c.genCode(ctx)
      s"""
         |if (!$isNull) {
         |  ${cg.code}
         |  if (${cg.isNull}) { $isNull = true; }
         |  else { $value |= $ref.checkedSpread((long) ${cg.value}, $j); }
         |}""".stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        boolean $isNull = false;
        long $value = 0L;
        $spreads
        """,
      isNull = JavaCode.isNullVariable(isNull),
      value = JavaCode.variable(value, LongType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): InterleaveBits = copy(children = newChildren)

  override def prettyName: String = "interleave_bits"
}

object InterleaveBits {
  /** Column wrapper: Morton interleave of `cols` at `bits` bits each. */
  def interleaveBits(cols: Seq[Column], bits: Int): Column =
    GraftSqlBridge.toColumn(InterleaveBits(cols.map(GraftSqlBridge.toExpression), bits))
}
