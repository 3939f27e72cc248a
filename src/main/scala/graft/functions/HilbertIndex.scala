package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** 2-D Hilbert curve index as a native expression — the
  * locality-stronger sibling of [[InterleaveBits]]: consecutive curve
  * positions are ALWAYS grid neighbors (|Δx|+|Δy| = 1, the curve's
  * defining continuity property, pinned as a spec invariant), so any
  * contiguous curve range maps to a more compact region than the
  * Morton curve's quadrant jumps — tighter per-file envelopes for the
  * same file count when the layout is written sorted by this key
  * (Hilbert 1891; the xy→d form is the classical bit-twiddling
  * loop: per level extract the quadrant bits, accumulate
  * s²·gray(quadrant), reflect-and-swap into the sub-cell frame).
  *
  * Same domain contract as InterleaveBits, enforced LOUDLY in-plan:
  * 0 ≤ x, y < 2^bits with 2·bits ≤ 62; out-of-range raises (a silent
  * mask would fold distant keys onto one curve position); NULL input
  * → NULL output. The DuckDB oracle twin runs the identical loop as
  * a recursive CTE over the levels (ds_hilbert), so the index is
  * cross-engine exact.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends Expression {

  override def children: Seq[Expression] = Seq(left, right)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (bits < 1 || bits > 31)
      return TypeCheckResult.TypeCheckFailure(
        s"hilbert_xy: bits must be in [1, 31], got $bits")
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    children.zipWithIndex.collectFirst {
      case (c, i) if !integral(c.dataType) =>
        TypeCheckResult.TypeCheckFailure(
          s"hilbert_xy column $i must be integral, got ${c.dataType}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  /** Domain check + the classical xy→d loop; public: called from
    * generated code. */
  def compute(x0: Long, y0: Long): Long = {
    val n = 1L << bits
    if (x0 < 0L || x0 >= n || y0 < 0L || y0 >= n)
      throw new IllegalArgumentException(
        s"hilbert_xy: ($x0, $y0) outside [0, $n)^2 (bits=$bits) - " +
          "rescale or bucket the columns upstream")
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0L) {
      val rx = if ((x & s) != 0L) 1L else 0L
      val ry = if ((y & s) != 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // reflect (rx==1) then swap, in the current level's frame
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1L - x
          y = s - 1L - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override def eval(input: InternalRow): Any = {
    val xv = left.eval(input)
    if (xv == null) return null
    val yv = right.eval(input)
    if (yv == null) return null
    compute(xv.asInstanceOf[Number].longValue(),
      yv.asInstanceOf[Number].longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hilbertKernel", this, classOf[HilbertIndex].getName)
    val xg = left.genCode(ctx)
    val yg = right.genCode(ctx)
    val isNull = ctx.freshName("hIsNull")
    val value = ctx.freshName("hValue")
    ev.copy(
      code = code"""
        ${xg.code}
        boolean $isNull = ${xg.isNull};
        long $value = 0L;
        if (!$isNull) {
          ${yg.code}
          if (${yg.isNull}) { $isNull = true; }
          else { $value = $ref.compute((long) ${xg.value}, (long) ${yg.value}); }
        }
        """,
      isNull = JavaCode.isNullVariable(isNull),
      value = JavaCode.variable(value, LongType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndex =
    copy(left = newChildren(0), right = newChildren(1))

  override def prettyName: String = "hilbert_xy"
}

object HilbertIndex {
  /** Column wrapper: Hilbert index of (x, y) on the 2^bits grid. */
  def hilbertXY(x: Column, y: Column, bits: Int): Column =
    GraftSqlBridge.toColumn(HilbertIndex(
      GraftSqlBridge.toExpression(x), GraftSqlBridge.toExpression(y), bits))
}
