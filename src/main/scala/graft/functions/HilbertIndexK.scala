package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** k-dimensional Hilbert curve index as a native expression — the
  * generalization that ends [[HilbertIndex]]'s 2-D-only contract
  * (VERDICT r11 #5): a 3+-column layout no longer has to fall back to
  * the Morton curve's quadrant jumps to cluster on every dimension.
  * The kernel is Skilling's transposed-coordinate algorithm
  * (J. Skilling, "Programming the Hilbert Curve", AIP Conf. Proc.
  * 707, 2004 — the standard compact n-D formulation): undo the
  * per-level rotations from the top bit down, Gray-encode across
  * dimensions, then bit-interleave the transposed axes MSB-first.
  * Unit-step continuity (consecutive curve positions are grid
  * neighbors, |Δ|₁ = 1) and bijectivity over the full 2^(k·bits)
  * grid are pinned as spec invariants at k = 3 — the same receipt
  * pair the 2-D expression carries.
  *
  * NOTE: at k = 2 this is a valid Hilbert curve but NOT bit-equal to
  * [[HilbertIndex]]'s classical xy→d loop (different base
  * orientation). [[graft.tools.ZOrderLayout]] keeps the 2-D
  * expression for k = 2 (its DuckDB recursive-CTE twin replays that
  * loop) and routes k ≥ 3 here.
  *
  * Same domain contract as [[InterleaveBits]], enforced LOUDLY
  * in-plan: every value in [0, 2^bits), k·bits ≤ 63; out-of-range
  * raises (a silent mask would fold distant keys onto one curve
  * position); NULL input → NULL output.
  */
case class HilbertIndexK(children: Seq[Expression], bits: Int) extends Expression {

  private def k: Int = children.length

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.size < 2)
      return TypeCheckResult.TypeCheckFailure(
        s"hilbert_k needs >= 2 columns, got ${children.size}")
    if (bits < 1)
      return TypeCheckResult.TypeCheckFailure(
        s"hilbert_k: bits must be >= 1, got $bits")
    if (k.toLong * bits > 63)
      return TypeCheckResult.TypeCheckFailure(
        s"hilbert_k: $k columns x $bits bits = ${k * bits} > 63 output bits")
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    children.zipWithIndex.collectFirst {
      case (c, i) if !integral(c.dataType) =>
        TypeCheckResult.TypeCheckFailure(
          s"hilbert_k column $i must be integral, got ${c.dataType}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  /** Domain check + Skilling axes→transpose→interleave; mutates its
    * scratch array only. Public: called from generated code with the
    * per-row values packed into `xs`. */
  def compute(xs: Array[Long]): Long = {
    val n = xs.length
    val top = 1L << bits
    var i = 0
    while (i < n) {
      if (xs(i) < 0L || xs(i) >= top)
        throw new IllegalArgumentException(
          s"hilbert_k: column $i value ${xs(i)} outside [0, $top) " +
            s"(bits=$bits) - rescale or bucket the column upstream")
      i += 1
    }
    // inverse-undo the per-level rotations, top bit down (Skilling's
    // AxestoTranspose, first loop)
    var q = 1L << (bits - 1)
    while (q > 1L) {
      val p = q - 1L
      i = 0
      while (i < n) {
        if ((xs(i) & q) != 0L) xs(0) ^= p
        else {
          val t = (xs(0) ^ xs(i)) & p
          xs(0) ^= t
          xs(i) ^= t
        }
        i += 1
      }
      q >>= 1
    }
    // Gray encode across dimensions
    i = 1
    while (i < n) { xs(i) ^= xs(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1L) {
      if ((xs(n - 1) & q) != 0L) t ^= q - 1L
      q >>= 1
    }
    i = 0
    while (i < n) { xs(i) ^= t; i += 1 }
    // transposed → scalar: bit b-1-of-X[0] is the index's MSB
    var d = 0L
    var j = bits - 1
    while (j >= 0) {
      i = 0
      while (i < n) {
        d = (d << 1) | ((xs(i) >> j) & 1L)
        i += 1
      }
      j -= 1
    }
    d
  }

  override def eval(input: InternalRow): Any = {
    val xs = new Array[Long](children.length)
    var j = 0
    while (j < children.length) {
      val v = children(j).eval(input)
      if (v == null) return null
      xs(j) = v.asInstanceOf[Number].longValue()
      j += 1
    }
    compute(xs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hkKernel", this, classOf[HilbertIndexK].getName)
    val isNull = ctx.freshName("hkIsNull")
    val value = ctx.freshName("hkValue")
    // per-operator scratch slot, reused across rows (ADVICE r12: a
    // fresh long[k] per row is avoidable garbage on the 64M-row
    // layout-write hot path); compute() treats it as scratch and every
    // non-null row overwrites all k slots before the call
    val arr = ctx.addMutableState("long[]", "hkXs", v => s"$v = new long[$k];")
    val fills = children.zipWithIndex.map { case (c, j) =>
      val cg = c.genCode(ctx)
      s"""
         |if (!$isNull) {
         |  ${cg.code}
         |  if (${cg.isNull}) { $isNull = true; }
         |  else { $arr[$j] = (long) ${cg.value}; }
         |}""".stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        boolean $isNull = false;
        long $value = 0L;
        $fills
        if (!$isNull) { $value = $ref.compute($arr); }
        """,
      isNull = JavaCode.isNullVariable(isNull),
      value = JavaCode.variable(value, LongType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndexK = copy(children = newChildren)

  override def prettyName: String = "hilbert_k"
}

object HilbertIndexK {
  /** Column wrapper: k-D Hilbert index of `cols` on the 2^bits grid. */
  def hilbertK(cols: Seq[Column], bits: Int): Column =
    GraftSqlBridge.toColumn(HilbertIndexK(cols.map(GraftSqlBridge.toExpression), bits))
}
