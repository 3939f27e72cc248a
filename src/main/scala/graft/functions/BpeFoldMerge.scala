package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One greedy leftmost-non-overlapping BPE merge round over a symbol
  * array, as ONE native expression with an internal scan loop — the
  * merge kernel of [[graft.operators.Bpe.learnMerges]].
  *
  * The `aggregate()` higher-order-function form this replaces runs on
  * the interpreted lambda path (per-element boxed lambda variables, an
  * O(n) array copy per APPEND so O(n²) copies per word); this is the
  * textbook scanner — if s[i]=lhs and s[i+1]=rhs emit lhs+rhs and skip
  * two, else emit s[i] — in one pass with one output buffer, driven
  * from whole-stage codegen via the [[HyperplaneBucket]]
  * reference-object pattern. Semantics are IDENTICAL to the fold (a
  * merged token can never left-match again in its own round because
  * lhs+rhs = lhs would need an empty rhs) and to the framed-string
  * replace the DuckDB oracle replays — BpeSpec's randomized property
  * pins all forms to one list-based reference.
  *
  * The merge pair is a per-round CONSTANT (the round's argmax), so it
  * is carried as constructor strings, not child expressions; the
  * UTF8String forms are built once per (de)serialized instance.
  * Input symbols are defensively cloned: the output array holds
  * references past the unsafe row buffer's per-row reuse. */
case class BpeFoldMerge(child: Expression, lhs: String, rhs: String)
    extends UnaryExpression {

  require(lhs.nonEmpty && rhs.nonEmpty, "bpe_fold_merge: empty merge symbol")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_fold_merge expects array<string>, got $other")
  }

  // containsNull mirrors the input: null elements (legal through the
  // SQL surface) pass through unmerged — null never equals a merge
  // symbol — instead of NPEing in the kernel
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, containsNull) => ArrayType(StringType, containsNull)
    case _ => ArrayType(StringType, containsNull = true)
  }
  override def nullable: Boolean = child.nullable

  @transient private lazy val l = UTF8String.fromString(lhs)
  @transient private lazy val r = UTF8String.fromString(rhs)
  @transient private lazy val merged = UTF8String.fromString(lhs + rhs)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  /** Public: called from generated code. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[AnyRef](n)
    var m = 0
    var i = 0
    while (i < n) {
      val cur = arr.getUTF8String(i)
      if (cur != null && i + 1 < n && l.equals(cur) && {
            val nxt = arr.getUTF8String(i + 1)
            nxt != null && r.equals(nxt)
          }) {
        out(m) = merged
        m += 1
        i += 2
      } else {
        out(m) = if (cur == null) null else cur.clone()
        m += 1
        i += 1
      }
    }
    new GenericArrayData(if (m == n) out else java.util.Arrays.copyOf(out, m))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMergeKernel", this, classOf[BpeFoldMerge].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def prettyName: String = "bpe_fold_merge"
  override protected def withNewChildInternal(newChild: Expression): BpeFoldMerge =
    copy(child = newChild)
}

object BpeFoldMerge {
  def bpeFoldMerge(syms: Column, lhs: String, rhs: String): Column =
    GraftSqlBridge.toColumn(
      BpeFoldMerge(GraftSqlBridge.toExpression(syms), lhs, rhs))
}
