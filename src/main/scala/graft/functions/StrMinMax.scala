package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** min+max of a string column in ONE hash-friendly aggregate —
  * `struct(min_s, max_s)`, nulls ignored, null struct when every
  * input is null (built-in min/max semantics on both engines of the
  * oracle contract, and UTF8String's binary order == DuckDB's VARCHAR
  * collation for the ASCII fixtures the oracles run on).
  *
  * Exists because Spark's declarative min/max over a STRING carries
  * an immutable-typed buffer that BARS HashAggregate — the whole
  * aggregate (and, under the count(distinct) rewrite, its keyed
  * partial stages) degrades to SortAggregate + a real Sort of the
  * value stream: the r10 bug class PlanSweep gates catalog-wide. A
  * TypedImperativeAggregate with a bounded two-string buffer rides
  * ObjectHashAggregate instead — one pass, map-side combinable, no
  * sort anywhere ([[Profiling.profile]]'s string branches are the
  * call site; the gate stays empty-allowlisted).
  */
case class StrMinMax(child: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[StrMinMax.Buf]
    with UnaryLike[Expression] {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"str_min_max expects a string column, got $other")
    }

  override def createAggregationBuffer(): StrMinMax.Buf = new StrMinMax.Buf(null, null)

  private def observe(buf: StrMinMax.Buf, s: UTF8String): Unit = {
    if (buf.mn == null || s.compareTo(buf.mn) < 0) buf.mn = s.clone()
    if (buf.mx == null || s.compareTo(buf.mx) > 0) buf.mx = s.clone()
  }

  override def update(buf: StrMinMax.Buf, input: InternalRow): StrMinMax.Buf = {
    val v = child.eval(input)
    if (v != null) observe(buf, v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: StrMinMax.Buf, other: StrMinMax.Buf): StrMinMax.Buf = {
    if (other.mn != null) {
      if (buf.mn == null || other.mn.compareTo(buf.mn) < 0) buf.mn = other.mn
      if (buf.mx == null || other.mx.compareTo(buf.mx) > 0) buf.mx = other.mx
    }
    buf
  }

  override def eval(buf: StrMinMax.Buf): Any =
    if (buf.mn == null) null
    else new GenericInternalRow(Array[Any](buf.mn, buf.mx))

  override def serialize(buf: StrMinMax.Buf): Array[Byte] = {
    val mnB = if (buf.mn == null) null else buf.mn.getBytes
    val mxB = if (buf.mx == null) null else buf.mx.getBytes
    val n = 8 + (if (mnB == null) 0 else mnB.length) +
      (if (mxB == null) 0 else mxB.length)
    val bb = ByteBuffer.allocate(n)
    bb.putInt(if (mnB == null) -1 else mnB.length)
    if (mnB != null) bb.put(mnB)
    bb.putInt(if (mxB == null) -1 else mxB.length)
    if (mxB != null) bb.put(mxB)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): StrMinMax.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    def readOne(): UTF8String = {
      val n = bb.getInt
      if (n < 0) null
      else {
        val a = new Array[Byte](n); bb.get(a); UTF8String.fromBytes(a)
      }
    }
    new StrMinMax.Buf(readOne(), readOne())
  }

  override def dataType: DataType = StructType(Seq(
    StructField("min_s", StringType), StructField("max_s", StringType)))
  override def nullable: Boolean = true
  override def prettyName: String = "str_min_max"
  override def withNewMutableAggBufferOffset(n: Int): StrMinMax =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): StrMinMax =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): StrMinMax =
    copy(child = newChild)
}

object StrMinMax {
  /** Two-string buffer; cloned on update (the input UTF8String is a
    * reused unsafe-row slice — retaining it uncloned aliases the
    * NEXT row's bytes). */
  final class Buf(var mn: UTF8String, var mx: UTF8String)

  /** Column form: struct(min_s, max_s) of a string column. */
  def strMinMax(c: Column): Column =
    GraftSqlBridge.toColumn(StrMinMax(
      GraftSqlBridge.toExpression(c)).toAggregateExpression())
}
