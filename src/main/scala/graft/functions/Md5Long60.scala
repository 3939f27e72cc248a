package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit md5-derived integer hash of a string, as ONE native
  * expression — numerically identical to the Column chain
  * `conv(substring(md5(c), 1, 15), 16, 10).cast("long")` it replaces
  * (the first 15 hex digits of an md5 are the first 60 bits of the
  * digest read big-endian), and therefore to the DuckDB oracle twin
  * `('0x' || substr(md5(x),1,15))::BIGINT`.
  *
  * The replaced chain materialized a 32-char hex string per value and
  * re-parsed 15 chars of it through conv's arbitrary-base loop —
  * measured ~30 µs/value, the dominant per-token cost of every dedup
  * and fingerprint front end (tokenHashes burned 23 s CPU hashing
  * ~750 k tokens at sf0.1). This goes digest-bytes → long directly
  * (~0.2 µs/value) and keeps the hashing inside whole-stage codegen.
  */
case class Md5Long60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_long60 expects a string column, got $other")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Public: called from generated code. */
  def compute(s: UTF8String): Long = {
    val md = Md5Long60.localMd5.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // first 15 hex digits == first 60 bits of the digest, big-endian
    ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) |
      ((d(2) & 0xffL) << 36) | ((d(3) & 0xffL) << 28) |
      ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("md5Kernel", this, classOf[Md5Long60].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override def prettyName: String = "md5_long60"
  override protected def withNewChildInternal(newChild: Expression): Md5Long60 =
    copy(child = newChild)
}

object Md5Long60 {
  private val localMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def md5Long60(c: Column): Column =
    GraftSqlBridge.toColumn(Md5Long60(GraftSqlBridge.toExpression(c)))
}
