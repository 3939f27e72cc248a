package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built bloom filter, as a codegen'd
  * native predicate — the explicit form of a runtime join filter.
  *
  * The scale pattern: semi-joining a 100 TB fact table against a
  * selective dim set shuffles the whole fact side; building a compact
  * bloom filter over the dim keys (`df.stat.bloomFilter`, a
  * distributed tree-aggregate) and pushing THIS predicate into the
  * fact scan prunes non-matching rows BEFORE the exchange, cutting the
  * shuffle to matches + the false-positive residue. No false
  * negatives, so following with the exact semi join gives a result
  * identical to the unpruned join — the filter only sheds work.
  *
  * The filter rides into tasks via the expression's reference object
  * (serialized once per task binary, ~m/8 bytes), the same mechanism
  * Spark's own injected runtime filters use.
  */
case class BloomContains(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_contains expects a bigint column, got $other")
  }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override def prettyName: String = "bloom_contains"
  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

object BloomContains {
  def bloomContains(c: Column, filter: BloomFilter): Column =
    GraftSqlBridge.toColumn(BloomContains(GraftSqlBridge.toExpression(c), filter))
}
