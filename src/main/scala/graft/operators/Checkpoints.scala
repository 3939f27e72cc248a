package graft.operators

import org.apache.spark.sql.DataFrame

/** THE checkpoint-release helper (one definition, four former copies):
  * free a superseded localCheckpoint's storage blocks now instead of
  * waiting for the ContextCleaner to notice the dropped reference
  * (ADVICE r4). The checkpointed plan is a LogicalRDD over the
  * persisted internal-row RDD — unpersisting it releases executor
  * storage immediately; the released frame becomes unusable, which is
  * the point for single-slot memo replacement.
  *
  * Best-effort by contract: the frame may belong to an already-STOPPED
  * SparkSession (JVM-global memos, per-session keys) — its blocks died
  * with that context, and a failed unpersist must never fail the
  * caller. */
object Checkpoints {
  def unpersist(df: DataFrame): Unit =
    try df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    } catch { case _: Throwable => () }
}
