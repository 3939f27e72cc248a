package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point — the config-based deployment
  * path for the engine's native functions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * makes `cosine`, `md5_long60`, `winnow_summary`, `hyperplane_bucket`,
  * `kmv_distinct` and `topk_pairs` callable from plain SQL on every
  * session of the cluster, like built-ins. Shares its builder table
  * with `GraftSqlBridge.registerAll` (the runtime form for an existing
  * session), so both paths register byte-identical functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.all.foreach { case (name, builder, usage) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage),
        builder))
    }
}
