package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed loaders for the driver-generated TPC-H-ish testdata
  * (`/root/repo/TESTDATA.md`). One function per table so every query
  * shares identical read paths (column pruning + filter pushdown reach
  * the parquet scan through these).
  */
object Tables {

  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark 4
    * rejects by default (PARQUET_TYPE_ILLEGAL). With
    * `spark.sql.legacy.parquet.nanosAsLong=true` it reads as LongType
    * nanos; we floor-convert to a microsecond TimestampType column.
    * NOTE for oracle parity: never output raw `ts` from a query —
    * DuckDB keeps nanosecond precision, Spark sees floored micros.
    * Emit `event_id` or a `date_trunc` of second-or-coarser instead.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    // `div` = integer division: ns epochs (~1.7e18) exceed double's
    // 2^53 exact range, so `col / 1000` loses the low microsecond on
    // ~12% of rows (measured) — enough to flip a window bucket or a
    // per-user sort order vs the oracle's exact-ns arithmetic.
    read(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
