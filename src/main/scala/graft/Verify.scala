package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries INT64 TIMESTAMP(NANOS) — see graft.Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // floor AQE coalescing at the core count: it sizes partitions by
      // shuffle INPUT bytes and otherwise serializes explosive joins
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", cpus)
      // Spark 4: parallelismFirst honors only minPartitionSize; see Bench
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // ts-parity note (checked 2026-08-12): events.ts carries REAL
    // sub-microsecond precision (max ts%1000 = 999 raw ns), yet every
    // ts query stays parity-safe because BOTH engines truncate ns→µs —
    // Spark via Tables.events' timestamp_micros(ts div 1000), DuckDB
    // 1.x by reading parquet timestamp[ns] as its µs TIMESTAMP. A
    // DuckDB upgrade that starts preserving TIMESTAMP_NS would change
    // ts ordering/grouping in the oracle only — the check_oracle
    // compare itself is the guard that would catch it.
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
