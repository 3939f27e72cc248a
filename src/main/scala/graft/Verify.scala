package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, only) = args match {
      case Array(s, o)       => (s, o, None)
      case Array(s, o, subset) => (s, o, Some(subset.split(',').toSet))
      case _ =>
        System.err.println("usage: graft.Verify <sfDir> <outDir> [query,query,...]")
        sys.exit(2)
    }
    val spark = GraftSession.builderFromEnv("4").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // ts-parity GUARD (was a comment through r3; now asserted): every ts
    // query is parity-safe only because BOTH engines agree on the µs
    // value of events.ts. The fixture has shipped in two physical forms
    // (see Tables.events): INT64 TIMESTAMP(NANOS) — both engines must
    // truncate ns→µs, Spark via timestamp_micros(ts div 1000) — and
    // native timestamp[us], where parity is identity. Assert the Spark
    // half loudly for whichever form this fixture carries: the derived
    // ts must be the exact µs value implied by the raw parquet bits (a
    // change to rounding, a lost nanosAsLong flag, or a schema drift
    // fails here, not forensically in a hash mismatch downstream). The
    // DuckDB half stays guarded by the check_oracle compare itself.
    locally {
      import org.apache.spark.sql.functions._
      // fingerprint = (count, decimal-exact sum, min, max) of the µs
      // value; any per-row floor-vs-round drift moves the sum
      def fp(df: org.apache.spark.sql.DataFrame): Seq[Any] = df.agg(
        count(lit(1)), sum(col("us").cast("decimal(38,0)")),
        min(col("us")), max(col("us"))).head().toSeq
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val rawDf = spark.read.parquet(s"$sfDir/events.parquet")
      val rawUs = rawDf.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => // INT64 ns → floor to µs
          rawDf.select(expr("ts div 1000").as("us"))
        case _ => // native timestamp[us] (NTZ) → identity under UTC session tz
          rawDf.select(unix_micros(col("ts").cast("timestamp")).as("us"))
      }
      val raw = fp(rawUs)
      val derived = fp(Tables.events(spark, sfDir)
        .select(unix_micros(col("ts")).as("us")))
      require(raw == derived,
        s"ts-parity guard: events.ts is not the exact µs value of the raw " +
          s"parquet column (raw fingerprint $raw != derived $derived) — rounding " +
          "drift or a schema-form mismatch breaks oracle ts parity")
    }
    val selected = only.fold(SparkEntry.queries)(names =>
      SparkEntry.queries.filter { case (n, _) => names(n) })
    selected.foreach { case (name, fn) =>
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
