package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** Throwaway profiling harness for operator internals. */
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s (n=$n)")
    }

    val toks = Tables.documents(spark, d).select(col("doc_id"),
      explode(split(trim(regexp_replace(regexp_replace(lower(col("text")),
        "[^a-z \\n]+", ""), "\\s+", " ")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)

    time("rdd baseline")(spark.sparkContext.parallelize(1 to 28000, 8).count())
    val noRegex = Tables.documents(spark, d).select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    time("explode noregex 1")(noRegex.count())
    time("explode noregex 2")(noRegex.count())
    time("explode noregex 3")(noRegex.count())
    val regexNoExplode = Tables.documents(spark, d).select(col("doc_id"),
      split(trim(regexp_replace(regexp_replace(lower(col("text")),
        "[^a-z \\n]+", ""), "\\s+", " ")), " ").as("toks"))
    time("regex no explode 1")(regexNoExplode.count())
    time("regex no explode 2")(regexNoExplode.count())
    time("plain count")(Tables.documents(spark, d).count())
    time("explode only")(toks.count())
    time("explode only again")(toks.count())
    time("explode+md5Long")(toks.select(Hashing.md5Long(col("tok")).as("h")).count())
    time("explode+md5 only")(toks.select(md5(col("tok")).as("h")).count())
    time("explode+conv(md5)")(toks.select(conv(substring(md5(col("tok")), 1, 15), 16, 10).as("h")).count())
    time("explode+xxhash64")(toks.select(xxhash64(col("tok")).as("h")).count())
    val hashed = toks.select(col("doc_id"), Hashing.md5Mod31(col("tok")).as("h"))
    time("agg16 from md5")(hashed.groupBy(col("doc_id"))
      .agg(min(Hashing.affine(col("h"), 0)).as("mh0"),
        (1 until 16).map(j => min(Hashing.affine(col("h"), j)).as(s"mh$j")): _*).count())
    val hashed2 = toks.select(col("doc_id"), (xxhash64(col("tok")) % 2147483647L).as("h"))
    time("agg16 from xxhash")(hashed2.groupBy(col("doc_id"))
      .agg(min(Hashing.affine(col("h"), 0)).as("mh0"),
        (1 until 16).map(j => min(Hashing.affine(col("h"), j)).as(s"mh$j")): _*).count())
    // second pass to check warm times
    time("agg16 from md5 warm")(hashed.groupBy(col("doc_id"))
      .agg(min(Hashing.affine(col("h"), 0)).as("mh0"),
        (1 until 16).map(j => min(Hashing.affine(col("h"), j)).as(s"mh$j")): _*).count())
    spark.stop()
  }
}
