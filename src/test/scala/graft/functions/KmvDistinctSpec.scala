package graft.functions

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** KMV sketch: exact below k, mergeable across partitions (partition
  * layout cannot change the result), and usefully accurate above k.
  */
class KmvDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def kmvOf(n: Int, k: Int, parts: Int): Long =
    spark.range(n).select(lit("g").as("g"),
        Hashing.md5Mod31(col("id").cast("string")).as("h"))
      .repartition(parts)
      .groupBy(col("g")).agg(KmvDistinct.kmvDistinct(col("h"), k).as("est"))
      .head().getLong(1)

  test("exact distinct count while under k") {
    assert(kmvOf(40, 64, 4) == 40L)
  }

  test("partition-layout-independent: merge of partials is deterministic") {
    val a = kmvOf(5000, 64, 1)
    val b = kmvOf(5000, 64, 13)
    val c = kmvOf(5000, 64, 32)
    assert(a == b && b == c)
  }

  test("estimate within 20% of truth for 10k distinct at k=256") {
    val est = kmvOf(10000, 256, 8)
    assert(math.abs(est - 10000.0) / 10000.0 < 0.2, s"estimate $est")
  }

  test("duplicates do not inflate the estimate") {
    val dup = spark.range(2000).select(lit("g").as("g"),
        Hashing.md5Mod31((col("id") % 100).cast("string")).as("h"))
      .groupBy(col("g")).agg(KmvDistinct.kmvDistinct(col("h"), 128).as("est"))
      .head().getLong(1)
    assert(dup == 100L) // 100 distinct < k=128 -> exact despite 20x dups
  }
}
