package graft.functions

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** Bloom filter aggregate: no false negatives ever, partition-layout-
  * independent OR-merges, loud shape-mismatch guard, SQL-callable.
  */
class BloomSketchSpec extends SparkSpec {
  import spark.implicits._

  private def keys = spark.range(500)
    .select(col("id"), Hashing.md5Mod31(col("id").cast("string")).as("hm"))

  private def membership(parts: Int): Map[Long, Boolean] = {
    val sk = keys.repartition(parts)
      .agg(BloomSketch.bloomSketch(col("hm")).as("sk"))
    // probe the 500 inserted keys plus 500 absent ones
    spark.range(1000)
      .select(col("id"), Hashing.md5Mod31(col("id").cast("string")).as("hm"))
      .crossJoin(broadcast(sk))
      .select(col("id"), BloomSketch.bloomMaybe(col("sk"), col("hm")).as("might"))
      .as[(Long, Boolean)].collect().toMap
  }

  test("no false negatives; absent keys mostly read false at this load") {
    val m = membership(4)
    (0L until 500L).foreach(i => assert(m(i), s"false negative for inserted key $i"))
    // 500 keys in 4096 bits / 3 hashes: fp ~ (1-e^-0.366)^3 ~ 3% — the
    // absent half must be overwhelmingly false (deterministic set)
    val fps = (500L until 1000L).count(m(_))
    assert(fps < 50, s"implausible false-positive count: $fps / 500")
  }

  test("partition-layout-independent: OR-merge is deterministic") {
    assert(membership(1) == membership(13) && membership(13) == membership(32))
  }

  test("probe with mismatched numBits fails loudly, never silently wrong") {
    val sk = keys.agg(BloomSketch.bloomSketch(col("hm"), numBits = 4096).as("sk"))
    val probe = keys.select(col("hm")).limit(1).crossJoin(broadcast(sk))
    val e = intercept[Exception] {
      probe.select(BloomSketch.bloomMaybe(col("sk"), col("hm"),
        numBits = 8192).as("might")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("bloom_maybe")),
      s"expected the loud size-guard error, got: $e")
  }

  test("callable from SQL after registration") {
    org.apache.spark.sql.GraftSqlBridge.registerAll(spark)
    keys.createOrReplaceTempView("bloom_in")
    val got = spark.sql(
      """SELECT bloom_maybe(sk, hm) AS might FROM
        |  (SELECT bloom_sketch(hm) AS sk FROM bloom_in),
        |  (SELECT hm FROM bloom_in LIMIT 1)""".stripMargin)
      .head().getBoolean(0)
    assert(got)
  }
}
