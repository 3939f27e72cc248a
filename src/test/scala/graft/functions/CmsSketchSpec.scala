package graft.functions

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** Count-Min sketch: never underestimates, partition-layout-
  * independent merges, exact at low collision pressure, and the
  * estimate expression reads the same counters the aggregate wrote.
  */
class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: key i (of 50) appears i+1 times
  private def skewed = spark.range(50)
    .select(col("id"), explode(sequence(lit(0L), col("id"))).as("rep"))
    .select(col("id"), Hashing.md5Mod31(col("id").cast("string")).as("hm"))

  private def estimates(parts: Int): Map[Long, Long] = {
    val sk = skewed.repartition(parts)
      .agg(CmsSketch.cmsSketch(col("hm")).as("sk"))
    skewed.select(col("id"), col("hm")).distinct()
      .crossJoin(broadcast(sk))
      .select(col("id"), CmsSketch.cmsEstimate(col("sk"), col("hm")).as("est"))
      .as[(Long, Long)].collect().toMap
  }

  test("estimates never underestimate and are exact at this load") {
    val est = estimates(4)
    (0L until 50L).foreach { i =>
      assert(est(i) >= i + 1, s"CMS underestimated key $i: ${est(i)} < ${i + 1}")
      // 50 keys in 4x256 counters: collisions possible in one row but
      // the min over 4 independent rows is exact w.o.p. at this load
      assert(est(i) == i + 1, s"key $i: est ${est(i)} != ${i + 1}")
    }
  }

  test("partition-layout-independent: elementwise merge is deterministic") {
    assert(estimates(1) == estimates(13) && estimates(13) == estimates(32))
  }

  test("estimate with mismatched (depth,width) fails loudly, never silently wrong (ADVICE r6)") {
    val sk = skewed.agg(CmsSketch.cmsSketch(col("hm"), depth = 4, width = 256).as("sk"))
    val probe = skewed.select(col("hm")).distinct().limit(1)
      .crossJoin(broadcast(sk))
    val e = intercept[Exception] {
      probe.select(CmsSketch.cmsEstimate(col("sk"), col("hm"),
        depth = 4, width = 128).as("est")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("cmsEstimate")),
      s"expected the loud size-guard error, got: $e")
    // and the matching shape still estimates fine through the guard
    val ok = probe.select(CmsSketch.cmsEstimate(col("sk"), col("hm")).as("est"))
      .head().getLong(0)
    assert(ok >= 1L)
  }

  test("callable from SQL after registration") {
    org.apache.spark.sql.GraftSqlBridge.registerAll(spark)
    skewed.createOrReplaceTempView("cms_in")
    val arr = spark.sql(
      "SELECT cms_sketch(hm, 4, 256) AS sk FROM cms_in")
      .head().getSeq[Long](0)
    assert(arr.length == 4 * 256 && arr.sum == 4L * (1 to 50).map(_.toLong).sum)
  }
}
