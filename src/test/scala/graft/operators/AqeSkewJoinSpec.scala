package graft.operators

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** The AQE half of the skew story: j_skew_salted demonstrates MANUAL
  * content-derived salting; this spec pins the RUNTIME path — AQE's
  * OptimizeSkewedJoin splitting a planted hot key's oversized shuffle
  * partition into multiple tasks (the `isSkew=true` / split-reader
  * markers in the final adaptive plan), with results identical to the
  * unsplit join. Thresholds are tuned down so local data exhibits
  * "skew" at test scale; the mechanism is byte-threshold-driven and
  * scale-free. */
class AqeSkewJoinSpec extends SparkSpec {

  private def withConfs[T](kvs: (String, String)*)(body: => T): T = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.get(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("AQE splits a planted hot key's partition; results unchanged") {
    import spark.implicits._
    // 200k rows on ONE key + 2k spread over 200 keys: the hot key's
    // shuffle partition dwarfs the median
    val fact = spark.range(202000).select(
      when(col("id") < 200000, 7L).otherwise(col("id") % 200).as("k"),
      col("id").as("v"))
    val dim = spark.range(200).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("name"))
    withConfs(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "100k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = fact.join(dim, "k")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
      // collect() drives THIS QueryExecution (head() would plan a
      // separate limit query and leave this plan un-finalized)
      val row = joined.collect().head
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isSkew=true") || plan.contains("skewed"),
        s"AQE did not mark/split the hot partition:\n$plan")
      // identical to the no-skew-handling join
      val expected = withConfs("spark.sql.adaptive.skewJoin.enabled" -> "false") {
        fact.join(dim, "k").agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
          .collect().head
      }
      assert(row == expected)
    }
  }
}
