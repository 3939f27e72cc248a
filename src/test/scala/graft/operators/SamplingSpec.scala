package graft.operators

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** Deterministic sampling/splitting: repeatability, partition
  * independence, the subset-stability (no-leakage) guarantee, and
  * rate sanity.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, s"lang${i % 3}")).toDF("id", "lang")

  test("same keys selected on every run and under any partitioning") {
    val df = corpus(2000)
    val a = Sampling.hashSample(df, "id", 0.2).select("id").as[Long].collect().toSet
    val b = Sampling.hashSample(df.repartition(13), "id", 0.2)
      .select("id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty)
    // rate sanity: within 5 points of the target on 2000 keys
    assert(math.abs(a.size / 2000.0 - 0.2) < 0.05)
  }

  test("growing the corpus never reassigns an existing key (no leakage)") {
    val small = Sampling.splitAssign(corpus(500), "id",
      Seq("train" -> 0.75, "valid" -> 0.125), "test")
      .select("id", "split").as[(Long, String)].collect().toMap
    val grown = Sampling.splitAssign(corpus(2000), "id",
      Seq("train" -> 0.75, "valid" -> 0.125), "test")
      .select("id", "split").as[(Long, String)].collect().toMap
    small.foreach { case (id, s) => assert(grown(id) == s) }
    assert(grown.values.toSet == Set("train", "valid", "test"))
  }

  test("stratified rates apply per stratum") {
    val df = corpus(3000)
    val got = Sampling.stratifiedSample(df, "id", "lang",
      Map("lang0" -> 0.0, "lang1" -> 1.0), defaultRate = 0.5)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(!got.contains("lang0"))           // rate 0 drops the stratum
    assert(got("lang1") == 1000L)            // rate 1 keeps all of it
    assert(math.abs(got("lang2") / 1000.0 - 0.5) < 0.1)
  }
}
