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

  test("mixture sampling hits target shares against skewed source counts") {
    // skewed corpus: srcA 2400 rows, srcB 300, srcC 300
    val df = ((0 until 2400).map(i => (i.toLong, "srcA")) ++
      (2400 until 2700).map(i => (i.toLong, "srcB")) ++
      (2700 until 3000).map(i => (i.toLong, "srcC"))).toDF("id", "src")
    // budget 600 at weights .5/.5/0: srcA rate 600*.5/2400 = .125
    // (downsampled), srcB rate 600*.5/300 = 1.0 (kept whole), srcC 0
    val got = Sampling.mixtureSample(df, "id", "src",
      Map("srcA" -> 0.5, "srcB" -> 0.5), defaultWeight = 0.0, budget = 600.0)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(got("srcB") == 300L)            // rate capped at 1.0: all kept
    assert(!got.contains("srcC"))          // weight 0 drops the source
    assert(math.abs(got("srcA") / 2400.0 - 0.125) < 0.05) // downsampled to share
    // deterministic: same selection on a different partitioning
    val again = Sampling.mixtureSample(df.repartition(13), "id", "src",
      Map("srcA" -> 0.5, "srcB" -> 0.5), defaultWeight = 0.0, budget = 600.0)
      .select("id").as[Long].collect().toSet
    val first = Sampling.mixtureSample(df, "id", "src",
      Map("srcA" -> 0.5, "srcB" -> 0.5), defaultWeight = 0.0, budget = 600.0)
      .select("id").as[Long].collect().toSet
    assert(first == again && first.nonEmpty)
  }

  test("mixture broadcast-join fallback (>64 sources) selects the same rows as the formula") {
    // 100 sources x 30 rows: past the when-chain bound, so the
    // broadcast (source, rate) join branch runs
    val df = (0 until 3000).map(i => (i.toLong, s"dom${i % 100}")).toDF("id", "src")
    val got = Sampling.mixtureSample(df, "id", "src",
      Map("dom0" -> 0.5), defaultWeight = 0.5 / 99, budget = 300.0)
      .select("id").as[Long].collect().toSet
    // driver-side replica of the selection rule: decision(key,'mix') <
    // min(1, budget * w / n) with the same md5-derived decision value
    def decision(id: Long): Double = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${id}_mix".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(md5, 16) % 2147483647L) / 2147483647.0
    }
    val want = (0 until 3000).filter { i =>
      val w = if (i % 100 == 0) 0.5 else 0.5 / 99
      decision(i.toLong) < math.min(1.0, 300.0 * w / 30)
    }.map(_.toLong).toSet
    assert(got == want && got.nonEmpty)
  }

  test("shuffleRank: an exact permutation, deterministic, salt changes the order") {
    val df = corpus(500)
    val got = Sampling.shuffleRank(df, "id")
      .as[(Long, Long, Long)].collect()
    // every id appears once with ranks exactly 1..n
    assert(got.map(_._1).toSet == (0L until 500L).toSet)
    assert(got.map(_._3).sorted.toSeq == (1L to 500L))
    // rank order is exactly ascending shuffle_key order
    assert(got.sortBy(_._2).map(_._3).toSeq == (1L to 500L))
    // repartitioning the input does not move a single rank
    val again = Sampling.shuffleRank(df.repartition(17), "id")
      .as[(Long, Long, Long)].collect()
    assert(got.map(r => r._1 -> r._3).toMap == again.map(r => r._1 -> r._3).toMap)
    // a different salt is a different epoch permutation
    val epoch2 = Sampling.shuffleRank(df, "id", salt = "epoch2")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got.map(r => r._1 -> r._3).toMap != epoch2)
  }

  test("interleave: exact weighted ratios at every schedule prefix") {
    // source 0 weight 1 (ids 0..9), source 1 weight 2 (ids 100..119):
    // virtual times 2,6,10,… vs 1,3,5,… — pattern (s1 s0 s1) repeating
    val df = ((0L until 10L).map(i => (i, 0L, 1L)) ++
      (100L until 120L).map(i => (i, 1L, 2L)))
      .toDF("id", "src_num", "w").repartition(5)
    val got = Sampling.interleave(df, "id", "src_num", "w", lcm = 2)
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(got.map(_._3).toSeq == (1L to 30L))               // dense permutation
    // every prefix holds the 2:1 ratio within one item per source
    got.scanLeft((0, 0)) { case ((a, b), r) =>
      if (r._2 == 0L) (a + 1, b) else (a, b + 1)
    }.tail.foreach { case (n0, n1) =>
      assert(n1 >= 2 * n0 - 1 && n1 <= 2 * (n0 + 1),
        s"prefix ratio broken: $n0 vs $n1")
    }
    // ids recover exactly and the schedule is deterministic
    assert(got.filter(_._2 == 0L).map(_._1).toSeq == (0L until 10L))
    val again = Sampling.interleave(df.repartition(3), "id", "src_num", "w", 2)
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(again.toSeq == got.toSeq)
  }

  test("weightedSample: matches the A-ES reference; heavier keys sampled more often") {
    // text length is the weight: ids 0..199, id i has length i+1
    val docs = (0 until 200).map(i => (i.toLong, "x" * (i + 1))).toDF("id", "text")
    val got = Sampling.weightedSample(docs, "id", length(col("text")), k = 30)
      .as[(Long, Long, Double)].collect().toSeq
    // independent reference: same md5 decision, same rank key
    def u(id: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${id}_wsample".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      // (hash + 1) / 2^31 in (0, 1] — shifted off ln(0)
      (java.lang.Long.parseLong(hex, 16) % 2147483647L + 1L).toDouble / 2147483648.0
    }
    val want = (0 until 200).map { i =>
      val w = (i + 1).toLong
      (i.toLong, w, math.log(u(i.toLong)) / w)
    }.sortBy { case (id, _, k) => (-k, id) }.take(30)
      .map { case (id, w, k) =>
        (id, w, new java.math.BigDecimal(k)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()) }
    assert(got == want, s"got ${got.take(3)}... want ${want.take(3)}...")
    // weighting is real: the sampled ids skew heavy — their mean
    // weight must exceed the population mean (100.5) clearly
    assert(got.map(_._2).sum / 30.0 > 110.0,
      s"weighted sample looks uniform: mean w = ${got.map(_._2).sum / 30.0}")
    // determinism across partitionings
    val again = Sampling.weightedSample(docs.repartition(7), "id",
        length(col("text")), k = 30)
      .as[(Long, Long, Double)].collect().toSeq
    assert(again == got)
  }
}
