package graft.operators

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** Scale toolbox: salted joins match unsalted results; bucketed tables
  * co-locate a join with no shuffle exchange on either side.
  */
class ScaleToolsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join is row-identical to the plain join under heavy skew") {
    val d = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, d)     // l_suppkey is dense
    val sup = graft.Tables.supplier(spark, d)
    val plain = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name")).agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 4).as("q"))
    val salted = SkewTools.saltedJoin(
      li.withColumnRenamed("l_suppkey", "k"),
      sup.withColumnRenamed("s_suppkey", "k"), "k", salts = 8)
      .groupBy(col("s_name")).agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 4).as("q"))
    val p = plain.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val s = salted.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(p.toSeq == s.toSeq && p.nonEmpty)
  }

  test("LSH hot bucket is salted: 1e5 copies of one doc complete with bounded shards") {
    // Degenerate corpus: every doc identical -> all 1e5 ids land in ONE
    // LSH bucket per band. Pre-fix this was one task holding the whole
    // id array and emitting |bucket|^2 = 5e9 pairs. With maxBucket=16
    // the bucket salts into ceil(1e5/16)=6250 shards; emission is
    // within-shard only (documented recall contract) and every
    // collect_list group stays O(maxBucket).
    val nDocs = 100000L
    val cap = 16
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      lit("alpha bravo charlie delta echo foxtrot golf hotel").as("text"))
    val pairs = Dedup.minHashLsh(docs, "text", "doc_id",
      bands = 2, rowsPerBand = 2, maxBucket = cap)
    val nShards = math.ceil(nDocs.toDouble / cap).toLong
    val shardOf = (c: org.apache.spark.sql.Column) => pmod(xxhash64(c), lit(nShards))
    // independent replica of the shard split: expected pair count and
    // the bound on any one collect_list group
    val shardSizes = spark.range(nDocs).groupBy(shardOf(col("id")).as("shard"))
      .count().collect().map(_.getLong(1))
    val expectedPairs = shardSizes.map(n => n * (n - 1) / 2).sum
    assert(shardSizes.max < 4L * cap, s"shard skew too high: ${shardSizes.max}")
    assert(pairs.count() == expectedPairs)
    // every emitted pair is within one shard (the recall contract)
    assert(pairs.filter(shardOf(col("doc_a")) =!= shardOf(col("doc_b"))).count() == 0)
  }

  test("hamming64 hot bucket is salted: 1e5 copies of one fingerprint complete with bounded shards") {
    // Degenerate media corpus: every doc carries the SAME 64-bit
    // fingerprint -> all 1e5 ids land in ONE (chunk, value) bucket per
    // chunk position. Pre-fix this was a raw self-join emitting
    // |bucket|^2 = 5e9 candidate pairs in one task; with maxBucket=16
    // each chunk-0 bucket salts into ceil(1e5/16)=6250 shards,
    // first-match emits each within-shard pair exactly once (at chunk
    // 0), and later chunks skip everything.
    val nDocs = 100000L
    val cap = 16
    val hashes = spark.range(nDocs).select(col("id").as("doc_id"),
      lit(0xA5A5A5A5L).as("fp_hi"), lit(0x5A5A5A5AL).as("fp_lo"))
    val oversizedBefore = Dedup.oversizedBucketRows(spark)
    val pairs = Dedup.hammingPairs64(hashes, "doc_id", "fp_hi", "fp_lo",
      maxDist = 6, maxBucket = cap)
    val nShards = math.ceil(nDocs.toDouble / cap).toLong
    val shardOf = (c: org.apache.spark.sql.Column) => pmod(xxhash64(c), lit(nShards))
    val shardSizes = spark.range(nDocs).groupBy(shardOf(col("id")).as("shard"))
      .count().collect().map(_.getLong(1))
    val expectedPairs = shardSizes.map(n => n * (n - 1) / 2).sum
    assert(shardSizes.max < 4L * cap, s"shard skew too high: ${shardSizes.max}")
    assert(pairs.count() == expectedPairs)
    // every emitted pair is within one shard (the recall contract),
    // and identical fingerprints report distance 0
    assert(pairs.filter(shardOf(col("id_a")) =!= shardOf(col("id_b"))).count() == 0)
    assert(pairs.filter(col("dist") =!= 0).count() == 0)
    // the salt's recall degradation is OBSERVABLE (ADVICE r8): rows in
    // over-cap buckets bumped the per-context accumulator
    assert(Dedup.oversizedBucketRows(spark) > oversizedBefore,
      "over-cap bucket rows did not register in the accumulator")
  }

  test("hamming64 salted kernel is exact below the cap: matches brute-force pairs") {
    // 300 deterministic pseudo-random fingerprints plus 20 planted
    // near-dups; buckets stay far under the default cap, so the salted
    // kernel must emit EXACTLY the brute-force (a<b, dist<=6) set.
    val base = spark.range(300).select(col("id").as("doc_id"),
      (xxhash64(col("id")).bitwiseAND(lit(0xffffffffL))).as("fp_hi"),
      (xxhash64(col("id"), lit(7)).bitwiseAND(lit(0xffffffffL))).as("fp_lo"))
    val dups = spark.range(20).select((col("id") + 1000L).as("doc_id"),
      (xxhash64(col("id") * 3L).bitwiseAND(lit(0xffffffffL))).as("fp_hi"),
      // flip one low bit of a base doc's lo half -> distance 1
      (xxhash64(col("id") * 3L, lit(7)).bitwiseAND(lit(0xffffffffL))
        .bitwiseXOR(lit(1L))).as("fp_lo"))
    val hashes = base.union(dups)
    val rows = hashes.collect()
      .map(r => (r.getLong(0), (r.getLong(1) << 32) | (r.getLong(2) & 0xffffffffL)))
    val expected = (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 6
    } yield (ia, ib, java.lang.Long.bitCount(sa ^ sb).toLong)).toSet
    val got = Dedup.hammingPairs64(hashes, "doc_id", "fp_hi", "fp_lo")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(expected.nonEmpty, "planted near-dups must produce pairs")
    assert(got == expected)
    // WIDENED blocking path (maxDist <= 3 -> 4 x 16-bit chunks) is
    // exact too: same corpus, tighter threshold, brute-force equality
    val expected3 = expected.filter(_._3 <= 3)
    val got3 = Dedup.hammingPairs64(hashes, "doc_id", "fp_hi", "fp_lo", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(expected3.nonEmpty && got3 == expected3)
  }

  test("hamming64 randomized: every chunk-width path equals brute force") {
    // maxDist 1 / 3 / 6 exercise the 2x32 / 4x16 / 8x8 blocking
    // layouts; clustered fingerprints (few base patterns + small
    // perturbations) make qualifying pairs plentiful at every
    // distance. Deterministic seed — no flaky reruns.
    val rnd = new scala.util.Random(20260814L)
    for (maxDist <- Seq(1, 3, 6)) {
      val bases = Array.fill(6)(rnd.nextLong())
      val rows = (0 until 160).map { i =>
        val base = bases(i % bases.length)
        // flip 0-4 random bits off the base pattern
        val sig = (0 until rnd.nextInt(5))
          .foldLeft(base)((s, _) => s ^ (1L << rnd.nextInt(64)))
        (i.toLong, sig >>> 32, sig & 0xffffffffL)
      }
      val expected = (for {
        (ia, ha, la) <- rows; (ib, hb, lb) <- rows
        if ia < ib
        d = java.lang.Long.bitCount(((ha << 32) | la) ^ ((hb << 32) | lb))
        if d <= maxDist
      } yield (ia, ib, d.toLong)).toSet
      val got = Dedup.hammingPairs64(
          rows.toDF("doc_id", "fp_hi", "fp_lo"), "doc_id", "fp_hi", "fp_lo",
          maxDist = maxDist)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(expected.nonEmpty, s"maxDist=$maxDist needs qualifying pairs")
      assert(got == expected, s"maxDist=$maxDist diverged from brute force")
    }
  }

  test("hotKeys surfaces the heaviest join keys") {
    val hot = SkewTools.hotKeys(
      graft.Tables.lineitem(spark, "/root/testdata/sf0.001"), "l_suppkey", 5)
      .collect()
    assert(hot.length == 5 && hot.head.getLong(1) >= hot.last.getLong(1))
  }

  test("bucketed tables join without a shuffle exchange") {
    val d = "/root/testdata/sf0.001"
    // spark.sql.warehouse.dir is static; tables land in ./spark-warehouse
    // (gitignored) and are dropped below.
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    graft.Tables.lineitem(spark, d).write.bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").mode("overwrite").saveAsTable("li_b")
    graft.Tables.orders(spark, d).write.bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").mode("overwrite").saveAsTable("ord_b")
    // co-located join: bucket pruning leaves NO Exchange in the plan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"expected shuffle-free co-located join, got:\n$physical")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
