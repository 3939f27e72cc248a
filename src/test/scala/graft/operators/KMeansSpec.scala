package graft.operators

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** Seeded k-means centroid training: deterministic across runs and
  * partition layouts (the cross-engine-parity property the ann_ivf
  * oracle depends on), micro-unit means, empty-cluster carry-over.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, dim: Int = 64) =
    spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        d => ((pmod(xxhash64(col("id") * lit(1000) + d), lit(2000)) - 1000) / 1000.0)
          .cast("float")).as("embedding"))

  test("centroids are identical across partition layouts") {
    val base = corpus(200)
    val a = Similarity.kmeansCentroids(base, nCentroids = 8)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val b = Similarity.kmeansCentroids(base.repartition(13), nCentroids = 8)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(a.length == 8)
    assert(a.toSeq == b.toSeq) // bit-identical: integer micro-unit means
  }

  test("micro-unit means match a driver-side replica on a tiny corpus") {
    val tiny = corpus(12)
    val cents = Similarity.kmeansCentroids(tiny, nCentroids = 2, iters = 1)
      .as[(Long, Seq[Double])].collect().toMap
    // replicate: same init (md5-smallest), one assignment by rounded
    // double cosine w/ cent-id tiebreak, micro-unit mean rounded to 6
    val vecs = tiny.as[(Long, Seq[Float])].collect().toMap
      .map { case (k, v) => k -> v.map(_.toDouble) }
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val init = vecs.keys.toSeq.sortBy(id => (md5hex(s"km_$id"), id)).take(2)
    val cent0 = init.zipWithIndex.map { case (id, i) => i.toLong -> vecs(id) }.toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val r = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val assigned = vecs.toSeq.map { case (id, v) =>
      val best = cent0.toSeq.map { case (c, ce) => (c, cos(v, ce)) }
        .maxBy { case (c, s) => (s, -c) }._1
      (best, v)
    }
    val expect = assigned.groupBy(_._1).map { case (c, rows) =>
      val n = rows.size
      c -> (0 until 64).map { d =>
        val sv = rows.map(r => math.round(r._2(d) * 1e6)).sum
        BigDecimal(sv / (n * 1e6)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }
    expect.foreach { case (c, e) =>
      assert(cents(c).zip(e).forall { case (x, y) => math.abs(x - y) < 1e-9 },
        s"centroid $c drifted from the replica")
    }
  }

  test("a centroid that captures no vectors keeps its previous value") {
    // 3 centroids over a 3-vector corpus where two vectors coincide:
    // at most 2 distinct assignment targets, so >=1 centroid starves
    val docs = Seq(
      (0L, Seq.fill(64)(1.0f)),
      (1L, Seq.fill(64)(1.0f)),
      (2L, (Seq.fill(32)(1.0f) ++ Seq.fill(32)(-1.0f)))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(docs, nCentroids = 3)
      .as[(Long, Seq[Double])].collect()
    assert(cents.length == 3) // starved centroid carried, not dropped
    assert(cents.forall(_._2.length == 64))
  }

  test("semanticDedup: in-cluster near-dups drop to min id, clusters block pairs") {
    // hand-built assignment: cluster blocking must prevent the
    // identical v1/v50 pair (different clusters) from ever forming
    val assigned = Seq(
      (1L, 0L, Seq(1f, 0f)),      // kept (min id of its near-dup set)
      (2L, 0L, Seq(0.99f, 0.01f)),// dup of 1 (cos ~ 1)
      (3L, 0L, Seq(-1f, 0.05f)),  // kept (cos < 0 to both)
      (50L, 1L, Seq(1f, 0f)),     // identical to v1 but other cluster: kept
      (60L, 1L, Seq(0.5f, 0.5f))  // cos(v50, v60) = .707 >= .3 -> dup
    ).toDF("vec_id", "cent_id", "embedding")
    val got = Similarity.semanticDedup(assigned, threshold = 0.3)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == Map(1L -> (0L, true), 2L -> (0L, false), 3L -> (0L, true),
      50L -> (1L, true), 60L -> (1L, false)))
  }

  test("PQ: codebooks deterministic across layouts; ksub-point corpus encodes exactly") {
    val base = corpus(100)
    val a = Similarity.pqTrain(base)
    val b = Similarity.pqTrain(base.repartition(7))
    assert(a == b) // pure integer training: bit-identical
    assert(a.size == 8 * 16 && a.forall(_._3.length == 8))
    // a corpus of exactly ksub vectors seeds every vector as its own
    // subspace centroid; one-member means reproduce it — every vector
    // must encode with ZERO micro-unit reconstruction error
    val tiny = corpus(16)
    val codes = Similarity.pqAssign(tiny, Similarity.pqTrain(tiny))
    val got = codes.selectExpr("vec_id", "err_micro2",
        "least(c0,c1,c2,c3,c4,c5,c6,c7)", "greatest(c0,c1,c2,c3,c4,c5,c6,c7)")
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length == 16)
    assert(got.forall(_._2 == 0L), "self-codebook must reconstruct exactly")
    assert(got.forall(r => r._3 >= 0 && r._4 <= 15), "codes out of [0, ksub)")
  }

  test("PQ: trainSample trains on the deterministic md5 half, layout-stable") {
    val base = corpus(200)
    val a = Similarity.pqTrain(base, trainSample = Some(0.5))
    val b = Similarity.pqTrain(base.repartition(11), trainSample = Some(0.5))
    assert(a == b) // sampled training stays bit-identical across layouts
    // the sample IS Sampling.hashSample: pre-filtering the corpus with
    // the same predicate must yield identical codebooks (the oracle
    // relies on exactly this equivalence)
    val pre = Sampling.hashSample(base, "vec_id", 0.5)
    assert(Similarity.pqTrain(pre) == a)
    // and it genuinely bounds the training set
    val n = pre.count()
    assert(n > 50 && n < 150, s"half-sample of 200 out of range: $n")
    assert(a != Similarity.pqTrain(base), "sampled training should differ from full")
  }

  test("ivfPqSearch: equals the ADC replica restricted to the probed lists") {
    val base = corpus(80)
    val books = Similarity.pqTrain(base)
    val centVals = Similarity.kmeansTrain(base, nCentroids = 8)
    val cents = broadcast(Similarity.centroidsDf(spark, centVals))
    val index = Similarity.ivfPqIndex(base, cents, books)
    val got = Similarity.ivfPqSearch(index, cents, books,
        base.filter(col("vec_id") < 3), k = 5, nProbe = 2)
      .as[(Long, Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap
    // replica: probe lists by rounded double cosine vs the driver-held
    // centroids (cent-id tiebreak), then the integer ADC ranking of
    // pqSearch's replica over ONLY those lists' members
    def micro(x: Double): Long =
      BigDecimal(x * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val vecsD = base.as[(Long, Seq[Float])].collect().toMap
      .map { case (k, v) => k -> v.map(_.toDouble) }
    val vecsM = vecsD.map { case (k, v) => k -> v.map(micro) }
    val codes = index.selectExpr("vec_id", "array(c0,c1,c2,c3,c4,c5,c6,c7)")
      .as[(Long, Seq[Long])].collect().toMap
    val lists = index.selectExpr("vec_id", "cent_id").as[(Long, Long)].collect().toMap
    val bookMap = books.map { case (s, c, emb) => (s, c) -> emb }.toMap
    def cosR(a: Seq[Double], b: Seq[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val r = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def adist(q: Long, v: Long): Long = (0 until 8).map { j =>
      val qs = vecsM(q).slice(j * 8, j * 8 + 8)
      val cv = bookMap((j, codes(v)(j)))
      qs.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sum
    (0L until 3L).foreach { q =>
      val probed = centVals.map { case (c, ce) => (c, cosR(vecsD(q), ce)) }
        .sortBy { case (c, s) => (-s, c) }.take(2).map(_._1).toSet
      val want = vecsD.keys.filter(v => v != q && probed(lists(v))).toSeq
        .map(v => (v, adist(q, v))).sortBy { case (v, d) => (d, v) }.take(5)
      assert(got(q) == want, s"query $q IVFPQ ranking diverged from the replica")
    }
  }

  test("pqSearch: ADC ranking matches a driver-side integer replica") {
    val base = corpus(60)
    val books = Similarity.pqTrain(base)
    val enc = Similarity.pqAssign(base, books)
    val got = Similarity.pqSearch(enc, books, base.filter(col("vec_id") < 3), k = 5)
      .as[(Long, Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap
    // driver replica: micro-quantize each vector (HALF_UP, the round()
    // twin), look its stored code's centroid up per subspace, rank by
    // (integer LUT-sum asc, vec_id asc)
    def micro(x: Double): Long =
      BigDecimal(x * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val vecs = base.as[(Long, Seq[Float])].collect().toMap
      .map { case (k, v) => k -> v.map(x => micro(x.toDouble)) }
    val codes = enc.selectExpr("vec_id", "array(c0,c1,c2,c3,c4,c5,c6,c7)")
      .as[(Long, Seq[Long])].collect().toMap
    val bookMap = books.map { case (s, c, emb) => (s, c) -> emb }.toMap
    def adist(q: Long, v: Long): Long = (0 until 8).map { j =>
      val qs = vecs(q).slice(j * 8, j * 8 + 8)
      val cv = bookMap((j, codes(v)(j)))
      qs.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sum
    (0L until 3L).foreach { q =>
      val want = vecs.keys.filter(_ != q).toSeq
        .map(v => (v, adist(q, v))).sortBy { case (v, d) => (d, v) }.take(5)
      assert(got(q) == want, s"query $q ADC ranking diverged from the replica")
    }
  }
}
