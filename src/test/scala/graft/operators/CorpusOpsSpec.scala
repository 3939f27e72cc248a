package graft.operators

import graft.streaming.SparkSpec

/** Edge semantics of the round-6 corpus operators: directional
  * containment (the asymmetry Jaccard can't express), bucketed
  * prefix-Levenshtein (blocking + distance cap), unigram
  * cross-entropy (micro-nat arithmetic), and per-dimension
  * standardization (exact moments).
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("containmentPairs: direction matters — contained doc scores 1, container does not") {
    val docs = Seq(
      (1L, "a b c d e f g h"),                 // 8 toks -> 1 shingle, subset of doc 2
      (2L, "a b c d e f g h i j"),             // 10 toks -> 3 shingles
      (3L, "z y x w v u t s")                  // unrelated
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "text", "doc_id")
      .as[(Long, Long, Long, Double)].collect().toSet
    // C(1->2) = 1/1 = 1.0 passes; C(2->1) = 1/3 < 0.5 does not
    assert(got == Set((1L, 2L, 1L, 1.0)))
  }

  test("containmentPairs: the df cap drops boilerplate shingles from both sides") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h i j")
    ).toDF("doc_id", "text")
    // shared shingle has df = 2 > maxDf = 1 -> no kept shingles, no pairs
    val got = Dedup.containmentPairs(docs, "text", "doc_id", maxDf = 1)
    assert(got.count() == 0)
  }

  test("editDistancePairs: blocked pairs meet, distance caps and blocks exclude") {
    val docs = Seq(
      (1L, "hello world foo bar"),
      (2L, "hello world foo baz"),             // same block, dist 1
      (3L, "differs world foo bar"),           // first token differs -> unblocked
      (4L, "hello " + Seq.fill(20)("pad").mkString(" ")), // length bucket 1
      (5L, "hello aaaaaaaaaa bbbbbbbbbb cccc") // same block, dist > 12
    ).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, "text", "doc_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((2L, 1L, 1L)))
  }

  test("editDistancePairs: an over-capacity block drops entirely") {
    val docs = Seq(
      (1L, "same text here one"),
      (2L, "same text here two"),
      (3L, "same text here tri")
    ).toDF("doc_id", "text")
    // block of 3 > maxBlock = 2 -> no pairs from it
    assert(Dedup.editDistancePairs(docs, "text", "doc_id", maxBlock = 2)
      .count() == 0)
    // at the default cap all three pairs emit
    assert(Dedup.editDistancePairs(docs, "text", "doc_id").count() == 3)
  }

  test("urlDedup: case/query/fragment/slash variants collapse, paths stay distinct") {
    val urls = Seq(
      (5L, "HTTPS://WWW.Example.COM/Docs/Intro?utm_source=a#top"),
      (3L, "https://www.example.com/Docs/Intro/"),
      (7L, "https://www.example.com/Docs/Intro"),
      (2L, "https://www.example.com/docs/intro"),   // path case differs -> distinct
      (9L, "http://other.net")                      // no path at all
    ).toDF("doc_id", "url")
    val got = Dedup.urlDedup(urls, "url", "doc_id")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("https://www.example.com/Docs/Intro") == (("https://www.example.com/Docs/Intro", 3L, 3L, 3L)))
    assert(got("https://www.example.com/docs/intro")._3 == 1L)
    assert(got("http://other.net") == (("http://other.net", 9L, 1L, 1L)))
    assert(got.size == 3)
  }

  test("urlDedup: malformed/schemeless rows pass through as their own keys (ADVICE r6)") {
    val urls = Seq(
      (1L, "not a url at all"),
      (2L, "ftp://files.example.com/a"),          // non-http scheme -> pass-through
      (3L, "example.com/schemeless"),
      (4L, "https://ok.example.com/x"),
      (5L, "HTTPS://OK.Example.COM/x?utm=1")
    ).toDF("doc_id", "url")
    val got = Dedup.urlDedup(urls, "url", "doc_id")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // the three malformed rows each keep their ORIGINAL string as the
    // canon key — no shared '' group, no cross-row keeper election
    assert(got.size == 4)
    assert(got("not a url at all")._2 == 1L && got("not a url at all")._3 == 1L)
    assert(got("ftp://files.example.com/a")._2 == 2L)
    assert(got("example.com/schemeless")._2 == 3L)
    assert(got("https://ok.example.com/x") == (("https://ok.example.com/x", 4L, 2L, 2L)))
  }

  test("standardize: zero-variance dimension yields NULL z by contract (ADVICE r6)") {
    val emb = Seq(
      (1L, Seq(1.0f, 5.0f)),
      (2L, Seq(3.0f, 5.0f))                       // dim 1 constant
    ).toDF("vec_id", "embedding")
    val rows = Similarity.standardize(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(rows((1L, 0L)) == Some(-1.0) && rows((2L, 0L)) == Some(1.0))
    assert(rows((1L, 1L)).isEmpty && rows((2L, 1L)).isEmpty)
  }

  test("unigramXent: corpus-frequency surprisal in exact micro-nats") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    // N = 5; c(a) = 2, c(b) = 2, c(c) = 1
    val sa = math.round(1e6 * math.log(5.0 / 2))  // a and b
    val sc = math.round(1e6 * math.log(5.0 / 1))
    val got = TextAnalysis.unigramXent(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 3L &&
      got(1L)._3 == Dedup.round6((3 * sa) / 3000000.0))
    assert(got(2L)._2 == 2L &&
      got(2L)._3 == Dedup.round6((sa + sc) / 2000000.0))
  }

  test("duplicatedSpans: cross-doc and intra-doc runs emit, singletons and unique text do not") {
    val docs = Seq(
      (1L, "p q r s t u"),                    // shares "p q r s" with doc 2
      (2L, "x p q r s y"),
      (3L, "a b a b a b"),                    // intra-doc loop: every gram x2
      (4L, "unique tokens only here now"),    // nothing duplicated
      (5L, "z1 q r s z2")                     // one duplicated gram < minRun
    ).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, "text", "doc_id")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 0L, 2L, 4L),                       // "p q r","q r s" at pos 0,1
      (2L, 1L, 2L, 4L),                       // same grams at pos 1,2
      (3L, 0L, 4L, 6L)))                      // all 4 grams duplicated
  }

  test("scrubSpans: covered tokens removed, untouched docs keep their full fingerprint") {
    def fp(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val docs = Seq(
      (1L, "p q r s t u"),                    // span covers tokens 0..3 ("p q r s")
      (2L, "x p q r s y"),                    // span covers tokens 1..4
      (3L, "a b a b a b"),                    // run of 4 grams covers ALL 6 tokens
      (4L, "unique tokens only here now")     // untouched
    ).toDF("doc_id", "text")
    val got = Dedup.scrubSpans(docs, "text", "doc_id")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 6L, 4L, fp("t u"))))
    assert(got(2L) == ((2L, 6L, 4L, fp("x y"))))
    assert(got(3L) == ((3L, 6L, 6L, fp(""))))
    assert(got(4L) == ((4L, 5L, 0L, fp("unique tokens only here now"))))
  }

  test("bigramXent: conditional surprisal in exact micro-nats; 1-token docs drop") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x")).toDF("doc_id", "text")
    // bigram counts: (a,b)=3, (b,a)=1, (b,c)=1 → cp(a)=3, cp(b)=2
    val sAb = math.round(1e6 * math.log(3.0 / 3))   // = 0
    val sBa = math.round(1e6 * math.log(2.0 / 1))
    val sBc = math.round(1e6 * math.log(2.0 / 1))
    val got = TextAnalysis.bigramXent(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 3L &&
      got(1L)._3 == Dedup.round6((2 * sAb + sBa) / 3000000.0))
    assert(got(2L)._2 == 2L &&
      got(2L)._3 == Dedup.round6((sAb + sBc) / 2000000.0))
    assert(!got.contains(3L))                       // no bigram to score
  }

  test("bigCorpus materialization gate: both sides produce identical results; " +
    "gate-on plans read checkpointed model tables (VERDICT r14 #6)") {
    val docs = Seq((1L, "a a b c d"), (2L, "b c d e"), (3L, "a d e f g a b"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    def checkpointed(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.LogicalRDD => r
      }.nonEmpty
    // gate OFF (default threshold far above any fixture): fused lazy
    // shape, no checkpoint node anywhere
    assert(!TextAnalysis.bigCorpus(docs))
    val offU = TextAnalysis.unigramXent(docs, "text", "doc_id")
    val offB = TextAnalysis.bigramXent(docs, "text", "doc_id")
    val offC = TextAnalysis.collocations(docs, "text", "doc_id", minCount = 1)
    assert(!checkpointed(offU) && !checkpointed(offB) && !checkpointed(offC))
    val (ru, rb, rc) = (rows(offU), rows(offB), rows(offC))
    // gate ON (threshold 0): identical rows, model tables materialized
    spark.conf.set("graft.materializeTrainBytes", "0")
    try {
      assert(TextAnalysis.bigCorpus(docs))
      val onU = TextAnalysis.unigramXent(docs, "text", "doc_id")
      val onB = TextAnalysis.bigramXent(docs, "text", "doc_id")
      val onC = TextAnalysis.collocations(docs, "text", "doc_id", minCount = 1)
      assert(checkpointed(onU) && checkpointed(onB) && checkpointed(onC))
      assert(rows(onU) == ru && rows(onB) == rb && rows(onC) == rc)
      // the trainBackoff gate rides the same helper: gate-on scoring
      // equals the gate-off fixture values pinned in TextStreamSpec
      val m = TextAnalysis.trainBackoff(docs, "text", "doc_id")
      val scoredOn = rows(TextAnalysis.scoreBackoff(m, docs, "text", "doc_id"))
      spark.conf.unset("graft.materializeTrainBytes")
      val mOff = TextAnalysis.trainBackoff(docs, "text", "doc_id")
      assert(rows(TextAnalysis.scoreBackoff(mOff, docs, "text", "doc_id"))
        == scoredOn)
    } finally spark.conf.unset("graft.materializeTrainBytes")
  }

  test("knnGraph: in-cluster neighbors ranked by cosine, singleton clusters emit nothing") {
    val assigned = Seq(
      (1L, 0L, Seq(1.0f, 0.0f)),
      (2L, 0L, Seq(1.0f, 0.0f)),
      (3L, 0L, Seq(0.0f, 1.0f)),
      (4L, 1L, Seq(1.0f, 1.0f))                 // alone in its cluster
    ).toDF("vec_id", "cent_id", "embedding")
    val got = Similarity.knnGraph(assigned, k = 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got.filter(_._1 == 1L) == Set((1L, 2L, 1.0, 1), (1L, 3L, 0.0, 2)))
    assert(!got.exists(_._1 == 4L))             // no cross-cluster edges
    assert(got.size == 6)                       // 3 vectors x 2 neighbors
  }

  test("randomProject: exact signed micro-unit sums, short vectors null out") {
    val emb = Seq(
      (1L, Seq(1.0f, -0.5f)),
      (2L, Seq(0.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.randomProject(emb, outDims = 3, dim = 2)
      .as[(Long, Long, Long)].collect().toSet
    // driver replica over the same sign family (rows 16..18)
    val want = (for {
      (id, xs) <- Seq(1L -> Seq(1.0, -0.5), 2L -> Seq(0.0, 2.0))
      j <- 0 until 3
    } yield {
      val y = xs.zipWithIndex.map { case (x, d) =>
        Similarity.hyperplaneSign(16 + j, d) * math.round(x * 1e6)
      }.sum
      (id, j.toLong, y)
    }).toSet
    assert(got == want)
    // a vector shorter than dim yields NO rows (null array -> no posexplode)
    val short = Seq((9L, Seq(1.0f))).toDF("vec_id", "embedding")
    assert(Similarity.randomProject(short, outDims = 3, dim = 2).count() == 0)
  }

  test("pcaPowerProject: dominant direction extracted exactly on a rank-1 corpus") {
    // all vectors along (3,4): direction converges to (0.75, 1.0) in
    // micro-units after one normalized step; projections are exact
    // integer dot products xm · vm
    val emb = Seq(
      (1L, Seq(3.0f, 4.0f)), (2L, Seq(6.0f, 8.0f)), (3L, Seq(-3.0f, -4.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.pcaPowerProject(emb, dim = 2)
      .as[(Long, Long)].collect().toMap
    // vm = (750000, 1000000); proj(3,4) = 3e6*750000 + 4e6*1e6
    assert(got(1L) == 6250000000000L)
    assert(got(2L) == 12500000000000L)
    assert(got(3L) == -6250000000000L)
  }

  test("standardize: hand-checked z-scores per dimension") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(3.0f, 4.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.standardize(emb)
      .as[(Long, Long, Double)].collect().toSet
    // dim 0: mean 2, std 1 -> z = -1, 1; dim 1: mean 2, std 2 -> z = -1, 1
    assert(got == Set((1L, 0L, -1.0), (2L, 0L, 1.0),
      (1L, 1L, -1.0), (2L, 1L, 1.0)))
  }

  test("centroidOutliers: the planted far vector tops, distance exact") {
    // 4 vectors at the corners of a tight cluster + one far point:
    // centroid of dim0 = (0+0+0+0+10)/5 = 2 → far point dist² =
    // (10−2)² + (5−1)² = 80; cluster points (0−2)² + (...)²
    val emb = Seq(
      (1L, Seq(0.0f, 1.0f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.0f, 1.0f)),
      (9L, Seq(10.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.centroidOutliers(emb, topK = 2)
      .as[(Long, Double)].collect().toSeq
    // mean = (2, 1.8); far: sqrt(64 + 10.24) = 8.616264; cluster:
    // sqrt(4 + 0.64) = 2.154066 — ties at the cut break by vec_id
    assert(got == Seq((9L, 8.616264), (1L, 2.154066)), s"got $got")
  }

  test("hashedFeatures: signed counts accumulate per bucket, zero cells drop") {
    val docs = Seq(
      (1L, "alpha alpha beta"),  // alpha hits its bucket twice
      (2L, "alpha")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.hashedFeatures(docs, "text", "doc_id", dim = 16)
      .as[(Long, Long, Long)].collect().toSet
    // independent reference: same md5-based idx/sign over the tokens
    def h(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    def f(tok: String): (Long, Long) = (h(tok) % 16, if ((h(tok) / 16) % 2 == 0) 1L else -1L)
    val want = Seq(1L -> Seq("alpha", "alpha", "beta"), 2L -> Seq("alpha"))
      .flatMap { case (id, toks) =>
        toks.map(f).groupBy(_._1).map { case (idx, xs) => (id, idx, xs.map(_._2).sum) }
      }.filter(_._3 != 0L).toSet
    assert(got == want, s"got $got want $want")
    // two same-sign 'alpha' hits accumulate to |w| = 2 on doc 1
    val (ai, as) = f("alpha")
    assert(got.contains((1L, ai, 2 * as)) || f("beta")._1 == ai,
      "alpha bucket should carry weight 2 unless beta collided")
  }

  test("bm25Rank: independent scoring reference; zero-hit docs absent; rank total-ordered") {
    val docs = Seq(
      (1L, "stream join stream"),
      (2L, "window filter filter sort"),
      (3L, "sort merge scan"), // no query term: excluded
      (4L, "join")
    ).toDF("doc_id", "text")
    val q = Seq("stream", "join", "window", "filter")
    // independent reference: same formula, plain per-doc maps
    val corpus = Map(1L -> Seq("stream", "join", "stream"),
      (2L, Seq("window", "filter", "filter", "sort")),
      (3L, Seq("sort", "merge", "scan")), (4L, Seq("join")))
    val n = corpus.size
    val avgdl = corpus.values.map(_.size).sum.toDouble / n
    val dfm = q.map(t => t -> corpus.values.count(_.contains(t))).toMap
    def micro(tf: Long, df: Long, dl: Long): Long = {
      val idf = math.log(1.0 + ((n - df).toDouble + 0.5) / (df.toDouble + 0.5))
      val tfp = (tf.toDouble * (1.2 + 1.0)) /
        (tf.toDouble + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl)))
      new java.math.BigDecimal(1000000 * (idf * tfp))
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    }
    val want = corpus.flatMap { case (id, toks) =>
      val s = q.map { t =>
        val tf = toks.count(_ == t).toLong
        if (tf > 0) micro(tf, dfm(t).toLong, toks.size.toLong) else 0L
      }.sum
      if (s > 0) Some(id -> s) else None
    }.toSeq.sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, s), i) => (id, i + 1L, s) }
    val got = TextAnalysis.bm25Rank(docs, "text", "doc_id", q)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == want, s"got $got want $want")
    assert(!got.exists(_._1 == 3L))
  }
}
