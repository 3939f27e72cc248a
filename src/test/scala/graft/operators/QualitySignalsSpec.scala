package graft.operators

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** Edge semantics of the round-4/5 quality/embedding/segmentation
  * additions that the synthetic corpus cannot exercise: repetition
  * extremes, zero-vector quantization, chunk boundaries, tf·idf
  * ranking.
  */
class QualitySignalsSpec extends SparkSpec {
  import spark.implicits._

  test("boilerplateLines: recurring lines drop, order survives, unique lines stay") {
    // "footer" recurs in 3 of 4 docs (minDf=3); every content line unique;
    // doc 4 is boilerplate-only and must survive as an empty document
    val docs = Seq(
      (1L, "alpha one\nfooter\nalpha two"),
      (2L, "beta one\nfooter"),
      (3L, "footer\ngamma one\ngamma two"),
      (4L, "footer")
    ).toDF("doc_id", "text")
    val got = Dedup.boilerplateLines(docs, "text", "doc_id", minDf = 3)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 1L, "alpha one\nalpha two")))  // order kept
    assert(got(2L) == ((2L, 2L, 1L, "beta one")))
    assert(got(3L) == ((3L, 3L, 1L, "gamma one\ngamma two")))
    assert(got(4L) == ((4L, 1L, 1L, "")))                      // fully scrubbed
    // below threshold nothing drops and text round-trips byte-identical
    val loose = Dedup.boilerplateLines(docs, "text", "doc_id", minDf = 5)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r._4).toMap
    assert(loose(1L) == "alpha one\nfooter\nalpha two")
  }

  test("repetition: looping text scores high, unique text zero, short text safe") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),        // one distinct 2-gram
      (2L, "all tokens here are fully distinct"),   // no repeated n-gram
      (3L, "ab"),                                   // 1 token: no n-grams at all
      (4L, "")                                      // empty text
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetition(docs, "text", "doc_id")
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    // 6 tokens -> 5 bigrams, 1 distinct -> 0.8 dup fraction
    assert(got(1L)._3 == 0.8 && got(1L)._4 == 0.75)
    assert(got(2L)._3 == 0.0 && got(2L)._4 == 0.0)
    assert(got(3L)._3 == 0.0 && got(3L)._4 == 0.0)
    assert(got(4L)._3 == 0.0 && got(4L)._4 == 0.0)
  }

  test("redactPii: counts on raw text, ordered redaction, md5 receipt") {
    val docs = Seq(
      (1L, "mail me at bob.smith@corp-x.io now"),
      (2L, "call 555-0199 or 555-12345 maybe"),     // 2nd: 5 digits, \b fails
      (3L, "node 10.0.3.200 and 999.1.1.1 up"),     // 999 still 1-3 digits
      (4L, "a@1.2.3.4.com overlap"),                // email consumes the quad
      (5L, "")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.redactPii(docs, "text", "doc_id")
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 1 && got(1L)._5 == "mail me at <EMAIL> now".length)
    // "555-12345": no word boundary between the 4th and 5th digit
    assert(got(2L)._3 == 1 && got(2L)._5 == "call <PHONE> or 555-12345 maybe".length)
    assert(got(3L)._4 == 2, "dotted quads are syntactic: 999.1.1.1 counts")
    // counts are per-detector on the RAW text (the quad inside the
    // email counts), but redaction is ordered: email eats it first
    assert(got(4L)._2 == 1 && got(4L)._4 == 1
      && got(4L)._5 == "<EMAIL> overlap".length)
    assert(got(5L)._2 == 0 && got(5L)._5 == 0
      && got(5L)._6 == "d41d8cd98f00b204e9800998ecf8427e") // md5("")
  }

  test("entropy: hand-checked micro-nat sums, uniform/degenerate/empty docs") {
    val docs = Seq(
      (1L, "a a b"),     // p = (2/3, 1/3): terms -270310, -366204 micro-nats
      (2L, "a b c d"),   // uniform: 4 × round(1e6·(1/4)ln(1/4)) = 4 × -346574
      (3L, "x x x x"),   // single type: entropy exactly 0
      (4L, "")           // no tokens after cleaning: no row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.entropy(docs, "text", "doc_id")
      .as[(Long, Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 2L, 0.636514, 0.666667)))
    // micro-rounding contract: 1.386296, not ln(4) rounded (1.386294)
    assert(got(2L) == ((2L, 4L, 4L, 1.386296, 1.0)))
    assert(got(3L) == ((3L, 4L, 1L, 0.0, 0.25)))
    assert(!got.contains(4L))
  }

  test("crossDocNgrams: shared spans across docs, within-doc repeats count once") {
    val docs = Seq(
      (1L, "a b c d"),         // grams: "a b c", "b c d"
      (2L, "z a b c"),         // grams: "z a b", "a b c" (shared with 1 and 5)
      (3L, "p q r"),           // unique gram
      (4L, "a b"),             // too short: no grams, no row
      (5L, "a b c a b c")      // distinct grams: "a b c", "b c a", "c a b"
    ).toDF("doc_id", "text")
    val got = Dedup.crossDocNgrams(docs, "text", "doc_id")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 1L, 0.5)))
    assert(got(2L) == ((2L, 2L, 1L, 0.5)))
    assert(got(3L) == ((3L, 1L, 0L, 0.0)))
    assert(!got.contains(4L))
    // "a b c" appears twice in doc 5 but is ONE distinct gram; the
    // other two grams are unique to it
    assert(got(5L) == ((5L, 3L, 1L, 0.333333)))
  }

  test("quantizeInt8: zero vector yields scale 1, all-zero q, zero error") {
    val emb = Seq(
      (1L, Seq.fill(8)(0.0f)),
      (2L, Seq(1.0f, -0.5f, 0.25f, 0.0f, -1.0f, 0.5f, 0.75f, -0.25f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(emb)
      .selectExpr("vec_id", "scale", "q", "q_sum", "n_sat", "max_abs_err")
      .as[(Long, Double, Seq[Int], Long, Int, Double)].collect()
      .map(r => r._1 -> r).toMap
    val zero = got(1L)
    assert(zero._2 == 1.0 && zero._3.forall(_ == 0) && zero._4 == 0 &&
      zero._5 == 0 && zero._6 == 0.0)
    val v = got(2L)
    assert(v._2 == 1.0 / 127)
    // max-magnitude elements land exactly on ±127 (saturated, no clamping loss)
    assert(v._3.max == 127 && v._3.min == -127 && v._5 == 2)
    // reconstruction error bounded by scale/2 (round-to-nearest)
    assert(v._6 <= v._2 / 2 + 1e-12)
    // q_sum is the exact integer witness of the whole array
    assert(v._4 == v._3.map(_.toLong).sum)
  }

  test("chunk: overlap coverage, tail width, single-chunk and empty docs") {
    // 10 tokens a..j; chunkSize 4, stride 3 -> starts 0,3,6,9
    val text10 = "a b c d e f g h i j"
    val docs = Seq((1L, text10), (2L, "one"), (3L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.chunk(docs, "text", "doc_id", chunkSize = 4, stride = 3)
      .as[(Long, Long, Long, Long, String, String)].collect()
      .groupBy(_._1)
    val d1 = got(1L).sortBy(_._2).toSeq
    assert(d1.map(c => (c._2, c._3, c._4, c._5, c._6)) == Seq(
      (0L, 0L, 4L, "a", "d"), (1L, 3L, 4L, "d", "g"),
      (2L, 6L, 4L, "g", "j"), (3L, 9L, 1L, "j", "j")))
    // every token position is covered by at least one chunk
    val covered = d1.flatMap(c => c._3 until (c._3 + c._4)).toSet
    assert(covered == (0L until 10L).toSet)
    assert(got(2L).toSeq == Seq((2L, 0L, 0L, 1L, "one", "one")))
    assert(!got.contains(3L)) // empty text: no tokens, no chunks
  }

  test("emb_gram: exact integer gram matrix on a hand-checked corpus") {
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f, 0.5f)),
      (2L, Seq(-1.0f, 0.0f, 2.0f))
    ).toDF("vec_id", "embedding")
    // milli-units: v1 = (1000, 2000, 500), v2 = (-1000, 0, 2000);
    // the SAME operator the catalog query calls
    val g = Similarity.gramMatrix(emb)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(g((0L, 0L)) == 1000L * 1000 + 1000L * 1000)       // 2e6
    assert(g((0L, 1L)) == 1000L * 2000 + -1000L * 0)         // 2e6
    assert(g((0L, 2L)) == 1000L * 500 + -1000L * 2000)       // -1.5e6
    assert(g((1L, 2L)) == 2000L * 500 + 0L * 2000)           // 1e6
    assert(g((2L, 2L)) == 500L * 500 + 2000L * 2000)         // 4.25e6
    assert(g.size == 6) // upper triangle of a 3x3
  }

  test("chunk is stateless: the SAME code runs on a stream, batch-equal per row") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val out = TextAnalysis.chunk(in.toDF().toDF("doc_id", "text"),
      "text", "doc_id", chunkSize = 4, stride = 3)
    val q = out.writeStream.format("memory").queryName("chunks_s")
      .outputMode("append").start()
    try {
      in.addData((1L, "a b c d e f g h i j"))
      q.processAllAvailable()
      in.addData((2L, "k l m"))
      q.processAllAvailable()
      val got = spark.table("chunks_s")
        .as[(Long, Long, Long, Long, String, String)].collect().sortBy(r => (r._1, r._2))
      val want = TextAnalysis.chunk(
        Seq((1L, "a b c d e f g h i j"), (2L, "k l m")).toDF("doc_id", "text"),
        "text", "doc_id", chunkSize = 4, stride = 3)
        .as[(Long, Long, Long, Long, String, String)].collect().sortBy(r => (r._1, r._2))
      assert(got.toSeq == want.toSeq)
    } finally q.stop()
  }

  test("tfidf: corpus-wide terms score zero, rare terms rank first") {
    // 'common' in all 4 docs -> idf ln(1) = 0; each doc's unique term
    // has df 1 -> idf ln(4), the top term
    val docs = Seq(
      (1L, "common alpha alpha"), (2L, "common bravo"),
      (3L, "common charlie"), (4L, "common delta")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tfidfTopTerms(docs, "text", "doc_id", k = 2)
      .as[(Long, Long, String, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    assert(got(1L).head._3 == "alpha" &&
      got(1L).head._6 == BigDecimal(2 * math.log(4.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    Seq(2L, 3L, 4L).foreach { d =>
      assert(got(d).head._4 == 1L && got(d).head._5 == 1L) // rare term first
      assert(got(d)(1)._3 == "common" && got(d)(1)._6 == 0.0)
    }
  }

  /** Driver-side stupid-backoff reference: the same four-level case
    * analysis and the same micro-nat rounding as the operator. */
  private def refBackoff(train: Seq[Seq[String]], doc: Seq[String])
      : (Long, Long, Long, Long, Long, Double) = {
    val c1 = train.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c2 = train.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c3 = train.flatMap(t => t.lazyZip(t.drop(1)).lazyZip(t.drop(2)).toSeq)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = c1.values.sum
    val scored = doc.lazyZip(doc.drop(1)).lazyZip(doc.drop(2)).toSeq.map {
      case (w1, w2, w3) =>
        if (c3.contains((w1, w2, w3)))
          (0, math.round(1e6 * math.log(c2((w1, w2)).toDouble / c3((w1, w2, w3)))))
        else if (c2.contains((w2, w3)))
          (1, math.round(1e6 * math.log(2.5 * c1(w2) / c2((w2, w3)))))
        else if (c1.contains(w3))
          (2, math.round(1e6 * math.log(6.25 * n / c1(w3))))
        else (3, math.round(1e6 * math.log(6.25 * n)))
    }
    val sm = scored.map(_._2).sum
    def lvl(k: Int) = scored.count(_._1 == k).toLong
    (scored.size.toLong, lvl(0), lvl(1), lvl(2), lvl(3),
      BigDecimal(sm / (scored.size * 1e6))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("backoffXent: all four backoff levels fire and match the reference") {
    val t0 = "the cat sat on the mat"
    val t2 = "the dog sat on the log"
    val s1 = "the cat sat on the log zebra" // l0 ×4, then (the,log,zebra)→OOV
    val s3 = "mat the cat likes dog"        // l1, OOV, l2
    val docs = Seq((0L, t0), (1L, s1), (2L, t2), (3L, s3)).toDF("doc_id", "text")
    val got = TextAnalysis.backoffXent(docs, "text", "doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    val train = Seq(t0, t2).map(_.split(" ").toSeq)
    assert(got.keySet == Set(1L, 3L)) // train docs are not scored
    assert(got(1L) == refBackoff(train, s1.split(" ").toSeq))
    assert(got(3L) == refBackoff(train, s3.split(" ").toSeq))
    // the fixture exercises every level at least once across the docs
    val sums = got.values.toSeq
    assert(sums.map(_._2).sum > 0 && sums.map(_._3).sum > 0 &&
      sums.map(_._4).sum > 0 && sums.map(_._5).sum > 0)
    // a scored doc with < 3 tokens yields no row
    val tiny = Seq((0L, t0), (1L, "two words")).toDF("doc_id", "text")
    assert(TextAnalysis.backoffXent(tiny, "text", "doc_id").isEmpty)
    // the distinct-trigram LUT path (dedupKeys, off by default) is
    // value-identical to the direct chain
    val model = TextAnalysis.trainBackoff(
      docs.filter($"doc_id" % 2 === 0), "text", "doc_id")
    val scored = docs.filter($"doc_id" % 2 === 1)
    val direct = TextAnalysis.scoreBackoff(model, scored, "text", "doc_id")
      .collect().map(_.toSeq).toSet
    val viaLut = TextAnalysis.scoreBackoff(model, scored, "text", "doc_id",
      dedupKeys = true).collect().map(_.toSeq).toSet
    assert(viaLut == direct)
  }

  test("backoffXent: randomized corpora match the reference (both paths)") {
    // the BpeSpec discipline: seeded random word-soup corpora with a
    // small vocabulary (repeated trigrams, high-dup docs, skewed
    // lengths) pinned against the independent driver reference —
    // join-path edge cases a hand fixture cannot enumerate
    val rnd = new scala.util.Random(1234)
    for (trial <- 1 to 3) {
      // letters only: the shared tokenizer strips digits, which would
      // collapse a w0/w1/... vocabulary into one token
      val vocab = (0 until 6 + trial * 3).map(i => s"w${('a' + i).toChar}")
      def doc(): String =
        Seq.fill(3 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      val docs = (0L until 40L).map(i => (i, doc()))
      val df = docs.toDF("doc_id", "text")
      val got = TextAnalysis.backoffXent(df, "text", "doc_id")
        .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
      val train = docs.filter(_._1 % 2 == 0).map(_._2.split(" ").toSeq)
      val want = docs.filter(d => d._1 % 2 == 1 && d._2.split(" ").length >= 3)
        .map(d => d._1 -> refBackoff(train, d._2.split(" ").toSeq)).toMap
      assert(got == want, s"trial $trial diverged from the reference")
      // LUT path identical on the same random corpus
      val model = TextAnalysis.trainBackoff(
        df.filter($"doc_id" % 2 === 0), "text", "doc_id")
      val lut = TextAnalysis.scoreBackoff(model,
          df.filter($"doc_id" % 2 === 1), "text", "doc_id", dedupKeys = true)
        .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
      assert(lut == want, s"trial $trial LUT path diverged")
    }
  }

  /** Reference PMI collocations: same tokenizer, same micro-nat
    * rounding, same (pmi desc, p, q) total order. */
  private def refColloc(docs: Seq[(Long, String)], minCount: Int,
                        topK: Int): Seq[(String, String, Long, Long, Long, Long)] = {
    def tok(t: String): Seq[String] =
      t.toLowerCase.replaceAll("[^a-z \n]+", "").replaceAll("\\s+", " ")
        .trim.split(" ").filter(_.nonEmpty).toSeq
    val toks = docs.map(d => tok(d._2))
    val uni = toks.flatten.groupBy(identity).map { case (w, xs) => (w, xs.size.toLong) }
    val n = uni.values.sum
    toks.flatMap(ts => ts.zip(ts.drop(1)))
      .groupBy(identity).map { case (pq, xs) => (pq, xs.size.toLong) }
      .filter(_._2 >= minCount).toSeq
      .map { case ((p, q), c2) =>
        val pm = BigDecimal(1000000.0 *
            math.log((n * c2).toDouble / (uni(p) * uni(q))))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        (p, q, c2, uni(p), uni(q), pm)
      }.sortBy(t => (-t._6, t._1, t._2)).take(topK)
  }

  test("collocations: a planted phrase tops the PMI list; full match vs reference") {
    // "alpha beta": perfectly associated AND the rarest pair above
    // minCount — PMI's favorite. "common common" is equally perfectly
    // adjacent but its tokens are 2× as frequent (PMI ln(N/32) vs
    // ln(N/8)); per-doc unique w$i pairs fall below minCount
    val docs = (0 until 8).map { i =>
      (i.toLong, s"the w$i alpha beta the w$i common common")
    }
    val got = TextAnalysis.collocations(docs.toDF("doc_id", "text"),
        "text", "doc_id", minCount = 5, topK = 10)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    val want = refColloc(docs, 5, 10)
    assert(got == want)
    assert(got.head._1 == "alpha" && got.head._2 == "beta",
      s"planted collocation must rank first: ${got.head}")
    // the equally-adjacent but more frequent pair ranks strictly below
    assert(got.indexWhere(r => r._1 == "common" && r._2 == "common") > 0)
  }

  test("collocations: randomized corpora match the reference end-to-end") {
    val rnd = new scala.util.Random(2213)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    (1 to 3).foreach { trial =>
      val docs = (0 until 12).map { i =>
        (i.toLong, (0 until 6 + rnd.nextInt(20))
          .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = TextAnalysis.collocations(docs.toDF("doc_id", "text"),
          "text", "doc_id", minCount = 2, topK = 15)
        .as[(String, String, Long, Long, Long, Long)].collect().toSeq
      assert(got == refColloc(docs, 2, 15), s"trial $trial diverged")
    }
  }
}
