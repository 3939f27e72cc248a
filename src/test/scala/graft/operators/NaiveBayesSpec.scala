package graft.operators

import scala.util.Random

import graft.streaming.SparkSpec

/** Multinomial Naive Bayes train/score ([[TextAnalysis.trainNaiveBayes]]
  * / [[TextAnalysis.scoreNaiveBayes]]): every assertion compares the
  * distributed result against an INDEPENDENT plain-collections
  * reference implementation (same tokenizer, same micro-nat rounding),
  * plus the contract edges the synthetic corpus cannot exercise —
  * zero-token documents, out-of-vocabulary smoothing, exact-integer
  * tie-breaks, and the degenerate-train guards.
  */
class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private def tok(text: String): Seq[String] =
    text.toLowerCase.replaceAll("[^a-z \n]+", "").replaceAll("\\s+", " ")
      .trim.split(" ").filter(_.nonEmpty).toSeq

  private def micro(x: Double): Long =
    BigDecimal(1000000.0 * math.log(x))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** Independent reference: add-one-smoothed multinomial NB with
    * per-term micro-nat rounding and (score, label) argmin. */
  private def refNb(train: Seq[(Long, String, String)],
                    score: Seq[(Long, String, String)]): Map[Long, (String, String, Long, Long, Long)] = {
    val occ = train.flatMap { case (_, lab, t) => tok(t).map(lab -> _) }
    val nd = train.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tc = occ.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val c = occ.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val v = occ.map(_._2).distinct.size.toLong
    val labels = nd.keySet.toSeq.sorted
    val n = nd.values.sum
    score.map { case (id, actual, t) =>
      val toks = tok(t)
      val scores = labels.map { l =>
        val prior = micro(n.toDouble / nd(l))
        val s = prior + toks.map { w =>
          micro((tc.getOrElse(l, 0L) + v).toDouble / (c.getOrElse((l, w), 0L) + 1L))
        }.sum
        (s, l)
      }
      val (s, lab) = scores.min
      id -> (actual, lab, if (lab == actual) 1L else 0L, toks.size.toLong, s)
    }.toMap
  }

  private def runNb(train: Seq[(Long, String, String)],
                    score: Seq[(Long, String, String)]): Map[Long, (String, String, Long, Long, Long)] = {
    val m = TextAnalysis.trainNaiveBayes(
      train.toDF("doc_id", "lab", "text"), "text", "lab", "doc_id")
    TextAnalysis.scoreNaiveBayes(m,
        score.toDF("doc_id", "lab", "text"), "text", "lab", "doc_id")
      .as[(Long, String, String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
  }

  test("hand fixture: smoothing, OOV floor, zero-token doc, priors") {
    val train = Seq(
      (0L, "en", "cat cat dog"),
      (2L, "en", "cat mat"),
      (4L, "fr", "chat chat chien"))
    val score = Seq(
      (1L, "en", "cat dog"),       // in-vocab, en-heavy
      (3L, "fr", "chat zebra"),    // one OOV token -> smoothing floor
      (5L, "en", "!!! 123"),       // zero tokens -> priors alone
      (7L, "fr", ""))              // empty text  -> priors alone
    val got = runNb(train, score)
    val want = refNb(train, score)
    assert(got == want)
    // the witnesses the fixture was built for: the en-heavy doc goes
    // en, the chat-heavy doc goes fr (OOV smooths equally), and the
    // zero-token docs both pick the smaller-prior class (en: 2 docs
    // of 3) with n_toks = 0
    assert(got(1L)._2 == "en" && got(3L)._2 == "fr")
    assert(got(5L) == (("en", "en", 1L, 0L, micro(3.0 / 2))))
    assert(got(7L)._2 == "en" && got(7L)._4 == 0L)
  }

  test("exact-integer tie-break goes to the lexicographically smallest class") {
    // perfectly symmetric classes: identical counts everywhere, so
    // every per-class score is the SAME integer and only the label
    // order can decide — 'aa' must win on every doc
    val train = Seq(
      (0L, "bb", "x y"), (2L, "aa", "x y"), (4L, "cc", "x y"))
    val score = Seq((1L, "cc", "x"), (3L, "bb", "z z z"), (5L, "aa", ""))
    val got = runNb(train, score)
    assert(got == refNb(train, score))
    assert(got.values.forall(_._2 == "aa"), s"tie must break to 'aa': $got")
  }

  test("randomized corpora match the reference end-to-end") {
    val rnd = new Random(1309)
    val vocab = Vector("ab", "cd", "ef", "gh", "ij", "kl", "mn", "op")
    val labels = Vector("de", "en", "fr")
    (1 to 3).foreach { trial =>
      val train = (0 until 30).map { i =>
        (i * 2L, labels(rnd.nextInt(labels.size)),
          (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val score = (0 until 20).map { i =>
        // a few OOV tokens mixed in so the smoothing floor fires
        val ws = (0 until rnd.nextInt(10)).map(_ =>
          if (rnd.nextInt(5) == 0) "zz" + rnd.nextInt(3) else vocab(rnd.nextInt(vocab.size)))
        (i * 2L + 1L, labels(rnd.nextInt(labels.size)), ws.mkString(" "))
      }
      assert(runNb(train, score) == refNb(train, score), s"trial $trial diverged")
    }
  }

  test("degenerate training splits are loud, not silently wrong") {
    val e1 = intercept[IllegalArgumentException] {
      TextAnalysis.trainNaiveBayes(
        Seq.empty[(Long, String, String)].toDF("doc_id", "lab", "text"),
        "text", "lab", "doc_id")
    }
    assert(e1.getMessage.contains("empty training split"))
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.trainNaiveBayes(
        Seq((0L, "en", "123 !!!")).toDF("doc_id", "lab", "text"),
        "text", "lab", "doc_id")
    }
    assert(e2.getMessage.contains("empty training vocabulary"))
  }
}
