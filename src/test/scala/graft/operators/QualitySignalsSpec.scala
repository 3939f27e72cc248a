package graft.operators

import graft.streaming.SparkSpec

/** Edge semantics of the round-4 quality/embedding additions that the
  * synthetic corpus cannot exercise: repetition extremes and
  * zero-vector quantization.
  */
class QualitySignalsSpec extends SparkSpec {
  import spark.implicits._

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
}
