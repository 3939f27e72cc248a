package graft.functions

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** Native winnowing kernel vs an independent brute-force reference:
  * the reference hashes grams through the ORACLE's literal formula
  * (md5 hex string → first 15 hex digits parsed base-16 → mod 2^31-1)
  * and takes each window min naively, so it shares no code with the
  * deque/bit-twiddling kernel under test.
  */
class WinnowSummarySpec extends SparkSpec {
  import spark.implicits._

  private val P31 = 2147483647L

  /** Oracle-literal gram hash: conv(substring(md5(gram),1,15),16,10) % P31. */
  private def oracleHash(gram: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(gram.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % P31
  }

  /** Brute-force winnow summary on code points; None if no full window. */
  private def reference(text: String, k: Int, w: Int): Option[(Long, Long)] = {
    val cps = text.codePoints().toArray
    val grams = cps.length - k + 1
    if (grams < w) return None
    val hs = (0 until grams).map(i =>
      oracleHash(new String(cps, i, k)))
    val minima = (w - 1 until grams).map(i => hs.slice(i - w + 1, i + 1).min)
    val distinct = minima.distinct
    Some((distinct.length.toLong, distinct.sum % P31))
  }

  private def run(texts: Seq[String], k: Int = 4, w: Int = 8): Map[Long, (Long, Long)] =
    graft.operators.TextAnalysis.winnowFingerprint(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        "text", "doc_id", k, w)
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, s) => id -> (n, s) }.toMap

  test("matches the brute-force oracle-formula reference") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaa", // all grams identical -> one fingerprint
      "abcabcabcabcabcabc",   // periodic text
      "A longer sentence, with punctuation; enough characters to winnow.")
    val got = run(texts)
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got.get(i.toLong) == reference(t, 4, 8), s"doc $i: '$t'")
    }
  }

  test("docs with no full window produce no row") {
    // k+w-1 = 11 chars is the minimum for one full window
    val got = run(Seq("ten chars!", "elevenchars", "short"))
    assert(got.keySet == Set(1L))
    assert(got(1L) == reference("elevenchars", 4, 8).get)
  }

  test("multibyte text hashes code-point grams, not UTF-16 slices") {
    val t = "héllo wörld — ça déraille à minuit, n'est-ce pas ?"
    assert(run(Seq(t)).get(0L) == reference(t, 4, 8))
  }

  test("matches the reference over the real documents table") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val got = graft.operators.TextAnalysis
      .winnowFingerprint(docs, "text", "doc_id")
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, s) => id -> (n, s) }.toMap
    val want = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().toMap.map { case (id, t) => id -> reference(t, 4, 8) }
    assert(want.forall { case (id, exp) => got.get(id) == exp })
    assert(got.size == want.count(_._2.isDefined))
  }
}
