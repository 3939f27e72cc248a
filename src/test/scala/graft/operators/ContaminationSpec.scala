package graft.operators

import graft.streaming.SparkSpec

/** Decontamination is SEQUENCE-sensitive: an n-token shingle is a
  * contiguous token run, so sharing the full token SET in a different
  * order must not flag, while one shared 8-token run must. (The
  * synthetic corpus can't show this — its docs share token sets — so
  * this fixture carries the true-subsequence case per VERDICT r3 #6.)
  */
class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val run8 = "alpha bravo charlie delta echo foxtrot golf hotel"

  private def check(train: Seq[(Long, String)], eval: Seq[(Long, String)],
                    n: Int = 8): Set[(Long, Long, Long)] =
    Dedup.contaminationCheck(
        train.toDF("doc_id", "text"), eval.toDF("doc_id", "text"), n = n)
      .as[(Long, Long, Long)].collect().toSet

  test("one shared 8-token run flags the pair; permuted token set does not") {
    val eval = Seq((1L, s"intro words then $run8 and a tail"))
    val train = Seq(
      (100L, s"completely other prefix $run8 different suffix here"), // true subsequence
      (101L, "hotel golf foxtrot echo delta charlie bravo alpha " +
        "intro words then and a tail"), // same token SET, shuffled order
      (102L, "nothing in common at all with the benchmark document"))
    val got = check(train, eval)
    // only the exact run-sharer, with exactly that one shared shingle
    assert(got == Set((100L, 1L, 1L)))
  }

  test("a 7-token overlap is invisible at n=8 but flags at n=7") {
    val seven = "one two three four five six seven"
    val eval = Seq((1L, s"$seven endofeval"))
    val train = Seq((200L, s"trainprefix $seven"))
    assert(check(train, eval, n = 8).isEmpty)
    assert(check(train, eval, n = 7) == Set((200L, 1L, 1L)))
  }

  test("docs shorter than n tokens never shingle (no crash, no rows)") {
    val eval = Seq((1L, "tiny doc"), (2L, s"real $run8 benchmark row"))
    val train = Seq((300L, "also tiny"), (301L, s"has $run8 inside"))
    assert(check(train, eval) == Set((301L, 2L, 1L)))
  }

  test("n_shared counts DISTINCT shared shingles per pair") {
    // eval has 9 tokens -> two 8-shingles; train contains the same 9-token run
    val run9 = run8 + " india"
    val eval = Seq((1L, run9))
    val train = Seq((400L, s"prefix tokens $run9 suffix tokens"))
    assert(check(train, eval) == Set((400L, 1L, 2L)))
  }
}
