package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE merge-table induction — the tokenizer-TRAINING step
  * of a pretraining pipeline (Sennrich/Haddow/Birch, "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016).
  * Generalizes the reference's P10 tokenizer
  * (exchange/model/ShareHypePiece.java:65-84) the way ta_tfidf
  * generalizes P3: ta_vocab/ta_token_ids map a FIXED vocabulary; this
  * operator LEARNS the subword merge table.
  *
  * Scale design: every per-round pass runs over the WORD HISTOGRAM,
  * not the corpus — the single corpus-sized pass is the initial
  * tokenize+count (one shuffle on word; at 100 TB the histogram is
  * bounded by the distinct-word vocabulary, orders of magnitude
  * smaller than the corpus). Each round is then one vocab-sized
  * map-side-combinable pair aggregation, a 1-ROW bounded collect for
  * the argmax (the k-means-centroid pattern — never the vocab), and a
  * literal string replace. Segmentations re-materialize per round
  * (localCheckpoint — the dd_components eager-checkpoint discipline)
  * so the iterated plan stays constant-size across 50 rounds.
  *
  * Determinism contract (the DuckDB oracle replays it merge for
  * merge): pair statistics weight each ADJACENT OCCURRENCE by word
  * frequency — overlapping occurrences counted, "aaa" holds (a,a)
  * twice; the round winner is (count DESC, left ASC, right ASC) under
  * binary string order; replacement is greedy leftmost
  * non-overlapping; induction stops early once no pair reaches
  * `minCount`.
  *
  * The greedy leftmost non-overlapping merge exists in two PROVEN-
  * EQUIVALENT forms. The DuckDB oracle (and [[segment]]'s replay)
  * uses SEPARATOR-FRAMED STRINGS ("␟sym␟␟sym␟", U+001F unit
  * separator): the merge is one replace of "␟l␟␟r␟" by "␟lr␟" —
  * both engines' replace is leftmost non-overlapping, and the
  * per-symbol start/end framing makes cross-symbol false matches
  * impossible (merging (b,c) can never fire inside ["ab","c"];
  * U+001F cannot occur in input — the tokenizer's alphabet is
  * [a-z]). Training ([[learnMerges]]) instead carries SYMBOL ARRAYS
  * and merges with [[foldMerge]] — see its scaladoc for the
  * equivalence argument and the per-row-regex-compile hot spot the
  * string form would pay per round; BpeSpec's randomized property
  * pins all forms to one list-based scanner reference.
  *
  * BATCH-ONLY by contract (the [[Graph]] posture): induction is a
  * multi-pass fixpoint over a corpus-wide histogram, which Structured
  * Streaming's single-pass incremental model cannot express — the
  * streaming analog is periodic re-induction over a corpus snapshot
  * (foreachBatch), while [[segment]] (a pure per-row replace chain
  * once the table is learned) is streaming-safe as-is.
  */
object Bpe {

  /** U+001F symbol frame. */
  val Sep = "\u001f"
  private val SepSep = Sep + Sep

  /** One learned merge: `rank` is 1-based acquisition order,
    * `pair_count` the frequency-weighted adjacent-occurrence count
    * that won the round. */
  case class Merge(rank: Long, lhs: String, rhs: String, pair_count: Long)

  /** (word, freq) histogram via the shared P10 tokenizer — the one
    * corpus-sized pass. */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs.select(StatelessOps.explodeTokens(col(textCol)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Current symbol list of a framed segmentation string. */
  private def symsOf(seg: Column): Column =
    transform(split(seg, SepSep), x => trim(x, Sep))

  /** Frequency-weighted adjacent-pair counts over a (syms, freq)
    * frame — one narrow projection + one map-side-combinable
    * aggregation per round. */
  private def pairCounts(segs: DataFrame): DataFrame = {
    val syms = col("syms")
    segs.select(col("freq"),
        explode(arrays_zip(
          slice(syms, lit(1), size(syms) - 1).as("l"),
          slice(syms, lit(2), size(syms) - 1).as("r"))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("c"))
  }

  /** Greedy leftmost non-overlapping merge of (l, r) over the symbol
    * array — the native one-pass scanner kernel
    * ([[graft.functions.BpeFoldMerge]], whole-stage-codegen driven).
    * Chosen over (a) a per-round framed-string replace, whose re-split
    * compiles a regex PER ROW (UTF8String.split falls through to
    * String.split for non-empty patterns), and (b) an `aggregate()`
    * higher-order fold, which runs on the interpreted lambda path with
    * O(n²) per-word array copies. All three forms are
    * semantically identical (a merged token can never left-match again
    * in its own round since l+r = l needs an empty r); BpeSpec's
    * random property pins the shipped kernel to the list-based
    * scanner reference. */
  private def foldMerge(syms: Column, l: String, r: String): Column =
    graft.functions.BpeFoldMerge.bpeFoldMerge(syms, l, r)

  /** Free a superseded localCheckpoint's storage blocks now instead of
    * waiting for the ContextCleaner (the ExtensionCatalog
    * unpersistCheckpoint discipline, ADVICE r4): at 100 TB the
    * vocab-sized frame is worth reclaiming per truncation — without
    * this, ~numMerges/8 superseded copies stay pinned through the
    * induction. Safe here because learnMerges holds the ONLY reference
    * to each superseded frame. */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    try df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    } catch { case _: Throwable => () }

  /** Learn up to `numMerges` merges from the corpus; returns the merge
    * table (rank, lhs, rhs, pair_count) in acquisition order. */
  def learnMerges(docs: DataFrame, textCol: String,
                  numMerges: Int = 50, minCount: Long = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(numMerges >= 1 && minCount >= 1)
    // LAZY checkpoint per round, ZERO extra jobs: each round's segs is
    // localCheckpoint(eager=false), and the round's own argmax action
    // (whose aggregate scans every partition) materializes it — so
    // every scan reads the previous round's stored blocks plus exactly
    // ONE pending fold, and the round count stays one job each. The
    // batched-every-8 variant this replaces re-executed the chained
    // merges on every scan: per-round stage cost climbed 40 s →
    // 738 s executor time across a checkpoint window at 1.6M vocab
    // (measured — the chain replay is quadratic in the window width).
    // The superseded checkpoint is released one round BEHIND: its
    // blocks feed the next round's materialization first.
    // seed: one character split per WORD TYPE total — the empty split
    // pattern takes UTF8String.split's per-char fast path (no regex)
    var segs = wordHistogram(docs, textCol)
      .select(split(col("word"), "").as("syms"), col("freq"))
      .localCheckpoint(false)
    var prevCheckpoint: DataFrame = null
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (!done && merges.length < numMerges) {
      // 1-row bounded collect: the argmax travels to the driver, the
      // vocab never does (and it materializes this round's segs)
      val best = pairCounts(segs)
        .orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      if (prevCheckpoint != null) {
        unpersistCheckpoint(prevCheckpoint)
        prevCheckpoint = null
      }
      if (best.isEmpty || best.head.getLong(2) < minCount) done = true
      else {
        val l = best.head.getString(0)
        val r = best.head.getString(1)
        merges += Merge(merges.length + 1L, l, r, best.head.getLong(2))
        // skip building the never-executed final fold: localCheckpoint
        // plans the frame eagerly on the driver even when lazy
        if (merges.length < numMerges) {
          prevCheckpoint = segs
          segs = segs.select(foldMerge(col("syms"), l, r).as("syms"), col("freq"))
            .localCheckpoint(false)
        }
      }
    }
    if (prevCheckpoint != null) unpersistCheckpoint(prevCheckpoint)
    unpersistCheckpoint(segs)
    merges.toSeq.toDF()
  }

  /** Segment words by REPLAYING a learned merge table in rank order —
    * the tokenizer-apply half (encode): returns (word, subwords).
    * `merges` must be small enough to collect (it is by construction:
    * numMerges rows); the replay is the same framed-string replace
    * chain as training, one narrow per-row expression pipeline with
    * zero joins. */
  def segment(words: DataFrame, wordCol: String, merges: DataFrame): DataFrame = {
    val table = merges.orderBy(col("rank"))
      .select(col("lhs"), col("rhs"))
      .collect().map(row => (row.getString(0), row.getString(1)))
    val seeded = concat(lit(Sep),
      array_join(split(col(wordCol), ""), SepSep), lit(Sep))
    val merged = table.foldLeft(seeded) { case (seg, (l, r)) =>
      replace(seg, lit(Sep + l + SepSep + r + Sep), lit(Sep + l + r + Sep))
    }
    words.withColumn("subwords", symsOf(merged))
  }
}
