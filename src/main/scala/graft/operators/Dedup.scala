package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deduplication family for large-scale training-data pipelines:
  * exact, MinHash-LSH, SimHash, and n-gram-Jaccard near-dup.
  *
  * Scale notes (the 100 TB path):
  *  - every variant is a constant number of hash-partitioned passes —
  *    no driver-side state, no O(n²) candidate generation: near-dup
  *    candidates only form inside an LSH band bucket / blocking key;
  *  - signatures are fixed-width (k ints), so the shuffle payload per
  *    doc is bounded regardless of document length;
  *  - token explode is the widest stage; it happens before the first
  *    aggregation so it never shuffles raw text more than once.
  */
object Dedup {

  /** Exact dedup by content: one survivor (min id) per distinct text.
    * A single hash aggregation — the groupBy key is the text itself so
    * Spark's partial (map-side) aggregation collapses duplicates before
    * the shuffle. */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_copies"))
      .select(col("survivor_id"), col("n_copies"))

  /** Distinct-token shingle set per doc with mod-2^31 hashes — the
    * shared front end of MinHash and Jaccard. Tokenizer is THE single
    * definition in StatelessOps.explodeTokens (oracle parity for every
    * dedup and text-analysis query depends on one tokenizer per engine). */
  private def tokenHashes(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        StatelessOps.explodeTokens(col(textCol)).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("doc_id"), Hashing.md5Mod31(col("tok")).as("h"))
      .distinct()

  /** MinHash signature: k affine permutations, min over the token set
    * (one aggregation, k columns wide). The affine re-hashes are
    * hoisted into a projection BEFORE the aggregate: embedding k
    * compound expressions inside partial_min makes the generated
    * aggregate method huge, and Janino recompilation of that method
    * (cache-missed per action since expr ids differ) costs seconds —
    * measured 4-25 s vs ms for plain min(col) aggs. */
  def minHashSignatures(docs: DataFrame, textCol: String, idCol: String, k: Int): DataFrame =
    tokenHashes(docs, textCol, idCol)
      .select(col("doc_id") +:
        (0 until k).map(j => Hashing.affine(col("h"), j).as(s"a$j")): _*)
      .groupBy(col("doc_id"))
      .agg(min(col("a0")).as("mh0"),
        (1 until k).map(j => min(col(s"a$j")).as(s"mh$j")): _*)

  /** MinHash + LSH banding: docs sharing all rows of any band become a
    * candidate pair (a < b). bands × rowsPerBand = k. Pair generation
    * is a self-join on the band bucket — bounded by bucket size, never
    * all-pairs. */
  def minHashLsh(docs: DataFrame, textCol: String, idCol: String,
                 bands: Int = 4, rowsPerBand: Int = 4): DataFrame = {
    val k = bands * rowsPerBand
    val sigs = minHashSignatures(docs, textCol, idCol, k)
    // One row per (doc, band) via posexplode of a precomputed bucket
    // array — NOT a bands-way union: Spark does not dedupe common
    // subplans, so a union would re-execute the whole signature
    // pipeline (scan+tokenize+hash+agg) once per band. At 100 TB that
    // is bands× the scan; as one explode it is a single pass.
    val bucketArr = array((0 until bands).map { b =>
      concat_ws("_",
        (b * rowsPerBand until (b + 1) * rowsPerBand).map(j => col(s"mh$j")): _*)
    }: _*)
    // Pair generation is a per-bucket Scala kernel, NOT a self-join:
    // the fused codegen for posexplode+join+filter+distinct exceeded
    // the JIT's method limit and ran permanently interpreted (1330 s
    // task time for 5M pairs at sf0.1, bimodal with AQE's plan
    // choice). Grouping each (band, bucket) once and emitting sorted
    // id combinations lazily is one aggregation + a tiny JIT-friendly
    // loop, and generates each candidate pair exactly once per band.
    val spark = docs.sparkSession
    import spark.implicits._
    val bandBuckets = sigs
      .select(col("doc_id"), posexplode(bucketArr).as(Seq("band", "bucket")))
    val n = docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    bandBuckets
      .groupBy(col("band"), col("bucket"))
      .agg(collect_list(col("doc_id")).as("ids"))
      // AQE coalesces this small aggregate to ~1 partition; the pair
      // emission below is the expensive part, so rebalance first.
      .select(col("ids")).repartition(n).as[Seq[Long]]
      // Dedicated iterator class, not Iterator.flatMap chains: the
      // shared combinator call sites go megamorphic in a long-lived
      // session (43 bench queries in one JVM) and the kernel
      // deoptimizes 5-10x. Own class = monomorphic = stays JIT'd.
      .mapPartitions(groups => new PairIterator(groups))
      .toDF("doc_a", "doc_b").distinct()
  }

  /** Emits all sorted id pairs (a < b) of each group, lazily. */
  private final class PairIterator(groups: Iterator[Seq[Long]])
      extends scala.collection.AbstractIterator[(Long, Long)] {
    private var cur: Array[Long] = _
    private var i = 0
    private var j = 1
    loadNext()
    private def loadNext(): Unit = {
      cur = null
      while (cur == null && groups.hasNext) {
        val arr = groups.next().toArray
        if (arr.length >= 2) {
          java.util.Arrays.sort(arr)
          cur = arr; i = 0; j = 1
        }
      }
    }
    override def hasNext: Boolean = cur != null
    override def next(): (Long, Long) = {
      val out = (cur(i), cur(j))
      j += 1
      if (j >= cur.length) {
        i += 1; j = i + 1
        if (j >= cur.length) loadNext()
      }
      out
    }
  }

  /** SimHash: per-doc 32-bit signature where bit i is the sign of the
    * token-set's aggregate weight on that bit (same integer arithmetic
    * as the DuckDB oracle). Bit weights are hoisted into a projection
    * (±1 per bit via exact shift-division) so the aggregate is `bits`
    * plain sums and no 32× row explode is needed: one narrow pass +
    * one aggregation regardless of corpus size. */
  def simHash(docs: DataFrame, textCol: String, idCol: String, bits: Int = 32): DataFrame = {
    val th = tokenHashes(docs, textCol, idCol)
    val weighted = th.select(col("doc_id") +:
      (0 until bits).map(i =>
        when((col("h") / lit(1L << i)).cast("long") % 2 === 1, 1)
          .otherwise(-1).as(s"w$i")): _*)
    weighted.groupBy(col("doc_id"))
      .agg(sum(col("w0")).as("s0"),
        (1 until bits).map(i => sum(col(s"w$i")).as(s"s$i")): _*)
      .select(col("doc_id"),
        (0 until bits).map(i =>
          when(col(s"s$i") > 0, lit(1L << i)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** Token-set Jaccard near-dup: LSH band candidates, then EXACT
    * Jaccard |A∩B| / |A∪B| via per-doc token-set arrays and
    * array_intersect. Work is linear in the candidate count — the
    * first cut (token-level self-join on a blocking key) materialized
    * |block|² rows PER TOKEN (225M intermediate rows / 361 s at sf0.1
    * on a 31-word-vocabulary corpus where every pair is a near-dup);
    * the array form shuffles each candidate pair once and intersects
    * two bounded arrays per pair. Emits pairs with
    * similarity >= threshold. */
  def ngramJaccard(docs: DataFrame, textCol: String, idCol: String,
                   threshold: Double, bands: Int = 4, rowsPerBand: Int = 8): DataFrame = {
    // Longer bands (r=8) than the generic LSH: candidate probability
    // J^r per band keeps the pair set near the true >= threshold set
    // instead of admitting the quadratic mid-similarity bulk.
    // Explicit rebalance of the candidate pairs: the band self-join's
    // input shuffle is tiny (signatures only), so AQE coalesces it to
    // ~1 partition — and the pair EXPLOSION plus every array intersect
    // then runs in a single task (measured: 1 task × 17 s CPU with 31
    // idle cores). Round-robin repartition spreads pairs before the
    // expensive per-pair work; the token-array side is small and
    // auto-broadcasts, keeping the intersects map-side parallel.
    val n = docs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val cands = minHashLsh(docs, textCol, idCol, bands, rowsPerBand).repartition(n)
    val arrs = tokenHashes(docs, textCol, idCol)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_set(col("h"))).as("toks"))
    val a = arrs.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"))
    val b = arrs.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"))
    // The per-pair intersect runs as a compact Scala kernel (sorted
    // two-pointer merge, no allocation) instead of codegen'd
    // array_intersect: the fused whole-stage method for
    // joins+intersect+filter was too large to JIT, so the FIRST
    // execution ran interpreted — 4860 s task time / 438 s GC vs 13 s
    // once hot. Small methods JIT immediately: stable ~8 s cold.
    val spark = docs.sparkSession
    import spark.implicits._
    cands.join(a, "doc_a").join(b, "doc_b")
      .select(col("doc_a"), col("doc_b"), col("toks_a"), col("toks_b"))
      .as[(Long, Long, Array[Long], Array[Long])]
      // dedicated iterator class — see PairIterator's megamorphism note
      .mapPartitions(rows => new JaccardIterator(rows, threshold))
      .toDF("doc_a", "doc_b", "jaccard")
  }

  /** Sorted two-pointer intersect + threshold filter, lazily. */
  private final class JaccardIterator(
      rows: Iterator[(Long, Long, Array[Long], Array[Long])], threshold: Double)
      extends scala.collection.AbstractIterator[(Long, Long, Double)] {
    private var nextA = 0L
    private var nextB = 0L
    private var nextJ = 0.0
    private var ready = false
    advance()
    private def advance(): Unit = {
      ready = false
      while (!ready && rows.hasNext) {
        val (da, db, ta, tb) = rows.next()
        var i = 0; var j = 0; var inter = 0
        while (i < ta.length && j < tb.length) {
          if (ta(i) < tb(j)) i += 1
          else if (ta(i) > tb(j)) j += 1
          else { inter += 1; i += 1; j += 1 }
        }
        val jac = inter.toDouble / (ta.length + tb.length - inter)
        // HALF_UP to match Spark round() and the DuckDB oracle
        val r = BigDecimal(jac).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (r >= threshold) { nextA = da; nextB = db; nextJ = r; ready = true }
      }
    }
    override def hasNext: Boolean = ready
    override def next(): (Long, Long, Double) = {
      val out = (nextA, nextB, nextJ)
      advance()
      out
    }
  }
}
