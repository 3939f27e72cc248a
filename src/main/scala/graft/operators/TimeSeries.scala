package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series similarity primitives: SAX symbolization and motif
  * discovery (Lin, Keogh, Lonardi, Chiu — "A Symbolic Representation
  * of Time Series, with Implications for Streaming Algorithms",
  * DMKD 2003). The engine's per-key series (prices, event values)
  * become discrete words that equality machinery — groupBy, joins,
  * the whole dedup family — can then search: two windows share a word
  * ⟺ their z-normalized shapes quantize identically, so similarity
  * search becomes hashing, never a quadratic scan.
  *
  * Cross-engine exactness: every window statistic derives from EXACT
  * integer micro-unit sums over a fixed 8-row frame (expressed as 8
  * lag() taps, identical in both engines), and the fp operations that
  * follow (mean, variance, sqrt, z, breakpoint compares) are the SAME
  * IEEE expressions evaluated on identical operands in an identical
  * order — so the emitted symbols match to the letter. Scale shape:
  * one hash-partitioned sort per key (the standard analytic-window
  * cost), zero joins, and the word output is fixed-width regardless
  * of corpus size.
  */
object TimeSeries {

  private val Breakpoint = 0.6745 // N(0,1) quartiles → 4 equiprobable symbols

  /** SAX word per full 8-value window (4 PAA segments × 4-symbol
    * alphabet) over each key's time-ordered micro-unit values.
    * Rows before the 8th of a key are dropped (no partial windows).
    * Zero-variance windows emit the sentinel 'flat'. */
  def saxWords(df: DataFrame, keyCol: String, orderCols: Seq[String],
               valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
    val vc = round(col(valueCol) * 1000000).cast("long")
    // taps(i) = v[t-7+i]; the current row is tapped directly
    val taps = (0 to 6).map(i => lag(vc, 7 - i).over(w)) :+ vc
    val rn = row_number().over(w)
    val s = taps.reduce(_ + _)
    val s2 = taps.map(t => t * t).reduce(_ + _)
    val mean = s.cast("double") / lit(8.0)
    val variance = (s2.cast("double")
      - s.cast("double") * s.cast("double") / lit(8.0)) / lit(8.0)
    val sd = sqrt(variance)
    def symbol(z: Column): Column =
      when(z < -Breakpoint, "a").when(z < 0.0, "b")
        .when(z < Breakpoint, "c").otherwise("d")
    val word = concat((0 until 4).map { seg =>
      val paa = (taps(2 * seg) + taps(2 * seg + 1)).cast("double") / lit(2.0)
      symbol((paa - mean) / sd)
    }: _*)
    df.select(col(keyCol), rn.as("rn"), s.as("s"), sd.as("sd"), word.as("w"))
      .filter(col("rn") >= 8)
      .select(col(keyCol), col("rn"),
        when(col("sd") === 0.0, lit("flat")).otherwise(col("w")).as("sax"))
  }

  /** Motif per key: the most frequent SAX word (ties break to the
    * lexicographically smallest word — total-order deterministic).
    * Two hash aggregations, both map-side combinable; the same
    * max(struct) idiom as agg_mode. */
  def motifs(sax: DataFrame, keyCol: String): DataFrame =
    sax.groupBy(col(keyCol), col("sax")).agg(count(lit(1)).as("n"))
      .groupBy(col(keyCol))
      .agg(max(struct(col("n"),
        // 4-char a-d words: two ASCII-order flips make bigger-struct
        // prefer the SMALLEST word at equal count
        translate(col("sax"), "abcdflt", "zyxwvut").as("inv"),
        col("sax").as("word"))).as("m"))
      .select(col(keyCol), col("m.word").as("motif"), col("m.n").as("n"))
}
