package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic corpus sampling and dataset splitting — the
  * reproducibility primitives of a training-data pipeline. Random
  * `df.sample()` is partition-order-dependent and unrepeatable across
  * engines/runs; hashing the record KEY makes every decision a pure
  * function of the data, so a re-run, a different cluster size, or the
  * DuckDB oracle all select the exact same rows, and a record keeps
  * its train/valid/test assignment for the life of the corpus (no
  * test-set leakage when the corpus is re-ingested or grows).
  *
  * All decisions derive from `md5Mod31(key || salt)` — uniform on
  * [0, 2^31-1), cross-engine identical (see [[graft.functions.Hashing]]),
  * fully codegen'd, no shuffle: sampling/splitting stays a narrow map
  * regardless of corpus size.
  */
object Sampling {

  private val P31 = 2147483647L

  /** Uniform [0,1) decision value for a key: hash(key || "_" || salt) / 2^31-1. */
  def decision(key: Column, salt: String): Column =
    Hashing.md5Mod31(concat(key.cast("string"), lit("_" + salt)))
      .cast("double") / lit(P31.toDouble)

  /** Bernoulli(rate) sample, deterministic in (key, salt). */
  def hashSample(df: DataFrame, keyCol: String, rate: Double,
                 salt: String = "sample"): DataFrame =
    df.filter(decision(col(keyCol), salt) < rate)

  /** Weighted sample WITHOUT replacement, exact size k (Efraimidis &
    * Spirakis, IPL 2006 — the one-pass A-ES scheme): each record
    * draws its deterministic u = [[decision]] and ranks by
    * ln(u)/w; the k largest ranks ARE a weighted
    * without-replacement sample (records with twice the weight are
    * twice as likely to make the cut, exactly). The data-MIXING
    * primitive: quality- or length-weighted corpus subsetting with
    * the same reproducibility contract as [[hashSample]] — every
    * decision a pure function of (key, salt), identical across
    * engines, re-runs, and cluster sizes.
    *
    * Scale shape: one narrow pass + a TakeOrdered top-k — no shuffle
    * of the corpus, heap bounded by k. u is drawn HALF-OPEN SHIFTED,
    * (hash + 1) / 2³¹ ∈ (0, 1] — NOT [[decision]]'s [0, 1): a key
    * hashing to exactly 0 would hit ln(0), where Spark yields −∞ but
    * DuckDB ERRORS outright — a 1-in-2³¹-per-key landmine that a
    * corpus-scale run WILL step on. ln(1) = 0 at the other end is a
    * plain best-possible rank. Ranking happens on the raw (unrounded)
    * key with an id tiebreak in both engines.
    *
    * WEIGHT CONTRACT — integer ≥ 1, enforced by clamping, NOT A-ES
    * verbatim: `weight` is truncated via cast to long (2.9 → 2) and
    * floored at 1 (`greatest(w, 1)`), so a zero/negative weight is
    * INCLUDED at weight 1 rather than excluded, and fractional
    * weights lose their fraction. Exact-integer ranks are what keep
    * the cross-engine floor-division parity; callers with fractional
    * weights pre-scale them to integers (×1000) before passing, and
    * callers that mean "exclude" filter before sampling. */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column,
                     k: Int, salt: String = "wsample"): DataFrame = {
    require(k >= 1)
    val u = (Hashing.md5Mod31(concat(col(keyCol).cast("string"),
        lit("_" + salt))) + lit(1L)).cast("double") / lit(2147483648.0)
    df.select(col(keyCol), greatest(weight.cast("long"), lit(1L)).as("w"))
      .withColumn("es_key_raw", log(u) / col("w"))
      .orderBy(col("es_key_raw").desc, col(keyCol))
      .limit(k)
      .select(col(keyCol), col("w"), round(col("es_key_raw"), 9).as("es_key"))
  }

  /** Per-stratum Bernoulli rates (e.g. downsample dominant languages,
    * keep all of rare ones). Strata absent from `rates` get
    * `defaultRate`. One narrow pass; the rate lookup is a constant
    * when/otherwise chain, not a join. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String = "strata"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
      when(col(strataCol) === stratum, lit(r)).otherwise(acc)
    }
    df.filter(decision(col(keyCol), salt) < rate)
  }

  /** Domain-mixture sampling — the corpus-mixing step of a pretraining
    * pipeline (hit per-source TARGET SHARES of a token/doc budget
    * regardless of how skewed the raw corpus is): rate(src) =
    * min(1, budget·weight(src) / n(src)), then the usual deterministic
    * hash-Bernoulli per row. Sources absent from `weights` share
    * `defaultWeight` each. Per-source counts are ONE map-side-combined
    * agg collapsing to |sources| rows on the driver (bounded — the
    * adjudicated runtime-filter shape); the rates then compile into a
    * literal when/otherwise chain, so the sampling pass itself stays a
    * narrow shuffle-free map like [[stratifiedSample]]. Oversampled
    * sources cap at rate 1.0 (no replication), undersampling is exact
    * in expectation — both deterministic in (key, salt). */
  def mixtureSample(df: DataFrame, keyCol: String, sourceCol: String,
                    weights: Map[String, Double], defaultWeight: Double,
                    budget: Double, salt: String = "mix"): DataFrame = {
    val counts = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = counts.map { case (src, n) =>
      src -> math.min(1.0, budget * weights.getOrElse(src, defaultWeight) / n)
    }
    if (rates.size <= 64) {
      // bounded source count: compile the rates into a literal
      // when/otherwise chain — no join, narrow shuffle-free pass
      val rate = rates.foldLeft(lit(0.0)) { case (acc, (src, r)) =>
        when(col(sourceCol) === src, lit(r)).otherwise(acc)
      }
      df.filter(decision(col(keyCol), salt) < rate)
    } else {
      // web-corpus source counts (thousands of domains) would build a
      // thousands-deep when-chain — the codegen method-size cliff this
      // repo documents for wide Column trees. Broadcast the (source,
      // rate) table instead: same rows, one hash-join lookup per row.
      val spark = df.sparkSession
      import spark.implicits._
      val rateDf = broadcast(rates.toSeq.toDF(sourceCol, "__rate"))
      df.join(rateDf, sourceCol)
        .filter(decision(col(keyCol), salt) < col("__rate"))
        .drop("__rate")
    }
  }

  /** Stable train/valid/test assignment from cumulative fractions:
    * d < f1 → first name, d < f1+f2 → second, … remainder → last.
    * Growing the corpus never reassigns an existing key (the decision
    * depends only on the key), which is the leakage guarantee batch
    * `randomSplit` cannot give. */
  def splitAssign(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)], lastName: String,
                  salt: String = "split"): DataFrame = {
    val d = decision(col(keyCol), salt)
    val cumulative = splits.scanLeft(0.0)(_ + _._2).tail
    val assign = splits.zip(cumulative).foldRight(lit(lastName): Column) {
      case (((name, _), cum), acc) => when(d < cum, lit(name)).otherwise(acc)
    }
    df.withColumn("split", assign)
  }

  /** Deterministic global training order — the epoch-shuffle step of a
    * pretraining pipeline: every row gets a pseudorandom but
    * reproducible global rank (its position in ascending order of a
    * salted md5 order key; a new `salt` is a new epoch permutation).
    * Composes the salted-hash idiom with
    * [[PrefixSum.globalRunningSum]]: the naive
    * `row_number() over (order by key)` funnels the corpus through ONE
    * reducer, while the range-partitioned two-pass prefix sum assigns
    * the same ranks with no global sort — numPartitions longs to the
    * driver, nothing else.
    *
    * The order key packs the salted 36-bit md5 hash above the id
    * (`h·2^24 + id`), making it UNIQUE (PrefixSum's stated contract)
    * whenever `id < 2^24` while staying pseudorandom in the high bits;
    * ids colliding in the hash order among themselves by id, exactly
    * the oracle's tiebreak-free `ORDER BY key` total order. Corpora
    * with wider ids raise the shift — the hash/id bit split is a
    * contract knob, not a structural limit. */
  /** Deterministic weighted source interleave — the training-order
    * scheduler for multi-source mixtures: source `s` with integer
    * weight `w` emits its r-th item at virtual time `(2r−1)·(L/w)`
    * (stride scheduling, Waldspurger & Weihl 1995, with `L` a common
    * multiple of all weights), so a weight-3 source appears 3× as
    * often as a weight-1 source at every prefix of the schedule —
    * unlike probabilistic mixing, the ratio holds EXACTLY, batch
    * after batch, and is fully reproducible.
    *
    * The global position is assigned by [[PrefixSum.globalRunningSum]]
    * over the packed key `stride·2²⁹ + srcNum·2²⁴ + id` — the same
    * no-single-reducer two-pass rank as [[shuffleRank]], with the same
    * loud bit-budget guards (id < 2²⁴, srcNum < 32, stride < 2³⁴ —
    * contract knobs, widened together with the pack). Per-source
    * ordinals come from one hash-partitioned window; with a bounded
    * source count each partition carries one source's ids — the sort
    * the schedule inherently needs. */
  def interleave(df: DataFrame, idCol: String, srcNumCol: String,
                 weightCol: String, lcm: Long): DataFrame = {
    val id = col(idCol).cast("long")
    val sn = col(srcNumCol).cast("long")
    val rk = row_number().over(
      Window.partitionBy(col(srcNumCol)).orderBy(col(idCol))).cast("long")
    val stride = (rk * 2 - 1) * (lit(lcm) / col(weightCol)).cast("long")
    val guard = coalesce(assert_true(
      id >= 0 && id < lit(1L << 24) && sn >= 0 && sn < 32 &&
        stride >= 0 && stride < lit(1L << 34),
      concat(lit("interleave: pack overflow (id/src/stride): "),
        id.cast("string"), lit("/"), sn.cast("string"), lit("/"),
        stride.cast("string"))).cast("long"), lit(0L))
    val key = (stride * lit(1L << 29) + sn * lit(1L << 24) + id + guard).as("k")
    PrefixSum.globalRunningSum(df.select(key, lit(1L).as("v")), "k", "v")
      .select((col("k") % lit(1L << 24)).as(idCol),
        ((col("k") / lit(1L << 24)).cast("long") % 32).as(srcNumCol),
        col("running").as("pos"))
  }

  def shuffleRank(df: DataFrame, idCol: String, salt: String = "shuf"): DataFrame = {
    // the 36/24 bit split is a CONTRACT: an id outside [0, 2^24) would
    // silently corrupt both the recovered doc_id (k % 2^24) and the
    // rank order — fail loudly instead (ADVICE r5). assert_true
    // returns NULL when the guard holds, so the coalesce adds exactly
    // 0 to every valid key and the output is unchanged.
    val id = col(idCol).cast("long")
    val guard = coalesce(assert_true(id >= 0 && id < lit(1L << 24),
      concat(lit(s"shuffleRank: $idCol out of [0, 2^24): "), id.cast("string")))
      .cast("long"), lit(0L))
    val key = (Hashing.md5Long(concat(lit(salt + "_"), col(idCol).cast("string")))
      % lit(1L << 36)) * lit(1L << 24) + id + guard
    PrefixSum.globalRunningSum(df.select(key.as("k"), lit(1L).as("v")), "k", "v")
      .select((col("k") % lit(1L << 24)).as("doc_id"),
        col("k").as("shuffle_key"), col("running").as("rank"))
  }
}
