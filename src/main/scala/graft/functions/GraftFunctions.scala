package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The engine's native functions as SQL-registrable builders — one
  * table shared by [[graft.GraftExtensions]] (config-based,
  * `spark.sql.extensions=graft.GraftExtensions`, for cluster deploys)
  * and [[org.apache.spark.sql.GraftSqlBridge.registerAll]] (runtime
  * registration on an existing session). After registration every
  * native expression/aggregate is callable from `spark.sql(...)`
  * exactly like a built-in — no Scala import needed to switch.
  */
object GraftFunctions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  private def strArg(e: Expression, fn: String, pos: Int): String = e match {
    case Literal(v: UTF8String, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be a string literal, got $other")
  }

  /** Arity gate shared by every builder: a wrong argument count raises
    * the same descriptive IllegalArgumentException as intArg instead
    * of a raw IndexOutOfBoundsException from args(i) (extra arguments
    * are rejected, not silently ignored). */
  private def arity(fn: String, min: Int, max: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args => {
      if (args.length < min || args.length > max)
        throw new IllegalArgumentException(
          s"$fn expects ${if (min == max) s"$min" else s"$min to $max"} " +
            s"argument(s), got ${args.length}")
      build(args)
    }

  /** name → (builder, usage). Aggregates return the AggregateFunction;
    * the analyzer wraps it like any built-in aggregate. */
  val all: Seq[(String, Seq[Expression] => Expression, String)] = Seq(
    ("cosine",
      arity("cosine", 2, 2)(args => CosineSimilarity(args(0), args(1))),
      "cosine(a array<float>, b array<float>) - fused dot/norm cosine similarity"),
    ("dot_product_d",
      arity("dot_product_d", 2, 2)(args => DotProductD(args(0), args(1))),
      "dot_product_d(a array<double>, b array<double>) - fused double dot product, bit-equal to the left-to-right fold"),
    ("micro_l2",
      arity("micro_l2", 2, 2)(args => MicroL2(args(0), args(1))),
      "micro_l2(a array<bigint>, b array<bigint>) - exact integer micro-unit squared L2 distance"),
    ("adc_sum",
      arity("adc_sum", 3, Int.MaxValue)(args =>
        AdcSum(args.head +: args.drop(2), intArg(args(1), "adc_sum", 2))),
      "adc_sum(lut array<bigint>, ksub int, code0 bigint, ...) - PQ asymmetric distance: sum of lut[j*ksub + code_j], 0-based codes"),
    ("md5_long60",
      arity("md5_long60", 1, 1)(args => Md5Long60(args(0))),
      "md5_long60(s string) - first 60 bits of md5(s) as bigint"),
    ("winnow_summary",
      arity("winnow_summary", 1, 3)(args => WinnowSummary(args(0),
        if (args.length > 1) intArg(args(1), "winnow_summary", 2) else 4,
        if (args.length > 2) intArg(args(2), "winnow_summary", 3) else 8)),
      "winnow_summary(text [, k, w]) - struct(n_fingerprints, fp_sum) of distinct window-min k-gram hashes"),
    ("bpe_fold_merge",
      arity("bpe_fold_merge", 3, 3)(args => BpeFoldMerge(args(0),
        strArg(args(1), "bpe_fold_merge", 2),
        strArg(args(2), "bpe_fold_merge", 3))),
      "bpe_fold_merge(syms array<string>, lhs, rhs) - one greedy leftmost non-overlapping BPE merge round"),
    ("hyperplane_bucket",
      arity("hyperplane_bucket", 2, 3)(args => HyperplaneBucket(args(0),
        intArg(args(1), "hyperplane_bucket", 2),
        if (args.length > 2) intArg(args(2), "hyperplane_bucket", 3) else 64)),
      "hyperplane_bucket(emb array<float>, nBits [, dim]) - Rademacher sign-LSH bucket id"),
    ("kmv_distinct",
      arity("kmv_distinct", 1, 2)(args => KmvDistinct(args(0),
        if (args.length > 1) intArg(args(1), "kmv_distinct", 2) else 64)),
      "kmv_distinct(hash bigint [, k]) - KMV distinct-count sketch estimate (aggregate)"),
    ("topk_pairs",
      arity("topk_pairs", 3, 3)(args => TopKPairs(args(0), args(1),
        intArg(args(2), "topk_pairs", 3))),
      "topk_pairs(score double, id bigint, k) - top-k (score desc, id asc) pairs (aggregate)"),
    ("kmin_by_hash",
      arity("kmin_by_hash", 3, 3)(args => KMinByHash(args(0), args(1),
        intArg(args(2), "kmin_by_hash", 3))),
      "kmin_by_hash(hash bigint, value double, k) - k hash-smallest (h, v) pairs (aggregate)"),
    ("misra_gries",
      arity("misra_gries", 1, 2)(args => MisraGries(args(0),
        if (args.length > 1) intArg(args(1), "misra_gries", 2) else 64)),
      "misra_gries(hash bigint [, k]) - heavy-hitter candidates with lower-bound counts (aggregate)"),
    ("cms_sketch",
      arity("cms_sketch", 1, 3)(args => CmsSketch(args(0),
        if (args.length > 1) intArg(args(1), "cms_sketch", 2) else 4,
        if (args.length > 2) intArg(args(2), "cms_sketch", 3) else 256)),
      "cms_sketch(hash bigint [, depth, width]) - count-min counter array, row-major depth x width (aggregate)"),
    ("bloom_sketch",
      arity("bloom_sketch", 1, 3)(args => BloomSketch(args(0),
        if (args.length > 1) intArg(args(1), "bloom_sketch", 2) else 4096,
        if (args.length > 2) intArg(args(2), "bloom_sketch", 3) else 3)),
      "bloom_sketch(hash bigint [, numBits, numHashes]) - Bloom filter word array, numBits/64 longs (aggregate)"),
    ("bloom_maybe",
      arity("bloom_maybe", 2, 4)(args => BloomMaybe(args(0), args(1),
        if (args.length > 2) intArg(args(2), "bloom_maybe", 3) else 4096,
        if (args.length > 3) intArg(args(3), "bloom_maybe", 4) else 3)),
      "bloom_maybe(sketch array<bigint>, hash bigint [, numBits, numHashes]) - Bloom membership probe"),
    ("interleave_bits",
      arity("interleave_bits", 3, Int.MaxValue)(args =>
        InterleaveBits(args.tail, intArg(args.head, "interleave_bits", 1))),
      "interleave_bits(bits int, c0, c1, ...) - Morton/Z-order interleave of k integral columns at bits bits each (k*bits <= 63)"),
    ("hilbert_xy",
      arity("hilbert_xy", 3, 3)(args => HilbertIndex(args(1), args(2),
        intArg(args(0), "hilbert_xy", 1))),
      "hilbert_xy(bits int, x, y) - 2-D Hilbert curve index on the 2^bits grid"),
    ("hilbert_k",
      arity("hilbert_k", 3, Int.MaxValue)(args =>
        HilbertIndexK(args.tail, intArg(args.head, "hilbert_k", 1))),
      "hilbert_k(bits int, c0, c1, ...) - k-D Hilbert curve index (Skilling transpose) on the 2^bits grid (k*bits <= 63)"),
    ("str_min_max",
      arity("str_min_max", 1, 1)(args => StrMinMax(args(0))),
      "str_min_max(s string) - struct(min_s, max_s) via a hash-friendly two-string buffer (aggregate)"),
    ("hyperplane_project",
      arity("hyperplane_project", 2, 4)(args => HyperplaneProject(args(0),
        intArg(args(1), "hyperplane_project", 2),
        if (args.length > 2) intArg(args(2), "hyperplane_project", 3) else 64,
        if (args.length > 3) intArg(args(3), "hyperplane_project", 4) else 16)),
      "hyperplane_project(emb array<float>, outDims [, dim, signRow0]) - JL Rademacher projection, micro-unit integer sums"))
}
