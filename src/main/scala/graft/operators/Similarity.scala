package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k via `zip_with` + `aggregate`
  * (pure Column expressions, whole-stage codegen, no UDF).
  * Scale path: sign-LSH bucketing — candidates only form inside a
  * bucket, so the cross product is bounded by bucket size; at 100 TB
  * the bucketed variant is a co-partitioned join on the bucket id
  * instead of an all-pairs cross join.
  */
object Similarity {

  /** Cosine similarity via the native Catalyst expression
    * (graft.functions.CosineSimilarity): one fused codegen loop for
    * dot + both norms, replacing the aggregate/zip_with lambda
    * composition (which allocates per-element closure frames and
    * an intermediate product array). Accumulation order is identical,
    * so results are bit-equal with the previous form and the oracle. */
  def cosine(a: String, b: String) =
    graft.functions.CosineSimilarity.cosine(col(a), col(b))

  /** Shared tail: score candidate (query_id, vec_id) pairs, rank on the
    * ROUNDED cosine with an id tiebreak (both engines rank the same
    * rounded value — fp ties cannot diverge), keep top-k. One
    * definition so the rounding/tiebreak contract with the oracle
    * cannot drift between the ANN variants. */
  private def scoreTopK(pairs: DataFrame, k: Int): DataFrame = {
    val scored = pairs.filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine("q_emb", "embedding"), 6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("query_id"), col("vec_id"), col("cos"), col("rk"))
  }

  /** Brute-force top-k: for each query vector, cosine against the full
    * corpus, keep the k nearest. The query side is broadcast (small by
    * construction); the corpus is scanned exactly once. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb")))
    scoreTopK(corpus.select(col("vec_id"), col("embedding")).crossJoin(q), k)
  }

  /** Sign-LSH bucket id from the first `nBits` embedding dimensions
    * (deterministic, SQL-expressible for the oracle; a production
    * variant would use random hyperplanes — same plumbing). */
  def signBucket(embCol: String, nBits: Int = 3) =
    (0 until nBits).map(i =>
      when(element_at(col(embCol), i + 1) > 0, 1L << i).otherwise(0L))
      .reduce(_ + _)

  /** Bucketed ANN: queries join only their own bucket — the 100 TB
    * path (bucket-partitioned join instead of cross product). Recall
    * is partial by construction; callers trade nBits for recall. */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int = 3): DataFrame = {
    val c = corpus.select(col("vec_id"), col("embedding"),
      signBucket("embedding", nBits).as("bucket"))
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      signBucket("embedding", nBits).as("bucket")))
    scoreTopK(c.join(q, "bucket"), k)
  }
}
