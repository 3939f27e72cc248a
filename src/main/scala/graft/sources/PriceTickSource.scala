package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** S2 analog — the simulated price-multiplier source
  * (SharePriceMultSource.java:15-48): one LogNormal(0.0001, 0.01) tick
  * per second with a slight upward drift.
  *
  * Randomness is DETERMINISTIC and engine-independent: uniforms come
  * from md5 hashes of (seed, row index) — not Spark's randn(), whose
  * values depend on partitioning — so tests and the DuckDB oracle can
  * reproduce every tick. Box-Muller turns two uniforms into the
  * normal draw.
  */
object PriceTickSource {

  private val Two60 = math.pow(2, 60)

  /** Uniform(0,1) from a key column: md5-derived, partitioning-proof. */
  def uniform(key: Column, salt: String): Column =
    (Hashing.md5Long(concat(key.cast("string"), lit("_" + salt))) + 1L) / lit(Two60)

  /** Deterministic log-normal draw per row: exp(mu + sigma·N(0,1)),
    * N via Box-Muller from two salted uniforms. */
  def logNormal(key: Column, mu: Double, sigma: Double): Column = {
    val u1 = uniform(key, "u1")
    val u2 = uniform(key, "u2")
    val n = sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
    exp(lit(mu) + lit(sigma) * n)
  }

  /** Streaming source: one SharePriceMult-shaped row per second
    * (rate source → seeded log-normal mult). */
  def stream(spark: SparkSession, rowsPerSecond: Int = 1,
             mu: Double = 0.0001, sigma: Double = 0.01): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(col("timestamp").as("time"),
        logNormal(col("value"), mu, sigma).as("mult"))

  /** Batch twin: n deterministic ticks starting at startEpochMs,
    * 1-second spacing. */
  def batch(spark: SparkSession, n: Long, startEpochMs: Long,
            mu: Double = 0.0001, sigma: Double = 0.01): DataFrame =
    spark.range(n)
      .select(timestamp_millis(lit(startEpochMs) + col("id") * 1000L).as("time"),
        logNormal(col("id"), mu, sigma).as("mult"))
}
