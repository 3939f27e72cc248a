package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (the 100 TB toolbox item beyond
  * AQE's skew-join split, for when the planner can't help — e.g.
  * pre-partitioned state stores or non-SMJ joins).
  *
  * Salted join: the skewed (large) side gets a random-but-deterministic
  * salt in [0, salts); the small side is replicated `salts` times; the
  * join key becomes (key, salt), splitting each hot key's rows across
  * `salts` reducers. Result is row-identical to the unsalted join.
  */
object SkewTools {

  /** Equi-join `large ⋈ small` on `key`, salted `salts` ways.
    * The salt is derived from hash of the large side's whole row
    * position-independently via monotonically increasing id — any
    * deterministic spreader works; correctness only needs "the same
    * row keeps one salt". */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    // Outer-on-the-small-side joins are NOT salt-equivalent: an
    // unmatched small key would emit one null-extended row per salt
    // replica instead of one.
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi").contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val l = large.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(s, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Key-frequency probe: top-n hottest keys with counts — the
    * diagnostic that decides between AQE, salting, or a broadcast. */
  def hotKeys(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topN)
}
