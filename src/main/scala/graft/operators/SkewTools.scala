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
    * Correctness only needs "the same row keeps one salt" — any
    * deterministic spreader works — but WHICH salt a row gets should
    * survive retries and AQE replans: pass `saltFrom` (a stable row
    * id column) to derive the salt from ROW CONTENT
    * (hash(key, id) % salts). The fallback spreader,
    * hash(monotonically_increasing_id()), is partition-layout-
    * dependent — still correct, but a replayed task may re-salt its
    * rows (VERDICT r5 #8). */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner",
                 saltFrom: Option[String] = None): DataFrame = {
    // Outer-on-the-small-side joins are NOT salt-equivalent: an
    // unmatched small key would emit one null-extended row per salt
    // replica instead of one.
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi").contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only, got $joinType")
    val spreader = saltFrom match {
      case Some(id) => hash(col(key), col(id))
      case None => hash(monotonically_increasing_id())
    }
    val l = large.withColumn("__salt", pmod(spreader, lit(salts)))
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
