package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** KMinByHash sample: exact under k, bounded at k, and identical
  * across partition layouts (the property reservoir sampling lacks).
  */
class KMinByHashSpec extends SparkSpec {
  import spark.implicits._

  private def sample(df: org.apache.spark.sql.DataFrame, k: Int): Seq[(Long, Double)] =
    df.agg(KMinByHash.kMinByHash(col("h"), col("v"), k).as("s"))
      .select(explode(col("s")).as("e")).select(col("e.h"), col("e.v"))
      .as[(Long, Double)].collect().toSeq

  test("keeps everything when the group is smaller than k, sorted by (h, v)") {
    val df = Seq((30L, 3.0), (10L, 1.0), (20L, 2.0)).toDF("h", "v")
    assert(sample(df, 10) == Seq((10L, 1.0), (20L, 2.0), (30L, 3.0)))
  }

  test("retains exactly the k hash-smallest pairs") {
    val df = (1L to 100L).map(i => (i, i * 0.5)).toDF("h", "v")
    assert(sample(df, 5) == (1L to 5L).map(i => (i, i * 0.5)))
  }

  test("sample is independent of partition layout") {
    val rows = (1L to 1000L).map(i => (i * 7919L % 1009L, i * 1.0))
    val one = sample(rows.toDF("h", "v").coalesce(1), 64)
    val many = sample(rows.toDF("h", "v").repartition(17), 64)
    assert(one == many)
    assert(one.size == 64)
  }

  test("identical (h, v) rows are retained as a multiset, not deduped") {
    // non-unique hash with duplicate values: all copies count toward k
    val df = Seq((1L, 5.0), (1L, 5.0), (1L, 5.0), (2L, 9.0), (3L, 1.0))
      .toDF("h", "v").repartition(3)
    assert(sample(df, 4) == Seq((1L, 5.0), (1L, 5.0), (1L, 5.0), (2L, 9.0)))
    assert(sample(df, 2) == Seq((1L, 5.0), (1L, 5.0)))
  }

  test("null hashes and values are skipped") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 1.0), (null, 9.0), (2L, null)).toDF("h", "v")
    assert(sample(df, 10) == Seq((1L, 1.0)))
  }
}
