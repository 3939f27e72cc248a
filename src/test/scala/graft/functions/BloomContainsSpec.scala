package graft.functions

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** BloomContains: never a false negative, and bloom-prune + exact
  * semi join equals the unpruned semi join.
  */
class BloomContainsSpec extends SparkSpec {
  import spark.implicits._

  test("every inserted key passes the probe") {
    val keys = (0L until 5000L).map(_ * 37L)
    val bf = keys.toDF("k").stat.bloomFilter("k", 5000, 0.01)
    val missed = keys.toDF("k")
      .filter(!BloomContains.bloomContains(col("k"), bf))
      .count()
    assert(missed == 0)
  }

  test("prune + exact semi join equals the unpruned semi join") {
    val dim = (0L until 300L).filter(_ % 7 == 0).toDF("k")
    val fact = (0L until 3000L).map(i => (i % 300L, i)).toDF("k", "payload")
    val bf = dim.stat.bloomFilter("k", 1000, 0.01)
    val pruned = fact.filter(BloomContains.bloomContains(col("k"), bf))
      .join(dim, Seq("k"), "left_semi")
      .as[(Long, Long)].collect().toSet
    val plain = fact.join(dim, Seq("k"), "left_semi")
      .as[(Long, Long)].collect().toSet
    assert(pruned == plain && plain.nonEmpty)
  }
}
