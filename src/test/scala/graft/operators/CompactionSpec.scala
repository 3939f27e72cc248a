package graft.operators

import graft.streaming.SparkSpec

/** [[Compaction.plan]]: chunk-by-cumulative-size bin assignment,
  * hand-checked, plus the never-split-a-file and positive-target
  * contracts. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def run(inv: Seq[(Long, Long)], target: Long)
      : Map[Long, (Long, Long, Long, Long)] =
    Compaction.plan(inv.toDF("fk", "sz").repartition(5), "fk", "sz", target)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("bins are consecutive ~target chunks in key order") {
    // sizes 4,5,3,6,2,7,1 → exclusive prefixes 0,4,9,12,18,20,27
    // → bins 0,0,0,1,1,2,2 at target 10
    val inv = Seq(1L -> 4L, 2L -> 5L, 3L -> 3L, 4L -> 6L, 5L -> 2L,
      6L -> 7L, 7L -> 1L)
    assert(run(inv, 10L) == Map(
      0L -> ((3L, 12L, 1L, 3L)),
      1L -> ((2L, 8L, 4L, 5L)),
      2L -> ((2L, 8L, 6L, 7L))))
  }

  test("a file larger than target lands whole in one bin") {
    // 25 > 10 is never split; the next file starts bin 2 (prefix 25)
    val inv = Seq(10L -> 25L, 20L -> 3L)
    assert(run(inv, 10L) == Map(
      0L -> ((1L, 25L, 10L, 10L)),
      2L -> ((1L, 3L, 20L, 20L))))
  }

  test("empty inventory yields an empty plan; target must be positive") {
    assert(run(Seq.empty, 10L).isEmpty)
    intercept[IllegalArgumentException] {
      Compaction.plan(Seq(1L -> 1L).toDF("fk", "sz"), "fk", "sz", 0L)
    }
  }

  test("negative size fails loudly (div-vs-floor engine split, review r13)") {
    val e = intercept[Exception] {
      run(Seq(1L -> 4L, 2L -> -3L, 3L -> 5L), 10L)
    }
    assert(e.getMessage.contains("negative size") ||
      Option(e.getCause).exists(_.getMessage.contains("negative size")),
      s"unexpected failure: ${e.getMessage}")
  }

  test("duplicate layout key fails loudly (engine-defined plan otherwise)") {
    val e = intercept[org.apache.spark.SparkException] {
      run(Seq(1L -> 4L, 2L -> 3L, 2L -> 5L), 10L)
    }
    assert(e.getMessage.contains("duplicate order key") ||
      Option(e.getCause).exists(_.getMessage.contains("duplicate order key")),
      s"unexpected failure: ${e.getMessage}")
  }
}
