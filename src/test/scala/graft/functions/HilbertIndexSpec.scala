package graft.functions

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** [[HilbertIndex]] correctness from the curve's own mathematics —
  * no reimplementation to agree with: the map is a BIJECTION from
  * the 2^bits grid onto [0, 4^bits), and CONSECUTIVE curve positions
  * are always grid neighbors (|Δx|+|Δy| = 1, the property Morton
  * lacks). Plus first-cells golden, locality envelopes, domain
  * violations on both paths, null propagation, SQL registration.
  */
class HilbertIndexSpec extends SparkSpec {
  import spark.implicits._

  private def gridDf(bits: Int) = {
    val n = 1 << bits
    (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        HilbertIndex.hilbertXY(col("x"), col("y"), bits).as("d"))
  }

  test("bijection + unit-step continuity on the full 32x32 grid") {
    val rows = gridDf(5).as[(Long, Long, Long)].collect()
    assert(rows.length == 1024)
    val byD = rows.map(r => r._3 -> ((r._1, r._2))).toMap
    assert(byD.keySet == (0L until 1024L).toSet, "d must be a bijection onto [0, 4^bits)")
    (0L until 1023L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"curve jump between d=$d ($x1,$y1) and d+1 ($x2,$y2)")
    }
  }

  test("golden first positions (the canonical U shape)") {
    // bits=1: (0,0)->0, (0,1)->1, (1,1)->2, (1,0)->3
    val got = gridDf(1).as[(Long, Long, Long)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    assert(got == Map((0L, 0L) -> 0L, (0L, 1L) -> 1L,
      (1L, 1L) -> 2L, (1L, 0L) -> 3L))
  }

  test("locality: every 16-cell curve range spans a bounded box (vs Morton's jumps)") {
    val spans = gridDf(4)
      .groupBy((col("d") / 16).cast("long").as("cell"))
      .agg((max(col("x")) - min(col("x"))).as("xs"),
        (max(col("y")) - min(col("y"))).as("ys"), count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect()
    assert(spans.length == 16)
    spans.foreach { case (_, xs, ys, n) =>
      assert(n == 16 && xs <= 3 && ys <= 3,
        s"16-cell Hilbert range must fit a 4x4 box, got spans ($xs, $ys)")
    }
  }

  test("domain violations raise on both paths; null propagates") {
    val h = HilbertIndex.hilbertXY(col("x"), col("y"), 4)
    val ex = intercept[Exception] {
      Seq((16L, 0L)).toDF("x", "y").select(h).collect()
    }
    assert(ex.getMessage.contains("hilbert_xy") ||
      Option(ex.getCause).exists(_.getMessage.contains("hilbert_xy")))
    val ex2 = intercept[Exception] {
      Seq((0L, -1L)).toDF("x", "y").filter(h === 0L).collect()
    }
    assert(ex2.getMessage.contains("hilbert_xy") ||
      Option(ex2.getCause).exists(_.getMessage.contains("hilbert_xy")))
    val n = Seq((Some(1L), Option.empty[Long])).toDF("x", "y").select(h).collect()
    assert(n.head.isNullAt(0))
  }

  test("SQL registration") {
    org.apache.spark.sql.GraftSqlBridge.registerAll(spark)
    val d = spark.sql("SELECT hilbert_xy(1, 1L, 0L)").as[Long].head()
    assert(d == 3L)
  }
}
