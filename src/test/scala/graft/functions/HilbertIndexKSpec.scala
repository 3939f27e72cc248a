package graft.functions

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** [[HilbertIndexK]] correctness from the curve's own mathematics
  * (the [[HilbertIndexSpec]] receipt pair, at k = 3): the map is a
  * BIJECTION from the 2^bits cube onto [0, 8^bits), and CONSECUTIVE
  * curve positions are always grid neighbors (|Δ|₁ = 1 — the
  * property that makes any contiguous curve range a compact region).
  * Plus k = 2 continuity (valid Hilbert curve, documented as a
  * different orientation from the classical 2-D loop), locality
  * envelopes, domain violations on both paths, null propagation, SQL
  * registration, and the ZOrderLayout k ≥ 3 routing.
  */
class HilbertIndexKSpec extends SparkSpec {
  import spark.implicits._

  private def cubeDf(bits: Int) = {
    val n = 1 << bits
    (for (x <- 0 until n; y <- 0 until n; z <- 0 until n)
      yield (x.toLong, y.toLong, z.toLong))
      .toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        HilbertIndexK.hilbertK(Seq(col("x"), col("y"), col("z")), bits).as("d"))
  }

  test("k=3: bijection + unit-step continuity on the full 16^3 cube") {
    val rows = cubeDf(4).as[(Long, Long, Long, Long)].collect()
    assert(rows.length == 4096)
    val byD = rows.map(r => r._4 -> ((r._1, r._2, r._3))).toMap
    assert(byD.keySet == (0L until 4096L).toSet,
      "d must be a bijection onto [0, 8^bits)")
    (0L until 4095L).foreach { d =>
      val (x1, y1, z1) = byD(d); val (x2, y2, z2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) + math.abs(z1 - z2) == 1,
        s"curve jump between d=$d ($x1,$y1,$z1) and d+1 ($x2,$y2,$z2)")
    }
  }

  test("k=2: still a Hilbert curve (bijection + continuity on 32x32)") {
    val rows = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        HilbertIndexK.hilbertK(Seq(col("x"), col("y")), 5).as("d"))
      .as[(Long, Long, Long)].collect()
    val byD = rows.map(r => r._3 -> ((r._1, r._2))).toMap
    assert(byD.keySet == (0L until 1024L).toSet)
    (0L until 1023L).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1)
    }
  }

  test("k=3 locality: every 64-cell curve range spans a bounded box") {
    // 64 consecutive positions of an order-4 3-D Hilbert curve cover
    // exactly one or two adjacent 4x4x4 sub-cubes worth of curve, so
    // each coordinate span stays within a constant envelope — the
    // clustering property the layout buys (Morton ranges can span the
    // whole cube edge at quadrant boundaries)
    val spans = cubeDf(4)
      .groupBy((col("d") / 64).cast("long").as("cell"))
      .agg((max(col("x")) - min(col("x"))).as("xs"),
        (max(col("y")) - min(col("y"))).as("ys"),
        (max(col("z")) - min(col("z"))).as("zs"), count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(spans.length == 64)
    spans.foreach { case (_, xs, ys, zs, n) =>
      assert(n == 64 && xs <= 7 && ys <= 7 && zs <= 7,
        s"64-cell 3-D Hilbert range must stay in a bounded box, got ($xs, $ys, $zs)")
    }
  }

  test("domain violations raise on both paths; null propagates") {
    val h = HilbertIndexK.hilbertK(Seq(col("x"), col("y"), col("z")), 4)
    val ex = intercept[Exception] {
      Seq((16L, 0L, 0L)).toDF("x", "y", "z").select(h).collect()
    }
    assert(ex.getMessage.contains("hilbert_k") ||
      Option(ex.getCause).exists(_.getMessage.contains("hilbert_k")))
    val ex2 = intercept[Exception] {
      Seq((0L, 0L, -1L)).toDF("x", "y", "z").filter(h === 0L).collect()
    }
    assert(ex2.getMessage.contains("hilbert_k") ||
      Option(ex2.getCause).exists(_.getMessage.contains("hilbert_k")))
    val n = Seq((Some(1L), Option.empty[Long], Some(0L)))
      .toDF("x", "y", "z").select(h).collect()
    assert(n.head.isNullAt(0))
  }

  test("SQL registration and ZOrderLayout k>=3 hilbert routing agree") {
    org.apache.spark.sql.GraftSqlBridge.registerAll(spark)
    val viaSql = spark.sql("SELECT hilbert_k(4, 3L, 5L, 7L)").as[Long].head()
    val viaLayout = Seq((3L, 5L, 7L)).toDF("x", "y", "z")
      .select(graft.tools.ZOrderLayout.curveKey(
        Seq(col("x"), col("y"), col("z")), 4, "hilbert").as("d"))
      .as[Long].head()
    assert(viaSql == viaLayout)
  }
}
