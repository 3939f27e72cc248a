package graft.functions

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** Misra-Gries: the superset guarantee (every item above n/(k+1)
  * retained) holds under any partition layout; exact under k distinct.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(rows: Seq[Long], k: Int, parts: Int): Map[Long, Long] =
    rows.toDF("h").repartition(parts)
      .agg(MisraGries.misraGries(col("h"), k).as("mg"))
      .select(explode(col("mg")).as("e")).select(col("e.h"), col("e.c"))
      .as[(Long, Long)].collect().toMap

  test("exact counts when distinct items fit in k") {
    val rows = Seq.fill(10)(1L) ++ Seq.fill(7)(2L) ++ Seq.fill(3)(3L)
    assert(sketch(rows, 8, 4) == Map(1L -> 10L, 2L -> 7L, 3L -> 3L))
  }

  test("heavy items survive any layout; counts are lower bounds") {
    val rnd = new scala.util.Random(3)
    // 5000 noise items (mostly unique) + two heavy items
    val rows = Seq.fill(5000)(rnd.nextInt(100000).toLong + 1000L) ++
      Seq.fill(800)(1L) ++ Seq.fill(400)(2L)
    val n = rows.size
    val k = 16
    for (parts <- Seq(1, 4, 13)) {
      val mg = sketch(rows, k, parts)
      assert(mg.size <= k)
      // guarantee: true count > n/(k+1) => retained
      assert(mg.contains(1L) && mg.contains(2L), s"parts=$parts lost a heavy item")
      assert(mg(1L) <= 800L && mg(2L) <= 400L) // lower bounds
      assert(mg(1L) >= 800L - n / (k + 1))     // bounded undercount
    }
  }
}
