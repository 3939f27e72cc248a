package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** Bounded top-k aggregate vs the row_number window it replaced —
  * including score ties (id tiebreak), k larger than the group, and
  * the merge path (many input partitions → partial buffers merged).
  */
class TopKPairsSpec extends SparkSpec {
  import spark.implicits._

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g")).orderBy(col("s").desc, col("id"))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("g"), col("id"), col("s"), col("rk"))
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(TopKPairs.topKPairs(col("s"), col("id"), k).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "p")))
      .select(col("g"), col("p.id").as("id"), col("p.score").as("s"),
        (col("pos") + 1).cast("int").as("rk"))

  test("matches the window form, with ties and k > group size") {
    // deterministic pseudo-random rows with deliberate score ties
    val rows = (0 until 5000).map { i =>
      (i % 7, i.toLong, ((i * 2654435761L) % 100).toDouble / 10.0)
    } ++ Seq((9, 1L, 5.0), (9, 2L, 5.0), (9, 3L, 5.0)) // tiny group, pure ties
    val df = rows.toDF("g", "id", "s").repartition(16) // force merge path
    for (k <- Seq(1, 10, 50)) {
      val want = windowTopK(df, k).as[(Int, Long, Double, Int)].collect().toSet
      val got = aggTopK(df, k).as[(Int, Long, Double, Int)].collect().toSet
      assert(got == want, s"k=$k")
    }
  }

  test("null scores and ids are skipped, not ranked") {
    val df = Seq((1, Some(1L), Some(2.0)), (1, Some(2L), None),
      (1, None, Some(9.0)), (1, Some(3L), Some(1.0)))
      .toDF("g", "id", "s")
    val got = aggTopK(df, 2).as[(Int, Long, Double, Int)].collect().toSet
    assert(got == Set((1, 1L, 2.0, 1), (1, 3L, 1.0, 2)))
  }
}
