package graft.operators

import org.apache.spark.sql.functions._

import graft.streaming.SparkSpec

/** The scale-safe batch replay: secondary-sort fold results match the
  * sequential reference under heavy key skew, and the physical plan is
  * sort-based (no per-group materialization operator at all).
  */
class SecondarySortSpec extends SparkSpec {
  import spark.implicits._

  test("keyedFold matches a sequential fold under one-key-dominates skew") {
    // one hot key with 100k rows, two cold keys — the shape that OOMs
    // a groupByKey.flatMapGroups Vector buffer at scale
    val n = 100000
    val hot = (0 until n).map(i => ("hot", i.toLong, (i % 97).toDouble))
    val cold = Seq(("a", 1L, 2.0), ("a", 2L, 4.0), ("b", 5L, 9.0))
    val ds = spark.createDataset(scala.util.Random.shuffle(hot ++ cold))
    val out = RunningAggs.emaPerKey(ds).collect().toMap
    def seqEma(xs: Seq[Double]): Double =
      xs.tail.foldLeft(xs.head)((e, x) => 0.1 * x + 0.9 * e)
    assert(out.keySet == Set("hot", "a", "b"))
    assert(out("hot") == seqEma(hot.sortBy(r => (r._2, r._3)).map(_._3)))
    assert(out("a") == seqEma(Seq(2.0, 4.0)) && out("b") == 9.0)
  }

  test("emaPerKey plan is sort-based: no group-materializing operator") {
    val ds = Seq(("k", 1L, 1.0), ("k", 2L, 2.0)).toDS()
    val plan = RunningAggs.emaPerKey(ds).queryExecution.executedPlan.toString
    assert(plan.contains("Sort") && plan.contains("MapPartitions"),
      s"expected secondary-sort shape, got:\n$plan")
    assert(!plan.contains("FlatMapGroups") && !plan.contains("MapGroups"),
      s"per-group materialization operator found in:\n$plan")
  }

  test("boundary flush emissions precede the next key's rows") {
    val ds = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 1L, 5.0)).toDS()
    val sorted = ds.repartition(1).sortWithinPartitions(col("_1"), col("_2"))
    val out = SecondarySort.keyedFoldFlush(sorted)(
      _._1, () => 0.0,
      (s: Double, r: (String, Long, Double)) => (s + r._3, Seq(s"${r._1}:row")),
      (k: String, s: Double) => Seq(s"$k:flush=$s")).collect().toSeq
    assert(out == Seq("a:row", "a:row", "a:flush=3.0", "b:row", "b:flush=5.0"))
  }
}
