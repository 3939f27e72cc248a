package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** One-purpose measurement main for the g_labelprop sf0.1 cost story
  * (VERDICT r11 #2): time [[graft.operators.Graph.labelPropagation]]
  * over the sf-dir co-purchase graph under explicit gate settings —
  * `driver` (gate = Long.MaxValue, the twin) vs `dist` (gate = 0, the
  * distributed rounds) — with the pair frame pre-materialized (warm
  * memo conditions, so the kernel is what's measured, not the
  * lineitem self-join) and one warmup per arm before the timed
  * alternating reps. Prints one JSON line per rep plus a summary of
  * per-arm minima. Runs identically against an older packaged jar
  * (the signature is stable), so the same harness produces
  * same-binary A/B receipts across rounds.
  *
  * Usage: spark-submit --class graft.tools.LpaTriage <jar> [reps]
  * with SPARK_GRAFT_SF_DIR (default sf0.1).
  */
object LpaTriage {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builderFromEnv("32").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the catalog's co-purchase pair frame, pre-materialized: both
    // arms consume identical warm blocks
    val lp0 = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    val pairs = lp0.select(col("ok"), col("p").as("pa"))
      .join(lp0.select(col("ok"), col("p").as("pb")), Seq("ok"))
      .filter(col("pa") < col("pb"))
      .select(col("pa"), col("pb"))
      .localCheckpoint()

    def loadAvg(): Double =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

    // the full catalog downstream (community sizes join) so the timed
    // plan matches g_labelprop's, not a count-pruned projection
    def run(gate: Long): Double = {
      val t0 = System.nanoTime()
      val lp = graft.operators.Graph.labelPropagation(
        pairs, "pa", "pb", rounds = 4, driverFinishEdges = gate)
      val sizes = lp.groupBy(col("community")).agg(count(lit(1)).as("comm_size"))
      lp.join(sizes, Seq("community"))
        .select(col("node"), col("community"), col("comm_size"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val arms = Seq("driver" -> Long.MaxValue, "dist" -> 0L)
    arms.foreach { case (n, g) =>
      System.err.println(f"[lpa_triage] warmup $n: ${run(g)}%.3f s")
    }
    val times = scala.collection.mutable.Map[String, List[Double]]()
    for (r <- 1 to reps; (n, g) <- arms) {
      val l0 = loadAvg()
      val t = run(g)
      times(n) = t :: times.getOrElse(n, Nil)
      println(f"""{"arm":"$n","rep":$r,"sec":$t%.3f,"load":$l0%.2f}""")
    }
    val mins = times.toSeq.sortBy(_._1)
      .map { case (n, ts) => f""""$n":${ts.min}%.3f""" }.mkString(",")
    println(s"""{"summary":"min","sf":"$sfDir","reps":$reps,$mins}""")
    spark.stop()
  }
}
