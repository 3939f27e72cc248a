package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line
  * {"metric":…,"value":…,"unit":"sec","queries":{…},"sf":…}.
  * Each query is forced through a `noop` sink so the full plan
  * (not just a count-pruned projection) executes.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // floor AQE coalescing at the core count: it sizes partitions by
      // shuffle INPUT bytes and otherwise serializes explosive joins
      .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", cpus)
      // minPartitionNum is inert in Spark 4 (parallelismFirst honors
      // only minPartitionSize): a ~1 MB shuffle feeding a CPU-heavy
      // stage still coalesced to ONE task. Small floor = real floor.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def loadAvg(): Double = try {
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
    } catch { case _: Throwable => -1.0 }

    // quiet-window gate (VERDICT r5 #1): the box is co-tenant; if the
    // 1-min load is already high at start, every per-query number is
    // noise. r5's gate of 8 let a 4.7-load window through and the
    // committed artifact showed q1 6x inflated — gate at 2 and retry
    // up to 5 minutes before proceeding with whatever window we got
    // (the recorded load field contextualizes a dirty run).
    var waits = 0
    while (loadAvg() > 2.0 && waits < 5) {
      System.err.println(f"[bench] load ${loadAvg()}%.1f > 2 at start - waiting 60s for a quieter window")
      Thread.sleep(60000)
      waits += 1
    }
    // the window-cleanliness signal is the POST-GATE START load: the
    // end-of-run 1-min average mostly reads back our own 32 threads
    // (measured: a 0.5-load start reads ~4.5 at end of a 68 s run)
    val loadStart = loadAvg()

    // JVM + parquet-footer warmup so per-query timings measure the plan,
    // not first-touch class loading.
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    // Corroborated-minimum per query (VERDICT r6 #2/#5): the box is
    // co-tenant (load swings 1-5 from outside) and a single shot can
    // land 5-10x off. A number is accepted only when the two SMALLEST
    // runs agree within 1.5x — per-query and self-calibrating, unlike
    // the old global "best > 1.5 s" threshold, which quadruple-ran
    // every legitimately-slow query (dd_containment, dd_jaccard, …)
    // while leaving mid-run steal on fast queries unconfirmed
    // (r6's committed q3 read 0.899 s vs the true 0.627 s).
    // Disagreement adds up to two more runs, the last after a 20 s
    // sleep so a live steal window can pass; agreement costs exactly
    // two runs. Worst case 4 runs + one sleep per query.
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // a failed query reports the -1.0 sentinel, joins "failed", and
      // fails the run — a regression must not bench as "fast"
      def once(): Double = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: $e")
          failed += name
          -1.0
        }
      }
      def settled(): Double = {
        var runs = List(once(), once())
        var extra = 0
        while (runs.forall(_ >= 0) && extra < 2 && {
          val s = runs.sorted; s(1) > 1.5 * s(0)
        }) {
          if (extra == 1) {
            System.err.println(
              f"[bench] $name unsettled after 3 runs (load ${loadAvg()}%.1f) - sleeping 20s for the steal window to pass")
            Thread.sleep(20000)
          }
          runs ::= once()
          extra += 1
        }
        if (runs.exists(_ < 0)) -1.0 else runs.min
      }
      name -> settled()
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // co-tenant box: record the 1-min load average so an outlier run
    // can be read against external steal (VERDICT r3 #10). "load" =
    // post-gate start load (the window signal); "load_end" includes
    // our own threads' tail.
    val loadEnd = loadAvg()
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failedJson,"load":$loadStart%.2f,"load_end":$loadEnd%.2f,"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
