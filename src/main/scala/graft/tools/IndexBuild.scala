package graft.tools

import org.apache.spark.sql.SparkSession

/** Index-build entry point (VERDICT r5 #4): train + write the full ANN
  * index set (IVF centroids/lists, PQ codebooks/codes, composed IVFPQ
  * table) for an embeddings table, keyed by data fingerprint. Probe
  * queries (ann_ivf / ann_pq / ann_ivfpq) then read the WRITTEN tables
  * instead of rebuilding — the index outlives the driver, which is the
  * 100 TB serving shape.
  *
  * usage: runMain graft.tools.IndexBuild <sfDir> [indexDir]
  * (indexDir defaults to the fingerprint-derived IndexStore.path)
  */
object IndexBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse {
      System.err.println("usage: graft.tools.IndexBuild <sfDir> [indexDir]")
      sys.exit(2)
    }
    val spark = graft.GraftSession.builderFromEnv("8").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fp = IndexStore.dataFingerprint(sfDir, "embeddings")
    val p = args.lift(1).getOrElse(IndexStore.path(sfDir, fp))
    if (IndexStore.ready(p)) {
      println(s"index already ready: $p")
    } else {
      IndexStore.writeAll(spark, graft.Tables.embeddings(spark, sfDir), p)
      println(s"index written: $p")
    }
    spark.stop()
  }
}
