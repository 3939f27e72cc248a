package graft.tools

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.SparkSpec

/** Streaming ANN probe against a WRITTEN index (VERDICT r10 #5): a
  * query stream served through [[IndexStore.probeStream]] must return
  * the EXACT batch ivfPqSearch top-k for every query, at any
  * micro-batch slicing — ANN probing is per-query stateless, so batch
  * boundaries can never change a result. The index is built once into
  * a temp warehouse via the real writeAll path (centroids + codebooks
  * + unified per-vector table + ready marker). */
class AnnStreamSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("probeStream == batch ivfPqSearch across uneven micro-batches") {
    val corpus = graft.Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_ann_stream")
      .toString + "/idx"
    IndexStore.writeAll(spark, corpus, dir)
    assert(IndexStore.ready(dir))

    // external serving queries: corpus vectors re-identified past the
    // corpus id space (the ann_external round-trip contract — each
    // query's top hit is its corpus twin)
    val queries = corpus.filter(col("vec_id") < 17)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq

    val want = {
      import org.apache.spark.sql.functions.broadcast
      Similarity_batchProbe(dir, queries)
    }

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Seq[Float])]
    val got = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Int)]
    val q = IndexStore.probeStream(spark, dir,
        in.toDF().toDF("vec_id", "embedding"), k = 10, nProbe = 4) { res =>
      got ++= res.as[(Long, Long, Long, Int)].collect()
    }
    try {
      // uneven slicing: 3, then 13, then 1 query
      in.addData(queries.take(3))
      q.processAllAvailable()
      in.addData(queries.slice(3, 16))
      q.processAllAvailable()
      in.addData(queries.drop(16))
      q.processAllAvailable()
    } finally q.stop()

    assert(got.size == want.size, s"stream ${got.size} rows, batch ${want.size}")
    assert(got.toSet == want, "stream top-k diverged from the batch probe")
    // the ann_external round-trip witness holds through the stream:
    // rank-1 of every query is its corpus twin
    val rank1 = got.filter(_._4 == 1).map(r => (r._1, r._2)).toSet
    assert(rank1 == queries.map(_._1).map(q0 => (q0, q0 - 1000000L)).toSet,
      "a query's top hit must be its corpus twin")
  }

  /** Batch twin through the SAME written tables. */
  private def Similarity_batchProbe(dir: String,
      queries: Seq[(Long, Seq[Float])]): Set[(Long, Long, Long, Int)] = {
    import org.apache.spark.sql.functions.broadcast
    graft.operators.Similarity.ivfPqSearch(
        IndexStore.readIvfPqIndex(spark, dir),
        broadcast(IndexStore.readCentroidsDf(spark, dir)),
        IndexStore.readBooks(spark, dir),
        queries.toDF("vec_id", "embedding"),
        k = 10, nProbe = 4, excludeSelf = false)
      .as[(Long, Long, Long, Int)].collect().toSet
  }
}
