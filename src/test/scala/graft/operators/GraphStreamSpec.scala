package graft.operators

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.streaming.SparkSpec

/** The streaming analog Graph.scala's batch-only contract names:
  * multi-pass fixpoints can't run inside Structured Streaming's
  * single-pass incremental model, so the streaming deployment is a
  * periodic RE-RUN over the accumulated edge snapshot from
  * foreachBatch. This spec drives that exact shape — edges arriving
  * over three micro-batches, each batch appending to the snapshot and
  * re-ranking it — and pins the final streaming-side ranks to the
  * one-shot batch ranks over the same edges (bit-equal, since
  * pageRankMicro is integer-exact and layout-invariant). */
class GraphStreamSpec extends SparkSpec {

  test("foreachBatch snapshot re-rank equals one-shot batch PageRank") {
    import spark.implicits._
    val snapshotDir = java.nio.file.Files
      .createTempDirectory("graft-graph-snapshot").toString
    val und = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 3L), (1L, 5L), (2L, 5L))
    val directed = und ++ und.map(_.swap)

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    @volatile var latest: Map[Long, Long] = Map.empty
    val q = stream.toDS().toDF("src", "dst").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(snapshotDir)
        latest = Graph.pageRankMicro(
            spark.read.parquet(snapshotDir), "src", "dst", iterations = 3)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      .start()
    try {
      directed.grouped(6).foreach { chunk =>
        stream.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()

    val batchRanks = Graph.pageRankMicro(
        directed.toDF("src", "dst"), "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(latest == batchRanks,
      "snapshot re-rank after the last micro-batch must equal the one-shot batch ranks")
    assert(latest.nonEmpty && latest.keySet == (1L to 5L).toSet)
  }

  test("snapshot BFS twin: frontier distances equal batch on the final snapshot") {
    import spark.implicits._
    val snapshotDir = java.nio.file.Files
      .createTempDirectory("graft-bfs-snapshot").toString
    val path = (1L to 6L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, Long)]
    @volatile var latest: Map[Long, Long] = Map.empty
    val q = stream.toDS().toDF("src", "dst").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(snapshotDir)
        latest = Graph.shortestHops(spark.read.parquet(snapshotDir),
            "src", "dst", Seq(1L).toDF("node"), maxHops = 6)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      }
      .start()
    try {
      path.grouped(5).foreach { chunk =>
        stream.addData(chunk: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val batchDist = Graph.shortestHops(path.toDF("src", "dst"),
        "src", "dst", Seq(1L).toDF("node"), maxHops = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(latest == batchDist)
    assert(latest == (1L to 7L).map(n => n -> (n - 1)).toMap)
  }
}
