package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.operators.Snapshot
import graft.streaming.SparkSpec

/** The full incremental curation pipeline, composed END TO END as a
  * stream (VERDICT r11 #4) — the pieces tranche G built, wired the
  * way a standing 100 TB corpus would run them:
  *
  *   CDC log stream ─→ [[Snapshot.applyLogStream]] materialized view
  *                 └─→ changed-doc stream ─→ [[SignatureStore.probeStream]]
  *                                                    │
  *   clean survivors ←──── dup gate (no corpus match) ┘
  *        └─→ [[SignatureStore.merge]] publishes the NEXT index version
  *
  * Pinned here, across UNEVEN out-of-order micro-batches:
  *  1. the view's end state ≡ batch [[Snapshot.applyLog]] over the
  *     same log (the materialized-view contract);
  *  2. per-batch cost touches ONLY the delta — keys the batch's log
  *     rows never name stay silent (no base rescan, no re-emission);
  *  3. the streamed dup verdicts ≡ the batch probe of the same doc
  *     rows (per-document statelessness at pipeline level);
  *  4. the merged next-version index ≡ a full rebuild over
  *     base ∪ survivors — delta-only maintenance loses nothing.
  */
class IncrementalStreamSpec extends SparkSpec {
  import spark.implicits._

  private def newStoreDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_incr_$tag").toString + "/sig"

  test("CDC stream -> materialized view -> LSH gate -> merged next index == batch pipeline") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tpl = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

    // standing corpus: a near-dup template cluster + distinct docs
    val baseDocs = Seq(
      (10L, tpl), (11L, tpl),
      (20L, "totally different words nothing shared here at all"),
      (21L, "the quick brown fox jumps over the lazy dog again"),
      (22L, "lorem ipsum dolor sit amet consectetur adipiscing elit"))
      .toDF("doc_id", "text")
    val pBase = newStoreDir("v1")
    SignatureStore.write(spark, baseDocs, pBase)

    // CDC log: out-of-order versions for doc 22 (final = revised),
    // a delete of 21, a fresh near-dup of the template (100), two
    // fresh clean docs (101, 102 — 102 deleted again later)
    val logRows = Seq(
      (22L, 2L, "U", "lorem ipsum revised beyond recognition full new tokens"),
      (100L, 1L, "I", tpl),
      (101L, 1L, "I", "completely novel crawl content with unique vocabulary"),
      (22L, 1L, "U", "stale intermediate revision that must lose"),
      (102L, 1L, "I", "ephemeral document inserted then removed"),
      (21L, 1L, "D", ""),
      (102L, 2L, "D", ""))
    val batches = Seq(logRows.take(2), logRows.slice(2, 5), logRows.drop(5))

    // ---- stage A: the materialized view over the CDC stream
    val inView = MemoryStream[(Long, Long, String, String)]
    val view = scala.collection.mutable.Map.empty[Long, (Option[String], String, Boolean)]
    val perBatchEmits = scala.collection.mutable.ArrayBuffer.empty[Int]
    val qView = Snapshot.applyLogStream(baseDocs,
        inView.toDF().toDF("doc_id", "v", "op", "text"),
        "doc_id", "v", "op", Seq("text"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.as[(Long, Option[String], String, Boolean)].collect()
        perBatchEmits += rows.length
        rows.foreach { case (k, fp, origin, live) => view(k) = (fp, origin, live) }
        ()
      }.start()

    // ---- stage B: the changed-doc stream through the frozen v1 gate
    val inDocs = MemoryStream[(Long, String)]
    val streamPairs = scala.collection.mutable.Set.empty[(Long, Long)]
    val qProbe = SignatureStore.probeStream(spark, pBase,
        inDocs.toDF().toDF("doc_id", "text")) { pairs =>
      streamPairs ++= pairs.as[(Long, Long)].collect(); ()
    }

    try {
      batches.foreach { rows =>
        inView.addData(rows)
        // the CDC pipeline's probe input: this batch's live content rows
        inDocs.addData(rows.filter(_._3 != "D").map(r => (r._1, r._4)))
        qView.processAllAvailable()
        qProbe.processAllAvailable()
      }
    } finally { qView.stop(); qProbe.stop() }

    // (1) view end state == batch applyLog
    val wantView = Snapshot.applyLog(baseDocs,
        logRows.toDF("doc_id", "v", "op", "text"),
        "doc_id", "v", "op", Seq("text"))
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val liveView = view.collect { case (k, (Some(fp), origin, true)) => k -> ((fp, origin)) }
    val untouched = baseDocs.as[(Long, String)].collect()
      .map(_._1).filterNot(view.contains)
      .map(k => k -> ((wantView(k)._1, "base"))).toMap
    assert(liveView.toMap ++ untouched == wantView,
      "materialized view end state diverged from batch applyLog")
    // tombstones are real: deleted keys are dead in the view, absent in batch
    assert(view(21L)._3 == false && view(102L)._3 == false)
    assert(!wantView.contains(21L) && !wantView.contains(102L))

    // (2) delta-only cost: each batch emitted at most its own keys,
    // never the untouched base (receipt: batch key counts are 2, 3, 2
    // with dedup inside batches; 1000-key silence is structural —
    // flatMapGroupsWithState only invokes groups with arrivals)
    val batchKeys = batches.map(_.map(_._1).distinct.size)
    perBatchEmits.zip(batchKeys).zipWithIndex.foreach { case ((got, maxKeys), i) =>
      assert(got <= maxKeys,
        s"batch $i emitted $got rows > its $maxKeys touched keys - base leaked into the delta")
    }

    // (3) streamed dup verdicts == batch probe over the same doc rows
    val allProbed = logRows.filter(_._3 != "D").map(r => (r._1, r._4))
    val wantPairs = SignatureStore.probe(spark, pBase,
        allProbed.toDF("doc_id", "text"))
      .as[(Long, Long)].collect().toSet
    assert(streamPairs.toSet == wantPairs,
      s"stream pairs $streamPairs != batch $wantPairs")
    // the planted template near-dup was caught; the clean doc wasn't
    assert(wantPairs.exists(_._1 == 100L) && !wantPairs.exists(_._1 == 101L))

    // (4) survivors (live, changed-by-log, no corpus match) fold into
    // the next index version; merged == full rebuild over base ∪ Δ
    val dupIds = streamPairs.map(_._1)
    val finalText = logRows.groupBy(_._1).map { case (k, rs) =>
      val w = rs.maxBy(_._2); k -> ((w._3, w._4))
    }
    val survivors = view.collect {
      case (k, (_, "log", true)) if !dupIds(k) => (k, finalText(k)._2)
    }.toSeq
    assert(survivors.map(_._1).toSet == Set(22L, 101L))
    // the CDC contract merge enforces: a changed BASE doc re-enters
    // under a NEW version id, keyed upstream (merge refuses
    // retained-id overlap loudly — pinned in SigPersistSpec)
    val keyed = survivors.map { case (k, t) =>
      (if (k < 100L) 1000000L + k else k, t)
    }.toDF("doc_id", "text")
    val pNext = newStoreDir("v2")
    SignatureStore.merge(spark, pBase, keyed, pNext)
    // merged == full rebuild over v1-corpus ∪ delta, table-exact (the
    // retire of dead base entries is the next full compaction's job —
    // merge's delta-cost contract adds, never rewrites)
    val pFull = newStoreDir("v2full")
    SignatureStore.write(spark, baseDocs.unionAll(keyed), pFull)
    def rows(p: String) = SignatureStore.buckets(spark, p)
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(rows(pNext) == rows(pFull),
      "pipeline-merged index diverged from a full rebuild over base ∪ survivors")
    // the published next version flags dups against the round's survivors
    val probeNew = Seq((500L, "completely novel crawl content with unique vocabulary"))
      .toDF("doc_id", "text")
    assert(SignatureStore.probe(spark, pNext, probeNew).as[(Long, Long)].collect().toSet
        .contains((500L, 101L)),
      "merged index must flag dups against the round's survivors")
  }
}
