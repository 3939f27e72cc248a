package graft.queries

import graft.streaming.SparkSpec

/** Composition invariants of pipe_pretrain that the per-value oracle
  * hash can confirm but not EXPLAIN: the packed stream is a gapless
  * token-offset sequence over exactly the curated survivor set.
  */
class PipelineSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("pipe_pretrain: offsets are gapless over the curated set, splits total") {
    val rows = ExtensionCatalog.pipePretrain(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sortBy(_._1)
    assert(rows.nonEmpty)
    // gapless global token stream in doc_id order: each doc's offset
    // is the previous doc's offset + token count; first offset is 0
    assert(rows.head._3 == 0L)
    rows.sliding(2).foreach {
      case Array((_, n0, off0, _, _), (id1, _, off1, _, _)) =>
        assert(off1 == off0 + n0, s"gap before doc $id1")
      case _ =>
    }
    // sequence id = offset div 1024, and every split is one of the three
    rows.foreach { case (id, _, off, seq, split) =>
      assert(seq == off / 1024, s"doc $id seq_id mismatch")
      assert(Set("train", "valid", "test")(split))
    }
    // the packed set IS the curated survivor set: gate + exact dedup
    val curated = ExtensionCatalog.pipeCurate(spark, sfDir)
      .select("survivor_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == curated,
      "pipe_pretrain packs a different document set than pipe_curate survives")
  }

  test("pipe_rag: chunks cover exactly the curated survivor set, contiguously") {
    val rows = ExtensionCatalog.pipeRag(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(6))).sortBy(r => (r._1, r._2))
    assert(rows.nonEmpty)
    // chunked docs == curated survivors (same gate+dedup stages)
    val curated = ExtensionCatalog.pipeCurate(spark, sfDir)
      .select("survivor_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == curated,
      "pipe_rag chunks a different document set than pipe_curate survives")
    // per doc: chunk indices are 0..k contiguous, starts every 24, every
    // chunk non-empty, and one split label per doc
    rows.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until sorted.length.toLong),
        s"doc $id chunk indices not contiguous")
      sorted.foreach { case (_, idx, start, n, _) =>
        assert(start == idx * 24 && n >= 1 && n <= 32)
      }
      assert(cs.map(_._5).toSet.size == 1, s"doc $id has multiple splits")
    }
  }
}
