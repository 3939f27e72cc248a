package graft.operators

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.streaming.SparkSpec

/** [[Bpe.learnMerges]] against an independent in-memory reference that
  * uses SYMBOL LISTS and explicit greedy scanning (not the framed
  * string representation), so a framing bug — a cross-symbol false
  * match, a chain-merge miss, a trim artifact — shows up as a merge
  * table divergence rather than being shared by both sides. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: list-based BPE over a word histogram. Same contract:
    * occurrence-weighted counts (overlaps counted), winner =
    * (count desc, l asc, r asc), greedy leftmost non-overlap merge,
    * stop when best count < minCount. */
  private def referenceMerges(words: Map[String, Long], numMerges: Int,
                              minCount: Long): Seq[(Long, String, String, Long)] = {
    var segs: Map[String, Vector[String]] =
      words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var stop = false
    while (!stop && out.length < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- segs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + words(w)
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= minCount =>
          out += ((out.length + 1L, l, r, c))
          segs = segs.map { case (w, syms) =>
            val acc = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                acc += (l + r); i += 2
              } else { acc += syms(i); i += 1 }
            }
            w -> acc.result()
          }
        case _ => stop = true
      }
    }
    out.toSeq
  }

  /** Blow a word histogram back up into a one-doc-per-word corpus with
    * `freq` repetitions, so learnMerges' own tokenizer+histogram path
    * is exercised end-to-end. */
  private def corpusOf(words: Map[String, Long]) =
    words.toSeq.flatMap { case (w, f) => Seq.fill(f.toInt)(w) }
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")

  private def collected(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  test("hand corpus: overlap counting, chain merges, tiebreaks, early stop") {
    // "aaaa"×3: (a,a) counts 9 (overlaps), greedy merge gives [aa,aa],
    // then (aa,aa) counts 3 → "aaaa"; "abab"×2 exercises the merged
    // symbol participating in later rounds. Both the adaptive DRIVER
    // path (default gate) and the forced DISTRIBUTED rounds must
    // match the reference.
    val words = Map("aaaa" -> 3L, "abab" -> 2L, "ab" -> 4L)
    val want = referenceMerges(words, 10, 2L)
    for (gate <- Seq(200000L, 0L)) {
      val got = collected(Bpe.learnMerges(corpusOf(words), "text",
        numMerges = 10, driverFinishWords = gate))
      assert(got == want, s"gate=$gate: got $got\nwant $want")
      assert(got.head._4 == 9L, "overlapping (a,a) in aaaa must count 3 per word")
      assert(got.length < 10, "tiny corpus must exhaust merges and stop early")
    }
  }

  test("segment replays the merge table identically to training's final state") {
    val words = Map("joinwhere" -> 5L, "joinselect" -> 4L, "whereselect" -> 3L)
    val merges = Bpe.learnMerges(corpusOf(words), "text", numMerges = 8)
    val segged = Bpe.segment(words.keys.toSeq.toDF("word"), "word", merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    // independent reference replay
    var segs: Map[String, Vector[String]] =
      words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    for (row <- merges.orderBy("rank").collect()) {
      val (l, r) = (row.getString(1), row.getString(2))
      segs = segs.map { case (w, syms) =>
        val acc = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            acc += (l + r); i += 2
          } else { acc += syms(i); i += 1 }
        }
        w -> acc.result()
      }
    }
    assert(segged == segs.map { case (w, v) => w -> (v: Seq[String]) })
    assert(segged.values.forall(sw => sw.nonEmpty),
      "every word must segment into at least one subword")
  }

  test("segment is streaming-safe: micro-batch output equals batch, across batches") {
    // the scaladoc contract (a pure per-row replace chain once the
    // table is learned) pinned in execution: the SAME operator body
    // runs over a stream and matches the batch output — including a
    // word the training corpus never saw
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val words = Map("joinwhere" -> 5L, "joinselect" -> 4L, "whereselect" -> 3L)
    val merges = Bpe.learnMerges(corpusOf(words), "text", numMerges = 8)
    val in = MemoryStream[String]
    val q = Bpe.segment(in.toDF().toDF("word"), "word", merges)
      .writeStream.format("memory").queryName("bpesegs").outputMode("append").start()
    try {
      in.addData("joinwhere", "joinselect")
      q.processAllAvailable()
      in.addData("whereselect", "novelword")
      q.processAllAvailable()
      val got = spark.table("bpesegs").collect()
        .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      val want = Bpe.segment(
          Seq("joinwhere", "joinselect", "whereselect", "novelword").toDF("word"),
          "word", merges).collect()
        .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      assert(got == want && got("novelword").nonEmpty)
    } finally q.stop()
  }

  test("round batching: disjoint-rich histograms equal the reference at every batchK") {
    // 6-letter alphabet + longer words → rounds where several
    // table-order pairs are symbol-disjoint, so the batch guard's
    // accept path (not just its size-1 fallback) is what's under test
    val genWords: Gen[Map[String, Long]] = for {
      n <- Gen.choose(4, 16)
      ws <- Gen.listOfN(n, for {
        len <- Gen.choose(2, 10)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', 'd', 'e', 'f'))
        f <- Gen.choose(1L, 9L)
      } yield (cs.mkString, f))
    } yield ws.toMap
    val prop = Prop.forAll(genWords) { words =>
      val want = referenceMerges(words, 8, 2L)
      Seq(1, 3, 8).forall { k =>
        // driverFinishWords = 0: the batch guard is a DISTRIBUTED-path
        // knob — the driver finish would short-circuit it entirely
        val got = collected(
          Bpe.learnMerges(corpusOf(words), "text", numMerges = 8, batchK = k,
            driverFinishWords = 0L))
        if (got != want)
          println(s"DIVERGED at batchK=$k on $words:\n got $got\n want $want")
        got == want
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("random histograms: learnMerges equals the list-based reference") {
    val genWords: Gen[Map[String, Long]] = for {
      n <- Gen.choose(2, 12)
      ws <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 8)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
        f <- Gen.choose(1L, 9L)
      } yield (cs.mkString, f))
    } yield ws.toMap
    val prop = Prop.forAll(genWords) { words =>
      val want = referenceMerges(words, 6, 2L)
      // default gate = the driver finish; 0 = the distributed rounds
      Seq(200000L, 0L).forall { gate =>
        val got = collected(Bpe.learnMerges(corpusOf(words), "text",
          numMerges = 6, driverFinishWords = gate))
        if (got != want)
          println(s"DIVERGED at gate=$gate on $words:\n got $got\n want $want")
        got == want
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, res.status.toString)
  }
}
