package graft.queries

/** DuckDB oracle twins for [[QueryCatalog]] / [[ExtensionCatalog]].
  *
  * Parity rules (learned against DuckDB 1.0):
  *  - DuckDB `regexp_replace` replaces the FIRST match unless the 'g'
  *    flag is passed — Spark replaces all; every oracle uses 'g'.
  *  - integer sums: DuckDB sum(BIGINT) → HUGEINT; cast back to BIGINT.
  *  - epoch() → DOUBLE; cast to BIGINT.
  *  - cross-engine hash: ('0x' || substr(md5(x),1,15))::BIGINT, the
  *    twin of graft.functions.Hashing.md5Long.
  *  - never emit raw events.ts (ns vs floored-µs mismatch).
  *  - all doubles rounded (2/4/6 decimals) in BOTH engines before
  *    comparison; ranking happens on the rounded value.
  */
object Oracles {

  /** Tokenizer twin of StatelessOps.explodeTokens / Dedup.tokenHashes. */
  private val tokCte =
    """toks_raw AS (
      |  SELECT doc_id, unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' ')) AS tok FROM documents),
      |toks AS (
      |  SELECT DISTINCT doc_id,
      |    ('0x' || substr(md5(tok),1,15))::BIGINT AS h
      |  FROM toks_raw WHERE length(tok) > 0)""".stripMargin

  /** Non-distinct variant (token multiset) for the fingerprint. */
  private val tokMultisetCte =
    """toks_raw AS (
      |  SELECT doc_id, unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' ')) AS tok FROM documents),
      |toks AS (
      |  SELECT doc_id, ('0x' || substr(md5(tok),1,15))::BIGINT % 2147483647 AS h
      |  FROM toks_raw WHERE length(tok) > 0)""".stripMargin


  /** The ds_profile oracle union (per-column single passes over
    * orders) — shared verbatim by ds_expectations' CTE. */
  private lazy val ordersProfileSql: String = {
    def num(c: String) =
      s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  round(CAST(min($c) AS DOUBLE), 6) AS min_num,
         |  round(CAST(max($c) AS DOUBLE), 6) AS max_num,
         |  CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s
         |FROM orders""".stripMargin
    def str(c: String, e: String) =
      s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN $e IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  CAST(count(DISTINCT $e) AS BIGINT) AS n_distinct,
         |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
         |  CAST(min($e) AS VARCHAR) AS min_s, CAST(max($e) AS VARCHAR) AS max_s
         |FROM orders""".stripMargin
    Seq(num("o_custkey"), num("o_totalprice"),
      str("o_orderstatus", "o_orderstatus"),
      str("o_orderpriority", "o_orderpriority"),
      str("o_orderdate", "CAST(o_orderdate AS DATE)"))
      .mkString("\n UNION ALL \n")
  }

  /** MinHash permutation j twin of Hashing.affine61 — the wide
    * mod-2^61-1 family (r12): DuckDB's HUGEINT carries the 67-bit
    * product directly, the engine side does the same arithmetic with
    * Mersenne split-folding inside 63 bits (equality
    * property-verified). */
  private def mh(j: Int): String =
    s"min(CAST((CAST(${2 * j + 1} AS HUGEINT) * h + ${12345 * (j + 1)}) % 2305843009213693951 AS BIGINT)) AS mh$j"

  /** [[sigCte]]/[[bandsCte]] generalized to an arbitrary (doc_id,
    * text) source subquery with a name prefix, so one statement can
    * band TWO different frames (pipe_incremental: the revised fresh
    * docs vs the standing corpus). Emits `<p>_sig` and `<p>_bands`. */
  private def sigBandsCteFor(p: String, srcSql: String,
                             bands: Int, rowsPerBand: Int): String = {
    val k = bands * rowsPerBand
    val selects = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(j => s"mh$j")
      s"SELECT doc_id, $b AS band, ('0x' || substr(md5(concat_ws('_', ${cols.mkString(", ")})),1,15))::BIGINT AS bucket FROM ${p}_sig"
    }
    s"""${p}_raw AS (
       |  SELECT doc_id, unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
       |    '[^a-z \\n]+', '', 'g'), '\\s+', ' ', 'g')), ' ')) AS tok FROM ($srcSql)),
       |${p}_toks AS (
       |  SELECT DISTINCT doc_id,
       |    ('0x' || substr(md5(tok),1,15))::BIGINT AS h
       |  FROM ${p}_raw WHERE length(tok) > 0),
       |${p}_sig AS (SELECT doc_id, ${(0 until k).map(mh).mkString(", ")}
       |  FROM ${p}_toks GROUP BY doc_id),
       |${p}_bands AS (${selects.mkString(" UNION ALL ")})""".stripMargin
  }

  // ---- Rademacher sign-LSH twins (dd_embed_cosine / ann_bucketed) ----
  // The hyperplane constants come from Similarity.hyperplaneSign — ONE
  // source of truth — inlined as literal signed sums with the same left
  // association as the Spark expression, so the projection doubles are
  // bit-equal. nbits derives from corpus size by the same integer
  // binary-length formula (no float log2).
  private val EmbDim = 64
  private val MaxBits = 16

  private val nbitsCte =
    "nb AS (SELECT greatest(4, length(printf('%b', greatest((count(*) - 1) // 64, 1)))) AS nbits FROM embeddings)"

  private def projSql(bit: Int): String =
    (0 until EmbDim).map { d =>
      val s = graft.operators.Similarity.hyperplaneSign(bit, d)
      s"CAST(embedding[${d + 1}] AS DOUBLE) * $s.0"
    }.mkString("(", " + ", ")")

  // mm_phash shared CTEs: the analytic cell-grid aHash (`hs` =
  // (doc_id, phash_hi, phash_lo)) — reused by the hamming-pair twin.
  // Each grid cell is uniformly synthColor(m*64 + b), so its MEAN
  // luma is the cell's luma and bit b reduces to
  // luma_b * (w*h) >= Σ_b luma_b · px_b (px cancels)
  private val phashCtes =
    """p AS (SELECT doc_id,
      |    16 + strlen(text) % 48 AS w, 16 + (strlen(text) // 48) % 48 AS h,
      |    doc_id % 32 AS m FROM documents),
      |cl AS (SELECT doc_id, w, h, b,
      |    ((m * 977 + b) % 256) + (((m * 977 + b) * 31) % 256)
      |      + (((m * 977 + b) * 97) % 256) AS luma,
      |    (((b % 8) + 1) * w // 8 - (b % 8) * w // 8)
      |      * (((b // 8) + 1) * h // 8 - (b // 8) * h // 8) AS px
      |  FROM p, generate_series(0, 63) g(b)),
      |t AS (SELECT doc_id, sum(luma * px) AS totalsum FROM cl GROUP BY 1),
      |bits AS (SELECT cl.doc_id, b,
      |    CASE WHEN luma * (w * h) >= totalsum THEN 1 ELSE 0 END AS bit
      |  FROM cl JOIN t USING (doc_id)),
      |hs AS (SELECT doc_id,
      |    CAST(sum(CASE WHEN b >= 32
      |      THEN bit * (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END) AS BIGINT) AS phash_hi,
      |    CAST(sum(CASE WHEN b < 32
      |      THEN bit * (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS phash_lo
      |  FROM bits GROUP BY doc_id)""".stripMargin

  // mm_phash pair-candidate CTEs (ch = per-chunk rows, cand =
  // same-chunk candidate pairs with both signatures) — shared by the
  // first-match pair twin (adds the fm suppression) and the
  // components closure (which needs only the qualifying pair SET)
  private val phashCandCtes =
    s"""$phashCtes,
      |ch AS (SELECT doc_id, phash_hi AS hi, phash_lo AS lo, c,
      |    CASE WHEN c < 4 THEN (phash_lo >> (c * 8)) & 255
      |      ELSE (phash_hi >> ((c - 4) * 8)) & 255 END AS cval
      |  FROM hs, generate_series(0, 7) g(c)),
      |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.c,
      |    a.hi AS ha, a.lo AS la, b.hi AS hb, b.lo AS lb
      |  FROM ch a JOIN ch b ON a.c = b.c AND a.cval = b.cval
      |    AND a.doc_id < b.doc_id)""".stripMargin

  // emb_project twin: the same hyperplane family at row offset 16
  // (= MaxBits, past every bucket bit), over micro-unit INTEGER
  // components — long sums are order-independent, so association
  // doesn't matter here, only the shared sign constants
  private def projMicroSql(j: Int): String =
    (0 until EmbDim).map { d =>
      val s = graft.operators.Similarity.hyperplaneSign(MaxBits + j, d)
      s"($s) * CAST(round(CAST(embedding[${d + 1}] AS DOUBLE) * 1000000) AS BIGINT)"
    }.mkString("(", " + ", ")")

  private def bucketSql: String =
    (0 until MaxBits).map { b =>
      s"(CASE WHEN $b < nbits AND ${projSql(b)} > 0 THEN ${1L << b} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  private def lshBucketsCte: String =
    s"""$nbitsCte,
       |b AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings, nb)""".stripMargin

  // ---- product-quantization twin (emb_pq) ----
  // Per-subspace unrolled two-iteration L2 k-means mirroring
  // Similarity.pqTrain/pqAssign exactly, in PURE INTEGER micro-units:
  // shared md5-smallest init quantized once, argmin integer L2² with
  // cent-id tiebreak, half-away-from-zero integer means (a rounded
  // DOUBLE mean diverges at exact-half boundaries — power-of-two
  // cluster sizes make s/n binary-exact and the engines' round()
  // implementations then disagree), empty clusters carry over; the
  // final encode emits the code and the integer error witness.
  private def pqSubCtes(j: Int): String = {
    val lo = j * 8 + 1
    val hi = j * 8 + 8
    // exact integer micro-unit L2² — Similarity.microL2's SQL twin.
    // `src`: training iterations run over the st$j SAMPLE slices
    // (pqTrain's trainSample=0.5 contract); the final encode pass
    // covers the full s$j corpus.
    def dist(cents: String, tag: String, src: String) =
      s"""d$j$tag AS (SELECT s.vec_id, s.sv, c.cent_id,
         |    list_sum(list_transform(generate_series(1, 8),
         |      i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))) AS d2
         |  FROM $src s, $cents c)""".stripMargin
    def iter(n: Int, prev: String) =
      s"""${dist(prev, n.toString, s"st$j")},
         |a$j$n AS (SELECT vec_id, sv, cent_id,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) AS crn FROM d$j$n),
         |m$j$n AS (SELECT cent_id, dimi,
         |    CAST(CASE WHEN s >= 0 THEN (2 * s + cnt) // (2 * cnt)
         |      ELSE -((2 * -s + cnt) // (2 * cnt)) END AS BIGINT) AS cval
         |  FROM (SELECT cent_id, i AS dimi, sum(sv[i]) AS s, count(*) AS cnt
         |    FROM a$j$n, generate_series(1, 8) g(i) WHERE crn = 1 GROUP BY 1, 2)),
         |g$j$n AS (SELECT cent_id, list(cval ORDER BY dimi) AS cv FROM m$j$n GROUP BY 1),
         |c$j$n AS (SELECT c.cent_id, coalesce(g.cv, c.cv) AS cv
         |  FROM $prev c LEFT JOIN g$j$n g USING (cent_id))""".stripMargin
    s"""s$j AS (SELECT vec_id,
       |    list_transform(embD[$lo:$hi], x -> CAST(round(x * 1000000) AS BIGINT)) AS sv
       |  FROM seedpq),
       |st$j AS (SELECT vec_id,
       |    list_transform(embD[$lo:$hi], x -> CAST(round(x * 1000000) AS BIGINT)) AS sv
       |  FROM trainpq),
       |c${j}0 AS (SELECT cent_id,
       |    list_transform(embD[$lo:$hi], x -> CAST(round(x * 1000000) AS BIGINT)) AS cv
       |  FROM initpq),
       |${iter(1, s"c${j}0")},
       |${iter(2, s"c${j}1")},
       |${dist(s"c${j}2", "f", s"s$j")},
       |f$j AS (SELECT vec_id, cent_id AS c$j, CAST(d2 AS BIGINT) AS errm$j
       |  FROM (SELECT vec_id, cent_id, d2,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d2, cent_id) AS crn FROM d${j}f)
       |  WHERE crn = 1)""".stripMargin
  }

  /** Shared PQ preamble: full-corpus seed (encode + query LUTs), the
    * deterministic md5 half-sample the TRAINING chain runs on
    * (pqTrain trainSample=0.5 — same predicate as ds_sample_hash),
    * and the 16 md5-smallest SAMPLE vectors as init. */
  private val pqSeedCtes =
    """seedpq AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embD,
      |    md5('pq_' || CAST(vec_id AS VARCHAR)) AS hk FROM embeddings),
      |trainpq AS (SELECT * FROM seedpq
      |  WHERE (('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '_sample'),1,15))::BIGINT
      |    % 2147483647) / 2147483647.0 < 0.5),
      |initpq AS (SELECT row_number() OVER (ORDER BY hk, vec_id) - 1 AS cent_id, embD
      |  FROM (SELECT * FROM trainpq ORDER BY hk, vec_id LIMIT 16))""".stripMargin

  /** Force DuckDB to materialize every CTE of the generated PQ
    * queries: the training chains are referenced more than once (code
    * chain + query LUTs), and default CTE inlining re-evaluates each
    * reference — the ann_pq tree ran > 7 min inlined vs 1.5 s
    * materialized at sf0.01. */
  private def materializeCtes(sql: String): String =
    sql.replace("AS (SELECT", "AS MATERIALIZED (SELECT")

  private def pqOracle: String = materializeCtes {
    val subs = (0 until 8).map(pqSubCtes).mkString(",\n")
    val joins = (1 until 8).map(j => s"JOIN f$j USING (vec_id)").mkString(" ")
    val codes = (0 until 8).map(j => s"f$j.c$j").mkString(", ")
    val errs = (0 until 8).map(j => s"f$j.errm$j").mkString(" + ")
    s"""WITH $pqSeedCtes,
       |$subs
       |SELECT f0.vec_id, $codes, CAST($errs AS BIGINT) AS err_micro2
       |FROM f0 $joins""".stripMargin
  }

  /** ADC search twin: same generated per-subspace chains, then each
    * query's integer LUT against the final codebooks and the 8-way
    * LUT-sum ranking with the vec_id tiebreak. */
  private def annPqOracle: String = materializeCtes {
    val subs = (0 until 8).map(pqSubCtes).mkString(",\n")
    val joins = (1 until 8).map(j => s"JOIN f$j USING (vec_id)").mkString(" ")
    val codeCols = (0 until 8).map(j => s"f$j.c$j").mkString(", ")
    val luts = (0 until 8).map { j =>
      s"""qs$j AS (SELECT vec_id AS query_id, sv FROM s$j WHERE vec_id < 20),
         |l$j AS (SELECT q.query_id, c.cent_id,
         |    list_sum(list_transform(generate_series(1, 8),
         |      i -> (q.sv[i] - c.cv[i]) * (q.sv[i] - c.cv[i]))) AS d2
         |  FROM qs$j q, c${j}2 c)""".stripMargin
    }.mkString(",\n")
    val lutJoins = (1 until 8).map(j =>
      s"JOIN l$j ON l$j.query_id = l0.query_id AND l$j.cent_id = c.c$j").mkString(" ")
    val distSum = (0 until 8).map(j => s"l$j.d2").mkString(" + ")
    s"""WITH $pqSeedCtes,
       |$subs,
       |codes AS (SELECT f0.vec_id, $codeCols FROM f0 $joins),
       |$luts,
       |adc AS (SELECT l0.query_id, c.vec_id, ($distSum) AS adist
       |  FROM codes c JOIN l0 ON l0.cent_id = c.c0 $lutJoins
       |  WHERE c.vec_id <> l0.query_id)
       |SELECT query_id, vec_id, CAST(adist AS BIGINT) AS adist, rk FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist, vec_id) AS rk
       |  FROM adc) WHERE rk <= 10""".stripMargin
  }

  /** IVFPQ twin (ann_ivfpq / ann_external): the ann_ivf coarse chain
    * supplies each vector's inverted-list id and each query's 4 probe
    * lists; the ann_pq chain supplies codes and per-query LUTs; ADC
    * then ranks only the PROBED lists' codes — by_residual=false, so
    * both chains are verbatim shared with their standalone twins.
    *
    * `idShift` re-identifies the query frame OUTSIDE the corpus id
    * space (the ann_external serving shape — queries are new vectors,
    * not corpus members) and `excludeSelf=false` then keeps every
    * candidate: an id collision would be coincidence, not a
    * self-match. Defaults reproduce ann_ivfpq byte-for-byte. */
  private def annIvfPqOracle(idShift: Long = 0L,
                             excludeSelf: Boolean = true,
                             rerank: Option[(Int, Int)] = None): String =
    materializeCtes {
    val subs = (0 until 8).map(pqSubCtes).mkString(",\n")
    val joins = (1 until 8).map(j => s"JOIN f$j USING (vec_id)").mkString(" ")
    val codeCols = (0 until 8).map(j => s"f$j.c$j").mkString(", ")
    val qid = if (idShift == 0L) "vec_id" else s"vec_id + $idShift"
    val luts = (0 until 8).map { j =>
      s"""qs$j AS (SELECT $qid AS query_id, sv FROM s$j WHERE vec_id < 20),
         |l$j AS (SELECT q.query_id, c.cent_id,
         |    list_sum(list_transform(generate_series(1, 8),
         |      i -> (q.sv[i] - c.cv[i]) * (q.sv[i] - c.cv[i]))) AS d2
         |  FROM qs$j q, c${j}2 c)""".stripMargin
    }.mkString(",\n")
    val lutJoins = (0 until 8).map(j =>
      s"JOIN l$j ON l$j.query_id = p.query_id AND l$j.cent_id = c.c$j").mkString(" ")
    val distSum = (0 until 8).map(j => s"l$j.d2").mkString(" + ")
    val probesRef = if (idShift == 0L) "" else
      s",\nprobesx AS (SELECT query_id + $idShift AS query_id, cent_id FROM probes)"
    val probesName = if (idShift == 0L) "probes" else "probesx"
    val selfFilter = if (excludeSelf) "\n  WHERE c.vec_id <> p.query_id" else ""
    // default tail: rank by ADC; rerank tail: shortlist by ADC, then
    // exact-cosine re-rank of the shortlist (queries are corpus
    // members here, so q_emb reads back from embeddings by query_id)
    val tail = rerank match {
      case None =>
        """SELECT query_id, vec_id, CAST(adist AS BIGINT) AS adist, rk FROM (
          |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist, vec_id) AS rk
          |  FROM adc) WHERE rk <= 10""".stripMargin
      case Some((shortlist, k)) =>
        require(idShift == 0L, "rerank oracle assumes corpus-member queries")
        s""",
           |sl AS (SELECT query_id, vec_id FROM (
           |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY adist, vec_id) AS rk0
           |  FROM adc) WHERE rk0 <= $shortlist),
           |rr AS (SELECT s.query_id, s.vec_id,
           |    round(list_cosine_similarity(list_transform(q.embedding, x -> CAST(x AS DOUBLE)),
           |      list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos
           |  FROM sl s JOIN embeddings e ON e.vec_id = s.vec_id
           |  JOIN embeddings q ON q.vec_id = s.query_id)
           |SELECT query_id, vec_id, cos, rk FROM (SELECT *,
           |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
           |  FROM rr) WHERE rk <= $k""".stripMargin
    }
    val adcSep = if (rerank.isEmpty) "\n" else ""
    s"""WITH $ivfCtes,
       |$pqSeedCtes,
       |$subs,
       |codes AS (SELECT f0.vec_id, $codeCols FROM f0 $joins)$probesRef,
       |$luts,
       |adc AS (SELECT p.query_id, c.vec_id, ($distSum) AS adist
       |  FROM codes c JOIN assigned a ON a.vec_id = c.vec_id
       |  JOIN $probesName p ON p.cent_id = a.cent_id $lutJoins$selfFilter)$adcSep$tail""".stripMargin
  }

  /** The ann_ivf coarse chain (corpus-adaptive k = greatest(32,
    * ceil(sqrt(n))) matching Similarity.adaptiveNCentroids, seeded
    * 2-iteration k-means → per-vector argmax-cosine list assignment →
    * per-query 4-probe selection), shared verbatim with ann_ivfpq:
    * `assigned` = (vec_id, embedding, cent_id), `probes` = (query_id,
    * q_emb, cent_id) for vec_id < 20. */
  private val ivfCtes =
    """seed AS (SELECT vec_id, embedding,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embD,
      |    md5(concat('km_', CAST(vec_id AS VARCHAR))) AS hk FROM embeddings),
      |ksel AS (SELECT greatest(32, CAST(ceil(sqrt(count(*))) AS BIGINT)) AS k
      |  FROM seed),
      |c0 AS (SELECT row_number() OVER (ORDER BY hk, vec_id) - 1 AS cent_id,
      |    embD AS cent_emb
      |  FROM seed QUALIFY row_number() OVER (ORDER BY hk, vec_id) <= (SELECT k FROM ksel)),
      |a1 AS (SELECT s.vec_id, s.embD, c.cent_id,
      |    row_number() OVER (PARTITION BY s.vec_id ORDER BY
      |      round(list_cosine_similarity(s.embD, c.cent_emb), 6) DESC, c.cent_id) AS crn
      |  FROM seed s, c0 c),
      |m1 AS (SELECT cent_id, i - 1 AS dim,
      |    round(sum(CAST(round(embD[i] * 1000000) AS BIGINT)) / (count(*) * 1000000.0), 6) AS cval
      |  FROM a1, generate_series(1, 64) g(i) WHERE crn = 1 GROUP BY 1, 2),
      |g1 AS (SELECT cent_id, list(cval ORDER BY dim) AS new_emb FROM m1 GROUP BY 1),
      |c1 AS (SELECT c.cent_id, coalesce(g.new_emb, c.cent_emb) AS cent_emb
      |  FROM c0 c LEFT JOIN g1 g ON c.cent_id = g.cent_id),
      |a2 AS (SELECT s.vec_id, s.embD, c.cent_id,
      |    row_number() OVER (PARTITION BY s.vec_id ORDER BY
      |      round(list_cosine_similarity(s.embD, c.cent_emb), 6) DESC, c.cent_id) AS crn
      |  FROM seed s, c1 c),
      |m2 AS (SELECT cent_id, i - 1 AS dim,
      |    round(sum(CAST(round(embD[i] * 1000000) AS BIGINT)) / (count(*) * 1000000.0), 6) AS cval
      |  FROM a2, generate_series(1, 64) g(i) WHERE crn = 1 GROUP BY 1, 2),
      |g2 AS (SELECT cent_id, list(cval ORDER BY dim) AS new_emb FROM m2 GROUP BY 1),
      |c2 AS (SELECT c.cent_id, coalesce(g.new_emb, c.cent_emb) AS cent_emb
      |  FROM c1 c LEFT JOIN g2 g ON c.cent_id = g.cent_id),
      |ac AS (SELECT s.vec_id, s.embedding, s.embD, c.cent_id,
      |    row_number() OVER (PARTITION BY s.vec_id ORDER BY
      |      round(list_cosine_similarity(s.embD, c.cent_emb), 6) DESC, c.cent_id) AS crn
      |  FROM seed s, c2 c),
      |assigned AS (SELECT vec_id, embedding, cent_id FROM ac WHERE crn = 1),
      |probes AS (SELECT vec_id AS query_id, embedding AS q_emb, cent_id FROM ac
      |  WHERE vec_id < 20 AND crn <= 4)""".stripMargin

  private def sigCte(k: Int): String =
    s"""$tokCte,
       |sig AS (SELECT doc_id, ${(0 until k).map(mh).mkString(", ")}
       |  FROM toks GROUP BY doc_id)""".stripMargin

  private def bandsCte(bands: Int, rowsPerBand: Int): String = {
    val selects = (0 until bands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(j => s"mh$j")
      s"SELECT doc_id, $b AS band, ('0x' || substr(md5(concat_ws('_', ${cols.mkString(", ")})),1,15))::BIGINT AS bucket FROM sig"
    }
    s"bands AS (${selects.mkString(" UNION ALL ")})"
  }

  /** The dd_jaccard pair pipeline (LSH candidates → exact rounded
    * Jaccard >= 0.7) as a CTE chain ending in `jpairs` — shared by
    * dd_jaccard and the dd_components closure over the same edges. */
  private def jaccardCtes: String =
    s"""${sigCte(32)}, ${bandsCte(4, 8)},
       |cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
       |    AND a.doc_id < b.doc_id),
       |arrs AS (SELECT doc_id, list(h) AS toks_l, count(*) AS sz FROM toks GROUP BY doc_id),
       |jpairs AS (SELECT doc_a, doc_b, jaccard FROM (
       |  SELECT doc_a, doc_b,
       |    round(len(list_intersect(x.toks_l, y.toks_l))
       |      / (x.sz + y.sz - len(list_intersect(x.toks_l, y.toks_l))), 6) AS jaccard
       |  FROM cands JOIN arrs x ON doc_a = x.doc_id JOIN arrs y ON doc_b = y.doc_id)
       |WHERE jaccard >= 0.7)""".stripMargin

  /** DuckDB twins of [[TpchCatalog]] — the classic suite adapted to
    * the reduced schema. Stated in the original correlated/EXISTS
    * form wherever SQL allows, so the oracle independently exercises
    * the subquery semantics the Spark plans decorrelate. */
  private val tpchSql: Map[String, String] = Map(
    "q4_priority" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 120 DAY)
        |GROUP BY 1""".stripMargin,
    "q7_trade_flows" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) / 100.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
        |    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
        |GROUP BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
        |  round(CAST(CAST(sum(CASE WHEN n1.n_name = 'NATION_3'
        |      THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS DOUBLE),
        |    6) AS mkt_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_type = 'PROMO'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND o_custkey IN (SELECT c_custkey FROM customer
        |    JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |    JOIN region ON n2.n_regionkey = r_regionkey WHERE r_name = 'ASIA')
        |GROUP BY 1""".stripMargin,
    "q10_returns" ->
      """SELECT c_custkey, c_name,
        |  sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) / 100.0 AS revenue,
        |  round(c_acctbal, 2) AS acctbal, n_name
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-07-01'
        |GROUP BY 1, 2, 4, 5
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q11_share_threshold" ->
      """WITH by_part AS (SELECT l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS part_cents
        |  FROM lineitem GROUP BY 1)
        |SELECT l_partkey, part_cents / 100.0 AS value FROM by_part
        |WHERE part_cents * (SELECT count(*) FROM by_part) * 2
        |  > (SELECT sum(part_cents) FROM by_part) * 3""".stripMargin,
    "q12_late_priority" ->
      """SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |    THEN 'LATE' ELSE 'ONTIME' END AS ship_bucket,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1""".stripMargin,
    "q13_count_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY 1)
        |GROUP BY 1""".stripMargin,
    "q14_promo" ->
      """SELECT round(100.0 * CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
        |      THEN CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
        |      ELSE 0 END) AS BIGINT) AS DOUBLE)
        |    / CAST(CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS DOUBLE),
        |    6) AS promo_share
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS rev_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, rev_cents / 100.0 AS total_rev
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_cents = (SELECT max(rev_cents) FROM rev)""".stripMargin,
    "q16_supplier_count" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3""".stripMargin,
    "q17_small_qty" ->
      """SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 700.0, 2) AS avg_yearly
        |FROM lineitem l JOIN part ON l_partkey = p_partkey
        |WHERE p_brand = 'Brand#3'
        |  AND 2 * CAST(round(l_quantity) AS BIGINT)
        |      * (SELECT count(*) FROM lineitem x JOIN part xp ON x.l_partkey = xp.p_partkey
        |         WHERE xp.p_brand = 'Brand#3' AND x.l_partkey = l.l_partkey)
        |    < (SELECT CAST(sum(CAST(round(x.l_quantity) AS BIGINT)) AS BIGINT)
        |       FROM lineitem x JOIN part xp ON x.l_partkey = xp.p_partkey
        |       WHERE xp.p_brand = 'Brand#3' AND x.l_partkey = l.l_partkey)""".stripMargin,
    "q9_profit" ->
      """SELECT n_name, year(o_orderdate) AS o_year,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)
        |    - CAST(round(p_retailprice * 60) AS BIGINT) * CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
        |    / 100.0 AS profit
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |WHERE p_type = 'ECONOMY'
        |GROUP BY 1, 2""".stripMargin,
    "q20_excess_shippers" ->
      """WITH pq AS (SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'PROMO' GROUP BY 1)
        |SELECT s_suppkey, s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE s_suppkey IN (SELECT l_suppkey FROM pq
        |  WHERE sq * (SELECT count(*) FROM pq) * 20 > (SELECT sum(sq) FROM pq) * 21)""".stripMargin,
    "q19_disjunctive" ->
      """SELECT sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) / 100.0 AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q21_sole_late" ->
      """WITH late AS (SELECT l_orderkey, l_suppkey FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 180 DAY)
        |SELECT s_name, count(*) AS numwait
        |FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q22_idle_customers" ->
      """SELECT c_nationkey % 10 AS cntrycode, count(*) AS numcust,
        |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0 AS totacctbal
        |FROM customer c
        |WHERE CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DOUBLE) >
        |    (SELECT CAST(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / count(*)
        |     FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c.c_custkey AND o_totalprice > 300000)
        |GROUP BY 1""".stripMargin,
    "q2_min_cost" ->
      """WITH cost AS (SELECT l_partkey, l_suppkey,
        |    min(CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT)) AS unit_cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type = 'STANDARD' AND p_size >= 40 GROUP BY 1, 2),
        |best AS (SELECT l_partkey, min(unit_cents) AS best_cents FROM cost GROUP BY 1),
        |pick AS (SELECT c.l_partkey, min(c.l_suppkey) AS best_supp,
        |    min(c.unit_cents) AS best_cents
        |  FROM cost c JOIN best b ON c.l_partkey = b.l_partkey
        |    AND c.unit_cents = b.best_cents GROUP BY 1)
        |SELECT p.l_partkey AS p_partkey, s_name, n_name, best_cents / 100.0 AS unit_cost
        |FROM pick p JOIN supplier ON best_supp = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey""".stripMargin
  )

  /** g_pagerank twin: the same five integer-exact rounds as unrolled
    * CTEs (standard SQL forbids aggregation in a recursive CTE member,
    * so the fixed iteration count unrolls mechanically). `//` is
    * DuckDB's floor division — the twin of Spark's `div` for the
    * all-positive rank/degree operands. */
  private def prRound(i: Int): String =
    s"""r$i AS (SELECT n.node,
       |  CAST(150000 + coalesce(sum(q.c), 0) AS BIGINT) AS r
       |  FROM nodes n LEFT JOIN (
       |    SELECT e.dst, (85 * r.r) // (100 * d.outdeg) AS c
       |    FROM edges e JOIN deg d ON e.src = d.src
       |      JOIN r${i - 1} r ON e.src = r.node) q ON q.dst = n.node
       |  GROUP BY 1)""".stripMargin

  private val pagerankSql: String =
    s"""WITH pairs AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS sn
       |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |edges AS (SELECT c AS src, sn AS dst FROM pairs
       |  UNION ALL SELECT sn AS src, c AS dst FROM pairs),
       |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS node FROM edges),
       |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
       |${(1 to 5).map(prRound).mkString(",\n")}
       |SELECT node, r AS rank_micro FROM r5""".stripMargin

  /** Shared ts twins (referenced by their own entries AND composed
    * into pipe_events): weekly profile, CUSUM changepoint, rolling-z
    * anomaly flags — see each catalog entry's comment for the parity
    * rules. */
  private val tsWeeklySql: String =
    """WITH b AS (SELECT user_id, (epoch_us(ts) // 86400000000) % 7 AS dow,
      |    count(*) AS n,
      |    sum(CAST(round(value * 1000000) AS BIGINT)::HUGEINT) AS s
      |  FROM events GROUP BY 1, 2),
      |m AS (SELECT user_id, dow, n,
      |    CAST(s AS DOUBLE) / n / 1000000.0 AS mean_raw FROM b),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY mean_raw DESC, dow) AS rk FROM m)
      |SELECT user_id, dow, n, round(mean_raw, 6) AS mean_value,
      |  rk = 1 AS is_peak FROM r""".stripMargin

  private val tsCusumSql: String =
      """WITH v AS (SELECT user_id, event_id,
      |    row_number() OVER w AS rn,
      |    sum(CAST(round(value * 1000000) AS BIGINT)::HUGEINT)
      |      OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
      |    sum(CAST(round(value * 1000000) AS BIGINT)::HUGEINT)
      |      OVER (PARTITION BY user_id) AS t,
      |    count(*) OVER (PARTITION BY user_id) AS n
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |d AS (SELECT user_id, event_id, rn, n,
      |    abs(n * s - rn * t) AS absd FROM v),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY absd DESC, event_id) AS rk FROM d)
      |SELECT user_id, event_id AS cp_event_id, CAST(rn AS BIGINT) AS cp_rn,
      |  round(CAST(absd AS DOUBLE) / n / 1000000.0, 6) AS dev
      |FROM r WHERE rk = 1 AND absd > 0""".stripMargin

  private val tsAnomalySql: String = {
      val taps = (1 to 8).map(i => s"lag(vc, $i) OVER w AS t$i").mkString(", ")
      val sum = (1 to 8).map(i => s"t$i").mkString(" + ")
      val sum2 = (1 to 8).map(i => s"t$i * t$i").mkString(" + ")
      s"""WITH v AS (SELECT user_id, ts, event_id,
         |    CAST(round(value * 1000000) AS BIGINT) AS vc FROM events),
         |t AS (SELECT user_id, event_id, vc, row_number() OVER w AS rn, $taps
         |  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |st AS (SELECT user_id, event_id, vc, $sum AS s, $sum2 AS s2
         |  FROM t WHERE rn >= 9),
         |ms AS (SELECT *, CAST(s AS DOUBLE) / 8.0 AS mean,
         |    sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / 8.0) / 8.0) AS sd
         |  FROM st)
         |SELECT user_id, event_id,
         |  CASE WHEN sd = 0.0 THEN NULL
         |    ELSE (CAST(vc AS DOUBLE) - mean) / sd END AS z,
         |  COALESCE(CASE WHEN sd = 0.0 THEN FALSE
         |    ELSE abs((CAST(vc AS DOUBLE) - mean) / sd) > 3.0 END,
         |    FALSE) AS is_anom
         |FROM ms""".stripMargin
    }

  /** g_hits twin: 4 unrolled HITS rounds over the directed
    * customer→supplier purchase graph — raw sums in HUGEINT (the
    * decimal(38,0) twin), max-normalized floor divisions back into
    * [0, 10⁶]; all-integer, so the replay matches to the bit.
    * MATERIALIZED per round: each a/h CTE is referenced by its raw
    * sum AND its scalar max. */
  private def hitsRound(i: Int): String =
    s"""ar$i AS MATERIALIZED (SELECT e.dst, sum(CAST(h AS HUGEINT)) AS araw
       |  FROM edges e JOIN h${i - 1} ON e.src = node GROUP BY 1),
       |a$i AS MATERIALIZED (SELECT dst AS node,
       |  CAST((araw * 1000000) // (SELECT max(araw) FROM ar$i) AS BIGINT) AS a
       |  FROM ar$i),
       |hr$i AS MATERIALIZED (SELECT e.src, sum(CAST(a AS HUGEINT)) AS hraw
       |  FROM edges e JOIN a$i ON e.dst = node GROUP BY 1),
       |h$i AS MATERIALIZED (SELECT src AS node,
       |  CAST((hraw * 1000000) // (SELECT max(hraw) FROM hr$i) AS BIGINT) AS h
       |  FROM hr$i)""".stripMargin

  private val hitsSql: String =
    s"""WITH edges AS MATERIALIZED (SELECT DISTINCT o_custkey * 2 AS src,
       |    l_suppkey * 2 + 1 AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
       |h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS h FROM nodes),
       |${(1 to 4).map(hitsRound).mkString(",\n")}
       |SELECT n.node, coalesce(h.h, 0) AS hub_micro,
       |  coalesce(a.a, 0) AS auth_micro
       |FROM nodes n LEFT JOIN h4 h USING (node) LEFT JOIN a4 a USING (node)"""
      .stripMargin

  /** g_bfs twin: min-hop from NATION_3 suppliers (s_nationkey = 3 —
    * see ExtensionCatalog.gBfs for why nation 0 was abandoned) as
    * four unrolled
    * min-union rounds (the naive form — the Spark side's frontier
    * optimization must be invisible in the result). */
  private def bfsRound(i: Int): String =
    s"""d$i AS (SELECT node, min(d) AS d FROM (
       |  SELECT node, d FROM d${i - 1}
       |  UNION ALL
       |  SELECT e.dst AS node, p.d + 1 AS d
       |  FROM edges e JOIN d${i - 1} p ON e.src = p.node) GROUP BY 1)""".stripMargin

  private val bfsSql: String =
    s"""WITH pairs AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS sn
       |    FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |edges AS (SELECT c AS src, sn AS dst FROM pairs
       |  UNION ALL SELECT sn AS src, c AS dst FROM pairs),
       |d0 AS (SELECT DISTINCT s_suppkey * 2 + 1 AS node, CAST(0 AS BIGINT) AS d
       |  FROM supplier WHERE s_nationkey = 3),
       |${(1 to 4).map(bfsRound).mkString(",\n")}
       |SELECT node, CAST(d AS BIGINT) AS d FROM d4""".stripMargin

  /** ta_bpe twin: REPLAY the 50 BPE merges with the identical framed-
    * string representation and primitives as graft.operators.Bpe —
    * chr(31)-framed segmentations, occurrence-weighted pair counts
    * (unnest over adjacent positions), (count DESC, l, r) winner,
    * greedy leftmost merge via plain replace (both engines replace
    * leftmost non-overlapping, so the merge step is a LITERAL replay,
    * not a re-derivation). CTEs are MATERIALIZED: w{i-1} is referenced
    * twice per round and un-hinted inlining re-expands the whole
    * prefix chain exponentially. */
  private val bpeS = "chr(31)"
  private val bpeSS = s"$bpeS||$bpeS"

  /** One unrolled merge round. EARLY-STOP PARITY with
    * Bpe.learnMerges(minCount = 2): b_i keeps only a winner with
    * c >= 2 (empty otherwise), and w_i LEFT-joins it so an empty b_i
    * passes segmentations through UNCHANGED — a cross join against an
    * empty b_i would wipe every later w_i and return zero rows, and an
    * unguarded winner would keep merging count-1 pairs the Spark side
    * stopped at. Once a round's b_i is empty, every later one is too
    * (w unchanged -> p unchanged), so the emitted ranks are exactly
    * the Spark side's. */
  private def bpeRound(i: Int): String =
    s"""p$i AS MATERIALIZED (
       |  SELECT syms[i] AS l, syms[i+1] AS r, sum(freq) AS c
       |  FROM (SELECT freq, list_transform(string_split(seg, $bpeSS),
       |          x -> trim(x, $bpeS)) AS syms FROM w${i - 1}),
       |       UNNEST(generate_series(1, len(syms)-1)) AS t(i)
       |  GROUP BY 1, 2),
       |b$i AS MATERIALIZED (SELECT l, r, c FROM p$i WHERE c >= 2
       |  ORDER BY c DESC, l, r LIMIT 1),
       |w$i AS MATERIALIZED (SELECT word,
       |  CASE WHEN b.l IS NULL THEN seg ELSE replace(seg,
       |    $bpeS||b.l||$bpeSS||b.r||$bpeS,
       |    $bpeS||b.l||b.r||$bpeS) END AS seg, freq
       |  FROM w${i - 1} LEFT JOIN b$i b ON TRUE)""".stripMargin

  private def bpePrefix(n: Int): String =
    s"""WITH wh AS MATERIALIZED (
       |  SELECT tok AS word, count(*) AS freq FROM (
       |    SELECT unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
       |      '[^a-z \n]+', '', 'g'), '\\s+', ' ', 'g')), ' ')) AS tok FROM documents)
       |  WHERE length(tok) > 0 GROUP BY 1),
       |w0 AS MATERIALIZED (
       |  SELECT word, $bpeS || array_to_string(string_split(word, ''), $bpeSS) || $bpeS AS seg, freq
       |  FROM wh),
       |${(1 to n).map(bpeRound).mkString(",\n")}""".stripMargin

  private val bpeMergesSql: String =
    bpePrefix(50) + "\n" + (1 to 50).map(i =>
      s"SELECT CAST($i AS BIGINT) AS rank, l AS lhs, r AS rhs, " +
        s"CAST(c AS BIGINT) AS pair_count FROM b$i").mkString(" UNION ALL ")

  private val bpeSegmentSql: String =
    bpePrefix(50) +
      s"""
         |SELECT word, freq, CAST(len(syms) AS BIGINT) AS n_subwords,
         |  array_to_string(syms, ' ') AS seg_text
         |FROM (SELECT word, freq, list_transform(string_split(seg, $bpeSS),
         |        x -> trim(x, $bpeS)) AS syms FROM w50)""".stripMargin

  private val bpeTokensSql: String =
    bpePrefix(50) +
      s""",
         |segn AS MATERIALIZED (SELECT word,
         |  CAST(len(list_transform(string_split(seg, $bpeSS),
         |    x -> trim(x, $bpeS))) AS BIGINT) AS n_sub FROM w50)
         |SELECT doc_id, count(*) AS n_words,
         |  CAST(sum(n_sub) AS BIGINT) AS n_bpe_tokens
         |FROM (SELECT doc_id, unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
         |    '[^a-z \n]+', '', 'g'), '\\s+', ' ', 'g')), ' ')) AS tok FROM documents) t
         |JOIN segn ON t.tok = segn.word
         |GROUP BY 1""".stripMargin

  /** ts_sax shared CTEs: the identical 8-tap / PAA / breakpoint
    * pipeline as TimeSeries.saxWords — integer taps, then the SAME
    * IEEE expressions in the same order. */
  private val saxCte: String = {
    val taps = (0 to 7).map { i =>
      if (i == 7) "vc AS t7" else s"lag(vc, ${7 - i}) OVER w AS t$i"
    }.mkString(", ")
    val sum = (0 to 7).map(i => s"t$i").mkString(" + ")
    val sum2 = (0 to 7).map(i => s"t$i * t$i").mkString(" + ")
    def sym(seg: Int): String = {
      val paa = s"(CAST(t${2 * seg} + t${2 * seg + 1} AS DOUBLE) / 2.0)"
      val z = s"($paa - mean) / sd"
      s"CASE WHEN $z < -0.6745 THEN 'a' WHEN $z < 0.0 THEN 'b' " +
        s"WHEN $z < 0.6745 THEN 'c' ELSE 'd' END"
    }
    s"""v AS (SELECT user_id, ts, event_id,
       |    CAST(round(value * 1000000) AS BIGINT) AS vc FROM events),
       |t AS (SELECT user_id, row_number() OVER w AS rn, $taps
       |  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |st AS (SELECT user_id, rn, $sum AS s, $sum2 AS s2,
       |    t0, t1, t2, t3, t4, t5, t6, t7
       |  FROM t WHERE rn >= 8),
       |ms AS (SELECT *, CAST(s AS DOUBLE) / 8.0 AS mean,
       |    sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / 8.0) / 8.0) AS sd
       |  FROM st),
       |sax AS (SELECT user_id, rn,
       |  CASE WHEN sd = 0.0 THEN 'flat'
       |    ELSE ${(0 until 4).map(sym).mkString(" || ")} END AS sax
       |  FROM ms)""".stripMargin
  }

  val all: Map[String, String] = tpchSql ++ Map(
    "g_pagerank" -> pagerankSql,
    "g_hits" -> hitsSql,
    "g_bfs" -> bfsSql,
    "ts_sax" ->
      s"WITH $saxCte SELECT user_id, rn, sax FROM sax",
    "ts_motif" ->
      s"""WITH $saxCte,
         |counts AS (SELECT user_id, sax, count(*) AS n FROM sax GROUP BY 1, 2),
         |ranked AS (SELECT user_id, sax, n,
         |  row_number() OVER (PARTITION BY user_id ORDER BY n DESC, sax ASC) AS rk
         |  FROM counts)
         |SELECT user_id, sax AS motif, n FROM ranked WHERE rk = 1""".stripMargin,
    // rolling-z twin: the saxCte integer-moment discipline over the
    // TRAILING 8 taps (lag 1..8 — strictly before the scored row),
    // then the identical IEEE mean/sd/z tree; zero-variance baseline
    // ⇒ NULL z, FALSE flag by contract
    "ts_anomaly" -> tsAnomalySql,
    // ACF twin: exact integer centi-unit moments (per-row products
    // BIGINT-safe by the kernel's magnitude guard; the sums widen to
    // HUGEINT here and decimal(38,0) in Spark — the emb z-score
    // discipline), then the identical IEEE expansion. Lateral aliases
    // (mu, den) expand to the same tree Spark evaluates inline.
    "ts_acf" -> {
      val lagTaps = (1 to 3).map(l => s"lag(vc, $l) OVER w AS t$l").mkString(", ")
      val moments = (1 to 3).map(l =>
        s"""sum(vc * t$l) AS c$l,
           |  sum(CASE WHEN t$l IS NOT NULL THEN vc END) AS a$l,
           |  sum(t$l) AS b$l""".stripMargin).mkString(",\n")
      val acfs = (1 to 3).map(l =>
        s"""CASE WHEN den = 0.0 THEN NULL
           |  ELSE (CAST(c$l AS DOUBLE) - mu * CAST(a$l + b$l AS DOUBLE)
           |    + CAST(n - $l AS DOUBLE) * mu * mu) / den END AS acf$l""".stripMargin)
        .mkString(",\n")
      s"""WITH v AS (SELECT user_id, ts, event_id,
         |    CAST(round(value * 100) AS BIGINT) AS vc FROM events),
         |t AS (SELECT user_id, vc, $lagTaps
         |  FROM v WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |g AS (SELECT user_id, count(*) AS n, sum(vc) AS s1, sum(vc * vc) AS s2,
         |$moments
         |  FROM t GROUP BY 1),
         |m AS (SELECT *, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         |    CAST(s2 AS DOUBLE)
         |      - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS den
         |  FROM g)
         |SELECT user_id, n,
         |$acfs
         |FROM m""".stripMargin
    },
    // pipe_events twin: the three ts twins composed VERBATIM as CTEs
    // (same strings as their own entries — drift-proof by
    // construction), joined per user
    "pipe_events" ->
      s"""WITH wk AS ($tsWeeklySql),
         |cs AS ($tsCusumSql),
         |an AS ($tsAnomalySql)
         |SELECT p.user_id, p.dow AS peak_dow, cs.cp_event_id, cs.dev,
         |  coalesce(a.n_anomalies, 0) AS n_anomalies
         |FROM (SELECT user_id, dow FROM wk WHERE is_peak) p
         |LEFT JOIN cs ON cs.user_id = p.user_id
         |LEFT JOIN (SELECT user_id,
         |    CAST(sum(CASE WHEN is_anom THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
         |  FROM an GROUP BY 1) a ON a.user_id = p.user_id""".stripMargin,
    // Pareto twin: same exact integer cents, HUGEINT cumulative sum
    // (the decimal twin), same floor-divided micro shares against the
    // scalar total, same before-this-part frontier rule
    "q_pareto" ->
      """WITH rev AS (SELECT l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(CAST(cents AS HUGEINT)) AS total FROM rev),
        |r AS (SELECT l_partkey, cents,
        |    CAST(row_number() OVER w AS BIGINT) AS rk,
        |    sum(CAST(cents AS HUGEINT)) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cum
        |  FROM rev WINDOW w AS (ORDER BY cents DESC, l_partkey))
        |SELECT l_partkey, rk, cents,
        |  CAST((cum * 1000000) // total AS BIGINT) AS cum_share_micro,
        |  CAST(((cum - cents) * 1000000) // total AS BIGINT) < 800000 AS in_top80
        |FROM r, t""".stripMargin,
    // basket-rules twin: same distinct basket-item set, same pruned
    // pair counts, same all-integer floor-divided measures (lift
    // numerator widened to HUGEINT — the decimal twin)
    "q_assoc" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
        |n AS (SELECT count(DISTINCT bk) AS nb FROM lp),
        |ic AS (SELECT it, count(*) AS c1 FROM lp GROUP BY 1),
        |pr AS (SELECT a.it AS pa, b.it AS pb, count(*) AS cab
        |  FROM lp a JOIN lp b ON a.bk = b.bk AND a.it < b.it
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT pa, pb, cab, ka.c1 AS ca, kb.c1 AS cb,
        |  (1000000 * cab) // nb AS support_micro,
        |  (1000000 * cab) // ka.c1 AS conf_micro,
        |  CAST((CAST(nb AS HUGEINT) * cab * 1000000)
        |    // (CAST(ka.c1 AS HUGEINT) * kb.c1) AS BIGINT) AS lift_micro
        |FROM pr JOIN ic ka ON ka.it = pr.pa JOIN ic kb ON kb.it = pr.pb, n
        |ORDER BY lift_micro DESC, pa, pb LIMIT 20""".stripMargin,
    // funnel twin: the same nested full-partition window minima
    // (each stage's CASE references the previous stage's column),
    // same strict > comparisons on µs instants — all-integer
    "q_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, event_type, us,
        |    min(CASE WHEN event_type = 'view' THEN us END)
        |      OVER (PARTITION BY user_id) AS t1 FROM e),
        |s2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND us > t1 THEN us END)
        |      OVER (PARTITION BY user_id) AS t2 FROM s1),
        |s3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END)
        |      OVER (PARTITION BY user_id) AS t3 FROM s2),
        |u AS (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
        |  FROM s3 GROUP BY 1)
        |SELECT CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase
        |FROM u""".stripMargin,
    // retention twin: same distinct (user, day) pass, same per-user
    // first-day cohort, same integer day arithmetic
    "q_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY 1)
        |SELECT c.cohort_day, ud.day - c.cohort_day AS day_offset,
        |  count(*) AS n_users
        |FROM ud JOIN c USING (user_id)
        |GROUP BY 1, 2""".stripMargin,
    // weekly-profile twin: the same pure-integer epoch-day-mod-7
    // bucket (no calendar dayofweek — conventions differ), HUGEINT
    // micro sums, the identical mean tree, peak ordered on the raw
    // mean with the dow tiebreak
    "ts_weekly" -> tsWeeklySql,
    // CUSUM twin: the same fully-integer statistic n·S_t − t·T (no
    // mean division — HUGEINT sums, the decimal twin), same argmax
    // rank with the same id tiebreak, one identical fp step at
    // display; zero-statistic (constant) keys dropped in both
    "ts_cusum" -> tsCusumSql,
    // xcorr twin: the same daily micro-sums (HUGEINT — the decimal
    // twin), the same top-40 activity cut (ties to smaller user), the
    // same five exact integer moments per pair, and the SINGLE fp
    // step num / sqrt(dx·dy) on identically-rounded doubles; ordering
    // uses the raw (unrounded) |corr| in both engines
    "ts_xcorr" ->
      """WITH h AS (SELECT user_id AS k, epoch_us(ts) // 86400000000 AS hr,
        |    sum(CAST(round(value * 1000000) AS BIGINT)::HUGEINT) AS x,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |top AS (SELECT k FROM (SELECT k, sum(c) AS n_ev FROM h GROUP BY 1)
        |  ORDER BY n_ev DESC, k LIMIT 40),
        |hf AS (SELECT h.k, h.hr, h.x FROM h JOIN top USING (k)),
        |p AS (SELECT a.k AS ka, b.k AS kb, count(*) AS n,
        |    sum(a.x) AS sx, sum(b.x) AS sy, sum(a.x * b.x) AS sxy,
        |    sum(a.x * a.x) AS sxx, sum(b.x * b.x) AS syy
        |  FROM hf a JOIN hf b ON a.hr = b.hr AND a.k < b.k GROUP BY 1, 2),
        |m AS (SELECT ka, kb, n, n * sxy - sx * sy AS num,
        |    n * sxx - sx * sx AS dx, n * syy - sy * sy AS dy FROM p
        |  WHERE n >= 10),
        |s AS (SELECT ka, kb, n,
        |    CAST(num AS DOUBLE) / sqrt(CAST(dx AS DOUBLE) * CAST(dy AS DOUBLE)) AS corr_raw
        |  FROM m WHERE dx > 0 AND dy > 0)
        |SELECT ka, kb, n, round(corr_raw, 6) AS corr FROM s
        |ORDER BY abs(corr_raw) DESC, ka, kb LIMIT 20""".stripMargin,
    // Holt twin: the IDENTICAL IEEE recurrence (seed l=x0 b=0, then
    // l' = 0.2x + 0.8(l+b); b' = 0.1(l'-l) + 0.9b — complements are
    // exact-literal doubles) replayed as a RECURSIVE CTE over the
    // (ts, event_id)-total order. NOT the a4 list_reduce fold: Holt's
    // state is a struct, and DuckDB v1.0.0 list_reduce evaluates
    // struct fields sequentially with acc mutated IN PLACE, so the
    // 'b' field would read the already-updated 'l'; the recursive CTE
    // reads the previous iteration's row immutably.
    "ts_holt" ->
      """WITH RECURSIVE v AS (SELECT user_id, CAST(value AS DOUBLE) AS x,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |r AS (
        |  SELECT user_id, rn, x AS l, CAST(0 AS DOUBLE) AS b FROM v WHERE rn = 1
        |  UNION ALL
        |  SELECT v.user_id, v.rn,
        |    0.2 * v.x + 0.8 * (r.l + r.b) AS l,
        |    0.1 * ((0.2 * v.x + 0.8 * (r.l + r.b)) - r.l) + 0.9 * r.b AS b
        |  FROM r JOIN v ON v.user_id = r.user_id AND v.rn = r.rn + 1),
        |mx AS (SELECT user_id, max(rn) AS m FROM v GROUP BY 1)
        |SELECT r.user_id, round(r.l, 6) AS level, round(r.b, 6) AS trend,
        |  round(r.l + r.b, 6) AS forecast
        |FROM r JOIN mx ON r.user_id = mx.user_id AND r.rn = mx.m""".stripMargin,
    // resample twin: the same exact-integer brackets (epoch-micro
    // times, micro-unit values, ties pre-collapsed to the max-id
    // event) and the same RANGE-frame bracket lookups; the grid is a
    // bounded generate_series (the p5 pattern — DuckDB can't lateral
    // a column bound) with a loud error() when a key's span exceeds
    // the 20000-step cap Spark's unbounded sequence() has no need for
    "ts_resample" ->
      """WITH ev0 AS (SELECT user_id AS k, epoch_us(ts) AS us,
        |    CAST(round(value * 1000000) AS BIGINT) AS vc0, event_id FROM events),
        |ev AS (SELECT k, us, arg_max(vc0, event_id) AS vc FROM ev0 GROUP BY 1, 2),
        |b AS (SELECT k, ((min(us) + 3599999999) // 3600000000) * 3600000000 AS fg,
        |    (max(us) // 3600000000) * 3600000000 AS lg FROM ev GROUP BY 1),
        |guard AS (SELECT CASE WHEN max((lg - fg) // 3600000000) <= 20000 THEN 1
        |    ELSE error('ts_resample oracle: grid cap 20000 exceeded') END AS g FROM b),
        |grid AS (SELECT k, fg + i * 3600000000 AS us
        |  FROM b, generate_series(0, 20000) t(i)
        |  WHERE fg + i * 3600000000 <= lg AND 1 = (SELECT g FROM guard)),
        |u AS (SELECT k, us, vc, 0 AS gf FROM ev
        |  UNION ALL SELECT k, us, NULL, 1 FROM grid),
        |w AS (SELECT k, us, gf,
        |    last_value(vc IGNORE NULLS) OVER wp AS pvc,
        |    last_value(CASE WHEN gf = 0 THEN us END IGNORE NULLS) OVER wp AS pus,
        |    first_value(vc IGNORE NULLS) OVER wn AS nvc,
        |    first_value(CASE WHEN gf = 0 THEN us END IGNORE NULLS) OVER wn AS nus
        |  FROM u WINDOW
        |    wp AS (PARTITION BY k ORDER BY us
        |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wn AS (PARTITION BY k ORDER BY us
        |      RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT k AS user_id, us // 1000000 AS grid_epoch,
        |  CASE WHEN nus = pus THEN CAST(pvc AS DOUBLE) / 1000000.0
        |    ELSE (CAST(pvc AS DOUBLE) + (CAST(nvc AS DOUBLE) - CAST(pvc AS DOUBLE))
        |      * (CAST(us - pus AS DOUBLE) / CAST(nus - pus AS DOUBLE)))
        |      / 1000000.0 END AS v_interp
        |FROM w WHERE gf = 1""".stripMargin,
    // trailing event-time RANGE frame: same integer epoch-micros
    // order key and bounds as the Spark window ((t-1h, t] via the
    // 3599999999-preceding integer bound)
    "w_range_frame" ->
      """SELECT event_id,
        |  count(*) OVER w AS n_hour,
        |  sum(CAST(round(value * 100) AS BIGINT)) OVER w / 100.0 AS total_hour
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS us, value FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)""".stripMargin,
    "p1_buy_sell" ->
      "SELECT event_id, CASE WHEN value > 100.0 THEN 'BUY' ELSE 'SELL' END AS decision FROM events",
    "p2_contains_all" ->
      "SELECT doc_id, n_chars FROM documents WHERE text LIKE '%join%' AND text LIKE '%scan%'",
    "p3_sentiment" ->
      """SELECT doc_id, sentiment FROM (
        |  SELECT doc_id, CASE WHEN regexp_matches(text, '\b(fast|big|merge)\b') THEN 'POS'
        |    WHEN regexp_matches(text, '\b(slow|small|filter)\b') THEN 'NEG'
        |    ELSE 'NEUTRAL' END AS sentiment FROM documents)
        |WHERE sentiment <> 'NEUTRAL'""".stripMargin,
    // DuckDB can't use a column as a lateral generate_series bound, so
    // the series is fixed at 2000 with a loud error() guard: a corpus
    // whose per-doc occurrence cap (length/4) exceeds it would
    // otherwise silently diverge from Spark's unbounded explode.
    "p5_occurrences" ->
      """SELECT doc_id FROM documents, generate_series(1, 2000) g(i)
        |WHERE i <= (length(text) - length(replace(text, 'join', ''))) // 4
        |  AND 1 = (SELECT CASE WHEN max(length(text)) // 4 <= 2000 THEN 1
        |    ELSE error('p5 oracle: occurrence cap 2000 exceeded') END FROM documents)""".stripMargin,
    "p6_parse_props" ->
      "SELECT event_id, TRY_CAST(regexp_extract(props, '\"k\": ([0-9]+)', 1) AS BIGINT) AS k FROM events",
    "p8_global_agg" ->
      "SELECT 'FOO' AS k, count(*) AS n, sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total FROM events",
    "p10_hype_words" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' ')) AS word FROM documents)
        |WHERE word IN ('join','merge','fast','big','slow','small') GROUP BY word""".stripMargin,
    "p14_deltas" ->
      """SELECT event_id, round(CASE WHEN event_type = 'purchase' THEN -value
        |  WHEN event_type = 'error' THEN value ELSE 0.0 END, 2) AS coins_delta FROM events""".stripMargin,
    "r1_split_route" ->
      """SELECT event_id, CASE WHEN value > 400.0 THEN 'invalid'
        |  WHEN event_type = 'purchase' THEN 'buy'
        |  WHEN event_type = 'view' THEN 'sell' ELSE 'other' END AS route FROM events""".stripMargin,
    "a1_window_sum" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, event_type,
        |  count(*) AS n, sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total
        |FROM events GROUP BY 1, 2""".stripMargin,
    // hopping 2h/1h: an event's two windows start at its hour floor
    // and one hour earlier — the generate_series(0,1) expansion is the
    // oracle twin of Spark's window-membership explode
    "a8_hopping_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) - 3600 * k AS BIGINT) AS start_epoch,
        |  event_type, count(*) AS n,
        |  sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total
        |FROM events, generate_series(0, 1) g(k)
        |GROUP BY 1, 2""".stripMargin,
    "a2_running_sum" ->
      """SELECT event_id, round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running FROM events""".stripMargin,
    // Order-sensitive seeded EMA fold (first value seeds, then
    // ema = 0.1*x + 0.9*ema): expressible since DuckDB 1.0 via
    // list_reduce over a time-ordered list — the reduce seeds with the
    // first element, exactly the reference recurrence
    // (Chapter04_WorkingWithState.java:168-178). 0.9 is written as a
    // literal because 1.0-0.1 == 0.9 in IEEE doubles (Semantics.emaStep
    // computes alpha complements the same way). Tie-break inside one
    // millisecond is by value in BOTH engines.
    "a4_ema_final" ->
      """SELECT user_id, round(list_reduce(list(value ORDER BY epoch_ms(ts), value),
        |  (acc, x) -> 0.1 * x + 0.9 * acc), 6) AS ema
        |FROM events GROUP BY user_id""".stripMargin,
    "a5_group_product" ->
      "SELECT l_orderkey, round(exp(sum(ln(1.0 + l_discount))), 4) AS disc_product FROM lineitem GROUP BY 1",
    "a6_max_per_key" ->
      """SELECT user_id, round(max(value), 2) AS max_v, round(min(value), 2) AS min_v,
        |  count(*) AS n FROM events GROUP BY 1""".stripMargin,
    // gaps-and-islands twin of session_window(ts, '5 minutes'): new
    // session when the gap >= 5 min (windows merge while
    // next.start < prev.end); both engines truncate the session start
    // to ms (unix_millis / epoch_ms)
    "a7_session_window" ->
      """WITH o AS (SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 5 MINUTE
        |      THEN 1 ELSE 0 END AS new_s FROM events),
        |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM o)
        |SELECT user_id, epoch_ms(min(ts)) AS session_start_ms, count(*) AS n,
        |  sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total
        |FROM s GROUP BY user_id, sid""".stripMargin,
    "agg_count_distinct" ->
      "SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n FROM events GROUP BY 1",
    // HLL twin checks the sketch's accuracy CLAIM, not the raw
    // estimate (engines use different HLL variants): exact count +
    // "approx within 5% of exact" boolean, true in both engines
    // whenever both sketches honor their documented error bound
    "agg_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS exact_users,
        |  abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
        |    <= count(DISTINCT user_id) * 0.05 AS approx_within_5pct
        |FROM events GROUP BY 1""".stripMargin,
    // KMV sketch twin: rank distinct md5 hashes per group, read the
    // 64th smallest; estimate = 63 * (2^31-1) // kth (both engines
    // truncate), exact count while under k
    "agg_kmv_distinct" ->
      """WITH h AS (SELECT DISTINCT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT % 2147483647 AS h
        |  FROM events),
        |r AS (SELECT event_type, h,
        |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS nd FROM h),
        |k AS (SELECT event_type, CAST(CASE WHEN max(nd) < 64 THEN max(nd)
        |    ELSE CAST(63 AS BIGINT) * 2147483647 // greatest(max(CASE WHEN rn = 64 THEN h END), 1)
        |    END AS BIGINT) AS kmv_users FROM r GROUP BY event_type),
        |x AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
        |  FROM events GROUP BY event_type)
        |SELECT k.event_type, kmv_users, exact_users FROM k JOIN x USING (event_type)""".stripMargin,
    // CMS twin: rebuild every depth×width counter with a GROUP BY
    // over the same md5-affine bucket hashes, probe with the same
    // row-wise min — point estimates match EXACTLY (same arithmetic),
    // not within tolerance
    "agg_cms" ->
      """WITH h AS (SELECT user_id,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT
        |      % 2147483647 AS hm FROM events),
        |b AS (SELECT j, ((2*j+1) * hm + 12345*(j+1)) % 2147483647 % 256 AS bk,
        |    count(*) AS c
        |  FROM h, generate_series(0, 3) g(j) GROUP BY 1, 2),
        |p AS (SELECT DISTINCT user_id, hm FROM h WHERE user_id < 20),
        |pe AS (SELECT p.user_id, j,
        |    ((2*j+1) * hm + 12345*(j+1)) % 2147483647 % 256 AS bk
        |  FROM p, generate_series(0, 3) g(j)),
        |est AS (SELECT pe.user_id, CAST(min(coalesce(b.c, 0)) AS BIGINT) AS cms_n
        |  FROM pe LEFT JOIN b USING (j, bk) GROUP BY 1),
        |x AS (SELECT user_id, count(*) AS exact_n FROM events
        |  WHERE user_id < 20 GROUP BY 1)
        |SELECT est.user_id, cms_n, exact_n FROM est JOIN x USING (user_id)""".stripMargin,
    // Bloom twin: rebuild the set-bit SET from the same md5-affine
    // positions (16384 bits, 3 hashes), answer membership as bool_and
    // over each probe's positions — bools match exactly, fp included
    "agg_bloom" ->
      """WITH h AS (SELECT user_id,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT
        |      % 2147483647 AS hm FROM events),
        |b AS (SELECT DISTINCT ((2*j+1) * hm + 12345*(j+1)) % 2147483647 % 16384 AS pos
        |  FROM h, generate_series(0, 2) g(j)),
        |pr AS (SELECT i AS user_id FROM generate_series(0, 19) s(i)
        |  UNION ALL SELECT i FROM generate_series(1000000, 1000019) s(i)),
        |ph AS (SELECT user_id,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)),1,15))::BIGINT
        |      % 2147483647 AS hm FROM pr),
        |pe AS (SELECT user_id, ((2*j+1) * hm + 12345*(j+1)) % 2147483647 % 16384 AS pos
        |  FROM ph, generate_series(0, 2) g(j)),
        |m AS (SELECT pe.user_id, bool_and(b.pos IS NOT NULL) AS might
        |  FROM pe LEFT JOIN b USING (pos) GROUP BY 1),
        |x AS (SELECT user_id, count(*) AS exact_n FROM events
        |  WHERE user_id < 20 GROUP BY 1)
        |SELECT m.user_id, might, coalesce(exact_n, 0) AS exact_n
        |FROM m LEFT JOIN x USING (user_id)""".stripMargin,
    "w_rank_topk" ->
      """SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price, rk FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |    row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rk
        |  FROM part) WHERE rk <= 3""".stripMargin,
    "w_lag_delta" ->
      """SELECT event_id, round(value - lag(value, 1) OVER (PARTITION BY user_id
        |  ORDER BY ts, event_id), 4) AS delta FROM events""".stripMargin,
    "w_first_last" ->
      """SELECT user_id, arg_min(event_id, ts) AS first_event,
        |  arg_max(event_id, ts) AS last_event FROM events GROUP BY 1""".stripMargin,
    // exact integer micro-units inside the sliding frame: DuckDB's
    // segment-tree frame aggregation and Spark's frame re-scan sum
    // doubles in different orders; integers make order irrelevant
    "w_moving_avg" ->
      """SELECT event_id, round(sum(CAST(round(value * 1000000) AS BIGINT)) OVER w
        |  / (count(*) OVER w * 1000000.0), 6) AS mavg FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)""".stripMargin,
    // ntile twin: same (n_chars, doc_id) deterministic tiebreak, so
    // both engines cut identical decile boundaries
    "w_ntile" ->
      """SELECT doc_id, lang, n_chars,
        |  CAST(ntile(10) OVER (PARTITION BY lang
        |    ORDER BY n_chars, doc_id) AS INT) AS decile
        |FROM documents""".stripMargin,
    // unique (n_chars, doc_id) order makes both fractions single
    // divisions of identical integers — round(…, 6) cannot diverge
    "w_cume_dist" ->
      """SELECT doc_id, lang, n_chars,
        |  round(cume_dist() OVER (PARTITION BY lang
        |    ORDER BY n_chars, doc_id), 6) AS cd,
        |  round(percent_rank() OVER (PARTITION BY lang
        |    ORDER BY n_chars, doc_id), 6) AS pr
        |FROM documents""".stripMargin,
    // six exact mergeable moments in centi-unit HUGEINTs, coefficient
    // derived once from exact integers (QueryCatalog.aggCorr twin)
    "agg_corr" ->
      """WITH c AS (SELECT l_returnflag,
        |    CAST(round(l_quantity * 100) AS HUGEINT) AS x,
        |    CAST(round(l_extendedprice * 100) AS HUGEINT) AS y FROM lineitem),
        |m AS (SELECT l_returnflag, CAST(count(*) AS HUGEINT) AS n,
        |    sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx, sum(y*y) AS syy,
        |    sum(x*y) AS sxy FROM c GROUP BY 1)
        |SELECT l_returnflag, round(CAST(n*sxy - sx*sy AS DOUBLE)
        |  / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 6)
        |  AS corr_qty_price FROM m""".stripMargin,
    "dd_embed_cosine" ->
      s"""WITH $lshBucketsCte
         |SELECT vec_a, vec_b, cos FROM (
         |  SELECT a.vec_id AS vec_a, b2.vec_id AS vec_b,
         |    round(list_cosine_similarity(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
         |      list_transform(b2.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos
         |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id)
         |WHERE cos >= 0.2""".stripMargin,
    "j_broadcast_dim" ->
      """SELECT p_brand, sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) / 100.0 AS revenue,
        |  count(*) AS n FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1""".stripMargin,
    "j_shuffle_agg" ->
      """SELECT o_orderpriority, count(*) AS n_lines, round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1""".stripMargin,
    "j_semi" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) GROUP BY 1""".stripMargin,
    "j_anti" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000) GROUP BY 1""".stripMargin,
    // the bucketed layout must be row-invisible: the oracle is the
    // plain join+agg over the raw parquet
    "j_bucketed_colo" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS totalprice,
        |  round(sum(l_quantity), 4) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderkey, o_totalprice
        |HAVING sum(l_quantity) > 150""".stripMargin,
    // the salt must be row-invisible: the oracle is the PLAIN join
    "j_skew_salted" ->
      """WITH dim AS (SELECT event_type, count(*) AS type_n FROM events GROUP BY 1)
        |SELECT event_id, event_type, type_n FROM events JOIN dim USING (event_type)""".stripMargin,
    // exact integer gram matrix over milli-unit components (1-based
    // list index -> 0-based output like ta_token_ids positions)
    "emb_gram" ->
      """WITH q AS (SELECT list_transform(embedding,
        |    x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q FROM embeddings)
        |SELECT CAST(i - 1 AS BIGINT) AS i, CAST(j - 1 AS BIGINT) AS j,
        |  CAST(sum(q[i] * q[j]) AS BIGINT) AS g
        |FROM q, generate_series(1, 64) gi(i), generate_series(1, 64) gj(j)
        |WHERE j >= i GROUP BY 1, 2""".stripMargin,
    "j_asof" ->
      """SELECT a.event_id, a.user_id, b.value AS prior_click_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') a
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
        |  ON a.user_id = b.user_id AND b.ts <= a.ts""".stripMargin,
    // nearest-as-of twin: DuckDB's native ASOF in both directions
    // (<= backward includes the equal instant; > forward excludes it,
    // exactly the Spark tag-union's tie layout), then one integer µs
    // distance pick preferring backward on equal distances
    "j_asof_nearest" ->
      """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT * FROM events WHERE event_type = 'click'),
        |b AS (SELECT a.event_id, a.user_id, epoch_us(a.ts) AS t,
        |    epoch_us(bb.ts) AS bt, bb.value AS bv
        |  FROM p a ASOF LEFT JOIN c bb
        |    ON a.user_id = bb.user_id AND bb.ts <= a.ts),
        |f AS (SELECT a.event_id, epoch_us(ff.ts) AS ft, ff.value AS fv
        |  FROM p a ASOF LEFT JOIN c ff
        |    ON a.user_id = ff.user_id AND ff.ts > a.ts)
        |SELECT b.event_id, b.user_id,
        |  round(CASE WHEN bt IS NULL THEN fv WHEN ft IS NULL THEN bv
        |    WHEN t - bt <= ft - t THEN bv ELSE fv END, 2) AS nearest_click_value
        |FROM b JOIN f USING (event_id)""".stripMargin,
    "j_interval" ->
      """SELECT p.user_id, p.event_id AS p_id, count(*) AS n_clicks,
        |  max(c.event_id) AS last_click
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        | AND c.ts >= p.ts - INTERVAL 360 MINUTE AND c.ts <= p.ts
        |GROUP BY 1, 2""".stripMargin,
    // the bloom filter only sheds work (no false negatives; FPs die in
    // the exact semi join), so the oracle is the plain semi join
    "j_bloom_semi" ->
      """SELECT count(*) AS n,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS total
        |FROM lineitem WHERE l_orderkey IN
        |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')""".stripMargin,
    // the oracle states the band join as the direct theta join the
    // bucketed form must reproduce exactly
    "j_band" ->
      """SELECT a.event_type, a.event_id AS id_a, b.event_id AS id_b
        |FROM events a JOIN events b ON a.event_type = b.event_type
        |  AND a.event_id < b.event_id AND abs(a.value - b.value) <= 0.05""".stripMargin,
    "j_lateral_topk" ->
      """SELECT o_orderkey, l.l_linenumber, l.price
        |FROM (SELECT * FROM orders WHERE o_totalprice > 350000) o
        |JOIN LATERAL (
        |  SELECT l_linenumber, round(l_extendedprice, 2) AS price
        |  FROM lineitem WHERE l_orderkey = o.o_orderkey
        |  ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) l ON true""".stripMargin,
    "q_top_orders" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin,
    "j4_cogroup" ->
      """WITH buys AS (SELECT user_id, count(*) AS n_buys, sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS spent
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |errs AS (SELECT user_id, count(*) AS n_errs FROM events
        |  WHERE event_type = 'error' GROUP BY 1)
        |SELECT coalesce(b.user_id, e.user_id) AS user_id,
        |  coalesce(n_buys, 0) AS n_buys, coalesce(spent, 0.0) AS spent,
        |  coalesce(n_errs, 0) AS n_errs
        |FROM buys b FULL OUTER JOIN errs e ON b.user_id = e.user_id""".stripMargin,
    "u1_union_tagged" ->
      """SELECT event_id, 'buy' AS tag FROM events WHERE event_type = 'purchase'
        |UNION ALL SELECT event_id, 'err' AS tag FROM events WHERE event_type = 'error'""".stripMargin,
    "set_except" ->
      """SELECT user_id, date_trunc('day', ts) AS day FROM events WHERE event_type = 'purchase'
        |EXCEPT SELECT user_id, date_trunc('day', ts) AS day FROM events WHERE event_type = 'error'""".stripMargin,
    "set_intersect" ->
      """SELECT user_id, date_trunc('day', ts) AS day FROM events WHERE event_type = 'purchase'
        |INTERSECT SELECT user_id, date_trunc('day', ts) AS day FROM events WHERE event_type = 'view'""".stripMargin,
    "q6_revenue" ->
      """SELECT sum(CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)) / 100.0 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, o_orderkey, round(o_totalprice, 2) AS totalprice,
        |  round(s, 4) AS total_qty
        |FROM orders
        |JOIN (SELECT l_orderkey, sum(l_quantity) AS s FROM lineitem
        |  GROUP BY 1 HAVING sum(l_quantity) > 300) b ON o_orderkey = b.l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 4) AS sum_qty,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base,
        |  sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) / 100.0 AS sum_disc,
        |  round(avg(l_quantity), 4) AS avg_qty, count(*) AS n
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-12-01' GROUP BY 1, 2""".stripMargin,
    "q3_shipping" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS odate,
        |  sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) / 100.0 AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2""".stripMargin,
    "q5_volume" ->
      """SELECT n_name, sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) / 100.0 AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA' GROUP BY 1""".stripMargin,

    // ------------------------------------------------------------ extensions
    "dd_exact" ->
      "SELECT min(doc_id) AS survivor_id, count(*) AS n_copies FROM documents GROUP BY text",
    // line-level boilerplate removal: same planted footers as ddLines;
    // df groups by raw line text where Spark groups by its 60-bit hash
    // (the dd_exact precedent — identical results, smaller shuffle key)
    "dd_lines" ->
      """WITH planted AS (SELECT doc_id, text
        |    || CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'subscribe to our newsletter for updates' ELSE '' END
        |    || CASE WHEN doc_id % 4 = 1 THEN chr(10) || 'all rights reserved worldwide' ELSE '' END
        |    || CASE WHEN doc_id % 5 = 2 THEN chr(10) || 'share this article with code ' || CAST(doc_id % 2 AS VARCHAR) ELSE '' END
        |    AS rich FROM documents),
        |ls AS (SELECT doc_id, string_split(rich, chr(10)) AS la FROM planted),
        |lines AS (SELECT doc_id, unnest(range(1, len(la) + 1)) AS pos,
        |  unnest(la) AS line FROM ls),
        |df AS (SELECT line, count(DISTINCT doc_id) AS df FROM lines GROUP BY 1),
        |flagged AS (SELECT l.doc_id, l.pos, l.line, (df.df >= 20) AS boiler
        |  FROM lines l JOIN df USING (line))
        |SELECT doc_id, count(*) AS n_lines,
        |  CAST(sum(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  coalesce(string_agg(CASE WHEN NOT boiler THEN line END, chr(10) ORDER BY pos), '') AS clean_text
        |FROM flagged GROUP BY 1""".stripMargin,
    "dd_minhash_sig" ->
      s"WITH ${sigCte(16)} SELECT * FROM sig",
    "dd_minhash_lsh" ->
      s"""WITH ${sigCte(32)}, ${bandsCte(4, 8)}
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
         |  AND a.doc_id < b.doc_id""".stripMargin,
    // frozen-corpus probe twin: the same banded collisions restricted
    // to (odd-id query, even-id corpus) — signatures are per-doc, so
    // splitting after banding equals splitting the corpus first
    "dd_lsh_probe" ->
      s"""WITH ${sigCte(32)}, ${bandsCte(4, 8)}
         |SELECT DISTINCT q.doc_id AS query_id, c.doc_id AS corpus_id
         |FROM bands q JOIN bands c ON q.band = c.band AND q.bucket = c.bucket
         |WHERE q.doc_id % 2 = 1 AND c.doc_id % 2 = 0""".stripMargin,
    "dd_simhash" ->
      s"""WITH $tokCte,
         |perbit AS (SELECT doc_id, bit,
         |    CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END AS w
         |  FROM toks, generate_series(0, 31) g(bit)),
         |bitsums AS (SELECT doc_id, bit, sum(w) AS s FROM perbit GROUP BY 1, 2)
         |SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN CAST(power(2, bit) AS BIGINT)
         |  ELSE 0 END) AS BIGINT) AS simhash FROM bitsums GROUP BY doc_id""".stripMargin,
    // pigeonhole blocking twin: 4 chunk-equality blocks of 8 bits are
    // a lossless candidate generator for hamming <= 3
    "dd_simhash_pairs" ->
      s"""WITH $tokCte,
         |perbit AS (SELECT doc_id, bit,
         |    CASE WHEN ((h >> bit) & 1) = 1 THEN 1 ELSE -1 END AS w
         |  FROM toks, generate_series(0, 31) g(bit)),
         |bitsums AS (SELECT doc_id, bit, sum(w) AS s FROM perbit GROUP BY 1, 2),
         |sh AS (SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN CAST(power(2, bit) AS BIGINT)
         |  ELSE 0 END) AS BIGINT) AS simhash FROM bitsums GROUP BY doc_id),
         |bands AS (SELECT doc_id, simhash, c AS band, (simhash >> (c * 8)) & 255 AS bucket
         |  FROM sh, generate_series(0, 3) g(c)),
         |cands AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.simhash AS sa, b.simhash AS sb
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
         |    AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
         |FROM cands WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin,
    "dd_jaccard" ->
      s"""WITH $jaccardCtes
         |SELECT doc_a, doc_b, jaccard FROM jpairs""".stripMargin,
    // 8-token shingles from the ORDERED (unfiltered) token array —
    // toks[i:i+7] is 1-based inclusive = 8 elements, the twin of
    // Spark's slice(toks, i, 8); per-doc DISTINCT shingle hashes
    "dd_contaminated" ->
      """WITH arr AS (SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id,
        |    ('0x' || substr(md5(array_to_string(toks[i:i+7], ' ')),1,15))::BIGINT AS h
        |  FROM arr, generate_series(1, 4000) g(i)
        |  WHERE i + 7 <= len(toks)
        |    AND 1 = (SELECT CASE WHEN max(len(toks)) - 7 <= 4000 THEN 1
        |      ELSE error('dd_contaminated oracle: shingle series bound exceeded') END FROM arr))
        |SELECT t.doc_id AS train_id, e.doc_id AS eval_id, count(*) AS n_shared
        |FROM sh t JOIN sh e ON t.h = e.h
        |WHERE t.doc_id >= 20 AND e.doc_id < 20
        |GROUP BY 1, 2""".stripMargin,
    // transitive closure of the dd_jaccard edge set via recursive
    // min-label spread: the component min m has (m, m); any smaller
    // label l < v reaching a neighbor v is recorded, so min(label)
    // per node is the component minimum — the same canonical
    // representative the Spark large-star/small-star fixpoint roots at
    "dd_components" ->
      s"""WITH RECURSIVE $jaccardCtes,
         |sym AS (SELECT doc_a AS u, doc_b AS v FROM jpairs
         |  UNION SELECT doc_b, doc_a FROM jpairs),
         |cc(node, label) AS (
         |  SELECT u, u FROM sym
         |  UNION
         |  SELECT s.v, c.label FROM cc c JOIN sym s ON s.u = c.node
         |  WHERE c.label < s.v),
         |lab AS (SELECT node, min(label) AS component_id FROM cc GROUP BY node)
         |SELECT d.doc_id, coalesce(l.component_id, d.doc_id) AS component_id
         |FROM documents d LEFT JOIN lab l ON d.doc_id = l.node""".stripMargin,
    // keep-one resolution twin: the same closure, per-doc lengths
    // joined on, the same (len desc, doc_id) argmax per component
    "dd_keep" ->
      s"""WITH RECURSIVE $jaccardCtes,
         |sym AS (SELECT doc_a AS u, doc_b AS v FROM jpairs
         |  UNION SELECT doc_b, doc_a FROM jpairs),
         |cc(node, label) AS (
         |  SELECT u, u FROM sym
         |  UNION
         |  SELECT s.v, c.label FROM cc c JOIN sym s ON s.u = c.node
         |  WHERE c.label < s.v),
         |lab AS (SELECT node, min(label) AS component_id FROM cc GROUP BY node),
         |lfull AS (SELECT d.doc_id,
         |    coalesce(l.component_id, d.doc_id) AS component_id,
         |    CAST(length(d.text) AS BIGINT) AS len
         |  FROM documents d LEFT JOIN lab l ON d.doc_id = l.node),
         |rr AS (SELECT *, row_number() OVER (PARTITION BY component_id
         |    ORDER BY len DESC, doc_id) AS rk FROM lfull)
         |SELECT doc_id, component_id, len, rk = 1 AS kept FROM rr""".stripMargin,
    // same closure as dd_components, read out as (histogram ∪ top-10):
    // hist rows (kind, cluster size, n clusters); top rows (kind,
    // component_id, its size) with size-desc/id-asc tie-break
    "dd_components_stats" ->
      s"""WITH RECURSIVE $jaccardCtes,
         |sym AS (SELECT doc_a AS u, doc_b AS v FROM jpairs
         |  UNION SELECT doc_b, doc_a FROM jpairs),
         |cc(node, label) AS (
         |  SELECT u, u FROM sym
         |  UNION
         |  SELECT s.v, c.label FROM cc c JOIN sym s ON s.u = c.node
         |  WHERE c.label < s.v),
         |lab AS (SELECT node, min(label) AS component_id FROM cc GROUP BY node),
         |labeled AS (SELECT d.doc_id, coalesce(l.component_id, d.doc_id) AS component_id
         |  FROM documents d LEFT JOIN lab l ON d.doc_id = l.node),
         |sizes AS (SELECT component_id, count(*) AS csize FROM labeled GROUP BY component_id)
         |SELECT 'hist' AS kind, csize AS k, count(*) AS n FROM sizes GROUP BY csize
         |UNION ALL
         |SELECT * FROM (SELECT 'top' AS kind, component_id AS k, csize AS n
         |  FROM sizes ORDER BY csize DESC, component_id LIMIT 10)""".stripMargin,
    "ann_brute_force" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 20),
        |scored AS (SELECT q.query_id, e.vec_id,
        |    round(list_cosine_similarity(list_transform(q.q_emb, x -> CAST(x AS DOUBLE)),
        |      list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id)
        |SELECT query_id, vec_id, cos, rk FROM (SELECT *,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
        |  FROM scored) WHERE rk <= 10""".stripMargin,
    // multi-probe: the exact bucket (i=0) plus each single-bit flip
    // (i=1..nbits), mirroring Similarity.bucketedTopK's probe array;
    // fixed-bound series + WHERE because DuckDB lateral series can't
    // take a column bound
    // centroid components accumulate as integer micro-units in BOTH
    // engines: exact, order-independent sums (a raw double sum's last
    // ulp depends on accumulation order)
    "emb_centroid" ->
      """WITH x AS (SELECT label, i - 1 AS dim,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS sv
        |  FROM embeddings, generate_series(1, 64) g(i)
        |  WHERE 1 = (SELECT CASE WHEN min(len(embedding)) = 64 AND max(len(embedding)) = 64
        |    THEN 1 ELSE error('emb_centroid oracle: embeddings are not 64-dim') END
        |    FROM embeddings))
        |SELECT label, CAST(dim AS BIGINT) AS dim,
        |  round(sum(sv) / (count(*) * 1000000.0), 6) AS centroid
        |FROM x GROUP BY 1, 2""".stripMargin,
    // int8 quantization twin: same element-local double arithmetic
    // (scale = max|x|/127, q = clamped round(x/scale)); witnesses are
    // the exact integer q_sum, saturation count, and the
    // order-independent max reconstruction error
    "emb_quantize" ->
      """WITH e AS (SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embD
        |  FROM embeddings),
        |m AS (SELECT vec_id, embD,
        |    list_max(list_transform(embD, x -> abs(x))) AS max_abs FROM e),
        |s AS (SELECT vec_id, embD,
        |    CASE WHEN max_abs = 0 THEN 1.0 ELSE max_abs / 127.0 END AS scale FROM m)
        |SELECT vec_id, round(scale, 6) AS scale,
        |  CAST(list_sum(list_transform(embD,
        |    x -> CAST(greatest(least(round(x / scale), 127), -127) AS BIGINT))) AS BIGINT) AS q_sum,
        |  CAST(len(list_filter(list_transform(embD,
        |    x -> greatest(least(round(x / scale), 127), -127)),
        |    v -> abs(v) = 127)) AS BIGINT) AS n_sat,
        |  round(list_max(list_transform(embD,
        |    x -> abs(x - greatest(least(round(x / scale), 127), -127) * scale))), 6) AS max_abs_err
        |FROM s""".stripMargin,
    "ann_bucketed" ->
      s"""WITH $lshBucketsCte,
         |q AS (SELECT vec_id AS query_id, q_emb, bucket FROM (
         |  SELECT vec_id, embedding AS q_emb, bucket FROM b) WHERE vec_id < 20),
         |probes AS (SELECT query_id, q_emb,
         |    CASE WHEN i = 0 THEN bucket ELSE xor(bucket, (CAST(1 AS BIGINT) << (i - 1))) END AS bucket
         |  FROM q, generate_series(0, $MaxBits) g(i), nb WHERE i <= nbits),
         |scored AS (SELECT p.query_id, e.vec_id,
         |    round(list_cosine_similarity(list_transform(p.q_emb, x -> CAST(x AS DOUBLE)),
         |      list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos
         |  FROM b e JOIN probes p ON e.bucket = p.bucket WHERE e.vec_id <> p.query_id)
         |SELECT query_id, vec_id, cos, rk FROM (SELECT *,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
         |  FROM scored) WHERE rk <= 10""".stripMargin,
    // IVF-Flat twin: same deterministic centroids, argmax-cosine
    // assignment and 4-probe, ROUNDED-cosine ranking with id
    // tiebreaks throughout
    // seeded k-means twin: k = greatest(32, ceil(sqrt(n))) — the SAME
    // integer formula as Similarity.adaptiveNCentroids (IEEE sqrt is
    // correctly rounded, so the engines agree) — init = the k
    // md5-smallest vectors, two Lloyd
    // iterations unrolled (assign by rounded cosine w/ cent-id
    // tiebreak; update = integer-micro-unit mean rounded to 6, the
    // emb_centroid idiom, so centroids stay bit-identical across
    // engines; empty clusters keep their previous centroid)
    // SemDeDup twin: same coarse k-means chain; a vector with a
    // smaller-id in-cluster neighbor at rounded cosine >= 0.3 is a dup
    "dd_semantic" -> materializeCtes {
      s"""WITH $ivfCtes,
         |dups AS (SELECT DISTINCT a.vec_id FROM assigned a JOIN assigned b
         |  ON a.cent_id = b.cent_id AND b.vec_id < a.vec_id
         |  AND round(list_cosine_similarity(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
         |    list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) >= 0.3)
         |SELECT s.vec_id, s.cent_id AS cluster_id, (dp.vec_id IS NULL) AS kept
         |FROM assigned s LEFT JOIN dups dp ON s.vec_id = dp.vec_id""".stripMargin
    },
    "ann_ivf" ->
      s"""WITH $ivfCtes,
         |scored AS (SELECT p.query_id, a.vec_id,
         |    round(list_cosine_similarity(list_transform(p.q_emb, x -> CAST(x AS DOUBLE)),
         |      list_transform(a.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos
         |  FROM assigned a JOIN probes p ON a.cent_id = p.cent_id
         |  WHERE a.vec_id <> p.query_id)
         |SELECT query_id, vec_id, cos, rk FROM (SELECT *,
         |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rk
         |  FROM scored) WHERE rk <= 10""".stripMargin,
    // kNN-graph twin: the shared coarse chain's assignment blocks the
    // exact in-cluster neighbor ranking (cos DESC, nb_id tiebreak)
    "emb_knn_graph" -> materializeCtes {
      s"""WITH $ivfCtes,
         |e AS (SELECT a.vec_id, b.vec_id AS nb_id,
         |    round(list_cosine_similarity(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
         |      list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos
         |  FROM assigned a JOIN assigned b
         |    ON a.cent_id = b.cent_id AND a.vec_id <> b.vec_id)
         |SELECT vec_id, nb_id, cos, rk FROM (SELECT *,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, nb_id) AS rk
         |  FROM e) WHERE rk <= 5""".stripMargin
    },
    // common-neighbor link-prediction twin: the emb_knn_graph edge
    // chain (shared ivfCtes + per-cell cosine top-5), symmetrized,
    // wedge-counted on the center, non-adjacent pairs ranked
    // (count desc, a, b) — the same total order as Spark's
    // TakeOrderedAndProject, so the LIMIT boundary is deterministic
    "g_commonneigh" -> materializeCtes {
      s"""WITH $ivfCtes,
         |ke AS (SELECT a.vec_id, b.vec_id AS nb_id,
         |    round(list_cosine_similarity(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
         |      list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos
         |  FROM assigned a JOIN assigned b
         |    ON a.cent_id = b.cent_id AND a.vec_id <> b.vec_id),
         |knn AS (SELECT vec_id, nb_id FROM (SELECT vec_id, nb_id,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, nb_id) AS rk
         |  FROM ke) WHERE rk <= 5),
         |und AS (SELECT DISTINCT least(vec_id, nb_id) AS a,
         |    greatest(vec_id, nb_id) AS b FROM knn),
         |sym AS (SELECT a AS s, b AS d FROM und
         |  UNION ALL SELECT b AS s, a AS d FROM und),
         |wed AS (SELECT x.d AS a, y.d AS b, count(*) AS n_common
         |  FROM sym x JOIN sym y ON x.s = y.s AND x.d < y.d
         |  GROUP BY 1, 2)
         |SELECT w.a, w.b, w.n_common FROM wed w
         |WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.a = w.a AND e.b = w.b)
         |ORDER BY w.n_common DESC, w.a, w.b LIMIT 100""".stripMargin
    },
    // assortativity twin: same canonical edges both directions, same
    // exact HUGEINT moments, the single identical fp step; NULL on a
    // zero-variance (regular) degree distribution in both engines
    "g_assortativity" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
        |und AS (SELECT a.p AS pa, b.p AS pb FROM lp a JOIN lp b
        |  ON a.ok = b.ok AND a.p < b.p GROUP BY 1, 2),
        |sym AS (SELECT pa AS s, pb AS d FROM und
        |  UNION ALL SELECT pb AS s, pa AS d FROM und),
        |dg AS (SELECT s, count(*) AS deg FROM sym GROUP BY 1),
        |ends AS (SELECT CAST(dx.deg AS HUGEINT) AS x, CAST(dy.deg AS HUGEINT) AS y
        |  FROM sym JOIN dg dx ON dx.s = sym.s JOIN dg dy ON dy.s = sym.d),
        |m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy FROM ends)
        |SELECT n AS n_ends,
        |  CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0 THEN NULL
        |    ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |           * CAST(n * syy - sy * sy AS DOUBLE)), 6) END AS r
        |FROM m""".stripMargin,
    // Jaccard twin: the g_commonneigh chain with degrees joined back
    // and the ALL-INTEGER micro score (1e6·n) // (da + db − n); no fp
    // anywhere, so ranking is bit-deterministic by construction
    "g_jaccard_links" -> materializeCtes {
      s"""WITH $ivfCtes,
         |ke AS (SELECT a.vec_id, b.vec_id AS nb_id,
         |    round(list_cosine_similarity(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
         |      list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos
         |  FROM assigned a JOIN assigned b
         |    ON a.cent_id = b.cent_id AND a.vec_id <> b.vec_id),
         |knn AS (SELECT vec_id, nb_id FROM (SELECT vec_id, nb_id,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, nb_id) AS rk
         |  FROM ke) WHERE rk <= 5),
         |und AS (SELECT DISTINCT least(vec_id, nb_id) AS a,
         |    greatest(vec_id, nb_id) AS b FROM knn),
         |sym AS (SELECT a AS s, b AS d FROM und
         |  UNION ALL SELECT b AS s, a AS d FROM und),
         |dg AS (SELECT s, count(*) AS deg FROM sym GROUP BY 1),
         |wed AS (SELECT x.d AS a, y.d AS b, count(*) AS n_common
         |  FROM sym x JOIN sym y ON x.s = y.s AND x.d < y.d
         |  GROUP BY 1, 2)
         |SELECT w.a, w.b, w.n_common,
         |  (1000000 * w.n_common) // (ka.deg + kb.deg - w.n_common) AS j_micro
         |FROM wed w JOIN dg ka ON ka.s = w.a JOIN dg kb ON kb.s = w.b
         |WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.a = w.a AND e.b = w.b)
         |ORDER BY j_micro DESC, w.a, w.b LIMIT 100""".stripMargin
    },
    // Adamic-Adar twin: the g_commonneigh chain with the center's
    // 1/ln(degree) weight — ONE identically-rounded micro-unit per
    // center, exact integer pair sums (sum in HUGEINT, cast back);
    // deg-1 centers pruned before the wedge join in both engines
    "g_adamic_adar" -> materializeCtes {
      s"""WITH $ivfCtes,
         |ke AS (SELECT a.vec_id, b.vec_id AS nb_id,
         |    round(list_cosine_similarity(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
         |      list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos
         |  FROM assigned a JOIN assigned b
         |    ON a.cent_id = b.cent_id AND a.vec_id <> b.vec_id),
         |knn AS (SELECT vec_id, nb_id FROM (SELECT vec_id, nb_id,
         |  row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, nb_id) AS rk
         |  FROM ke) WHERE rk <= 5),
         |und AS (SELECT DISTINCT least(vec_id, nb_id) AS a,
         |    greatest(vec_id, nb_id) AS b FROM knn),
         |sym AS (SELECT a AS s, b AS d FROM und
         |  UNION ALL SELECT b AS s, a AS d FROM und),
         |dg AS (SELECT s, count(*) AS deg FROM sym GROUP BY 1),
         |ws AS (SELECT sym.s, sym.d,
         |    CAST(round(1000000 / ln(CAST(deg AS DOUBLE))) AS BIGINT) AS w
         |  FROM sym JOIN dg USING (s) WHERE deg >= 2),
         |wed AS (SELECT x.d AS a, y.d AS b, count(*) AS n_common,
         |    CAST(sum(x.w) AS BIGINT) AS aa_micro
         |  FROM ws x JOIN ws y ON x.s = y.s AND x.d < y.d
         |  GROUP BY 1, 2)
         |SELECT w.a, w.b, w.n_common, w.aa_micro FROM wed w
         |WHERE NOT EXISTS (SELECT 1 FROM und e WHERE e.a = w.a AND e.b = w.b)
         |ORDER BY w.aa_micro DESC, w.a, w.b LIMIT 100""".stripMargin
    },
    // IVFPQ twin: shared coarse chain + shared PQ chains, ADC over
    // probed lists only (annIvfPqOracle)
    "ann_ivfpq" -> annIvfPqOracle(),
    // external-query twin: same chains, query ids shifted past the
    // corpus id space, NO self-exclusion (each query's top hit is its
    // corpus twin at its own quantization error — the round-trip
    // witness that nothing was excluded)
    "ann_external" -> annIvfPqOracle(idShift = 1000000L, excludeSelf = false),
    // two-stage refine twin: ADC top-50 shortlist, exact-cosine top-10
    "ann_ivfpq_rerank" -> annIvfPqOracle(rerank = Some((50, 10))),
    "ta_langid" ->
      """SELECT doc_id, lang, CASE WHEN greatest(en, fr, de) = 0 THEN 'und'
        |  WHEN en >= fr AND en >= de THEN 'en' WHEN fr >= de THEN 'fr'
        |  ELSE 'de' END AS lang_pred FROM (
        |  SELECT doc_id, lang,
        |    len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is|that)\b')) AS en,
        |    len(regexp_extract_all(lower(text), '\b(le|la|de|et|un|une|est|que)\b')) AS fr,
        |    len(regexp_extract_all(lower(text), '\b(der|die|das|und|ein|ist|nicht|mit)\b')) AS de
        |  FROM documents)""".stripMargin,
    "ta_quality" ->
      """SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  round(n_punct / n_chars_d, 6) AS punct_ratio,
        |  round(n_stop / n_words, 6) AS stopword_ratio,
        |  round(n_nonspace / n_words, 6) AS mean_word_len,
        |  round((CASE WHEN n_words >= 5 THEN 1.0 ELSE 0.0 END) * 0.4
        |    + (CASE WHEN n_punct / n_chars_d < 0.2 THEN 1.0 ELSE 0.0 END) * 0.3
        |    + least(n_stop / n_words * 4, 1.0) * 0.3, 6) AS quality_score
        |FROM (SELECT doc_id, length(text) AS n_chars_d,
        |    len(string_split_regex(trim(text), '\s+')) AS n_words,
        |    length(text) - length(regexp_replace(text, '[\.,;:!\?]', '', 'g')) AS n_punct,
        |    len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is|that)\b')) AS n_stop,
        |    length(regexp_replace(text, '\s+', '', 'g')) AS n_nonspace
        |  FROM documents)""".stripMargin,
    // same planting CASEs as the catalog; counts run on the planted
    // text, redaction applies email -> phone -> IP in that order, and
    // md5 receipts must agree byte-for-byte
    // planted URL families (taUrls twin); domain = host part of every
    // https?:// mention, histogram over distinct docs + total mentions
    "ta_urls" ->
      """WITH rich AS (SELECT doc_id, text
        |    || CASE WHEN doc_id % 4 = 1 THEN ' visit https://news-' || CAST(doc_id % 5 AS VARCHAR)
        |      || '.example.com/story/' || CAST(doc_id AS VARCHAR) ELSE '' END
        |    || CASE WHEN doc_id % 6 = 2 THEN ' mirror http://cdn' || CAST(doc_id % 3 AS VARCHAR)
        |      || '.example.net/asset' ELSE '' END
        |    || CASE WHEN doc_id % 10 = 3 THEN ' docs at https://wiki.example.org' ELSE '' END
        |    AS t FROM documents),
        |u AS (SELECT doc_id, unnest(regexp_extract_all(t, 'https?://[^ ]+')) AS url FROM rich),
        |dom AS (SELECT doc_id, regexp_extract(url, 'https?://([^/ ]+)', 1) AS domain FROM u)
        |SELECT domain, count(DISTINCT doc_id) AS n_docs, count(*) AS n_urls
        |FROM dom GROUP BY 1""".stripMargin,
    "ta_pii" ->
      """WITH rich AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' contact u' || CAST(doc_id AS VARCHAR)
        |      || '@mail-' || CAST(doc_id % 7 AS VARCHAR) || '.com' ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 0 THEN ' call 555-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR)
        |      || '.' || CAST(doc_id % 200 AS VARCHAR)
        |      || '.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[a-z0-9._-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\b555-[0-9]{4}\b')) AS BIGINT) AS n_phones,
        |  CAST(len(regexp_extract_all(t, '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b')) AS BIGINT) AS n_ips,
        |  CAST(length(red) AS BIGINT) AS red_len, md5(red) AS red_fp
        |FROM (SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(t,
        |      '[a-z0-9._-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |      '\b555-[0-9]{4}\b', '<PHONE>', 'g'),
        |      '\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b', '<IP>', 'g') AS red, t
        |  FROM rich)""".stripMargin,
    "ta_tokens" ->
      """SELECT doc_id, CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT) AS bpe_tokens
        |FROM documents""".stripMargin,
    "ta_fingerprint" ->
      s"""WITH $tokMultisetCte
         |SELECT doc_id, CAST(sum(h) % 2147483647 AS BIGINT) AS fingerprint,
         |  count(*) AS n_tokens FROM toks GROUP BY doc_id""".stripMargin,
    // the 50 learned merges replayed CTE by CTE (see bpeRound)
    "ta_bpe" -> bpeMergesSql,
    "ta_bpe_segment" -> bpeSegmentSql,
    "ta_bpe_tokens" -> bpeTokensSql,
    // LIMIT boundary is tie-safe: rank-100 ties break on ascending
    // token in both engines
    "ta_vocab" ->
      """SELECT tok, count(*) AS n FROM (
        |  SELECT unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' ')) AS tok FROM documents)
        |WHERE length(tok) > 0
        |GROUP BY 1 ORDER BY n DESC, tok LIMIT 100""".stripMargin,
    // token-id mapping: vocab ids = rank by (count desc, tok) minus
    // one; positions from the UNFILTERED ordered array (the only
    // empty token is a whole-empty doc, which yields no rows in both
    // engines), OOV -> -1
    "ta_token_ids" ->
      """WITH tr AS (SELECT doc_id, unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' ')) AS tok FROM documents),
        |v AS (SELECT tok, row_number() OVER (ORDER BY n DESC, tok) - 1 AS token_id
        |  FROM (SELECT tok, count(*) AS n FROM tr WHERE length(tok) > 0
        |    GROUP BY 1 ORDER BY n DESC, tok LIMIT 100)),
        |arr AS (SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' ') AS toks FROM documents),
        |toks AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS tok
        |  FROM arr, generate_series(1, 4000) g(i)
        |  WHERE i <= len(toks) AND length(toks[i]) > 0
        |    AND 1 = (SELECT CASE WHEN max(len(toks)) <= 4000 THEN 1
        |      ELSE error('ta_token_ids oracle: token series bound exceeded') END FROM arr))
        |SELECT t.doc_id, t.pos, coalesce(v.token_id, -1) AS token_id
        |FROM toks t LEFT JOIN v USING (tok)""".stripMargin,
    // bigrams over the ORDERED token array (no empty-token filter on
    // either side: a doc cleaning to '' has one empty token and no
    // bigram in both engines); fixed series bound + loud guard like
    // p5_occurrences
    "ta_ngrams" ->
      """WITH arr AS (SELECT string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' ') AS toks FROM documents),
        |bg AS (SELECT toks[i] || ' ' || toks[i + 1] AS bigram
        |  FROM arr, generate_series(1, 4000) g(i)
        |  WHERE i <= len(toks) - 1
        |    AND 1 = (SELECT CASE WHEN max(len(toks)) - 1 <= 4000 THEN 1
        |      ELSE error('ta_ngrams oracle: token series bound exceeded') END FROM arr))
        |SELECT bigram, count(*) AS n FROM bg GROUP BY 1
        |ORDER BY n DESC, bigram LIMIT 50""".stripMargin,
    // winnowing: window-min of 4-gram hashes over w=8, distinct-min
    // SET per doc (tie-order-free, so cross-engine deterministic);
    // docs shorter than k+w-1 chars have no full window in either
    // engine
    "ta_winnow" ->
      """WITH g AS (SELECT doc_id, i,
        |    ('0x' || substr(md5(substr(text, i, 4)),1,15))::BIGINT % 2147483647 AS h
        |  FROM documents, generate_series(1, 4000) s(i)
        |  WHERE i <= greatest(length(text) - 3, 0)
        |    AND 1 = (SELECT CASE WHEN max(length(text)) - 3 <= 4000 THEN 1
        |      ELSE error('ta_winnow oracle: gram series bound exceeded') END FROM documents)),
        |m AS (SELECT doc_id, i, min(h) OVER (PARTITION BY doc_id ORDER BY i
        |    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS wmin FROM g),
        |d AS (SELECT DISTINCT doc_id, wmin FROM m WHERE i >= 8)
        |SELECT doc_id, count(*) AS n_fingerprints,
        |  CAST(sum(wmin) % 2147483647 AS BIGINT) AS fp_sum
        |FROM d GROUP BY doc_id""".stripMargin,
    // real-resize twin: the Spark side bilinear-resizes a solid-color
    // PNG (fill derived from doc_id), so every output pixel keeps that
    // color and the checksum is 256*256*(r+g+b) mod 2^31-1
    "mm_resize" ->
      """SELECT doc_id, CAST(256 AS BIGINT) AS out_w, CAST(256 AS BIGINT) AS out_h,
        |  CAST(196608 AS BIGINT) AS out_bytes,
        |  CAST((65536 * ((doc_id % 256) + ((doc_id * 31) % 256) + ((doc_id * 97) % 256)))
        |    % 2147483647 AS BIGINT) AS checksum
        |FROM documents""".stripMargin,
    // real-GIF twin: one frame per 32 payload bytes (min 1), every 4th
    // pixel-decoded at 25 fps; the checksum predicts what a correct
    // raster decode of THAT frame must sum — dims from byte length,
    // per-frame solid fill from (doc_id, frame_idx), so checksum =
    // w*h*(r+g+b) mod 2^31-1. Fixed-bound series + loud guard, like
    // p5_occurrences.
    "mm_frames" ->
      """SELECT doc_id, CAST(i * 4 AS BIGINT) AS frame_idx,
        |  CAST(i * 4 * 40 AS BIGINT) AS frame_ts_ms,
        |  CAST((16 + strlen(text) % 48) * (16 + (strlen(text) // 48) % 48)
        |    * (((doc_id + 11 * i * 4) % 256) + ((doc_id * 31 + 13 * i * 4) % 256)
        |       + ((doc_id * 97 + 29 * i * 4) % 256)) % 2147483647 AS BIGINT) AS checksum
        |FROM documents, generate_series(0, 2000) g(i)
        |WHERE i * 4 < greatest(strlen(text) // 32, 1)
        |  AND 1 = (SELECT CASE WHEN max(strlen(text)) // 32 <= 8000 THEN 1
        |    ELSE error('mm_frames oracle: frame cap exceeded') END FROM documents)""".stripMargin,
    "mm_decode_meta" ->
      // real-decode twin: predicts what a CORRECT javax.imageio decode
      // of the synthesized PNG must report. strlen = BYTE length (the
      // synth measures UTF-8 payload bytes); length() counts
      // characters and diverges on non-ASCII text.
      """SELECT doc_id,
        |  CAST(16 + strlen(text) % 48 AS BIGINT) AS width,
        |  CAST(16 + (strlen(text) // 48) % 48 AS BIGINT) AS height,
        |  'png' AS format,
        |  CAST((16 + strlen(text) % 48) * (16 + (strlen(text) // 48) % 48) * 3
        |    AS BIGINT) AS raster_bytes
        |FROM documents""".stripMargin,
    // perceptual-hash twin: every aHash bit predicted ANALYTICALLY
    // from the two-tone geometry (cell luma sums from band overlap
    // counts; the same integer cross-multiplication threshold), then
    // the same hash-identical grouping
    "mm_phash" ->
      s"""WITH $phashCtes
        |SELECT doc_id, phash_hi, phash_lo,
        |  count(*) OVER (PARTITION BY phash_hi, phash_lo) AS n_same
        |FROM hs""".stripMargin,
    // hamming-pair twin: same predicted hashes, same 8-chunk
    // pigeonhole blocking with first-match emission, exact popcount
    "mm_phash_pairs" ->
      s"""WITH $phashCandCtes,
        |fm AS (SELECT * FROM cand x WHERE NOT EXISTS (
        |  SELECT 1 FROM generate_series(0, 7) g(c2) WHERE c2 < x.c AND
        |    (CASE WHEN c2 < 4 THEN (x.la >> (c2 * 8)) & 255
        |      ELSE (x.ha >> ((c2 - 4) * 8)) & 255 END)
        |    = (CASE WHEN c2 < 4 THEN (x.lb >> (c2 * 8)) & 255
        |      ELSE (x.hb >> ((c2 - 4) * 8)) & 255 END)))
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS BIGINT) AS dist
        |FROM fm
        |WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 6""".stripMargin,
    // image dup-cluster twin: the same qualifying pair SET (first-match
    // dedup and DISTINCT-over-candidates agree by construction — any
    // dist ≤ 6 pair shares ≥ 1 of 8 chunks), closed by the recursive
    // min-label closure of the dd_components twin
    "mm_phash_components" ->
      s"""WITH RECURSIVE $phashCandCtes,
        |mp AS (SELECT DISTINCT id_a, id_b FROM cand
        |  WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 6),
        |sym AS (SELECT id_a AS u, id_b AS v FROM mp
        |  UNION SELECT id_b, id_a FROM mp),
        |cc(node, label) AS (
        |  SELECT u, u FROM sym
        |  UNION
        |  SELECT s.v, c.label FROM cc c JOIN sym s ON s.u = c.node
        |  WHERE c.label < s.v),
        |lab AS (SELECT node, min(label) AS component_id FROM cc GROUP BY node)
        |SELECT d.doc_id, coalesce(l.component_id, d.doc_id) AS component_id
        |FROM documents d LEFT JOIN lab l ON d.doc_id = l.node""".stripMargin,
    // audio-fingerprint-pair twin: rebuild each mod-32-seeded PCM's
    // 64-chunk energy bits analytically (e_b·n >= totalE·n_b), then
    // the same 8-chunk pigeonhole with first-match emission
    "mm_audio_pairs" ->
      """WITH p AS (SELECT doc_id, 256 + strlen(text) % 1024 AS n,
        |    doc_id % 32 AS m FROM documents),
        |e AS (SELECT doc_id, n, b, (b + 1) * n // 64 - b * n // 64 AS nb,
        |    CAST((b + 1) * n // 64 - b * n // 64 AS BIGINT)
        |      * (((m * 977 + b * 53) % 256) * 128) * (((m * 977 + b * 53) % 256) * 128) AS eb
        |  FROM p, generate_series(0, 63) g(b)),
        |t AS (SELECT doc_id, CAST(sum(eb) AS BIGINT) AS te FROM e GROUP BY 1),
        |bits AS (SELECT e.doc_id, b,
        |    CASE WHEN eb * n >= te * nb THEN 1 ELSE 0 END AS bit
        |  FROM e JOIN t USING (doc_id)),
        |hs AS (SELECT doc_id,
        |    CAST(sum(CASE WHEN b >= 32
        |      THEN bit * (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END) AS BIGINT) AS hi,
        |    CAST(sum(CASE WHEN b < 32
        |      THEN bit * (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS lo
        |  FROM bits GROUP BY doc_id),
        |ch AS (SELECT doc_id, hi, lo, c,
        |    CASE WHEN c < 4 THEN (lo >> (c * 8)) & 255
        |      ELSE (hi >> ((c - 4) * 8)) & 255 END AS cval
        |  FROM hs, generate_series(0, 7) g(c)),
        |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.c,
        |    a.hi AS ha, a.lo AS la, b.hi AS hb, b.lo AS lb
        |  FROM ch a JOIN ch b ON a.c = b.c AND a.cval = b.cval
        |    AND a.doc_id < b.doc_id),
        |fm AS (SELECT * FROM cand x WHERE NOT EXISTS (
        |  SELECT 1 FROM generate_series(0, 7) g(c2) WHERE c2 < x.c AND
        |    (CASE WHEN c2 < 4 THEN (x.la >> (c2 * 8)) & 255
        |      ELSE (x.ha >> ((c2 - 4) * 8)) & 255 END)
        |    = (CASE WHEN c2 < 4 THEN (x.lb >> (c2 * 8)) & 255
        |      ELSE (x.hb >> ((c2 - 4) * 8)) & 255 END)))
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) AS BIGINT) AS dist
        |FROM fm
        |WHERE bit_count(xor(ha, hb)) + bit_count(xor(la, lb)) <= 6""".stripMargin,
    // real-audio-decode twin: predicts what a correct javax.sound WAV
    // decode of the synthesized PCM16LE/mono/8kHz container must say
    "mm_audio_meta" ->
      """SELECT doc_id, CAST(1 AS BIGINT) AS channels,
        |  CAST(8000 AS BIGINT) AS sample_rate, CAST(16 AS BIGINT) AS bits,
        |  CAST(256 + strlen(text) % 1024 AS BIGINT) AS n_samples,
        |  CAST((256 + strlen(text) % 1024) * 1000 // 8000 AS BIGINT) AS duration_ms
        |FROM documents""".stripMargin,
    // windowed-audio twin: rebuild every 400-sample window's exact
    // integer energy/peak from the (doc_id, i) sample rule. k ≤ 2 is
    // structural: n_samples = 256 + len%1024 < 1280 → at most 3 full
    // windows, so the series bound needs no runtime guard
    "mm_audio_windows" ->
      """WITH w AS (SELECT doc_id, k
        |  FROM documents, generate_series(0, 2) g(k)
        |  WHERE k < (256 + strlen(text) % 1024) // 400),
        |s AS (SELECT doc_id, k,
        |    ((doc_id * 31 + (k * 400 + i) * 17) % 65536) - 32768 AS smp
        |  FROM w, generate_series(0, 399) g(i))
        |SELECT doc_id, CAST(k AS BIGINT) AS win_idx,
        |  CAST(sum(smp * smp) AS BIGINT) AS energy,
        |  CAST(max(abs(smp)) AS BIGINT) AS peak
        |FROM s GROUP BY doc_id, k""".stripMargin,
    // ---- OLAP aggregate shapes (rollup / histogram / pivot / quantiles) ----
    // exact discrete percentile: the ceil(q*n)-th smallest value is
    // invariant under tie order, so no interpolation arithmetic can
    // diverge between engines
    // the sketch only prunes (no false negatives above n/65, FPs die
    // in the exact confirm), so the oracle is the plain count filter
    "agg_heavy_hitters" ->
      """WITH tr AS (SELECT unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' ')) AS tok FROM documents),
        |t2 AS (SELECT tok FROM tr WHERE length(tok) > 0)
        |SELECT tok, count(*) AS cnt FROM t2 GROUP BY tok
        |HAVING count(*) >= (SELECT count(*) FROM t2) / 32.0""".stripMargin,
    "agg_mode" ->
      """SELECT event_type, user_id AS mode_user, n FROM (
        |  SELECT event_type, user_id, n, row_number() OVER (
        |      PARTITION BY event_type ORDER BY n DESC, user_id) AS rk
        |  FROM (SELECT event_type, user_id, count(*) AS n FROM events
        |    GROUP BY 1, 2))
        |WHERE rk = 1""".stripMargin,
    // the sample is defined by (md5-hash asc, value asc) order — the
    // exact twin of KMinByHash's TreeSet ordering — then exact
    // discrete percentiles over it, same ceil(q*n) rule as
    // agg_percentile_disc
    "agg_hash_quantile" ->
      """WITH h AS (SELECT event_type, value,
        |    ('0x' || substr(md5(CAST(event_id AS VARCHAR)),1,15))::BIGINT AS hk
        |  FROM events),
        |samp AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY hk, value) AS hrn FROM h),
        |o AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt
        |  FROM samp WHERE hrn <= 256)
        |SELECT event_type,
        |  min(CASE WHEN rn = ceil(0.5 * cnt) THEN value END) AS p50_est,
        |  min(CASE WHEN rn = ceil(0.95 * cnt) THEN value END) AS p95_est
        |FROM o GROUP BY 1""".stripMargin,
    "agg_percentile_disc" ->
      """SELECT event_type,
        |  min(CASE WHEN rn = ceil(0.5 * cnt) THEN value END) AS p50,
        |  min(CASE WHEN rn = ceil(0.95 * cnt) THEN value END) AS p95
        |FROM (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS cnt FROM events)
        |GROUP BY 1""".stripMargin,
    // ---- OLAP aggregate shapes (rollup / histogram / pivot) ----
    "agg_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus, count(*) AS n,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS total
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "agg_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus, count(*) AS n,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS total
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus, count(*) AS n,
        |  sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS total
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""".stripMargin,
    "agg_histogram" ->
      """SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket, count(*) AS n,
        |  sum(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total
        |FROM events GROUP BY 1""".stripMargin,
    // Spark pivot leaves absent cells null; nullif(count FILTER, 0)
    // reproduces that from a filtered count
    "agg_pivot" ->
      """SELECT user_id % 10 AS cohort,
        |  nullif(count(*) FILTER (WHERE event_type = 'click'), 0) AS click,
        |  nullif(count(*) FILTER (WHERE event_type = 'error'), 0) AS error,
        |  nullif(count(*) FILTER (WHERE event_type = 'purchase'), 0) AS purchase,
        |  nullif(count(*) FILTER (WHERE event_type = 'signup'), 0) AS signup,
        |  nullif(count(*) FILTER (WHERE event_type = 'view'), 0) AS view
        |FROM events GROUP BY 1""".stripMargin,
    // ---- deterministic sampling / splitting (graft.operators.Sampling) ----
    // decision value = md5Mod31(key || '_' || salt) / (2^31-1): one
    // IEEE double division of identical integers in both engines, so
    // every comparison selects identical rows. Split thresholds are
    // chosen exactly representable (0.75, 0.875) — a 0.8+0.1 cumulative
    // sum would be 0.9000000000000001 in one engine and 0.9 in the other.
    "ds_sample_hash" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_sample'),1,15))::BIGINT
        |  % 2147483647) / 2147483647.0 < 0.1""".stripMargin,
    // A-ES weighted-sample twin: u = (hash + 1) / 2^31 in (0, 1] —
    // shifted off zero because DuckDB's ln(0) ERRORS where Spark
    // yields -inf; the same ln(u)/w rank key, ORDERING on the raw key
    // (identical doubles), id tiebreak, display rounded to 9
    "ds_weighted_sample" ->
      """WITH b AS (SELECT doc_id, greatest(length(text), 1) AS w,
        |    ((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_wsample'),1,15))::BIGINT
        |      % 2147483647) + 1) / 2147483648.0 AS u
        |  FROM documents)
        |SELECT doc_id, CAST(w AS BIGINT) AS w, round(ln(u) / w, 9) AS es_key
        |FROM b ORDER BY ln(u) / w DESC, doc_id LIMIT 50""".stripMargin,
    "ds_sample_stratified" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_strata'),1,15))::BIGINT
        |    % 2147483647) / 2147483647.0
        |  < (CASE lang WHEN 'en' THEN 0.05 WHEN 'fr' THEN 0.5 WHEN 'de' THEN 0.8 ELSE 0.25 END)""".stripMargin,
    // exact-k stratified twin: the k hash-smallest per stratum is the
    // row_number form the aggregate exists to avoid at scale — rank
    // order (h asc, doc_id asc) matches the (h, v) sort contract
    "ds_sample_topk" ->
      """WITH h AS (SELECT lang, doc_id,
        |    ('0x' || substr(md5('topk_' || CAST(doc_id AS VARCHAR)),1,15))::BIGINT
        |      % 2147483647 AS h FROM documents),
        |r AS (SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk FROM h)
        |SELECT lang, doc_id, rk FROM r WHERE rk <= 16""".stripMargin,
    // mixture twin: identical rate arithmetic — (100.0 * w) / cnt with
    // the same literal weights and left association, least(1.0, …),
    // then the shared md5 decision idiom
    "ds_mixture" ->
      """WITH n AS (SELECT source, count(*) AS cnt FROM documents GROUP BY 1),
        |r AS (SELECT source, least(1.0, 100.0 *
        |    (CASE source WHEN 'src0' THEN 0.3 WHEN 'src1' THEN 0.2
        |      WHEN 'src2' THEN 0.1 ELSE 0.4 / 17 END) / cnt) AS rate FROM n)
        |SELECT d.doc_id, d.source FROM documents d JOIN r USING (source)
        |WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_mix'),1,15))::BIGINT
        |  % 2147483647) / 2147483647.0 < rate""".stripMargin,
    // composition twin of pipe_curate: the ta_quality score gate, the
    // dd_exact min-id survivor rule and the ds_split_assign threshold
    // chain, chained exactly as the Spark pipeline chains the operators
    "pipe_curate" ->
      """WITH q AS (SELECT doc_id, text, lang,
        |    round((CASE WHEN n_words >= 5 THEN 1.0 ELSE 0.0 END) * 0.4
        |      + (CASE WHEN n_punct / n_chars_d < 0.2 THEN 1.0 ELSE 0.0 END) * 0.3
        |      + least(n_stop / n_words * 4, 1.0) * 0.3, 6) AS quality_score
        |  FROM (SELECT doc_id, text, lang, length(text) AS n_chars_d,
        |      len(string_split_regex(trim(text), '\s+')) AS n_words,
        |      length(text) - length(regexp_replace(text, '[\.,;:!\?]', '', 'g')) AS n_punct,
        |      len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is|that)\b')) AS n_stop
        |    FROM documents)),
        |gated AS (SELECT doc_id, text FROM q
        |  WHERE quality_score >= 0.7 AND lang IN ('en', 'fr')),
        |sur AS (SELECT min(doc_id) AS survivor_id, count(*) AS n_copies
        |  FROM gated GROUP BY text),
        |assigned AS (SELECT doc_id AS survivor_id,
        |    CASE WHEN d < 0.75 THEN 'train' WHEN d < 0.875 THEN 'valid'
        |      ELSE 'test' END AS split
        |  FROM (SELECT doc_id,
        |      (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_split'),1,15))::BIGINT
        |        % 2147483647) / 2147483647.0 AS d FROM documents))
        |SELECT survivor_id, n_copies, split
        |FROM sur JOIN assigned USING (survivor_id)""".stripMargin,
    // pipe_curate's gate+survivor CTEs -> pack_sequences' window
    // prefix sum over the CURATED stream -> split assignment
    "pipe_pretrain" ->
      """WITH q AS (SELECT doc_id, text, lang,
        |    round((CASE WHEN n_words >= 5 THEN 1.0 ELSE 0.0 END) * 0.4
        |      + (CASE WHEN n_punct / n_chars_d < 0.2 THEN 1.0 ELSE 0.0 END) * 0.3
        |      + least(n_stop / n_words * 4, 1.0) * 0.3, 6) AS quality_score
        |  FROM (SELECT doc_id, text, lang, length(text) AS n_chars_d,
        |      len(string_split_regex(trim(text), '\s+')) AS n_words,
        |      length(text) - length(regexp_replace(text, '[\.,;:!\?]', '', 'g')) AS n_punct,
        |      len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is|that)\b')) AS n_stop
        |    FROM documents)),
        |gated AS (SELECT doc_id, text FROM q
        |  WHERE quality_score >= 0.7 AND lang IN ('en', 'fr')),
        |sur AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY text),
        |p AS (SELECT g.doc_id,
        |    len(string_split_regex(trim(g.text), '\s+')) AS n_tokens,
        |    sum(len(string_split_regex(trim(g.text), '\s+')))
        |      OVER (ORDER BY g.doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM gated g JOIN sur USING (doc_id)),
        |a AS (SELECT doc_id, CASE WHEN d < 0.75 THEN 'train' WHEN d < 0.875 THEN 'valid'
        |    ELSE 'test' END AS split
        |  FROM (SELECT doc_id,
        |      (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_split'),1,15))::BIGINT
        |        % 2147483647) / 2147483647.0 AS d FROM documents))
        |SELECT p.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(cum - n_tokens AS BIGINT) AS stream_offset,
        |  CAST((cum - n_tokens) // 1024 AS BIGINT) AS seq_id, a.split
        |FROM p JOIN a ON p.doc_id = a.doc_id""".stripMargin,
    // RAG composition twin: pipe_pretrain's gate+survivor CTEs, then
    // the ta_chunks arr/series pattern over the CURATED docs, then the
    // split join
    "pipe_rag" ->
      """WITH q AS (SELECT doc_id, text, lang,
        |    round((CASE WHEN n_words >= 5 THEN 1.0 ELSE 0.0 END) * 0.4
        |      + (CASE WHEN n_punct / n_chars_d < 0.2 THEN 1.0 ELSE 0.0 END) * 0.3
        |      + least(n_stop / n_words * 4, 1.0) * 0.3, 6) AS quality_score
        |  FROM (SELECT doc_id, text, lang, length(text) AS n_chars_d,
        |      len(string_split_regex(trim(text), '\s+')) AS n_words,
        |      length(text) - length(regexp_replace(text, '[\.,;:!\?]', '', 'g')) AS n_punct,
        |      len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is|that)\b')) AS n_stop
        |    FROM documents)),
        |gated AS (SELECT doc_id, text FROM q
        |  WHERE quality_score >= 0.7 AND lang IN ('en', 'fr')),
        |sur AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY text),
        |arr AS (SELECT g.doc_id,
        |    list_filter(string_split(trim(regexp_replace(regexp_replace(lower(g.text),
        |      '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' '),
        |      t -> length(t) > 0) AS toks
        |  FROM gated g JOIN sur USING (doc_id)),
        |ch AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |    CAST(i * 24 AS BIGINT) AS start_pos,
        |    CAST(least(32, len(toks) - i * 24) AS BIGINT) AS n_toks,
        |    toks[i * 24 + 1] AS first_tok,
        |    toks[i * 24 + least(32, len(toks) - i * 24)] AS last_tok
        |  FROM arr, generate_series(0, 200) g(i)
        |  WHERE len(toks) > 0 AND i * 24 < len(toks)
        |    AND 1 = (SELECT CASE WHEN (max(len(toks)) - 1) // 24 <= 200 THEN 1
        |      ELSE error('pipe_rag oracle: chunk series bound exceeded') END FROM arr)),
        |a AS (SELECT doc_id, CASE WHEN d < 0.75 THEN 'train' WHEN d < 0.875 THEN 'valid'
        |    ELSE 'test' END AS split
        |  FROM (SELECT doc_id,
        |      (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_split'),1,15))::BIGINT
        |        % 2147483647) / 2147483647.0 AS d FROM documents))
        |SELECT ch.doc_id, ch.chunk_idx, ch.start_pos, ch.n_toks,
        |  ch.first_tok, ch.last_tok, a.split
        |FROM ch JOIN a ON ch.doc_id = a.doc_id""".stripMargin,
    // the oracle's single-reducer window IS the naive form the
    // two-pass prefix sum replaces; same ws-token formula as ta_tokens
    "pack_sequences" ->
      """SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(cum - n_tokens AS BIGINT) AS stream_offset,
        |  CAST((cum - n_tokens) // 1024 AS BIGINT) AS seq_id
        |FROM (SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |    sum(len(string_split_regex(trim(text), '\s+')))
        |      OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM documents)""".stripMargin,
    // repetition twin: same tokenizer, list-built n-grams, same
    // 1 - distinct/total double arithmetic
    "ta_repetition" ->
      """WITH t AS (SELECT doc_id,
        |    string_split(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' ') AS toks
        |  FROM documents),
        |g AS (SELECT doc_id, len(toks) AS n,
        |    CASE WHEN len(toks) >= 2 THEN list_transform(generate_series(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1]) ELSE [] END AS g2,
        |    CASE WHEN len(toks) >= 3 THEN list_transform(generate_series(1, len(toks) - 2),
        |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) ELSE [] END AS g3
        |  FROM t)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  round(CASE WHEN len(g2) = 0 THEN 0.0
        |    ELSE 1.0 - len(list_distinct(g2)) * 1.0 / len(g2) END, 6) AS dup_2gram_frac,
        |  round(CASE WHEN len(g3) = 0 THEN 0.0
        |    ELSE 1.0 - len(list_distinct(g3)) * 1.0 / len(g3) END, 6) AS dup_3gram_frac
        |FROM g""".stripMargin,
    // chunking twin: same filtered token array, chunk starts every 24
    // while < len, width least(32, remainder); fixed-bound series +
    // loud guard like ta_token_ids
    "ta_chunks" ->
      """WITH arr AS (SELECT doc_id,
        |    list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' '),
        |      t -> length(t) > 0) AS toks
        |  FROM documents)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |  CAST(i * 24 AS BIGINT) AS start_pos,
        |  CAST(least(32, len(toks) - i * 24) AS BIGINT) AS n_toks,
        |  toks[i * 24 + 1] AS first_tok,
        |  toks[i * 24 + least(32, len(toks) - i * 24)] AS last_tok
        |FROM arr, generate_series(0, 200) g(i)
        |WHERE len(toks) > 0 AND i * 24 < len(toks)
        |  AND 1 = (SELECT CASE WHEN (max(len(toks)) - 1) // 24 <= 200 THEN 1
        |    ELSE error('ta_chunks oracle: chunk series bound exceeded') END FROM arr)""".stripMargin,
    // tf·idf twin: same explode, same tf/df aggs, score = tf *
    // ln(N/df) rounded to 6, rank on the ROUNDED score with a token
    // tiebreak (the cross-engine ranking contract)
    "ta_tfidf" ->
      """WITH tr AS (SELECT doc_id, unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' ')) AS tok FROM documents),
        |t2 AS (SELECT doc_id, tok FROM tr WHERE length(tok) > 0),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t2 GROUP BY 1, 2),
        |dfq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM t2 GROUP BY 1),
        |scored AS (SELECT tf.doc_id, tf.tok, tf.tf, dfq.df,
        |    round(tf.tf * ln((SELECT count(*) FROM documents) * 1.0 / dfq.df), 6) AS score
        |  FROM tf JOIN dfq USING (tok))
        |SELECT doc_id, CAST(rk AS BIGINT) AS rk, tok, tf, df, score FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, tok) AS rk FROM scored)
        |WHERE rk <= 3""".stripMargin,
    // hashvec twin: same tokenizer, same 60-bit md5 hash, idx and
    // sign from disjoint bit ranges (h non-negative, so % / // agree
    // with pmod / div), integer signed sums, zero cells dropped
    "ta_hashvec" ->
      """WITH tr AS (SELECT doc_id, unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' ')) AS tok FROM documents),
        |h AS (SELECT doc_id, ('0x' || substr(md5(tok),1,15))::BIGINT AS h
        |  FROM tr WHERE length(tok) > 0),
        |f AS (SELECT doc_id, h % 256 AS idx,
        |    CASE WHEN (h // 256) % 2 = 0 THEN 1 ELSE -1 END AS sgn FROM h)
        |SELECT doc_id, idx, CAST(sum(sgn) AS BIGINT) AS w FROM f
        |GROUP BY 1, 2 HAVING sum(sgn) <> 0""".stripMargin,
    // BM25 twin: same tokenizer, same conditional-sum tf/df aggs, the
    // IDENTICAL IEEE per-term tree on integer operands rounded to
    // micro-units per term (integer-summed — no cross-engine double
    // accumulation); fp literals enter arithmetic only against an
    // already-DOUBLE operand (a bare 0.5 is DECIMAL in DuckDB and
    // would reroute the tree through decimal division); k1+1 is
    // COMPUTED (1.2 + 1.0), matching the Spark side's lit(k1 + 1.0)
    "ta_bm25" -> {
      val terms = Seq("stream", "join", "window", "filter")
      val tfs = terms.zipWithIndex.map { case (t, i) =>
        s"sum(CASE WHEN tok = '$t' THEN 1 ELSE 0 END) AS tf$i" }.mkString(", ")
      val dfs = terms.indices.map(i =>
        s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
      val scores = terms.indices.map(i =>
        s"""(CASE WHEN tf$i > 0 THEN CAST(round(1000000 *
           |    (ln(1.0 + (CAST(n_docs - df$i AS DOUBLE) + 0.5)
           |        / (CAST(df$i AS DOUBLE) + 0.5))
           |     * ((CAST(tf$i AS DOUBLE) * (CAST(1.2 AS DOUBLE) + 1.0))
           |        / (CAST(tf$i AS DOUBLE) + CAST(1.2 AS DOUBLE)
           |           * ((1.0 - CAST(0.75 AS DOUBLE)) + CAST(0.75 AS DOUBLE)
           |              * (dl / (CAST(total_dl AS DOUBLE) / n_docs)))))))
           |  AS BIGINT) ELSE 0 END)""".stripMargin).mkString("\n  + ")
      s"""WITH tr AS (SELECT doc_id, unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
         |    '[^a-z \\n]+', '', 'g'), '\\s+', ' ', 'g')), ' ')) AS tok FROM documents),
         |t2 AS (SELECT doc_id, tok FROM tr WHERE length(tok) > 0),
         |pd AS (SELECT doc_id, count(*) AS dl, $tfs FROM t2 GROUP BY 1),
         |st AS (SELECT count(*) AS n_docs, sum(dl) AS total_dl, $dfs FROM pd),
         |sc AS (SELECT doc_id, $scores AS score_micro FROM pd, st)
         |SELECT doc_id, CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rk,
         |  score_micro
         |FROM sc WHERE score_micro > 0 ORDER BY rk LIMIT 20""".stripMargin
    },
    // entropy twin: same tokenizer, per-token counts via GROUP BY
    // instead of the sorted-array fold — terms meet in integer
    // MICRO-NATS (round(1e6·p·ln p) per distinct token), so the
    // order-dependent double sum never crosses engines
    "ta_entropy" ->
      """WITH tr AS (SELECT doc_id, unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' ')) AS tok FROM documents),
        |t2 AS (SELECT doc_id, tok FROM tr WHERE length(tok) > 0),
        |cnt AS (SELECT doc_id, tok, count(*) AS c FROM t2 GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, count(*) AS nd FROM cnt GROUP BY 1)
        |SELECT c.doc_id, max(t.n) AS n_tokens, CAST(max(t.nd) AS BIGINT) AS n_distinct,
        |  round(-sum(CAST(round(1000000 * (c.c / t.n) * ln(c.c / t.n)) AS BIGINT))
        |    / 1000000.0, 6) AS entropy,
        |  round(max(t.nd) / max(t.n), 6) AS ttr
        |FROM cnt c JOIN tot t USING (doc_id) GROUP BY 1""".stripMargin,
    // cross-doc span twin: same raw-ordered-array 3-grams as
    // ta_ngrams, same 60-bit md5 gram hash as the Spark explode, doc
    // frequency as a count window over distinct (doc, gram-hash)
    "dd_crossdoc" ->
      """WITH arr AS (SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' ') AS toks FROM documents),
        |g AS (SELECT DISTINCT doc_id,
        |    ('0x' || substr(md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]),1,15))::BIGINT AS gh
        |  FROM arr, generate_series(1, 4000) s(i)
        |  WHERE i <= len(toks) - 2
        |    AND 1 = (SELECT CASE WHEN max(len(toks)) - 2 <= 4000 THEN 1
        |      ELSE error('dd_crossdoc oracle: token series bound exceeded') END FROM arr)),
        |d AS (SELECT doc_id, gh, count(*) OVER (PARTITION BY gh) AS dfreq FROM g)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN dfreq > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams,
        |  round(sum(CASE WHEN dfreq > 1 THEN 1 ELSE 0 END) / count(*), 6) AS dup_frac
        |FROM d GROUP BY doc_id""".stripMargin,
    // duplicated-span twin: positioned gram stream (NO per-doc
    // distinct — multiplicity counts every occurrence), corpus
    // multiplicity window, then the gaps-and-islands run grouping
    "dd_spans" ->
      """WITH arr AS (SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, i - 1 AS pos,
        |    ('0x' || substr(md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]),1,15))::BIGINT AS gh
        |  FROM arr, generate_series(1, 4000) s(i)
        |  WHERE i <= len(toks) - 2
        |    AND 1 = (SELECT CASE WHEN max(len(toks)) - 2 <= 4000 THEN 1
        |      ELSE error('dd_spans oracle: token series bound exceeded') END FROM arr)),
        |d AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY gh) AS cfreq FROM g),
        |r AS (SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM d WHERE cfreq > 1)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS start_pos,
        |  count(*) AS run_grams, count(*) + 2 AS span_tokens
        |FROM r GROUP BY doc_id, grp
        |HAVING count(*) >= 2""".stripMargin,
    // span-removal twin: same run CTEs, then positional coverage
    // ([start, start+run+1] for 3-grams, dedup'd), kept tokens
    // re-joined in order, md5 receipt of the byte-identical scrub
    "dd_spans_scrub" ->
      """WITH arr AS (SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, i - 1 AS pos,
        |    ('0x' || substr(md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]),1,15))::BIGINT AS gh
        |  FROM arr, generate_series(1, 4000) s(i)
        |  WHERE i <= len(toks) - 2
        |    AND 1 = (SELECT CASE WHEN max(len(toks)) - 2 <= 4000 THEN 1
        |      ELSE error('dd_spans_scrub oracle: token series bound exceeded') END FROM arr)),
        |d AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY gh) AS cfreq FROM g),
        |r AS (SELECT doc_id, pos,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        |  FROM d WHERE cfreq > 1),
        |runs AS (SELECT doc_id, min(pos) AS sp, count(*) AS rg
        |  FROM r GROUP BY doc_id, grp HAVING count(*) >= 2),
        |cov AS (SELECT DISTINCT doc_id, sp + i AS cpos
        |  FROM runs, generate_series(0, 4001) cg(i) WHERE i <= rg + 1),
        |t AS (SELECT doc_id, i - 1 AS pos, toks[i] AS tok
        |  FROM arr, generate_series(1, 4002) s(i) WHERE i <= len(toks)),
        |k AS (SELECT t.doc_id, t.pos, t.tok FROM t LEFT JOIN cov c
        |  ON c.doc_id = t.doc_id AND c.cpos = t.pos WHERE c.cpos IS NULL),
        |s2 AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS scrub
        |  FROM k GROUP BY doc_id),
        |nr AS (SELECT doc_id, count(*) AS n_removed FROM cov GROUP BY doc_id)
        |SELECT a.doc_id, CAST(len(a.toks) AS BIGINT) AS n_tokens,
        |  CAST(coalesce(nr.n_removed, 0) AS BIGINT) AS n_removed,
        |  md5(coalesce(s2.scrub, '')) AS scrub_fp
        |FROM arr a LEFT JOIN nr USING (doc_id) LEFT JOIN s2 USING (doc_id)""".stripMargin,
    // PQ twin: 8 generated per-subspace k-means chains (see pqSubCtes)
    "emb_pq" -> pqOracle,
    // PQ-ADC search twin: codes + per-query integer LUTs (annPqOracle)
    "ann_pq" -> annPqOracle,
    // epoch-shuffle twin: identical packed order key (36-bit salted
    // md5 above the id), global row_number — the single-reducer form
    // the Spark side exists to avoid
    "ds_shuffle_rank" ->
      """WITH k AS (SELECT doc_id,
        |    (('0x' || substr(md5('shuf_' || CAST(doc_id AS VARCHAR)),1,15))::BIGINT
        |      % 68719476736) * 16777216 + doc_id AS shuffle_key
        |  FROM documents)
        |SELECT doc_id, shuffle_key, row_number() OVER (ORDER BY shuffle_key) AS rank
        |FROM k""".stripMargin,
    // temperature-sampling twin: micro-unit integer weights (exact
    // sum), p and 10k targets in the identical expression order
    "ds_temperature" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |w AS (SELECT lang, n,
        |    CAST(round(pow(n, 0.7) * 1000000) AS BIGINT) AS wm FROM c),
        |t AS (SELECT CAST(sum(wm) AS BIGINT) AS tw FROM w)
        |SELECT lang, n, round(wm * 1.0 / (SELECT tw FROM t), 6) AS p,
        |  CAST(round(wm * 10000.0 / (SELECT tw FROM t)) AS BIGINT) AS target_10k
        |FROM w""".stripMargin,
    // stride scheduling: source s (weight w) emits item r at virtual
    // time (2r-1)*(6/w); global order = (stride, src, id) — the exact
    // total order Sampling.interleave packs into its prefix-sum key
    "ds_interleave" ->
      """WITH s AS (SELECT doc_id,
        |    CAST(regexp_extract(source, 'src(\d+)', 1) AS BIGINT) AS sn
        |  FROM documents),
        |r AS (SELECT doc_id, sn, (sn % 3) + 1 AS w,
        |    row_number() OVER (PARTITION BY sn ORDER BY doc_id) AS rk FROM s)
        |SELECT doc_id, 'src' || CAST(sn AS VARCHAR) AS source,
        |  row_number() OVER (ORDER BY (2*rk - 1) * (6 // w), sn, doc_id) AS pos
        |FROM r""".stripMargin,
    // Morton-key twin: zval spelled out as the 16-term bit-select sum
    // (bit i of pk_lo -> position 2i+1, of sk_lo -> 2i — column 0 most
    // significant within each level, InterleaveBits' documented
    // layout); cell = zval div 1024 == shiftright(zval, 10) on the
    // non-negative curve key
    "ds_zorder" ->
      s"""WITH b AS (SELECT CAST(l_partkey % 256 AS BIGINT) AS pk_lo,
        |    CAST(l_suppkey % 256 AS BIGINT) AS sk_lo FROM lineitem),
        |z AS (SELECT pk_lo, sk_lo, CAST(${(0 until 8).map(i =>
             s"((pk_lo >> $i) & 1) * ${1L << (2 * i + 1)} + " +
               s"((sk_lo >> $i) & 1) * ${1L << (2 * i)}").mkString(" + ")}
        |  AS BIGINT) AS zval FROM b)
        |SELECT zval // 1024 AS cell, CAST(count(*) AS BIGINT) AS n,
        |  min(pk_lo) AS pk_min, max(pk_lo) AS pk_max,
        |  min(sk_lo) AS sk_min, max(sk_lo) AS sk_max,
        |  CAST(sum(zval) AS BIGINT) AS z_sum
        |FROM z GROUP BY 1""".stripMargin,
    // compaction twin: same per-day inventory, the prefix sum spelled
    // as the window DuckDB is happy to single-thread at oracle scale
    // (the engine side uses the distributed two-pass PrefixSum — the
    // whole point), same exact-integer bin arithmetic
    "ds_compaction" ->
      """WITH f AS (SELECT CAST(datediff('day', DATE '1992-01-01', o_orderdate)
        |      AS BIGINT) AS fk, CAST(count(*) AS BIGINT) AS sz
        |  FROM orders GROUP BY 1),
        |c AS (SELECT fk, sz, sum(sz) OVER (ORDER BY fk
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - sz AS before_sz
        |  FROM f)
        |SELECT CAST(before_sz // 4096 AS BIGINT) AS out_bin,
        |  CAST(count(*) AS BIGINT) AS n_files,
        |  CAST(sum(sz) AS BIGINT) AS size_total,
        |  min(fk) AS key_min, max(fk) AS key_max
        |FROM c GROUP BY 1""".stripMargin,
    // modularity twin: the assortativity pair chain, per-brand exact
    // integer terms (intra edges, degree sums), m recovered from
    // Σ deg_c = 2m over the tiny community frame, the single
    // identical fp step (4·m·e_c − deg_c²) / 4m² rounded once
    "g_modularity" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
        |und AS (SELECT a.p AS a, b.p AS b FROM lp a JOIN lp b
        |  ON a.ok = b.ok AND a.p < b.p GROUP BY 1, 2),
        |sym AS (SELECT a AS s FROM und UNION ALL SELECT b FROM und),
        |dg AS (SELECT s, count(*) AS deg FROM sym GROUP BY 1),
        |nc AS (SELECT p_partkey AS node, p_brand AS community FROM part),
        |dc AS (SELECT community, CAST(count(*) AS BIGINT) AS n_nodes,
        |    CAST(sum(deg) AS BIGINT) AS deg_sum
        |  FROM dg JOIN nc ON nc.node = dg.s GROUP BY 1),
        |ic AS (SELECT ca.community AS community, count(*) AS intra
        |  FROM und JOIN nc ca ON ca.node = und.a
        |  JOIN nc cb ON cb.node = und.b
        |  WHERE ca.community = cb.community GROUP BY 1),
        |j AS (SELECT community, n_nodes, deg_sum,
        |    CAST(coalesce(intra, 0) AS BIGINT) AS intra_edges,
        |    CAST((sum(deg_sum) OVER ()) // 2 AS HUGEINT) AS m
        |  FROM dc LEFT JOIN ic USING (community))
        |SELECT community, n_nodes, intra_edges, deg_sum,
        |  round(CAST(4 * m * CAST(intra_edges AS HUGEINT)
        |      - CAST(deg_sum AS HUGEINT) * CAST(deg_sum AS HUGEINT) AS DOUBLE)
        |    / CAST(4 * m * m AS DOUBLE), 6) AS q
        |FROM j""".stripMargin,
    // incremental-curation twin: the snapshot-diff CTEs name the
    // fresh work (added/changed keys of the planted new snapshot,
    // REVISED text), then two independently-banded sides — fresh
    // docs vs the standing even-id corpus — join on band collisions
    "pipe_incremental" ->
      s"""WITH o AS (SELECT doc_id, md5(text) AS old_fp FROM documents
        |    WHERE doc_id % 17 <> 3),
        |nv AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 13 = 0 THEN ' [rev2]' ELSE '' END AS text
        |  FROM documents WHERE doc_id % 19 <> 5),
        |nf AS (SELECT doc_id, md5(text) AS new_fp FROM nv),
        |st AS (SELECT coalesce(o.doc_id, nf.doc_id) AS doc_id,
        |    CASE WHEN o.doc_id IS NULL THEN 'added'
        |      WHEN nf.doc_id IS NULL THEN 'removed'
        |      WHEN old_fp <> new_fp THEN 'changed'
        |      ELSE 'unchanged' END AS status
        |  FROM o FULL JOIN nf ON o.doc_id = nf.doc_id),
        |fresh AS (SELECT nv.doc_id, nv.text, st.status FROM nv
        |  JOIN st ON nv.doc_id = st.doc_id
        |  WHERE st.status IN ('added', 'changed')),
        |${sigBandsCteFor("q", "SELECT doc_id, text FROM fresh", 4, 8)},
        |${sigBandsCteFor("c",
             "SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0", 4, 8)},
        |m AS (SELECT q.doc_id AS doc_id, min(c.doc_id) AS dup_of,
        |    CAST(count(DISTINCT c.doc_id) AS BIGINT) AS n_matches
        |  FROM q_bands q JOIN c_bands c
        |    ON q.band = c.band AND q.bucket = c.bucket GROUP BY 1)
        |SELECT f.doc_id, f.status, (m.doc_id IS NOT NULL) AS is_dup,
        |  m.dup_of, CAST(coalesce(m.n_matches, 0) AS BIGINT) AS n_matches
        |FROM fresh f LEFT JOIN m ON f.doc_id = m.doc_id""".stripMargin,
    // Hilbert twin: the classical xy->d reflect-and-swap loop run as
    // a recursive CTE over the levels (s = 128 .. 1), on the <= 2^16
    // DISTINCT coordinate pairs (per-pair counts carried to the cell
    // aggregate). rx/ry and the new x/y all read the PRE-step row;
    // negative reflected intermediates use two's-complement & on
    // both engines. d-increment spells gray((3*rx)^ry) as a CASE.
    "ds_hilbert" ->
      """WITH RECURSIVE
        |b AS (SELECT CAST(l_partkey % 256 AS BIGINT) AS pk_lo,
        |    CAST(l_suppkey % 256 AS BIGINT) AS sk_lo FROM lineitem),
        |g AS (SELECT pk_lo, sk_lo, CAST(count(*) AS BIGINT) AS cnt
        |  FROM b GROUP BY 1, 2),
        |h AS (
        |  SELECT pk_lo, sk_lo, pk_lo AS x, sk_lo AS y,
        |      CAST(0 AS BIGINT) AS d, CAST(128 AS BIGINT) AS s FROM g
        |  UNION ALL
        |  SELECT pk_lo, sk_lo,
        |    CASE WHEN (y & s) = 0 THEN
        |        CASE WHEN (x & s) <> 0 THEN s - 1 - y ELSE y END
        |      ELSE x END,
        |    CASE WHEN (y & s) = 0 THEN
        |        CASE WHEN (x & s) <> 0 THEN s - 1 - x ELSE x END
        |      ELSE y END,
        |    d + s * s * (CASE WHEN (x & s) = 0 AND (y & s) = 0 THEN 0
        |      WHEN (x & s) = 0 THEN 1
        |      WHEN (y & s) <> 0 THEN 2
        |      ELSE 3 END),
        |    s // 2
        |  FROM h WHERE s > 0),
        |f AS (SELECT pk_lo, sk_lo, d AS hval FROM h WHERE s = 0)
        |SELECT hval // 1024 AS cell, CAST(sum(cnt) AS BIGINT) AS n,
        |  min(g.pk_lo) AS pk_min, max(g.pk_lo) AS pk_max,
        |  min(g.sk_lo) AS sk_min, max(g.sk_lo) AS sk_max,
        |  CAST(sum(hval * cnt) AS BIGINT) AS h_sum
        |FROM g JOIN f ON g.pk_lo = f.pk_lo AND g.sk_lo = f.sk_lo
        |GROUP BY 1""".stripMargin,
    // 3-D Hilbert twin: the SAME Skilling transpose kernel the native
    // expression runs (inverse-undo levels q=32..2, Gray encode, bit
    // interleave), replayed as chained level CTEs over the <= 64^3
    // distinct (pk, sk, qty) triples; DuckDB's lateral column aliases
    // carry the within-level sequential x0/x1/x2 updates
    "ds_hilbert3" -> {
      def lvl(i: Int, q: Long): String = {
        val p = q - 1
        val src = if (i == 1) "g" else s"h${i - 1}"
        s"""h$i AS (SELECT pk_lo, sk_lo, qt_lo, cnt, c0 AS x0, b1 AS x1, c2 AS x2 FROM (
           |  SELECT pk_lo, sk_lo, qt_lo, cnt,
           |    CASE WHEN (x0 & $q) <> 0 THEN xor(x0, $p) ELSE x0 END AS a0,
           |    CASE WHEN (x1 & $q) <> 0 THEN xor(a0, $p)
           |      ELSE xor(a0, xor(a0, x1) & $p) END AS b0,
           |    CASE WHEN (x1 & $q) <> 0 THEN x1
           |      ELSE xor(x1, xor(a0, x1) & $p) END AS b1,
           |    CASE WHEN (x2 & $q) <> 0 THEN xor(b0, $p)
           |      ELSE xor(b0, xor(b0, x2) & $p) END AS c0,
           |    CASE WHEN (x2 & $q) <> 0 THEN x2
           |      ELSE xor(x2, xor(b0, x2) & $p) END AS c2
           |  FROM $src))""".stripMargin
      }
      val levels = Seq(32L, 16L, 8L, 4L, 2L).zipWithIndex
        .map { case (q, i) => lvl(i + 1, q) }.mkString(",\n")
      val tExpr = Seq(32L, 16L, 8L, 4L, 2L)
        .map(q => s"CASE WHEN (g2 & $q) <> 0 THEN ${q - 1} ELSE 0 END")
        .reduce((a, b) => s"xor($a, $b)")
      val interleave = (0 to 5).flatMap { j =>
        Seq(s"(((f0 >> $j) & 1) << ${3 * j + 2})",
          s"(((f1 >> $j) & 1) << ${3 * j + 1})",
          s"(((f2 >> $j) & 1) << ${3 * j})")
      }.mkString(" + ")
      s"""WITH b AS (SELECT CAST(l_partkey % 64 AS BIGINT) AS pk_lo,
        |    CAST(l_suppkey % 64 AS BIGINT) AS sk_lo,
        |    CAST(round(l_quantity) AS BIGINT) % 64 AS qt_lo FROM lineitem),
        |g AS (SELECT pk_lo, sk_lo, qt_lo, CAST(count(*) AS BIGINT) AS cnt,
        |    pk_lo AS x0, sk_lo AS x1, qt_lo AS x2 FROM b GROUP BY 1, 2, 3),
        |$levels,
        |gr AS (SELECT pk_lo, sk_lo, qt_lo, cnt, x0 AS g0, xor(x1, x0) AS g1,
        |    xor(x2, xor(x1, x0)) AS g2 FROM h5),
        |tt AS (SELECT pk_lo, sk_lo, qt_lo, cnt, g0, g1, g2, $tExpr AS t FROM gr),
        |f AS (SELECT pk_lo, sk_lo, qt_lo, cnt, $interleave AS hval FROM
        |  (SELECT *, xor(g0, t) AS f0, xor(g1, t) AS f1, xor(g2, t) AS f2 FROM tt))
        |SELECT hval // 4096 AS cell, CAST(sum(cnt) AS BIGINT) AS n,
        |  min(pk_lo) AS pk_min, max(pk_lo) AS pk_max,
        |  min(sk_lo) AS sk_min, max(sk_lo) AS sk_max,
        |  min(qt_lo) AS qt_min, max(qt_lo) AS qt_max,
        |  CAST(sum(hval * cnt) AS BIGINT) AS h_sum
        |FROM f GROUP BY 1""".stripMargin
    },
    // snapshot-diff twin: same planted snapshots, same md5 content
    // fingerprints, same FULL JOIN classification
    "ds_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS old_fp FROM documents
        |    WHERE doc_id % 17 <> 3),
        |n AS (SELECT doc_id, md5(text ||
        |      CASE WHEN doc_id % 13 = 0 THEN ' [rev2]' ELSE '' END) AS new_fp
        |    FROM documents WHERE doc_id % 19 <> 5)
        |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |    WHEN n.doc_id IS NULL THEN 'removed'
        |    WHEN old_fp <> new_fp THEN 'changed'
        |    ELSE 'unchanged' END AS status,
        |  old_fp, new_fp
        |FROM o FULL JOIN n ON o.doc_id = n.doc_id""".stripMargin,
    // windowed-drift twin: UTC-day windows == date_trunc under the
    // pinned UTC session tz; mean via the same micro-unit integer
    // sum in one expression order, NULL for all-null windows
    "ds_profile_windows" -> {
      def one(c: String) =
        s"""SELECT date_trunc('day', ts) AS window_start, '$c' AS "column",
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  min(CAST($c AS DOUBLE)) AS min_num, max(CAST($c AS DOUBLE)) AS max_num,
           |  CASE WHEN count($c) = 0 THEN NULL
           |    ELSE round(sum(CAST(round(CAST($c AS DOUBLE) * 1000000) AS BIGINT))
           |      / (count($c) * 1000000.0), 6) END AS mean
           |FROM events GROUP BY 1""".stripMargin
      s"${one("value")}\n UNION ALL \n${one("user_id")}"
    },
    // windowed-expectations twin: the same per-day profile CTE, each
    // check's predicate replayed as a CASE keyed on the expectation
    // name; NULL predicate coalesces to FALSE (failed, never silent)
    "ds_expectations_windows" -> {
      def one(c: String) =
        s"""SELECT date_trunc('day', ts) AS window_start, '$c' AS "column",
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           |  min(CAST($c AS DOUBLE)) AS min_num, max(CAST($c AS DOUBLE)) AS max_num,
           |  CASE WHEN count($c) = 0 THEN NULL
           |    ELSE round(sum(CAST(round(CAST($c AS DOUBLE) * 1000000) AS BIGINT))
           |      / (count($c) * 1000000.0), 6) END AS mean
           |FROM events GROUP BY 1""".stripMargin
      s"""WITH p AS (${one("value")}\n UNION ALL \n${one("user_id")})
        |SELECT p.window_start, e.expectation, e."column",
        |  coalesce(CASE e.expectation
        |    WHEN 'value_present' THEN p.n_null = 0
        |    WHEN 'value_mean_band' THEN p.mean <= 50.0
        |    WHEN 'user_id_ceiling' THEN p.max_num <= 200.0
        |    WHEN 'daily_volume_floor' THEN p.n_rows >= 100
        |  END, FALSE) AS pass
        |FROM p JOIN (VALUES
        |    ('value_present', 'value'),
        |    ('value_mean_band', 'value'),
        |    ('user_id_ceiling', 'user_id'),
        |    ('daily_volume_floor', 'value'))
        |  e(expectation, "column") ON p."column" = e."column"""".stripMargin
    },
    // MERGE INTO twin: same planted log, same max-version winner,
    // same full-outer apply; empty-string D payload matches the
    // engine side (its fp is never read — D rows are filtered)
    "ds_apply_log" ->
      """WITH b AS (SELECT doc_id, md5(text) AS fp FROM documents
        |    WHERE doc_id % 17 <> 3),
        |l AS (
        |  SELECT doc_id, 2 AS v, 'U' AS op, md5(text || ' [v2]') AS lfp
        |    FROM documents WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id, 3, 'D', md5('') FROM documents WHERE doc_id % 7 = 1
        |  UNION ALL
        |  SELECT doc_id + 100000, 1, 'I', md5(text || ' [new]')
        |    FROM documents WHERE doc_id % 11 = 2),
        |w AS (SELECT doc_id, max(v) AS v FROM l GROUP BY 1),
        |win AS (SELECT l.doc_id, l.op, l.lfp FROM l
        |  JOIN w ON l.doc_id = w.doc_id AND l.v = w.v)
        |SELECT coalesce(b.doc_id, win.doc_id) AS doc_id,
        |  CASE WHEN win.doc_id IS NOT NULL THEN win.lfp ELSE b.fp END AS fp,
        |  CASE WHEN win.doc_id IS NOT NULL THEN 'log' ELSE 'base' END AS origin
        |FROM b FULL JOIN win ON b.doc_id = win.doc_id
        |WHERE coalesce(win.op, '') <> 'D'""".stripMargin,
    // profiling twin: one single-column pass per profiled column,
    // numeric min/max as rounded doubles, string/date as VARCHAR
    "ds_profile" -> ordersProfileSql,
    // expectations twin: same profile union as a CTE, one CASE per
    // named expectation; a NULL predicate result is a FAIL (coalesce),
    // matching the engine side
    "ds_expectations" ->
      s"""WITH p AS ($ordersProfileSql)
        |SELECT e.expectation, e."column",
        |  coalesce(CASE e.expectation
        |    WHEN 'custkey_not_null' THEN p.n_null = 0
        |    WHEN 'custkey_min_card' THEN p.n_distinct >= 10
        |    WHEN 'totalprice_nonneg' THEN p.min_num >= 0
        |    WHEN 'status_single_valued' THEN p.n_distinct <= 1
        |    WHEN 'orderdate_in_window'
        |      THEN p.min_s >= '1994-01-01' AND p.max_s <= '2002-12-31'
        |  END, FALSE) AS pass
        |FROM p JOIN (VALUES
        |    ('custkey_not_null', 'o_custkey'),
        |    ('custkey_min_card', 'o_custkey'),
        |    ('totalprice_nonneg', 'o_totalprice'),
        |    ('status_single_valued', 'o_orderstatus'),
        |    ('orderdate_in_window', 'o_orderdate'))
        |  e(expectation, "column") ON p."column" = e."column"""".stripMargin,
    "ds_split_assign" ->
      """SELECT doc_id, CASE WHEN d < 0.75 THEN 'train' WHEN d < 0.875 THEN 'valid'
        |    ELSE 'test' END AS split,
        |  lang FROM (SELECT doc_id, lang,
        |    (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_split'),1,15))::BIGINT
        |      % 2147483647) / 2147483647.0 AS d FROM documents)""".stripMargin,
    // canonical-URL dedup twin: same synthesized URL variants, same
    // canonicalization regexes (RE2-compatible, (?i) scheme+host),
    // same malformed-row pass-through (empty host extract → the
    // original string is its own canon key, ADVICE r6)
    "dd_urls" ->
      """WITH u AS (SELECT doc_id,
        |    'HTTPS://Site-' || CAST(doc_id % 7 AS VARCHAR)
        |    || '.Example.COM/Page/' || CAST(doc_id % 25 AS VARCHAR)
        |    || CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END
        |    || CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed' ELSE '' END
        |    || CASE WHEN doc_id % 3 = 0 THEN '#section' ELSE '' END AS url
        |  FROM documents),
        |c AS (SELECT doc_id,
        |    CASE WHEN lower(regexp_extract(url, '(?i)^(https?://[^/?#]+)', 1)) = ''
        |      THEN url
        |      ELSE lower(regexp_extract(url, '(?i)^(https?://[^/?#]+)', 1))
        |        || regexp_replace(regexp_extract(url, '(?i)^https?://[^/?#]+([^?#]*)', 1),
        |             '/+$', '') END AS canon_url
        |  FROM u)
        |SELECT canon_url, min(doc_id) AS keeper, count(*) AS n_urls,
        |  count(DISTINCT doc_id) AS n_docs
        |FROM c GROUP BY 1""".stripMargin,
    // containment twin: same tokenizer, same 8-token string shingles
    // (the Spark side distincts md5-hashed shingles — set-equal to
    // distinct strings), same df<=50 cap applied to intersection AND
    // denominator, threshold on the ROUNDED ratio
    "dd_containment" ->
      """WITH t AS (SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' ') AS toks FROM documents),
        |sh AS (SELECT DISTINCT doc_id, sh FROM (
        |  SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS sh
        |  FROM t, generate_series(1, 4000) g(i)
        |  WHERE len(toks) >= 8 AND i <= len(toks) - 7
        |    AND 1 = (SELECT CASE WHEN max(len(toks)) - 7 <= 4000 THEN 1
        |      ELSE error('dd_containment oracle: series bound exceeded') END FROM t))),
        |d AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 50),
        |k AS (SELECT s.doc_id, s.sh FROM sh s JOIN d USING (sh)),
        |sz AS (SELECT doc_id, count(*) AS n_sh FROM k GROUP BY 1),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        |  FROM k a JOIN k b USING (sh) WHERE a.doc_id <> b.doc_id GROUP BY 1, 2)
        |SELECT p.doc_a, p.doc_b, p.n_inter,
        |  round(p.n_inter * 1.0 / s.n_sh, 6) AS containment
        |FROM p JOIN sz s ON p.doc_a = s.doc_id
        |WHERE round(p.n_inter * 1.0 / s.n_sh, 6) >= 0.5""".stripMargin,
    // edit-distance twin: same (len//16, first-token) blocking, same
    // maxBlock=1000 block cap, same 64-char raw-text prefixes, same
    // levenshtein DP in both engines
    "dd_edit" ->
      """WITH t AS (SELECT doc_id, substr(text, 1, 64) AS pfx,
        |    string_split(trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' ') AS toks FROM documents),
        |b AS (SELECT doc_id, pfx, len(toks) // 16 AS lb, toks[1] AS t1
        |  FROM t WHERE len(toks) > 0),
        |bs AS (SELECT lb, t1 FROM b GROUP BY 1, 2
        |  HAVING count(*) BETWEEN 2 AND 1000)
        |SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
        |  CAST(levenshtein(a.pfx, b2.pfx) AS BIGINT) AS dist
        |FROM b a JOIN bs ON a.lb = bs.lb AND a.t1 = bs.t1 JOIN b b2
        |  ON a.lb = b2.lb AND a.t1 = b2.t1 AND b2.doc_id < a.doc_id
        |WHERE levenshtein(a.pfx, b2.pfx) <= 12""".stripMargin,
    // unigram cross-entropy twin: corpus frequency table from the same
    // filtered tokens; each occurrence meets in integer micro-nats
    // (round(1e6*ln(N/c)) — N, c exact integers in both engines)
    "ta_unigram" ->
      """WITH tr AS (SELECT doc_id, unnest(string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' ')) AS tok FROM documents),
        |t2 AS (SELECT doc_id, tok FROM tr WHERE length(tok) > 0),
        |f AS (SELECT tok, count(*) AS c FROM t2 GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM f)
        |SELECT doc_id, count(*) AS n_tokens,
        |  round(sum(CAST(round(1000000 * ln((SELECT n_total FROM n) * 1.0 / f.c)) AS BIGINT))
        |    / (count(*) * 1000000.0), 6) AS xent
        |FROM t2 JOIN f USING (tok)
        |GROUP BY doc_id""".stripMargin,
    // bigram cross-entropy twin: adjacency over the SAME length-
    // filtered token list; conditional surprisal in integer micro-nats
    // (round(1e6*ln(cp/cb)) — cp, cb exact integers in both engines)
    "ta_bigram" ->
      """WITH arr AS (SELECT doc_id, list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' '), t -> len(t) > 0) AS toks FROM documents),
        |o AS (SELECT doc_id, toks[i] AS prev, toks[i + 1] AS tok
        |  FROM arr, generate_series(1, 4000) s(i)
        |  WHERE i <= len(toks) - 1
        |    AND 1 = (SELECT CASE WHEN max(len(toks)) - 1 <= 4000 THEN 1
        |      ELSE error('ta_bigram oracle: token series bound exceeded') END FROM arr)),
        |f AS (SELECT prev, tok, count(*) AS cb FROM o GROUP BY 1, 2),
        |p AS (SELECT prev, CAST(sum(cb) AS BIGINT) AS cp FROM f GROUP BY 1)
        |SELECT doc_id, count(*) AS n_bigrams,
        |  round(sum(CAST(round(1000000 * ln(cp * 1.0 / cb)) AS BIGINT))
        |    / (count(*) * 1000000.0), 6) AS xent
        |FROM o JOIN f USING (prev, tok) JOIN p USING (prev)
        |GROUP BY doc_id""".stripMargin,
    // stupid-backoff twin: the same even/odd split, the same three
    // n-gram tables from the train half, the same four-level case —
    // every surprisal is ln of ONE identically-associated double
    // (ln(c2p/c3), ln(2.5*c1p/c2b), ln(6.25*N/c1b), ln(6.25*N)) in
    // integer micro-nats
    "ta_backoff" ->
      """WITH arr AS (SELECT doc_id, list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' '), t -> len(t) > 0) AS toks FROM documents),
        |tr AS (SELECT doc_id, toks FROM arr WHERE doc_id % 2 = 0),
        |sc AS (SELECT doc_id, toks FROM arr WHERE doc_id % 2 = 1 AND len(toks) >= 3),
        |u1 AS (SELECT tok AS w, count(*) AS c1 FROM
        |  (SELECT unnest(toks) AS tok FROM tr) GROUP BY 1),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS nt FROM u1),
        |bo AS (SELECT toks[i] AS p, toks[i + 1] AS q
        |  FROM tr, generate_series(1, 4000) s(i)
        |  WHERE i <= len(toks) - 1
        |    AND 1 = (SELECT CASE WHEN max(len(toks)) - 1 <= 4000 THEN 1
        |      ELSE error('ta_backoff oracle: token series bound exceeded') END FROM arr)),
        |b2 AS (SELECT p, q, count(*) AS c2 FROM bo GROUP BY 1, 2),
        |to3 AS (SELECT toks[i] AS w1, toks[i + 1] AS w2, toks[i + 2] AS w3
        |  FROM tr, generate_series(1, 4000) s(i) WHERE i <= len(toks) - 2),
        |t3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM to3 GROUP BY 1, 2, 3),
        |o AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2, toks[i + 2] AS w3
        |  FROM sc, generate_series(1, 4000) s(i)
        |  WHERE i <= len(toks) - 2
        |    AND 1 = (SELECT CASE WHEN max(len(toks)) - 1 <= 4000 THEN 1
        |      ELSE error('ta_backoff oracle: token series bound exceeded') END FROM arr)),
        |j AS (SELECT o.doc_id,
        |    CASE WHEN t3.c3 IS NOT NULL THEN 0 WHEN bb.c2 IS NOT NULL THEN 1
        |         WHEN ub.c1 IS NOT NULL THEN 2 ELSE 3 END AS lvl,
        |    CASE WHEN t3.c3 IS NOT NULL
        |           THEN CAST(round(1000000 * ln(bp.c2 * 1.0 / t3.c3)) AS BIGINT)
        |         WHEN bb.c2 IS NOT NULL
        |           THEN CAST(round(1000000 * ln(2.5 * up.c1 / bb.c2)) AS BIGINT)
        |         WHEN ub.c1 IS NOT NULL
        |           THEN CAST(round(1000000 * ln(6.25 * n.nt / ub.c1)) AS BIGINT)
        |         ELSE CAST(round(1000000 * ln(6.25 * n.nt)) AS BIGINT) END AS sm
        |  FROM o
        |  LEFT JOIN t3 ON t3.w1 = o.w1 AND t3.w2 = o.w2 AND t3.w3 = o.w3
        |  LEFT JOIN b2 bp ON bp.p = o.w1 AND bp.q = o.w2
        |  LEFT JOIN b2 bb ON bb.p = o.w2 AND bb.q = o.w3
        |  LEFT JOIN u1 up ON up.w = o.w2
        |  LEFT JOIN u1 ub ON ub.w = o.w3, n)
        |SELECT doc_id, count(*) AS n_trigrams,
        |  CAST(sum(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri,
        |  CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bi,
        |  CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_uni,
        |  CAST(sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  round(sum(sm) / (count(*) * 1000000.0), 6) AS xent
        |FROM j GROUP BY doc_id""".stripMargin,
    // Moore-Lewis twin: two independent ta_backoff model CTE sets
    // (in-domain doc_id%4=0, general doc_id%4=2) scoring the SAME odd
    // trigram stream; per-doc sums and their difference are exact
    // BIGINTs (all sums CAST — the r9 HUGEINT lesson), the selection
    // flag one integer comparison
    "ta_moorelewis" ->
      """WITH arr AS (SELECT doc_id, list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' '), t -> len(t) > 0) AS toks FROM documents),
        |gd AS (SELECT 1 AS ok FROM arr HAVING max(len(toks)) - 1 <= 4000),
        |tri AS (SELECT doc_id, toks FROM arr WHERE doc_id % 4 = 0),
        |trg AS (SELECT doc_id, toks FROM arr WHERE doc_id % 4 = 2),
        |sc AS (SELECT doc_id, toks FROM arr WHERE doc_id % 2 = 1 AND len(toks) >= 3),
        |u1i AS (SELECT tok AS w, count(*) AS c1 FROM (SELECT unnest(toks) AS tok FROM tri) GROUP BY 1),
        |u1g AS (SELECT tok AS w, count(*) AS c1 FROM (SELECT unnest(toks) AS tok FROM trg) GROUP BY 1),
        |ni AS (SELECT CAST(sum(c1) AS BIGINT) AS nt FROM u1i),
        |ng AS (SELECT CAST(sum(c1) AS BIGINT) AS nt FROM u1g),
        |b2i AS (SELECT toks[i] AS p, toks[i + 1] AS q, count(*) AS c2
        |  FROM tri, generate_series(1, 4000) s(i), gd WHERE i <= len(toks) - 1 GROUP BY 1, 2),
        |b2g AS (SELECT toks[i] AS p, toks[i + 1] AS q, count(*) AS c2
        |  FROM trg, generate_series(1, 4000) s(i), gd WHERE i <= len(toks) - 1 GROUP BY 1, 2),
        |t3i AS (SELECT toks[i] AS w1, toks[i + 1] AS w2, toks[i + 2] AS w3, count(*) AS c3
        |  FROM tri, generate_series(1, 4000) s(i), gd WHERE i <= len(toks) - 2 GROUP BY 1, 2, 3),
        |t3g AS (SELECT toks[i] AS w1, toks[i + 1] AS w2, toks[i + 2] AS w3, count(*) AS c3
        |  FROM trg, generate_series(1, 4000) s(i), gd WHERE i <= len(toks) - 2 GROUP BY 1, 2, 3),
        |o AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2, toks[i + 2] AS w3
        |  FROM sc, generate_series(1, 4000) s(i), gd WHERE i <= len(toks) - 2),
        |j AS (SELECT o.doc_id,
        |    CASE WHEN ti.c3 IS NOT NULL
        |           THEN CAST(round(1000000 * ln(bpi.c2 * 1.0 / ti.c3)) AS BIGINT)
        |         WHEN bbi.c2 IS NOT NULL
        |           THEN CAST(round(1000000 * ln(2.5 * upi.c1 / bbi.c2)) AS BIGINT)
        |         WHEN ubi.c1 IS NOT NULL
        |           THEN CAST(round(1000000 * ln(6.25 * ni.nt / ubi.c1)) AS BIGINT)
        |         ELSE CAST(round(1000000 * ln(6.25 * ni.nt)) AS BIGINT) END AS smi,
        |    CASE WHEN tg.c3 IS NOT NULL
        |           THEN CAST(round(1000000 * ln(bpg.c2 * 1.0 / tg.c3)) AS BIGINT)
        |         WHEN bbg.c2 IS NOT NULL
        |           THEN CAST(round(1000000 * ln(2.5 * upg.c1 / bbg.c2)) AS BIGINT)
        |         WHEN ubg.c1 IS NOT NULL
        |           THEN CAST(round(1000000 * ln(6.25 * ng.nt / ubg.c1)) AS BIGINT)
        |         ELSE CAST(round(1000000 * ln(6.25 * ng.nt)) AS BIGINT) END AS smg
        |  FROM o
        |  LEFT JOIN t3i ti ON ti.w1 = o.w1 AND ti.w2 = o.w2 AND ti.w3 = o.w3
        |  LEFT JOIN b2i bpi ON bpi.p = o.w1 AND bpi.q = o.w2
        |  LEFT JOIN b2i bbi ON bbi.p = o.w2 AND bbi.q = o.w3
        |  LEFT JOIN u1i upi ON upi.w = o.w2
        |  LEFT JOIN u1i ubi ON ubi.w = o.w3
        |  LEFT JOIN t3g tg ON tg.w1 = o.w1 AND tg.w2 = o.w2 AND tg.w3 = o.w3
        |  LEFT JOIN b2g bpg ON bpg.p = o.w1 AND bpg.q = o.w2
        |  LEFT JOIN b2g bbg ON bbg.p = o.w2 AND bbg.q = o.w3
        |  LEFT JOIN u1g upg ON upg.w = o.w2
        |  LEFT JOIN u1g ubg ON ubg.w = o.w3, ni, ng)
        |SELECT doc_id, count(*) AS n_trigrams,
        |  CAST(sum(smi) AS BIGINT) AS s_in, CAST(sum(smg) AS BIGINT) AS s_gen,
        |  CAST(sum(smi) - sum(smg) AS BIGINT) AS ml_delta,
        |  CAST(CASE WHEN sum(smi) < sum(smg) THEN 1 ELSE 0 END AS BIGINT) AS selected
        |FROM j GROUP BY doc_id""".stripMargin,
    // collocation twin: same corpus-wide bigram/unigram counts, the
    // PMI ln argument as ONE double (CAST(N*c2 AS DOUBLE)/(c1p*c1q) —
    // exact integer products both sides), integer micro-nats, and the
    // total (pmi desc, p, q) order so the LIMIT boundary agrees
    "ta_colloc" ->
      """WITH arr AS (SELECT doc_id, list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' '), t -> len(t) > 0) AS toks FROM documents),
        |u AS (SELECT tok AS w, count(*) AS c1 FROM
        |  (SELECT unnest(toks) AS tok FROM arr) GROUP BY 1),
        |n AS (SELECT CAST(sum(c1) AS BIGINT) AS nt FROM u),
        |bo AS (SELECT toks[i] AS p, toks[i + 1] AS q
        |  FROM arr, generate_series(1, 4000) s(i)
        |  WHERE i <= len(toks) - 1
        |    AND 1 = (SELECT CASE WHEN max(len(toks)) - 1 <= 4000 THEN 1
        |      ELSE error('ta_colloc oracle: token series bound exceeded') END FROM arr)),
        |b AS (SELECT p, q, count(*) AS c2 FROM bo GROUP BY 1, 2
        |  HAVING count(*) >= 5)
        |SELECT b.p, b.q, b.c2, up.c1 AS c1p, uq.c1 AS c1q,
        |  CAST(round(1000000 * ln(CAST(n.nt * b.c2 AS DOUBLE) / (up.c1 * uq.c1))) AS BIGINT) AS pmi_micro
        |FROM b JOIN u up ON up.w = b.p JOIN u uq ON uq.w = b.q, n
        |ORDER BY pmi_micro DESC, p, q LIMIT 50""".stripMargin,
    // naive-bayes twin: same even/odd split, same add-one-smoothed
    // per-(token, class) surprisal in integer micro-nats — each term
    // is ln of ONE identically-associated double (CAST(tc+V AS
    // DOUBLE)/(c+1), CAST(n AS DOUBLE)/nd), so per-class totals are
    // exact integers and the argmin (ties → smallest class) cannot
    // diverge. Zero-token docs score on priors alone (left joins).
    "ta_nbayes" ->
      """WITH arr AS (SELECT doc_id, lang, list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z \n]+', '', 'g'), '\s+', ' ', 'g')), ' '), t -> len(t) > 0) AS toks FROM documents),
        |tr AS (SELECT * FROM arr WHERE doc_id % 2 = 0),
        |sc AS (SELECT * FROM arr WHERE doc_id % 2 = 1),
        |occ AS (SELECT lang AS lab, unnest(toks) AS w FROM tr),
        |cond AS (SELECT lab, w, count(*) AS c FROM occ GROUP BY 1, 2),
        |tcc AS (SELECT lab, CAST(count(*) AS BIGINT) AS tc FROM occ GROUP BY 1),
        |vv AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM occ),
        |pr AS (SELECT lang AS lab, count(*) AS nd FROM tr GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM tr),
        |lab AS (SELECT pr.lab, coalesce(tcc.tc, 0) + vv.v AS tcv,
        |    CAST(round(1000000 * ln(CAST(nn.n AS DOUBLE) / pr.nd)) AS BIGINT) AS prior_s
        |  FROM pr LEFT JOIN tcc USING (lab), vv, nn),
        |tok AS (SELECT doc_id, unnest(toks) AS w FROM sc),
        |pdl AS (SELECT t.doc_id, l.lab,
        |    sum(CAST(round(1000000 * ln(CAST(l.tcv AS DOUBLE) / (coalesce(c.c, 0) + 1))) AS BIGINT)) AS s_tok
        |  FROM tok t CROSS JOIN lab l
        |  LEFT JOIN cond c ON c.lab = l.lab AND c.w = t.w
        |  GROUP BY 1, 2),
        |f AS (SELECT s.doc_id, s.lang AS actual, l.lab,
        |    CAST(l.prior_s + coalesce(p.s_tok, 0) AS BIGINT) AS s, CAST(len(s.toks) AS BIGINT) AS n_toks
        |  FROM sc s CROSS JOIN lab l
        |  LEFT JOIN pdl p ON p.doc_id = s.doc_id AND p.lab = l.lab),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY s, lab) AS rn FROM f)
        |SELECT doc_id, actual, lab AS pred, CAST(actual = lab AS BIGINT) AS agree,
        |  n_toks, s AS s_micro
        |FROM r WHERE rn = 1""".stripMargin,
    // triangle twin: id-ordered naive enumeration (a<b<c, each
    // triangle once) — the triangle SET is orientation-independent,
    // so the degree-ordered Spark enumeration must agree exactly
    "g_triangles" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM lp a JOIN lp b
        |  ON a.ok = b.ok AND a.p < b.p),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT node, count(*) AS n_tri FROM (
        |  SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri) t
        |GROUP BY node""".stripMargin,
    // clustering-coefficient twin: same edge set, id-ordered triangle
    // enumeration, one rounded double division on exact integers
    "g_clustering" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM lp a JOIN lp b
        |  ON a.ok = b.ok AND a.p < b.p),
        |deg AS (SELECT node, count(*) AS deg FROM (
        |  SELECT u AS node FROM e UNION ALL SELECT v FROM e) dn GROUP BY node),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |tc AS (SELECT node, count(*) AS n_tri FROM (
        |  SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |  UNION ALL SELECT c FROM tri) t GROUP BY node)
        |SELECT d.node, d.deg, CAST(coalesce(tc.n_tri, 0) AS BIGINT) AS n_tri,
        |  round(2.0 * coalesce(tc.n_tri, 0) / (d.deg * (d.deg - 1)), 6) AS coef
        |FROM deg d LEFT JOIN tc USING (node) WHERE d.deg >= 2""".stripMargin,
    // label-propagation twin: the same symmetrized edge set, each of
    // the 4 synchronous rounds replayed as a counts CTE + a
    // row_number argmax with the IDENTICAL (count desc, label asc)
    // tie-break — integer counts, so the replay cannot diverge
    // SSSP twin: exact-integer Bellman-Ford replayed as a FIXED
    // 10-round MATERIALIZED chain (each round references its
    // predecessor twice). Relaxation is monotone and idempotent at
    // its fixpoint, so over-provisioned rounds are no-ops; the Spark
    // kernel REQUIREs convergence within the same budget.
    "g_sssp" -> {
      val rounds = (1 to 10).map { i =>
        s"""r$i AS MATERIALIZED (SELECT node, min(d) AS d FROM (
           |  SELECT node, d FROM r${i - 1}
           |  UNION ALL SELECT s.dst AS node, t.d + s.w AS d
           |  FROM sym s JOIN r${i - 1} t ON s.src = t.node) GROUP BY 1)"""
          .stripMargin
      }.mkString(",\n")
      s"""WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
         |ep AS (SELECT a.p AS u, b.p AS v, count(*) AS c FROM lp a JOIN lp b
         |  ON a.ok = b.ok AND a.p < b.p GROUP BY 1, 2),
         |sym AS MATERIALIZED (SELECT u AS src, v AS dst, 1000000 // c AS w FROM ep
         |  UNION ALL SELECT v AS src, u AS dst, 1000000 // c AS w FROM ep),
         |r0 AS MATERIALIZED (SELECT min(src) AS node, CAST(0 AS BIGINT) AS d FROM sym),
         |$rounds
         |SELECT node, d AS dist_micro FROM r10""".stripMargin
    },
    // k-core twin: the same exact-integer peel, replayed as a FIXED
    // 12-round CTE chain. Peeling is monotone and idempotent at its
    // fixpoint, so extra rounds are no-ops; the Spark kernel REQUIREs
    // convergence within 12 rounds, making an input that would need
    // more fail loudly there instead of diverging here.
    "g_kcore" -> {
      // MATERIALIZED per round: each round references its predecessor
      // four times, so inlined CTEs would expand ~4^12 scans
      val rounds = (1 to 12).map { i =>
        s"""k$i AS MATERIALIZED (SELECT src FROM r${i - 1} GROUP BY src
           |  HAVING count(*) >= (SELECT k FROM kv)),
           |r$i AS MATERIALIZED (SELECT e.src, e.dst FROM r${i - 1} e
           |  WHERE e.src IN (SELECT src FROM k$i)
           |    AND e.dst IN (SELECT src FROM k$i))""".stripMargin
      }.mkString(",\n")
      s"""WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
         |e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM lp a JOIN lp b
         |  ON a.ok = b.ok AND a.p < b.p),
         |r0 AS MATERIALIZED (SELECT u AS src, v AS dst FROM e
         |  UNION ALL SELECT v AS src, u AS dst FROM e),
         |kv AS MATERIALIZED (SELECT (count(*) * 7) // (count(DISTINCT src) * 10) AS k
         |  FROM r0),
         |$rounds
         |SELECT src AS node, CAST(count(*) AS BIGINT) AS core_deg
         |FROM r12 GROUP BY 1""".stripMargin
    },
    "g_labelprop" ->
      """WITH lp AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem),
        |e AS (SELECT DISTINCT a.p AS u, b.p AS v FROM lp a JOIN lp b
        |  ON a.ok = b.ok AND a.p < b.p),
        |sym AS (SELECT u AS src, v AS dst FROM e
        |  UNION ALL SELECT v AS src, u AS dst FROM e),
        |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM sym),
        |c1 AS (SELECT s.dst, l.lbl, count(*) AS c FROM sym s
        |  JOIN l0 l ON l.node = s.src GROUP BY 1, 2),
        |l1 AS (SELECT dst AS node, lbl FROM (SELECT dst, lbl,
        |  row_number() OVER (PARTITION BY dst ORDER BY c DESC, lbl) AS rn
        |  FROM c1) WHERE rn = 1),
        |c2 AS (SELECT s.dst, l.lbl, count(*) AS c FROM sym s
        |  JOIN l1 l ON l.node = s.src GROUP BY 1, 2),
        |l2 AS (SELECT dst AS node, lbl FROM (SELECT dst, lbl,
        |  row_number() OVER (PARTITION BY dst ORDER BY c DESC, lbl) AS rn
        |  FROM c2) WHERE rn = 1),
        |c3 AS (SELECT s.dst, l.lbl, count(*) AS c FROM sym s
        |  JOIN l2 l ON l.node = s.src GROUP BY 1, 2),
        |l3 AS (SELECT dst AS node, lbl FROM (SELECT dst, lbl,
        |  row_number() OVER (PARTITION BY dst ORDER BY c DESC, lbl) AS rn
        |  FROM c3) WHERE rn = 1),
        |c4 AS (SELECT s.dst, l.lbl, count(*) AS c FROM sym s
        |  JOIN l3 l ON l.node = s.src GROUP BY 1, 2),
        |l4 AS (SELECT dst AS node, lbl FROM (SELECT dst, lbl,
        |  row_number() OVER (PARTITION BY dst ORDER BY c DESC, lbl) AS rn
        |  FROM c4) WHERE rn = 1),
        |sz AS (SELECT lbl, CAST(count(*) AS BIGINT) AS comm_size
        |  FROM l4 GROUP BY 1)
        |SELECT l4.node, l4.lbl AS community, sz.comm_size
        |FROM l4 JOIN sz USING (lbl)""".stripMargin,
    // z-score twin: micro-unit integer moments per dimension, the
    // double formula in the IDENTICAL expression order (s*1.0/n etc.).
    // s2 sums exactly on both sides (Spark decimal(38,0), DuckDB
    // BIGINT→HUGEINT widening), and a zero-variance dimension yields
    // NULL z by contract — the same double `<= 0` branch both engines
    // evaluate on identical exact-integer moments (ADVICE r6).
    // PCA power-iteration twin: the SAME exact-integer recurrence in
    // HUGEINTs — full gram from a self-join over milli-unit
    // components, three normalized v <- G·v steps (half-up on
    // positives: (|w|*2e6 + m) // (2m)), then the micro-unit
    // projection — bit-identical direction and sign
    "emb_pca" ->
      """WITH c AS (SELECT vec_id, i - 1 AS dim,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qm
        |  FROM embeddings, generate_series(1, 64) g(i)
        |  WHERE 1 = (SELECT CASE WHEN min(len(embedding)) = 64 AND max(len(embedding)) = 64
        |    THEN 1 ELSE error('emb_pca oracle: embeddings are not 64-dim') END FROM embeddings)),
        |gm AS (SELECT a.dim AS i, b.dim AS j,
        |    CAST(sum(CAST(a.qm AS HUGEINT) * b.qm) AS HUGEINT) AS gv
        |  FROM c a JOIN c b USING (vec_id) GROUP BY 1, 2),
        |v0 AS (SELECT i AS dim, CAST(1000000 AS HUGEINT) AS v FROM generate_series(0, 63) s(i)),
        |w1 AS (SELECT gm.i AS dim, sum(gv * v0.v) AS w FROM gm JOIN v0 ON v0.dim = gm.j GROUP BY 1),
        |m1 AS (SELECT max(abs(w)) AS m FROM w1),
        |v1 AS (SELECT dim, sign(w) * ((abs(w) * 2000000 + m) // (2 * m)) AS v FROM w1, m1),
        |w2 AS (SELECT gm.i AS dim, sum(gv * v1.v) AS w FROM gm JOIN v1 ON v1.dim = gm.j GROUP BY 1),
        |m2 AS (SELECT max(abs(w)) AS m FROM w2),
        |v2 AS (SELECT dim, sign(w) * ((abs(w) * 2000000 + m) // (2 * m)) AS v FROM w2, m2),
        |w3 AS (SELECT gm.i AS dim, sum(gv * v2.v) AS w FROM gm JOIN v2 ON v2.dim = gm.j GROUP BY 1),
        |m3 AS (SELECT max(abs(w)) AS m FROM w3),
        |v3 AS (SELECT dim, sign(w) * ((abs(w) * 2000000 + m) // (2 * m)) AS v FROM w3, m3)
        |SELECT e.vec_id,
        |  CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) * v3.v) AS BIGINT) AS proj_micro2
        |FROM embeddings e, generate_series(1, 64) g(i), v3
        |WHERE v3.dim = i - 1
        |GROUP BY e.vec_id""".stripMargin,
    // JL projection twin: 16 per-out-dim selects over the inlined
    // Rademacher constants (rows 16..31 of the hyperplane family)
    "emb_project" ->
      (0 until 16).map { j =>
        s"SELECT vec_id, CAST($j AS BIGINT) AS out_dim, ${projMicroSql(j)} AS y_micro FROM embeddings"
      }.mkString("", "\nUNION ALL\n", ""),
    // outlier twin: the same fully-integer n²·dist² = Σ_d (n·xm−S_d)²
    // (HUGEINT — the decimal twin), ranking on the exact integer, one
    // identical sqrt/divide tree at display
    "emb_outliers" ->
      """WITH c AS (SELECT vec_id, i - 1 AS dim,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xm
        |  FROM embeddings, generate_series(1, 256) g(i)
        |  WHERE i <= len(embedding)
        |    AND 1 = (SELECT CASE WHEN max(len(embedding)) <= 256 THEN 1
        |      ELSE error('emb_outliers oracle: dim series bound exceeded') END
        |      FROM embeddings)),
        |st AS (SELECT dim, count(*) AS n, sum(CAST(xm AS HUGEINT)) AS s
        |  FROM c GROUP BY 1),
        |dv AS (SELECT c.vec_id, max(st.n) AS n,
        |    sum((CAST(st.n AS HUGEINT) * c.xm - st.s)
        |      * (CAST(st.n AS HUGEINT) * c.xm - st.s)) AS dev2
        |  FROM c JOIN st USING (dim) GROUP BY 1)
        |SELECT vec_id,
        |  round(sqrt(CAST(dev2 AS DOUBLE)) / n / 1000000.0, 6) AS dist
        |FROM dv ORDER BY dev2 DESC, vec_id LIMIT 20""".stripMargin,
    "emb_standardize" ->
      """WITH c AS (SELECT vec_id, i - 1 AS dim,
        |    CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS xm
        |  FROM embeddings, generate_series(1, 256) g(i)
        |  WHERE i <= len(embedding)
        |    AND 1 = (SELECT CASE WHEN max(len(embedding)) <= 256 THEN 1
        |      ELSE error('emb_standardize oracle: dim series bound exceeded') END
        |      FROM embeddings)),
        |s AS (SELECT dim, count(*) AS n, sum(xm) AS s, sum(xm * xm) AS s2
        |  FROM c GROUP BY 1)
        |SELECT c.vec_id, c.dim,
        |  CASE WHEN s.s2 * 1.0 / s.n - (s.s * 1.0 / s.n) * (s.s * 1.0 / s.n) <= 0
        |    THEN NULL
        |    ELSE round((c.xm - s.s * 1.0 / s.n) /
        |      sqrt(s.s2 * 1.0 / s.n - (s.s * 1.0 / s.n) * (s.s * 1.0 / s.n)), 6)
        |  END AS z
        |FROM c JOIN s USING (dim)""".stripMargin
  )
}
