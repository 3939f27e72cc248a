package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ExtensionCatalog, Oracles, QueryCatalog, TpchCatalog}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented operator from SURVEY §2
  * (p/a/w/j/u/r/q families) plus the LLM-pipeline extensions
  * (dd/ann/ta/mm families); `oracleSql` holds the DuckDB twin for each
  * (see [[graft.queries.Oracles]] for the parity rules).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueryCatalog.q1PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // stateless transforms (SURVEY §2.3)
    "p1_buy_sell" -> QueryCatalog.p1BuySell,
    "p2_contains_all" -> QueryCatalog.p2ContainsAll,
    "p3_sentiment" -> QueryCatalog.p3Sentiment,
    "p5_occurrences" -> QueryCatalog.p5Occurrences,
    "p6_parse_props" -> QueryCatalog.p6ParseProps,
    "p8_global_agg" -> QueryCatalog.p8GlobalAgg,
    "p10_hype_words" -> QueryCatalog.p10HypeWords,
    "p14_deltas" -> QueryCatalog.p14Deltas,
    "r1_split_route" -> QueryCatalog.r1SplitRoute,
    // aggregations (§2.5) + windows (§2.6/2.7)
    "a1_window_sum" -> QueryCatalog.a1WindowSum,
    "a2_running_sum" -> QueryCatalog.a2RunningSum,
    "a5_group_product" -> QueryCatalog.a5GroupProduct,
    "a6_max_per_key" -> QueryCatalog.a6MaxPerKey,
    "agg_count_distinct" -> QueryCatalog.aggCountDistinct,
    "w_rank_topk" -> QueryCatalog.wRankTopK,
    "w_lag_delta" -> QueryCatalog.wLagDelta,
    "w_first_last" -> QueryCatalog.wFirstLast,
    "w_moving_avg" -> QueryCatalog.wMovingAvg,
    "w_ntile" -> QueryCatalog.wNtile,
    "w_cume_dist" -> QueryCatalog.wCumeDist,
    "w_range_frame" -> QueryCatalog.wRangeFrame,
    "agg_corr" -> QueryCatalog.aggCorr,
    "a4_ema_final" -> QueryCatalog.a4EmaFinal,
    "a7_session_window" -> QueryCatalog.a7SessionWindow,
    "a8_hopping_window" -> QueryCatalog.a8HoppingWindow,
    "agg_approx_distinct" -> QueryCatalog.aggApproxDistinct,
    "agg_kmv_distinct" -> QueryCatalog.aggKmvDistinct,
    "agg_cms" -> QueryCatalog.aggCms,
    "agg_bloom" -> QueryCatalog.aggBloom,
    "agg_percentile_disc" -> QueryCatalog.aggPercentileDisc,
    "agg_hash_quantile" -> QueryCatalog.aggHashQuantile,
    "agg_mode" -> QueryCatalog.aggMode,
    "agg_heavy_hitters" -> ExtensionCatalog.aggHeavyHitters,
    "agg_rollup" -> QueryCatalog.aggRollup,
    "agg_cube" -> QueryCatalog.aggCube,
    "agg_grouping_sets" -> QueryCatalog.aggGroupingSets,
    "agg_histogram" -> QueryCatalog.aggHistogram,
    "agg_pivot" -> QueryCatalog.aggPivot,
    // joins / two-input (§2.4) + set ops (§2.8) + routing (§2.9)
    "j_broadcast_dim" -> QueryCatalog.jBroadcastDim,
    "j_shuffle_agg" -> QueryCatalog.jShuffleAgg,
    "j_semi" -> QueryCatalog.jSemi,
    "j_anti" -> QueryCatalog.jAnti,
    "j_asof" -> QueryCatalog.jAsOf,
    "j_interval" -> QueryCatalog.jInterval,
    "j_band" -> QueryCatalog.jBand,
    "j_bloom_semi" -> QueryCatalog.jBloomSemi,
    "j_lateral_topk" -> QueryCatalog.jLateralTopk,
    "q_top_orders" -> QueryCatalog.qTopOrders,
    "j4_cogroup" -> QueryCatalog.j4Cogroup,
    "u1_union_tagged" -> QueryCatalog.u1UnionTagged,
    "set_except" -> QueryCatalog.setExcept,
    "set_intersect" -> QueryCatalog.setIntersect,
    // headline scan/join/agg queries
    "q1_pricing_summary" -> QueryCatalog.q1PricingSummary,
    "q3_shipping" -> QueryCatalog.q3Shipping,
    "q5_volume" -> QueryCatalog.q5Volume,
    "q6_revenue" -> QueryCatalog.q6Revenue,
    "q18_large_orders" -> QueryCatalog.q18LargeOrders,
    // the rest of the classic TPC-H suite, adapted to the reduced
    // schema (graft.queries.TpchCatalog — plan shapes preserved)
    "q2_min_cost" -> TpchCatalog.q2MinCost,
    "q4_priority" -> TpchCatalog.q4Priority,
    "q7_trade_flows" -> TpchCatalog.q7TradeFlows,
    "q8_market_share" -> TpchCatalog.q8MarketShare,
    "q9_profit" -> TpchCatalog.q9Profit,
    "q20_excess_shippers" -> TpchCatalog.q20ExcessShippers,
    "q10_returns" -> TpchCatalog.q10Returns,
    "q11_share_threshold" -> TpchCatalog.q11ShareThreshold,
    "q12_late_priority" -> TpchCatalog.q12LatePriority,
    "q13_count_distribution" -> TpchCatalog.q13CountDistribution,
    "q14_promo" -> TpchCatalog.q14Promo,
    "q15_top_supplier" -> TpchCatalog.q15TopSupplier,
    "q16_supplier_count" -> TpchCatalog.q16SupplierCount,
    "q17_small_qty" -> TpchCatalog.q17SmallQty,
    "q19_disjunctive" -> TpchCatalog.q19Disjunctive,
    "q21_sole_late" -> TpchCatalog.q21SoleLate,
    "q22_idle_customers" -> TpchCatalog.q22IdleCustomers,
    // LLM-pipeline extensions
    "dd_exact" -> ExtensionCatalog.ddExact,
    "dd_lines" -> ExtensionCatalog.ddLines,
    "dd_minhash_sig" -> ExtensionCatalog.ddMinhashSig,
    "dd_minhash_lsh" -> ExtensionCatalog.ddMinhashLsh,
    "dd_simhash" -> ExtensionCatalog.ddSimhash,
    "dd_simhash_pairs" -> ExtensionCatalog.ddSimhashPairs,
    "dd_jaccard" -> ExtensionCatalog.ddJaccard,
    "dd_embed_cosine" -> ExtensionCatalog.ddEmbedCosine,
    "dd_components" -> ExtensionCatalog.ddComponents,
    "dd_components_stats" -> ExtensionCatalog.ddClusterStats,
    "dd_contaminated" -> ExtensionCatalog.ddContaminated,
    "dd_crossdoc" -> ExtensionCatalog.ddCrossdoc,
    "dd_spans" -> ExtensionCatalog.ddSpans,
    "dd_spans_scrub" -> ExtensionCatalog.ddSpansScrub,
    "dd_semantic" -> ExtensionCatalog.ddSemantic,
    "dd_containment" -> ExtensionCatalog.ddContainment,
    "dd_edit" -> ExtensionCatalog.ddEdit,
    "dd_urls" -> ExtensionCatalog.ddUrls,
    "ann_brute_force" -> ExtensionCatalog.annBruteForce,
    "ann_bucketed" -> ExtensionCatalog.annBucketed,
    "ann_ivf" -> ExtensionCatalog.annIvf,
    "ann_pq" -> ExtensionCatalog.annPq,
    "ann_ivfpq" -> ExtensionCatalog.annIvfPq,
    "ann_external" -> ExtensionCatalog.annExternal,
    "ann_ivfpq_rerank" -> ExtensionCatalog.annIvfPqRerank,
    "emb_centroid" -> ExtensionCatalog.embCentroid,
    "emb_quantize" -> ExtensionCatalog.embQuantize,
    "emb_gram" -> ExtensionCatalog.embGram,
    "emb_pq" -> ExtensionCatalog.embPq,
    "j_skew_salted" -> ExtensionCatalog.jSkewSalted,
    "j_bucketed_colo" -> ExtensionCatalog.jBucketedColo,
    "ds_sample_hash" -> ExtensionCatalog.dsSampleHash,
    "ds_sample_stratified" -> ExtensionCatalog.dsSampleStratified,
    "ds_sample_topk" -> ExtensionCatalog.dsSampleTopk,
    "ds_split_assign" -> ExtensionCatalog.dsSplitAssign,
    "ds_mixture" -> ExtensionCatalog.dsMixture,
    "ds_shuffle_rank" -> ExtensionCatalog.dsShuffleRank,
    "ds_interleave" -> ExtensionCatalog.dsInterleave,
    "ds_temperature" -> ExtensionCatalog.dsTemperature,
    "pipe_curate" -> ExtensionCatalog.pipeCurate,
    "pipe_pretrain" -> ExtensionCatalog.pipePretrain,
    "pipe_rag" -> ExtensionCatalog.pipeRag,
    "pack_sequences" -> ExtensionCatalog.packSequences,
    "ta_langid" -> ExtensionCatalog.taLangId,
    "ta_quality" -> ExtensionCatalog.taQuality,
    "ta_pii" -> ExtensionCatalog.taPii,
    "ta_urls" -> ExtensionCatalog.taUrls,
    "ta_tokens" -> ExtensionCatalog.taTokens,
    "ta_fingerprint" -> ExtensionCatalog.taFingerprint,
    "ta_winnow" -> ExtensionCatalog.taWinnow,
    "ta_vocab" -> ExtensionCatalog.taVocab,
    "ta_ngrams" -> ExtensionCatalog.taNgrams,
    "ta_token_ids" -> ExtensionCatalog.taTokenIds,
    "ta_repetition" -> ExtensionCatalog.taRepetition,
    "ta_chunks" -> ExtensionCatalog.taChunks,
    "ta_tfidf" -> ExtensionCatalog.taTfidf,
    "ta_entropy" -> ExtensionCatalog.taEntropy,
    "ta_unigram" -> ExtensionCatalog.taUnigram,
    "ta_bigram" -> ExtensionCatalog.taBigram,
    "emb_standardize" -> ExtensionCatalog.embStandardize,
    "emb_project" -> ExtensionCatalog.embProject,
    "emb_pca" -> ExtensionCatalog.embPca,
    "emb_knn_graph" -> ExtensionCatalog.embKnnGraph,
    "mm_decode_meta" -> ExtensionCatalog.mmDecodeMeta,
    "mm_resize" -> ExtensionCatalog.mmResize,
    "mm_frames" -> ExtensionCatalog.mmFrames,
    "mm_phash" -> ExtensionCatalog.mmPhash,
    "mm_phash_pairs" -> ExtensionCatalog.mmPhashPairs,
    "mm_audio_meta" -> ExtensionCatalog.mmAudioMeta,
    "mm_audio_windows" -> ExtensionCatalog.mmAudioWindows,
    "mm_audio_pairs" -> ExtensionCatalog.mmAudioPairs,
    // iterative graph analytics
    "g_pagerank" -> ExtensionCatalog.gPagerank,
    "g_bfs" -> ExtensionCatalog.gBfs,
    // time-series similarity
    "ts_sax" -> ExtensionCatalog.tsSax,
    "ts_motif" -> ExtensionCatalog.tsMotif
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.all
}
