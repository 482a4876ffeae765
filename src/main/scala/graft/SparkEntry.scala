package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CorpusQueries, GraphQueries, LlmQueries, MediaQueries, Relational, Relational2, Relational3, RetrievalQueries, VideoQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries`: one entry per implemented operator from SURVEY.md §2;
  * each is (spark, sfDir) => DataFrame over the parquet tables in
  * sfDir. `oracleSql`: equivalent DuckDB SQL per key; column names
  * and aliases match the Spark output exactly.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    VideoQueries.v1Boxes(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> Relational.q1Agg,
    "q2_topk" -> Relational.q2TopK,
    "q6_filter_agg" -> Relational.q6FilterAgg,
    "v1_boxes" -> VideoQueries.v1Boxes,
    "v2_label_hist" -> VideoQueries.v2LabelHist,
    "v3_rgb" -> VideoQueries.v3Rgb,
    "v4_frame_stats" -> VideoQueries.v4FrameStats,
    "v5_vdms_records" -> VideoQueries.v5VdmsRecords,
    "v6_detect" -> VideoQueries.v6Detect,
    "v7_detect_planned" -> VideoQueries.v7DetectPlanned,
    "d1_exact_dedup" -> LlmQueries.d1ExactDedup,
    "d2_near_dup" -> LlmQueries.d2NearDup,
    "d3_simhash" -> LlmQueries.d3Simhash,
    "d4_ngram_jaccard" -> LlmQueries.d4NgramJaccard,
    "d5_embed_neardup" -> LlmQueries.d5EmbedNearDup,
    "d6_simhash_pairs" -> LlmQueries.d6SimhashPairs,
    "d7_semantic_dedup" -> LlmQueries.d7SemanticDedup,
    "d8_repeated_ngrams" -> CorpusQueries.d8RepeatedNgrams,
    "d9_dedup_clusters" -> LlmQueries.d9DedupClusters,
    "s1_knn" -> LlmQueries.s1Knn,
    "s2_knn_lsh" -> LlmQueries.s2KnnLsh,
    "s3_knn_ivf" -> LlmQueries.s3KnnIvf,
    "s4_knn_multiprobe" -> LlmQueries.s4KnnMultiProbe,
    "s5_quantize" -> LlmQueries.s5Quantize,
    "s6_knn_ivf_probe" -> LlmQueries.s6KnnIvfProbe,
    "s7_pq_adc" -> LlmQueries.s7PqAdc,
    "s8_ivf_pq" -> LlmQueries.s8IvfPq,
    "s9_knn_ivf_trained" -> LlmQueries.s9KnnIvfTrained,
    "s10_index_serve" -> LlmQueries.s10IndexServe,
    "s11_ivfpq_rerank" -> LlmQueries.s11IvfPqRerank,
    "s12_ann_recall" -> LlmQueries.s12AnnRecall,
    "x13_decontaminate" -> LlmQueries.x13Decontaminate,
    "x1_text_stats" -> LlmQueries.x1TextStats,
    "x2_lang_id" -> LlmQueries.x2LangId,
    "x3_token_hist" -> LlmQueries.x3TokenHist,
    "x4_fingerprint" -> LlmQueries.x4Fingerprint,
    "x5_cardinality" -> LlmQueries.x5Cardinality,
    "x6_approx_distinct" -> LlmQueries.x6ApproxDistinct,
    "x7_token_counts" -> LlmQueries.x7TokenCounts,
    "x8_percentiles" -> LlmQueries.x8Percentiles,
    "x9_profile" -> LlmQueries.x9Profile,
    "x10_curation" -> LlmQueries.x10Curation,
    "x11_split" -> LlmQueries.x11Split,
    "x12_sample" -> LlmQueries.x12Sample,
    "m1_multimodal" -> LlmQueries.m1Multimodal,
    "m2_png_decode" -> LlmQueries.m2PngDecode,
    "m3_wav_decode" -> LlmQueries.m3WavDecode,
    "m4_gif_decode" -> LlmQueries.m4GifDecode,
    "m5_audio_features" -> LlmQueries.m5AudioFeatures,
    "m6_image_stats" -> LlmQueries.m6ImageStats,
    "m7_frame_sample" -> LlmQueries.m7FrameSample,
    "x14_repetition" -> LlmQueries.x14Repetition,
    "x15_bloom_decontaminate" -> LlmQueries.x15BloomDecontaminate,
    "x16_pack" -> CorpusQueries.x16Pack,
    "x21_pack_map" -> CorpusQueries.x21PackMap,
    "x22_decontam_ngram" -> CorpusQueries.x22NgramDecontaminate,
    "x17_scrub" -> CorpusQueries.x17Scrub,
    "x18_string_profile" -> LlmQueries.x18StringProfile,
    "x19_mixing" -> LlmQueries.x19Mixing,
    "x20_curation_v2" -> LlmQueries.x20CurationV2,
    "r10_rollup" -> Relational2.r10Rollup,
    "r11_cube" -> Relational2.r11Cube,
    "r12_setops" -> Relational2.r12SetOps,
    "r13_rank_window" -> Relational2.r13RankWindow,
    "r14_semi_anti" -> Relational2.r14SemiAnti,
    "r15_string_date" -> Relational2.r15StringDate,
    "r16_json" -> Relational2.r16Json,
    "r17_star_join" -> Relational2.r17StarJoin,
    "r18_analytic" -> Relational2.r18Analytic,
    "r19_sql_surface" -> Relational2.r19SqlSurface,
    "r20_session_window" -> Relational2.r20SessionWindow,
    "r21_asof" -> Relational2.r21Asof,
    "r22_range" -> Relational2.r22Range,
    "r23_outer_join" -> Relational2.r23OuterJoin,
    "r24_pivot" -> Relational2.r24Pivot,
    "r25_range_window" -> Relational2.r25RangeWindow,
    "r26_distribution" -> Relational2.r26Distribution,
    "r27_subqueries" -> Relational2.r27Subqueries,
    "x23_incremental_dedup" -> CorpusQueries.x23IncrementalDedup,
    "x24_cluster_rep" -> CorpusQueries.x24ClusterRep,
    "x25_token_budget" -> CorpusQueries.x25TokenBudget,
    "d10_substring_dedup" -> LlmQueries.d10SubstringDedup,
    "s13_binary_rerank" -> LlmQueries.s13BinaryRerank,
    "x26_bigram_lm" -> CorpusQueries.x26BigramLm,
    "r28_grouping_sets" -> Relational2.r28GroupingSets,
    "r29_lateral" -> Relational2.r29Lateral,
    "s14_mrl_rerank" -> LlmQueries.s14MrlRerank,
    "s15_pq_trained" -> LlmQueries.s15PqTrained,
    "x27_temperature_mix" -> LlmQueries.x27TemperatureMix,
    "x28_bm25" -> RetrievalQueries.x28Bm25,
    "x29_tfidf_keywords" -> RetrievalQueries.x29TfidfKeywords,
    "s16_filtered_ann" -> RetrievalQueries.s16FilteredAnn,
    "r30_gap_fill" -> Relational3.r30GapFill,
    "r31_compact_log" -> Relational3.r31CompactLog,
    "m8_perceptual_hash" -> MediaQueries.m8PerceptualHash,
    "s17_index_update" -> LlmQueries.s17IndexUpdate,
    "g1_pagerank" -> GraphQueries.g1PageRank,
    "g2_triangles" -> GraphQueries.g2Triangles,
    "r32_local_supplier" -> Relational3.r32LocalSupplier,
    "x30_zipf_profile" -> CorpusQueries.x30ZipfProfile,
    "r33_funnel" -> Relational3.r33Funnel,
    "r34_cohort" -> Relational3.r34Cohort,
    "m9_scene_cuts" -> MediaQueries.m9SceneCuts,
    "r35_streaks" -> Relational3.r35Streaks,
    "x31_corr_profile" -> CorpusQueries.x31CorrProfile,
    "x32_equidepth_hist" -> CorpusQueries.x32EquiDepth,
    "d11_edit_distance" -> LlmQueries.d11EditDistanceDedup,
    "m10_silence_segments" -> LlmQueries.m10SilenceSegments,
    "r36_bucketed_join" -> Relational3.r36BucketedJoin,
    "r37_small_quantity" -> Relational3.r37SmallQuantity,
    "d12_minhash_accuracy" -> LlmQueries.d12MinhashAccuracy,
    "g3_two_hop" -> GraphQueries.g3TwoHop,
    "x33_cluster_split" -> LlmQueries.x33ClusterSplit,
    "r38_scd2" -> Relational3.r38Scd2,
    "x34_cross_source" -> LlmQueries.x34CrossSourceDup,
    "s18_index_delete" -> LlmQueries.s18IndexDelete,
    "v8_track_continuity" -> VideoQueries.v8TrackContinuity,
    "x35_dataset_card" -> CorpusQueries.x35DatasetCard,
    "m11_thumbnail" -> MediaQueries.m11Thumbnail,
    "d13_neardup_index" -> LlmQueries.d13NearDupIndex,
    "x36_heavy_hitters" -> CorpusQueries.x36HeavyHitters,
    "x37_perplexity_filter" -> CorpusQueries.x37PerplexityFilter,
  )

  /** Every oracle is wrapped in `ORDER BY ALL` (all columns,
    * left-to-right ascending) — the exact order Verify dumps Spark
    * results in — so the driver's compare is order-proof whether or
    * not it re-sorts rows. Engine queries carry no global sort.
    * Invariant for query authors: no NULLs and no map columns in any
    * query output (NULL-ordering defaults differ across engines). */
  private def ordered(sql: String): String =
    s"SELECT * FROM (\n$sql\n) ORDER BY ALL"

  def oracleSql: Map[String, String] = rawOracleSql.map {
    case (k, v) => k -> ordered(v)
  }

  private def rawOracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin,
    "q6_filter_agg" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,
    "v1_boxes" -> VideoQueries.v1Sql,
    "v2_label_hist" -> VideoQueries.v2Sql,
    "v3_rgb" -> VideoQueries.v3Sql,
    "v4_frame_stats" -> VideoQueries.v4Sql,
    "v5_vdms_records" -> VideoQueries.v5Sql,
    "v6_detect" -> VideoQueries.v6Sql,
    // v7 = v6's semantics through the custom plan-node route
    "v7_detect_planned" -> VideoQueries.v6Sql,
    "d1_exact_dedup" -> LlmQueries.d1Sql,
    "d2_near_dup" -> LlmQueries.d2Sql,
    "d3_simhash" -> LlmQueries.d3Sql,
    "d4_ngram_jaccard" -> LlmQueries.d4Sql,
    "d5_embed_neardup" -> LlmQueries.d5Sql,
    "d6_simhash_pairs" -> LlmQueries.d6Sql,
    "d7_semantic_dedup" -> LlmQueries.d7Sql,
    "d8_repeated_ngrams" -> CorpusQueries.d8Sql,
    "d9_dedup_clusters" -> LlmQueries.d9Sql,
    "s1_knn" -> LlmQueries.s1Sql,
    "s2_knn_lsh" -> LlmQueries.s2Sql,
    "s3_knn_ivf" -> LlmQueries.s3Sql,
    "s4_knn_multiprobe" -> LlmQueries.s4Sql,
    "s5_quantize" -> LlmQueries.s5Sql,
    "s6_knn_ivf_probe" -> LlmQueries.s6Sql,
    "s7_pq_adc" -> LlmQueries.s7Sql,
    "s8_ivf_pq" -> LlmQueries.s8Sql,
    // s9_knn_ivf_trained: trained-centroid float averages are
    // summation-order-sensitive across engines — no SQL oracle on
    // purpose (driver records a rows-only check); correctness is
    // pinned by KMeansSpec (determinism, cost strictly below the
    // stand-in quantizer's, recall parity at equal search budget)
    // s15_pq_trained: same contract as s9 for the PQ codebook —
    // trained codewords are float means, so no SQL oracle; the spec
    // pins Lloyd's monotonicity (trained self-distortion ≤ the s7
    // stand-in's, whose seed it is) and determinism
    // s10 = s8's search served from the persisted cell-partitioned
    // index; identical arithmetic, so the oracle is s8's
    "s10_index_serve" -> LlmQueries.s8Sql,
    "s11_ivfpq_rerank" -> LlmQueries.s11Sql,
    "s12_ann_recall" -> LlmQueries.s12Sql,
    "x13_decontaminate" -> LlmQueries.x13Sql,
    "x1_text_stats" -> LlmQueries.x1Sql,
    "x2_lang_id" -> LlmQueries.x2Sql,
    "x3_token_hist" -> LlmQueries.x3Sql,
    "x4_fingerprint" -> LlmQueries.x4Sql,
    "x5_cardinality" -> LlmQueries.x5Sql,
    // x6_approx_distinct: HLL sketches differ across engines — no
    // SQL oracle on purpose (driver records a rows-only check)
    "x7_token_counts" -> LlmQueries.x7Sql,
    "x8_percentiles" -> LlmQueries.x8Sql,
    "x9_profile" -> LlmQueries.x9Sql,
    "x10_curation" -> LlmQueries.x10Sql,
    "x11_split" -> LlmQueries.x11Sql,
    "x12_sample" -> LlmQueries.x12Sql,
    "m1_multimodal" -> LlmQueries.m1Sql,
    "m2_png_decode" -> LlmQueries.m2Sql,
    "m3_wav_decode" -> LlmQueries.m3Sql,
    "m4_gif_decode" -> LlmQueries.m4Sql,
    "m5_audio_features" -> LlmQueries.m5Sql,
    "m6_image_stats" -> LlmQueries.m6Sql,
    "m7_frame_sample" -> LlmQueries.m7Sql,
    "x14_repetition" -> LlmQueries.x14Sql,
    // x15 output ≡ x13 (the bloom is a pure prefilter; the exact
    // semi join removes its false positives)
    "x15_bloom_decontaminate" -> LlmQueries.x15Sql,
    "x16_pack" -> CorpusQueries.x16Sql,
    "x21_pack_map" -> CorpusQueries.x21Sql,
    "x22_decontam_ngram" -> CorpusQueries.x22Sql,
    "x17_scrub" -> CorpusQueries.x17Sql,
    "x18_string_profile" -> LlmQueries.x18Sql,
    "x19_mixing" -> LlmQueries.x19Sql,
    "x20_curation_v2" -> LlmQueries.x20Sql,
    "r10_rollup" -> Relational2.r10Sql,
    "r11_cube" -> Relational2.r11Sql,
    "r12_setops" -> Relational2.r12Sql,
    "r13_rank_window" -> Relational2.r13Sql,
    "r14_semi_anti" -> Relational2.r14Sql,
    "r15_string_date" -> Relational2.r15Sql,
    "r16_json" -> Relational2.r16Sql,
    "r17_star_join" -> Relational2.r17Sql,
    "r18_analytic" -> Relational2.r18Sql,
    "r19_sql_surface" -> Relational2.r19Sql,
    "r20_session_window" -> Relational2.r20Sql,
    "r21_asof" -> Relational2.r21Sql,
    "r22_range" -> Relational2.r22Sql,
    "r23_outer_join" -> Relational2.r23Sql,
    "r24_pivot" -> Relational2.r24Sql,
    "r25_range_window" -> Relational2.r25Sql,
    "r26_distribution" -> Relational2.r26Sql,
    "r27_subqueries" -> Relational2.r27Sql,
    "x23_incremental_dedup" -> CorpusQueries.x23Sql,
    "x24_cluster_rep" -> CorpusQueries.x24Sql,
    "x25_token_budget" -> CorpusQueries.x25Sql,
    "d10_substring_dedup" -> LlmQueries.d10Sql,
    "s13_binary_rerank" -> LlmQueries.s13Sql,
    "x26_bigram_lm" -> CorpusQueries.x26Sql,
    "r28_grouping_sets" -> Relational2.r28Sql,
    "r29_lateral" -> Relational2.r29Sql,
    "s14_mrl_rerank" -> LlmQueries.s14Sql,
    "x27_temperature_mix" -> LlmQueries.x27Sql,
    "x28_bm25" -> RetrievalQueries.x28Sql,
    "x29_tfidf_keywords" -> RetrievalQueries.x29Sql,
    "s16_filtered_ann" -> RetrievalQueries.s16Sql,
    "r30_gap_fill" -> Relational3.r30Sql,
    "r31_compact_log" -> Relational3.r31Sql,
    "m8_perceptual_hash" -> MediaQueries.m8Sql,
    // s17 = s8's full-corpus search served from the incrementally
    // appended index; identical arithmetic, so the oracle is s8's
    "s17_index_update" -> LlmQueries.s8Sql,
    "g1_pagerank" -> GraphQueries.g1Sql,
    "g2_triangles" -> GraphQueries.g2Sql,
    "r32_local_supplier" -> Relational3.r32Sql,
    "x30_zipf_profile" -> CorpusQueries.x30Sql,
    "x36_heavy_hitters" -> CorpusQueries.x36Sql,
    "x37_perplexity_filter" -> CorpusQueries.x37Sql,
    "r33_funnel" -> Relational3.r33Sql,
    "r34_cohort" -> Relational3.r34Sql,
    "m9_scene_cuts" -> MediaQueries.m9Sql,
    "r35_streaks" -> Relational3.r35Sql,
    "x31_corr_profile" -> CorpusQueries.x31Sql,
    "x32_equidepth_hist" -> CorpusQueries.x32Sql,
    "d11_edit_distance" -> LlmQueries.d11Sql,
    "m10_silence_segments" -> LlmQueries.m10Sql,
    "r36_bucketed_join" -> Relational3.r36Sql,
    "r37_small_quantity" -> Relational3.r37Sql,
    "d12_minhash_accuracy" -> LlmQueries.d12Sql,
    "g3_two_hop" -> GraphQueries.g3Sql,
    "x33_cluster_split" -> LlmQueries.x33Sql,
    "r38_scd2" -> Relational3.r38Sql,
    "x34_cross_source" -> LlmQueries.x34Sql,
    "s18_index_delete" -> LlmQueries.s18Sql,
    "v8_track_continuity" -> VideoQueries.v8Sql,
    "x35_dataset_card" -> CorpusQueries.x35Sql,
    "m11_thumbnail" -> MediaQueries.m11Sql,
    "d13_neardup_index" -> LlmQueries.d13Sql,
  )
}
