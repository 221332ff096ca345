package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 + §7. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.q01 _),
    "q02_filter_project" -> (Relational.q02 _),
    "q03_join_agg" -> (Relational.q03 _),
    "q04_broadcast_dims" -> (Relational.q04 _),
    "q05_window_rank" -> (Relational.q05 _),
    "q06_topk" -> (Relational.q06 _),
    "q07_distinct" -> (Relational.q07 _),
    "q08_union" -> (Relational.q08 _),
    "q09_semi_join" -> (Relational.q09 _),
    "q10_anti_join" -> (Relational.q10 _),
    "q11_rollup" -> (Relational.q11 _),
    "q12_conditional_agg" -> (Relational.q12 _),
    "q13_monthly" -> (Relational.q13 _),
    "q14_string_ops" -> (Relational.q14 _),
    "q15_having" -> (Relational.q15 _),
    "q16_subquery_avg" -> (Relational.q16 _),
    "q17_running_sum" -> (Relational.q17 _),
    "q18_sessionize" -> (Relational.q18 _),
    "q19_asof_join" -> (Relational.q19 _),
    "q20_token_count" -> (TextAnalysis.q20 _),
    "q21_quality_score" -> (TextAnalysis.q21 _),
    "q22_lang_id" -> (TextAnalysis.q22 _),
    "q23_fingerprint" -> (TextAnalysis.q23 _),
    "q24_tfidf" -> (TextAnalysis.q24 _),
    "q25_redact" -> (TextAnalysis.q25 _),
    "q26_bigrams" -> (TextAnalysis.q26 _),
    "q27_heavy_hitters" -> ((s: SparkSession, d: String) => TextAnalysis.q27(s, d)),
    "q28_text_clean" -> (TextAnalysis.q28 _),
    "q29_stopword_filter" -> (TextAnalysis.q29 _),
    "q78_bigram_novelty" -> ((s: SparkSession, d: String) => TextAnalysis.q78(s, d)),
    "q30_dedup_exact" -> (Dedup.q30 _),
    "q31_ngram_jaccard" -> ((s: SparkSession, d: String) => Dedup.q31(s, d)),
    "q32_minhash_lsh" -> ((s: SparkSession, d: String) => Dedup.q32(s, d)),
    "q33_simhash" -> ((s: SparkSession, d: String) => Dedup.q33(s, d)),
    // oracle gate pins the exact path: Dedup.q34 (the library API)
    // dispatches to approximate LSH above exactPairsLimitFor(dims) —
    // a wall-budget-derived boundary (~77k vectors at dims=64, r8) —
    // which would hash-mismatch the exact DuckDB oracle by design at
    // large corpus sizes; the dispatch is recall-spec'd in DedupSpec
    // and the exact arm's collect is bounded by the same limit
    "q34_embed_neardup" -> ((s: SparkSession, d: String) => Dedup.q34Exact(s, d)),
    "q35_dup_clusters" -> (Dedup.q35 _),
    "q36_cluster_rep" -> (Dedup.q36 _),
    "q37_incremental_dedup" -> ((s: SparkSession, d: String) => Dedup.q37(s, d)),
    "q38_clean_corpus" -> (Dedup.q38 _),
    "q79_cluster_split" -> (Dedup.q79 _),
    "q39_lcs_dedup" -> ((s: SparkSession, d: String) => Dedup.q39(s, d)),
    "q40_knn_brute" -> (Similarity.q40 _),
    "q41_knn_lsh" -> (Similarity.q41 _),
    "q42_knn_ivf" -> ((s: SparkSession, d: String) => Similarity.q42(s, d)),
    "q43_knn_ivfpq" -> ((s: SparkSession, d: String) => Similarity.q43(s, d)),
    "q44_vector_stats" -> (Similarity.q44 _),
    "q45_repetition" -> (Curation.q45 _),
    "q46_contamination" -> (Curation.q46 _),
    "q47_mixture_weights" -> ((s: SparkSession, d: String) => Curation.q47(s, d)),
    "q48_source_cap" -> (Curation.q48 _),
    "q49_zipf_vocab" -> (Curation.q49 _),
    "q50_event_window" -> (Events.q50 _),
    "q51_funnel" -> (Analytics.q51 _),
    "q52_retention" -> (Analytics.q52 _),
    "q53_grouping_sets" -> (Analytics.q53 _),
    "q54_window_funcs" -> (Analytics.q54 _),
    "q55_approx_sketch" -> (Analytics.q55 _),
    "q56_gapfill" -> (Analytics.q56 _),
    "q57_corr_exact" -> (Analytics.q57 _),
    "q58_hash_split" -> (Sampling.q58 _),
    "q59_stratified_sample" -> ((s: SparkSession, d: String) => Sampling.q59(s, d)),
    "q61_profile" -> (Analytics.q61 _),
    "q62_moving_avg" -> (RelationalMore.q62 _),
    "q64_string_kitchen" -> (RelationalMore.q64 _),
    "q67_unpivot" -> (RelationalMore.q67 _),
    "q68_array_ops" -> (RelationalMore.q68 _),
    "q88_setops_all" -> (RelationalMore.q88 _),
    "q89_correlated_subquery" -> (RelationalMore.q89 _),
    "q63_basket" -> (RelationalMore.q63 _),
    "q65_null_semantics" -> (RelationalMore.q65 _),
    "q66_datetime" -> (RelationalMore.q66 _),
    "q60_file_manifest" -> (graft.sources.FileOps.q60 _),
    "q70_multimodal_features" -> (Multimodal.q70 _),
    "q80_cube" -> (RelationalExt.q80 _),
    "q81_pivot" -> (RelationalExt.q81 _),
    "q82_percentiles" -> (RelationalExt.q82 _),
    "q83_setops" -> (RelationalExt.q83 _),
    "q84_full_outer" -> (RelationalExt.q84 _),
    "q85_explode_words" -> (RelationalExt.q85 _),
    "q86_json_extract" -> (RelationalExt.q86 _),
    "q87_range_join" -> (RelationalExt.q87 _),
    "q69_orc_scan" -> (FormatTwins.q69 _),
    "q90_csv_scan" -> (FormatTwins.q90 _),
    "q91_json_scan" -> (FormatTwins.q91 _),
    "q92_cdc_merge" -> (RelationalMore.q92 _),
    "q93_sequence_pack" -> (Curation.q93 _),
    "q71_image_features" -> (Multimodal.q71 _),
    "q94_sketch_rollup" -> (Analytics.q94 _),
    "q95_anomaly" -> (Analytics.q95 _),
    "q96_outage_anomaly" -> (Analytics.q96 _),
    "q97_bpe_merges" -> (Bpe.q97 _),
    "q72_dup_span" -> (Curation.q72 _),
    "q98_bpe_encode" -> (Bpe.q98 _),
    // rows-only: the IVF quantizer is a training artifact, not SQL
    "q99_semdedup" -> ((s: SparkSession, d: String) => Dedup.q99(s, d)),
    "q73_fuzzy_match" -> ((s: SparkSession, d: String) => Dedup.q73(s, d)),
    "q76_fuzzy_match2" -> ((s: SparkSession, d: String) => Dedup.q76(s, d)),
    "q74_outlier_fences" -> (Analytics.q74 _),
    "q77_multicol_profile" -> (Analytics.q77 _),
    "q75_curation_pipeline" -> (Curation.q75 _),
    "q100_cut_spans" -> (Curation.q100 _),
    "q101_line_dedup" -> (Curation.q101 _),
    // rows-only: the stupid-backoff LM is a training artifact
    "q102_perplexity_filter" -> (Perplexity.q102 _),
    "q103_curation_pack" -> (Curation.q103 _),
    "q104_full_pipeline" -> (Curation.q104 _),
    "q105_bm25_search" -> (Search.q105 _),
    "q106_mixture_realize" -> ((sp, d) => Curation.q106(sp, d)),
    "q107_doc_chunks" -> (Curation.q107 _),
    "q108_train_manifest" -> ((sp, d) => Curation.q108(sp, d)),
    // rows-only: the chunk-level IVF quantizer is a training artifact;
    // RagSpec pins the full-probe path bit-equal to brute force
    "q109_rag_pipeline" -> ((sp, d) => Rag.q109(sp, d)),
    "q110_hybrid_rrf" -> (Hybrid.q110 _),
    // rows-only: the classifier weights are a training artifact;
    // QualityFilterSpec pins separation, determinism, keep rule,
    // and batch/stream bit-equality
    "q111_quality_filter" -> (QualityFilter.q111 _),
    // snapshot diff: text never shuffles — both sides reduce to
    // (doc_id, fingerprint64) before the one full-outer join
    "q112_corpus_diff" -> (Versioning.q112 _),
    "q113_token_mixture" -> ((s, d) => Curation.q113(s, d)),
    // declarative constraint suite: K checks compile into ONE scan
    "q114_data_checks" -> (Analytics.q114 _),
    // rows-only: best-fit-decreasing packing is iterative (not
    // SQL-expressible); CurationSpec pins conservation, capacity,
    // determinism, utilization, and the zero-truncation contrast
    // with q93
    "q115_bestfit_pack" -> ((s, d) => Curation.q115(s, d)),
    // rows-only: PNG codec output is engine-specific; MultimodalSpec
    // pins pooled pixels, losslessness, and determinism
    "q116_image_resize" -> (Multimodal.q116 _),
    // rows-only: frame sampling over the typed container; spec pins
    // sampled indices, exact lumas, and the skip-without-decode seek
    "q117_frame_sample" -> (Multimodal.q117 _),
    // rows-only: integer-exact PCM window features; MultimodalSpec
    // pins a driver recompute and the byte-parse round trip
    "q118_audio_features" -> (Multimodal.q118 _),
    // rows-only: dHash is not SQL-expressible; MultimodalSpec asserts
    // bit-equality vs an all-pairs brute force in the full-recall
    // zone and (src, thumb) rendition folding
    "q119_phash_neardup" -> (Multimodal.q119 _),
    "q120_dataset_card" -> (TextAnalysis.q120 _),
    // iterative graph centrality: five int64 fixed-point PageRank
    // rounds over the customer–supplier purchase graph; the oracle is
    // the same rounds unrolled as chained DuckDB CTEs
    "q121_pagerank" -> ((s, d) => Graph.q121(s, d)),
    // per-node triangle counts by degree-oriented wedge join
    "q122_triangles" -> (Graph.q122 _),
    // basket association rules: int64 counts + one division each for
    // confidence and lift, support-floor-pruned before any join
    "q123_assoc_rules" -> (Graph.q123 _),
    // frontier-parallel BFS hop distances; capped recursive-CTE twin
    "q124_bfs_hops" -> ((s, d) => Graph.q124(s, d)),
    // personalized PageRank: q121's int64 loop with teleport mass
    // restarting at a seed supplier decile — contamination tracing
    "q125_ppr" -> ((s, d) => Graph.q125(s, d)),
    "q126_hits" -> ((s, d) => Graph.q126(s, d)),
    "q127_edge_jaccard" -> (Graph.q127 _),
    "q128_pmi_colloc" -> (TextAnalysis.q128 _),
    "q129_kcore" -> ((s, d) => Graph.q129(s, d)),
    "q130_coreness" -> (Graph.q130 _),
    "q131_clustering" -> (Graph.q131 _),
    "q132_host_prior" -> ((s: SparkSession, d: String) => Curation.q132(s, d)),
    "q133_mixture_with_prior" -> ((s: SparkSession, d: String) => Curation.q133(s, d)),
    "q134_langid_trained" -> ((s: SparkSession, d: String) => LangId.q134(s, d)),
    // quantile-parameterized k-truss: the support floor is the lower
    // median of the graph's own initial support distribution
    "q135_ktruss" -> ((s, d) => Graph.q135(s, d)),
    // context-length economics sweep: fit/pad/truncate costs per cap
    "q136_ctx_sweep" -> ((s: SparkSession, d: String) => Curation.q136(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> Relational.q01Sql,
    "q02_filter_project" -> Relational.q02Sql,
    "q03_join_agg" -> Relational.q03Sql,
    "q04_broadcast_dims" -> Relational.q04Sql,
    "q05_window_rank" -> Relational.q05Sql,
    "q06_topk" -> Relational.q06Sql,
    "q07_distinct" -> Relational.q07Sql,
    "q08_union" -> Relational.q08Sql,
    "q09_semi_join" -> Relational.q09Sql,
    "q10_anti_join" -> Relational.q10Sql,
    "q11_rollup" -> Relational.q11Sql,
    "q12_conditional_agg" -> Relational.q12Sql,
    "q13_monthly" -> Relational.q13Sql,
    "q14_string_ops" -> Relational.q14Sql,
    "q15_having" -> Relational.q15Sql,
    "q16_subquery_avg" -> Relational.q16Sql,
    "q17_running_sum" -> Relational.q17Sql,
    "q18_sessionize" -> Relational.q18Sql,
    "q19_asof_join" -> Relational.q19Sql,
    "q20_token_count" -> TextAnalysis.q20Sql,
    "q21_quality_score" -> TextAnalysis.q21Sql,
    "q22_lang_id" -> TextAnalysis.q22Sql,
    "q23_fingerprint" -> TextAnalysis.q23Sql,
    "q24_tfidf" -> TextAnalysis.q24Sql,
    "q25_redact" -> TextAnalysis.q25Sql,
    "q26_bigrams" -> TextAnalysis.q26Sql,
    "q28_text_clean" -> TextAnalysis.q28Sql,
    "q29_stopword_filter" -> TextAnalysis.q29Sql,
    "q78_bigram_novelty" -> TextAnalysis.q78Sql,
    "q120_dataset_card" -> TextAnalysis.q120Sql,
    "q30_dedup_exact" -> Dedup.q30Sql,
    "q31_ngram_jaccard" -> Dedup.q31Sql,
    // q32/q33 are probabilistic sketches — rows-only by design
    "q34_embed_neardup" -> Dedup.q34Sql,
    "q35_dup_clusters" -> Dedup.q35Sql,
    "q36_cluster_rep" -> Dedup.q36Sql,
    "q37_incremental_dedup" -> Dedup.q37Sql,
    "q38_clean_corpus" -> Dedup.q38Sql,
    "q79_cluster_split" -> Dedup.q79Sql,
    // q39 LCS is not DuckDB-expressible — rows-only; DedupSpec proves
    // it bit-equal to an in-driver brute force at sf0.001
    "q40_knn_brute" -> Similarity.q40Sql,
    "q44_vector_stats" -> Similarity.q44Sql,
    "q45_repetition" -> Curation.q45Sql,
    "q46_contamination" -> Curation.q46Sql,
    "q47_mixture_weights" -> Curation.q47Sql,
    "q48_source_cap" -> Curation.q48Sql,
    "q49_zipf_vocab" -> Curation.q49Sql,
    // q41 is approximate by construction — rows-only
    "q50_event_window" -> Events.q50Sql,
    "q51_funnel" -> Analytics.q51Sql,
    "q52_retention" -> Analytics.q52Sql,
    "q53_grouping_sets" -> Analytics.q53Sql,
    "q54_window_funcs" -> Analytics.q54Sql,
    // q55 compares approx sketches to exact — sketch internals are
    // engine-specific ⇒ rows-only; AnalyticsSpec bounds the error
    "q56_gapfill" -> Analytics.q56Sql,
    "q57_corr_exact" -> Analytics.q57Sql,
    "q58_hash_split" -> Sampling.q58Sql,
    // q59 is seeded-RNG sampling — engine-specific ⇒ rows-only + spec
    "q61_profile" -> Analytics.q61Sql,
    "q62_moving_avg" -> RelationalMore.q62Sql,
    "q64_string_kitchen" -> RelationalMore.q64Sql,
    "q67_unpivot" -> RelationalMore.q67Sql,
    "q68_array_ops" -> RelationalMore.q68Sql,
    "q88_setops_all" -> RelationalMore.q88Sql,
    "q89_correlated_subquery" -> RelationalMore.q89Sql,
    "q63_basket" -> RelationalMore.q63Sql,
    "q65_null_semantics" -> RelationalMore.q65Sql,
    "q66_datetime" -> RelationalMore.q66Sql,
    // q42/q43 are approximate by construction — rows-only
    "q80_cube" -> RelationalExt.q80Sql,
    "q81_pivot" -> RelationalExt.q81Sql,
    "q82_percentiles" -> RelationalExt.q82Sql,
    "q83_setops" -> RelationalExt.q83Sql,
    "q84_full_outer" -> RelationalExt.q84Sql,
    "q85_explode_words" -> RelationalExt.q85Sql,
    "q86_json_extract" -> RelationalExt.q86Sql,
    "q87_range_join" -> RelationalExt.q87Sql,
    "q69_orc_scan" -> FormatTwins.q69Sql,
    "q90_csv_scan" -> FormatTwins.q90Sql,
    "q91_json_scan" -> FormatTwins.q91Sql,
    "q92_cdc_merge" -> RelationalMore.q92Sql,
    "q93_sequence_pack" -> Curation.q93Sql,
    "q95_anomaly" -> Analytics.q95Sql,
    "q96_outage_anomaly" -> Analytics.q96Sql,
    "q72_dup_span" -> Curation.q72Sql,
    "q73_fuzzy_match" -> Dedup.q73Sql,
    "q76_fuzzy_match2" -> Dedup.q76Sql,
    "q74_outlier_fences" -> Analytics.q74Sql,
    "q77_multicol_profile" -> Analytics.q77Sql,
    "q75_curation_pipeline" -> Curation.q75Sql,
    "q100_cut_spans" -> Curation.q100Sql,
    "q101_line_dedup" -> Curation.q101Sql,
    "q103_curation_pack" -> Curation.q103Sql,
    "q104_full_pipeline" -> Curation.q104Sql,
    "q105_bm25_search" -> Search.q105Sql,
    "q106_mixture_realize" -> Curation.q106Sql,
    "q107_doc_chunks" -> Curation.q107Sql,
    "q108_train_manifest" -> Curation.q108Sql,
    "q110_hybrid_rrf" -> Hybrid.q110Sql,
    "q112_corpus_diff" -> q112Sql,
    "q113_token_mixture" -> Curation.q113Sql,
    "q114_data_checks" -> Analytics.q114Sql,
    "q121_pagerank" -> Graph.q121Sql,
    "q122_triangles" -> Graph.q122Sql,
    "q123_assoc_rules" -> Graph.q123Sql,
    "q124_bfs_hops" -> Graph.q124Sql,
    "q125_ppr" -> Graph.q125Sql,
    "q126_hits" -> Graph.q126Sql,
    "q127_edge_jaccard" -> Graph.q127Sql,
    "q128_pmi_colloc" -> TextAnalysis.q128Sql,
    "q129_kcore" -> Graph.q129Sql,
    "q130_coreness" -> Graph.q130Sql,
    "q131_clustering" -> Graph.q131Sql,
    "q132_host_prior" -> Curation.q132Sql,
    "q133_mixture_with_prior" -> Curation.q133Sql,
    "q135_ktruss" -> Graph.q135Sql,
    "q136_ctx_sweep" -> Curation.q136Sql,
  )

  /** DuckDB twin of [[Versioning.q112]]: version B derived by the
    * same doc_id-keyed edits, diff classified by direct text
    * comparison (the Spark side compares fingerprint64 digests — the
    * engines agree absent a 64-bit collision between versions of one
    * doc).
    */
  private val q112Sql: String = """
    WITH b AS (
      SELECT doc_id,
             CASE WHEN doc_id % 23 = 5 THEN text || ' rev2' ELSE text END AS text
      FROM documents WHERE doc_id % 17 <> 3
      UNION ALL
      SELECT doc_id + 1000000000 AS doc_id, text || ' new' AS text
      FROM documents WHERE doc_id % 29 = 7
    ), d AS (
      SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
             CASE WHEN b.doc_id IS NULL THEN 'removed'
                  WHEN a.doc_id IS NULL THEN 'added'
                  WHEN a.text <> b.text THEN 'changed' END AS status
      FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id
    )
    SELECT doc_id, status FROM d WHERE status IS NOT NULL ORDER BY doc_id
  """
}
