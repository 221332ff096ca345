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
    "q30_dedup_exact" -> (Dedup.q30 _),
    "q31_ngram_jaccard" -> ((s: SparkSession, d: String) => Dedup.q31(s, d)),
    "q32_minhash_lsh" -> ((s: SparkSession, d: String) => Dedup.q32(s, d)),
    "q33_simhash" -> ((s: SparkSession, d: String) => Dedup.q33(s, d)),
    "q34_embed_neardup" -> ((s: SparkSession, d: String) => Dedup.q34(s, d)),
    "q35_dup_clusters" -> (Dedup.q35 _),
    "q36_cluster_rep" -> (Dedup.q36 _),
    "q40_knn_brute" -> (Similarity.q40 _),
    "q41_knn_lsh" -> (Similarity.q41 _),
    "q42_knn_ivf" -> (Similarity.q42 _),
    "q50_event_window" -> (Events.q50 _),
    "q51_funnel" -> (Analytics.q51 _),
    "q52_retention" -> (Analytics.q52 _),
    "q53_grouping_sets" -> (Analytics.q53 _),
    "q54_window_funcs" -> (Analytics.q54 _),
    "q55_approx_sketch" -> (Analytics.q55 _),
    "q57_corr_exact" -> (Analytics.q57 _),
    "q58_hash_split" -> (Sampling.q58 _),
    "q59_stratified_sample" -> ((s: SparkSession, d: String) => Sampling.q59(s, d)),
    "q61_profile" -> (Analytics.q61 _),
    "q62_moving_avg" -> (RelationalMore.q62 _),
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
    "q30_dedup_exact" -> Dedup.q30Sql,
    "q31_ngram_jaccard" -> Dedup.q31Sql,
    // q32/q33 are probabilistic sketches — rows-only by design
    "q34_embed_neardup" -> Dedup.q34Sql,
    "q35_dup_clusters" -> Dedup.q35Sql,
    "q36_cluster_rep" -> Dedup.q36Sql,
    "q40_knn_brute" -> Similarity.q40Sql,
    // q41 is approximate by construction — rows-only
    "q50_event_window" -> Events.q50Sql,
    "q51_funnel" -> Analytics.q51Sql,
    "q52_retention" -> Analytics.q52Sql,
    "q53_grouping_sets" -> Analytics.q53Sql,
    "q54_window_funcs" -> Analytics.q54Sql,
    // q55 compares approx sketches to exact — sketch internals are
    // engine-specific ⇒ rows-only; AnalyticsSpec bounds the error
    "q57_corr_exact" -> Analytics.q57Sql,
    "q58_hash_split" -> Sampling.q58Sql,
    // q59 is seeded-RNG sampling — engine-specific ⇒ rows-only + spec
    "q61_profile" -> Analytics.q61Sql,
    "q62_moving_avg" -> RelationalMore.q62Sql,
    "q63_basket" -> RelationalMore.q63Sql,
    "q65_null_semantics" -> RelationalMore.q65Sql,
    "q66_datetime" -> RelationalMore.q66Sql,
    // q42 is approximate by construction — rows-only
    "q80_cube" -> RelationalExt.q80Sql,
    "q81_pivot" -> RelationalExt.q81Sql,
    "q82_percentiles" -> RelationalExt.q82Sql,
    "q83_setops" -> RelationalExt.q83Sql,
    "q84_full_outer" -> RelationalExt.q84Sql,
    "q85_explode_words" -> RelationalExt.q85Sql,
    "q86_json_extract" -> RelationalExt.q86Sql,
    "q87_range_join" -> RelationalExt.q87Sql,
  )
}
