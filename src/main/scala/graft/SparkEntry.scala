package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._
import graft.oracle.OracleSql

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q_agg_pricing_summary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_lineitem_count" -> (Relational.q_scan_lineitem_count _),
    "q_scan_pruned"         -> (Relational.q_scan_pruned _),
    "q_filter_complex"      -> (Relational.q_filter_complex _),
    "q_project_expr"        -> (Relational.q_project_expr _),
    "q_agg_pricing_summary" -> (Relational.q_agg_pricing_summary _),
    "q_agg_distinct"        -> (Relational.q_agg_distinct _),
    "q_agg_rollup"          -> (Relational.q_agg_rollup _),
    "q_agg_cube"            -> (Relational.q_agg_cube _),
    "q_agg_stats"           -> (Relational.q_agg_stats _),
    "q_agg_median"          -> (Relational.q_agg_median _),
    "q_topk_customers"      -> (Relational.q_topk_customers _),
    "q_sort_multi"          -> (Relational.q_sort_multi _),
    "q_set_intersect"       -> (Relational.q_set_intersect _),
    "q_set_except"          -> (Relational.q_set_except _),
    "q_set_union"           -> (Relational.q_set_union _),
    "q_join_broadcast"      -> (Joins.q_join_broadcast _),
    "q_join_shuffle_multi"  -> (Joins.q_join_shuffle_multi _),
    "q_join_left_outer"     -> (Joins.q_join_left_outer _),
    "q_join_semi"           -> (Joins.q_join_semi _),
    "q_join_anti"           -> (Joins.q_join_anti _),
    "q_join_theta"          -> (Joins.q_join_theta _),
    "q_join_asof"           -> (Joins.q_join_asof _),
    "q_window_rank"         -> (Windows.q_window_rank _),
    "q_window_running"      -> (Windows.q_window_running _),
    "q_window_lag_delta"    -> (Windows.q_window_lag_delta _),
    "q_window_ntile"        -> (Windows.q_window_ntile _),
    "q_window_firstlast"    -> (Windows.q_window_firstlast _),
    "q_pivot_events"        -> (Relational.q_pivot_events _),
    "q_unpivot_part"        -> (Relational.q_unpivot_part _),
    "q_subquery_scalar"     -> (Relational.q_subquery_scalar _),
    "q_scalar_string"       -> (Scalars.q_scalar_string _),
    "q_scalar_date"         -> (Scalars.q_scalar_date _),
    "q_scalar_math"         -> (Scalars.q_scalar_math _),
    "q_scalar_json"         -> (Scalars.q_scalar_json _),
    "q_scalar_array"        -> (Scalars.q_scalar_array _),
    "q_wordcount"           -> (Text.q_wordcount _),
    "q_word_per_lang"       -> (Text.q_word_per_lang _),
    "q_ngram_bigrams"       -> (Text.q_ngram_bigrams _),
    "q_tfidf"               -> (Text.q_tfidf _),
    "q_dedup_exact"         -> (Text.q_dedup_exact _),
    "q_neardup_jaccard"     -> (Text.q_neardup_jaccard _),
    "q_sentiment_lexicon"   -> (Text.q_sentiment_lexicon _),
    "q_text_stats"          -> (Text.q_text_stats _),
    "q_stream_tumbling"     -> (Events.q_stream_tumbling _),
    "q_stream_sliding"      -> (Events.q_stream_sliding _),
    "q_stream_session"      -> (Events.q_stream_session _),
    "q_cosine_topk"         -> (Vectors.q_cosine_topk _),
    "q_similarity_join_topk" -> (Vectors.q_similarity_join_topk _),
    "q_knn_classify"        -> (Vectors.q_knn_classify _),
    "q_linreg_normal"       -> (MLDeterministic.q_linreg_normal _),
    "q_naivebayes_train"    -> (MLDeterministic.q_naivebayes_train _),
    "q_naivebayes_predict"  -> (MLDeterministic.q_naivebayes_predict _),
    "q_kmeans_step"         -> (MLDeterministic.q_kmeans_step _),
    "q_kmeans_iter2"        -> (MLDeterministic.q_kmeans_iter2 _),
    "q_apriori_pairs"       -> (MLDeterministic.q_apriori_pairs _),
    "q_token_count"         -> (TextPipeline.q_token_count _),
    "q_quality_score"       -> (TextPipeline.q_quality_score _),
    "q_doc_fingerprint"     -> (TextPipeline.q_doc_fingerprint _),
    "q_dedup_simhash"       -> (TextPipeline.q_dedup_simhash _),
    "q_dedup_minhash_lsh"   -> (TextPipeline.q_dedup_minhash_lsh _),
    "q_langid_ngram"        -> (TextPipeline.q_langid_ngram _),
    "q_neardup_embedding"   -> (Ann.q_neardup_embedding _),
    "q_ann_ivf"             -> (Ann.q_ann_ivf _),
    "q_ann_rplsh"           -> (Ann.q_ann_rplsh _),
    // round 2: sampling / splits / profiling / LM / frames (SURVEY.md §2.15)
    "q_sample_hash_split"   -> (Sampling.q_sample_hash_split _),
    "q_sample_stratified"   -> (Sampling.q_sample_stratified _),
    "q_sample_weighted"     -> (Sampling.q_sample_weighted _),
    "q_mixture_plan"        -> (Sampling.q_mixture_plan _),
    "q_hist_value"          -> (Sampling.q_hist_value _),
    "q_feature_stats"       -> (Sampling.q_feature_stats _),
    "q_grouping_sets"       -> (Relational.q_grouping_sets _),
    "q_window_range_frame"  -> (Windows.q_window_range_frame _),
    "q_join_range_bin"      -> (Joins.q_join_range_bin _),
    "q_ngram_lm"            -> (TextPipeline.q_ngram_lm _),
    "q_dedup_apply"         -> (TextPipeline.q_dedup_apply _),
    "q_stream_dedup"        -> (Events.q_stream_dedup _),
    "q_corr_matrix"         -> (MLDeterministic.q_corr_matrix _),
    // round 2 batch 2: outer join / agg idioms / profiling / LM (§2.16)
    "q_join_full_outer"     -> (Joins.q_join_full_outer _),
    "q_agg_argmax"          -> (Relational.q_agg_argmax _),
    "q_agg_collect"         -> (Relational.q_agg_collect _),
    "q_window_percentiles"  -> (Windows.q_window_percentiles _),
    "q_seq_pack"            -> (Sampling.q_seq_pack _),
    "q_doc_length_buckets"  -> (Sampling.q_doc_length_buckets _),
    "q_anomaly_zscore"      -> (Sampling.q_anomaly_zscore _),
    "q_minmax_scale"        -> (Sampling.q_minmax_scale _),
    "q_contamination"       -> (TextPipeline.q_contamination _),
    "q_lm_score"            -> (TextPipeline.q_lm_score _),
    "q_pii_redact"          -> (Scalars.q_pii_redact _),
    // round 2 batch 3: components / salting / entropy / PMI / mode (§2.17)
    "q_dedup_components"    -> (Text.q_dedup_components _),
    "q_join_salted"         -> (Joins.q_join_salted _),
    "q_token_entropy"       -> (Text.q_token_entropy _),
    "q_colloc_pmi"          -> (Text.q_colloc_pmi _),
    "q_agg_mode"            -> (Relational.q_agg_mode _),
    // round 2 batch 4: funnel / retention / fuzzy / spearman (§2.18)
    "q_funnel"              -> (Events.q_funnel _),
    "q_retention"           -> (Events.q_retention _),
    "q_fuzzy_match"         -> (Relational.q_fuzzy_match _),
    "q_corr_spearman"       -> (MLDeterministic.q_corr_spearman _),
    "q_binary_meta"         -> (graft.multimodal.Multimodal.q_binary_meta _),
    "q_window_ewma"         -> (Windows.q_window_ewma _),
    "q_chi_square"          -> (MLDeterministic.q_chi_square _),
    "q_recursive_calendar"  -> (Events.q_recursive_calendar _),
    "q_join_interval"       -> (Joins.q_join_interval _),
    "q_agg_weighted"        -> (Relational.q_agg_weighted _),
    // capability-only (no oracle — engine-specific sketch internals;
    // driver records the weaker rows-only check, tests gate the accuracy)
    "q_approx_distinct"     -> (Relational.q_approx_distinct _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = OracleSql.sql
}
