package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.pipeline.{CovidFixture, CovidPipeline}
import graft.queries.{CoreQueries, DateTimeQueries, MediaQueries, Oracles, SimilarityQueries, SqlQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: the end-to-end covid pipeline (SURVEY.md §3 unified) on a
    * deterministic covid-shaped stage fixture — from_json + explode +
    * nested projection + cleanup filter + quality gate + dims + broadcast
    * surrogate-key join + fact projection. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CovidPipeline.run(spark, CovidFixture.stage(spark), "2023-03-02").fact

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg" -> (CoreQueries.q01Agg _),
    "q02_filter_project" -> (CoreQueries.q02FilterProject _),
    "q03_join_broadcast" -> (CoreQueries.q03JoinBroadcast _),
    "q04_join_large" -> (CoreQueries.q04JoinLarge _),
    "q05_window_topk" -> (CoreQueries.q05WindowTopK _),
    "q06_union" -> (CoreQueries.q06Union _),
    "q07_count_gate" -> (CoreQueries.q07CountGate _),
    "q08_anti_join" -> (CoreQueries.q08AntiJoin _),
    "q09_semi_join" -> (CoreQueries.q09SemiJoin _),
    "q10_date_dim" -> (DateTimeQueries.q10DateDim _),
    "q11_json_extract" -> (DateTimeQueries.q11JsonExtract _),
    "q12_sort_limit" -> (DateTimeQueries.q12SortLimit _),
    "q13_hourly_agg" -> (DateTimeQueries.q13HourlyAgg _),
    "q14_sessionize" -> (DateTimeQueries.q14Sessionize _),
    "q15_token_stats" -> (TextQueries.q15TokenStats _),
    "q16_lang_id" -> (TextQueries.q16LangId _),
    "q17_fingerprint" -> (TextQueries.q17Fingerprint _),
    "q18_dedup_exact" -> (TextQueries.q18DedupExact _),
    "q19_minhash_lsh" -> (TextQueries.q19MinhashLsh _),
    "q20_jaccard_pairs" -> (TextQueries.q20JaccardPairs _),
    "q21_simhash" -> (TextQueries.q21Simhash _),
    "q22_cosine_topk" -> (SimilarityQueries.q22CosineTopK _),
    "q23_ann_srp" -> (SimilarityQueries.q23AnnSrp _),
    "q24_binary_meta" -> (MediaQueries.q24BinaryMeta _),
    "q25_frame_sample" -> (MediaQueries.q25FrameSample _),
    "q26_media_features" -> (MediaQueries.q26MediaFeatures _),
    "q27_bpe_tokens" -> (TextQueries.q27BpeTokens _),
    "q28_cosine_neardup" -> (SimilarityQueries.q28CosineNearDup _),
    "q29_ann_ivf" -> (SimilarityQueries.q29AnnIvf _),
    "q30_salted_agg" -> (CoreQueries.q30SaltedAgg _),
    "q31_rollup" -> (CoreQueries.q31Rollup _),
    "q32_asof_join" -> (DateTimeQueries.q32AsofJoin _),
    "q33_profile" -> (TextQueries.q33Profile _),
    "q34_top_tokens" -> (TextQueries.q34TopTokens _),
    "q35_topk_custom" -> (CoreQueries.q35TopkCustom _),
    "q36_window_funcs" -> (CoreQueries.q36WindowFuncs _),
    "q37_set_ops" -> (CoreQueries.q37SetOps _),
    "q38_interval_join" -> (DateTimeQueries.q38IntervalJoin _),
    "q39_centroids" -> (SimilarityQueries.q39Centroids _),
    "q40_split" -> (TextQueries.q40Split _),
    "q41_stratified" -> (TextQueries.q41Stratified _),
    "q42_mix" -> (TextQueries.q42Mix _),
    "q43_token_budget" -> (TextQueries.q43TokenBudget _),
    "q44_simhash_neardup" -> (TextQueries.q44SimhashNearDup _),
    "q45_variant_json" -> (DateTimeQueries.q45VariantJson _),
    "q46_cube" -> (CoreQueries.q46Cube _),
    "q47_pivot" -> (CoreQueries.q47Pivot _),
    "q48_unpivot" -> (CoreQueries.q48Unpivot _),
    "q49_percentiles" -> (CoreQueries.q49Percentiles _),
    "q50_corpus_curation" -> (TextQueries.q50CorpusCuration _),
    "q51_dup_clusters" -> (TextQueries.q51DupClusters _),
    "q52_gap_fill" -> (DateTimeQueries.q52GapFill _),
    "q53_trailing_features" -> (DateTimeQueries.q53TrailingFeatures _),
    "q54_decontam" -> (TextQueries.q54Decontam _),
    "q55_repetition" -> (TextQueries.q55Repetition _),
    "q56_tfidf" -> (TextQueries.q56Tfidf _),
    "q57_gram_postings" -> (TextQueries.q57GramPostings _),
    "q58_weighted_sample" -> (TextQueries.q58WeightedSample _),
    "q59_minhash_accuracy" -> (TextQueries.q59MinhashAccuracy _),
    "q60_quantize_audit" -> (SimilarityQueries.q60QuantizeAudit _),
    "q61_pmi_pairs" -> (TextQueries.q61PmiPairs _),
    "q62_funnel" -> (DateTimeQueries.q62Funnel _),
    "q63_cohort_retention" -> (DateTimeQueries.q63CohortRetention _),
    "q64_regression" -> (DateTimeQueries.q64Regression _),
    "q65_streaks" -> (DateTimeQueries.q65Streaks _),
    "q66_normalize" -> (TextQueries.q66Normalize _),
    "q67_edit_distance" -> (TextQueries.q67EditDistance _),
    "q68_robust_outliers" -> (DateTimeQueries.q68RobustOutliers _),
    "q69_ship_priority" -> (CoreQueries.q69ShipPriority _),
    "q70_local_supplier_volume" -> (CoreQueries.q70LocalSupplierVolume _),
    "q71_bpe_merges" -> (TextQueries.q71BpeMerges _),
    "q72_equidepth_hist" -> (CoreQueries.q72EquidepthHist _),
    "q73_exists_lateship" -> (CoreQueries.q73LateShipExists _),
    "q74_char_entropy" -> (TextQueries.q74CharEntropy _),
    "q75_expectations" -> (CoreQueries.q75Expectations _),
    "q76_full_outer" -> (CoreQueries.q76FullOuter _),
    "q77_token_ids" -> (TextQueries.q77TokenIds _),
    "q78_chunking" -> (TextQueries.q78Chunking _),
    "q79_embed_dim_stats" -> (SimilarityQueries.q79EmbedDimStats _),
    "q80_window_distribution" -> (CoreQueries.q80WindowDistribution _),
    "q81_big_orders" -> (CoreQueries.q81BigOrders _),
    "q82_chunk_dedup" -> (TextQueries.q82ChunkDedup _),
    "q83_embed_decontam" -> (SimilarityQueries.q83EmbedDecontam _),
    "q84_sql_tpch10" -> (SqlQueries.q84SqlTpch10 _),
    "q85_scalar_subquery" -> (SqlQueries.q85ScalarSubquery _),
    "q86_grouping_sets" -> (SqlQueries.q86GroupingSets _),
    "q87_token_maps" -> (TextQueries.q87TokenMaps _),
    "q88_snapshot_diff" -> (DateTimeQueries.q88SnapshotDiff _),
    "q89_unigram_logprob" -> (TextQueries.q89UnigramLogprob _),
    "q90_hard_negatives" -> (SimilarityQueries.q90HardNegatives _),
    "q91_shard_pack" -> (TextQueries.q91ShardPack _),
    "q92_skyline" -> (CoreQueries.q92Skyline _),
    "q93_golden_record" -> (TextQueries.q93GoldenRecord _),
    "q94_split_leakage" -> (TextQueries.q94SplitLeakage _),
    "q95_scd2_history" -> (DateTimeQueries.q95Scd2History _),
    "q96_class_balance" -> (TextQueries.q96ClassBalance _),
    "q97_rank_normalize" -> (SimilarityQueries.q97RankNormalize _),
    "q98_sig_union" -> (TextQueries.q98SigUnion _),
    "q99_triangles" -> (TextQueries.q99Triangles _),
    "q100_report_card" -> (TextQueries.q100ReportCard _),
    "q101_markov_transitions" -> (DateTimeQueries.q101MarkovTransitions _),
    "q102_session_paths" -> (DateTimeQueries.q102SessionPaths _),
    "q103_equiwidth_hist" -> (DateTimeQueries.q103EquiwidthHist _),
    "q104_shard_blobs" -> (TextQueries.q104ShardBlobs _),
    "q105_stopword_induction" -> (TextQueries.q105StopwordInduction _),
    "q106_contrastive_triplets" -> (SimilarityQueries.q106ContrastiveTriplets _),
    "q107_trailing_1h" -> (DateTimeQueries.q107Trailing1h _),
    "q108_dup_degree_dist" -> (TextQueries.q108DupDegreeDist _),
    "q109_source_mix" -> (TextQueries.q109SourceMix _),
    "q110_value_quantiles" -> (DateTimeQueries.q110ValueQuantiles _),
    "q111_lang_topic_chisq" -> (TextQueries.q111LangTopicChisq _),
    "q112_class_separation" -> (SimilarityQueries.q112ClassSeparation _),
    "q113_containment" -> (TextQueries.q113Containment _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Oracles.core ++ DateTimeQueries.oracles ++ TextQueries.oracles ++
      SimilarityQueries.oracles ++ MediaQueries.oracles ++ SqlQueries.oracles
}
