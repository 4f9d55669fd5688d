package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-inventory keys (SURVEY §2 / §7.4) to Spark
  * implementations; `oracleSql` carries the mirrored DuckDB SQL the driver
  * hash-compares against at sf0.01. Keys without oracle SQL get the weaker
  * rows-only check (non-SQL-expressible ops, e.g. hash-dependent sketches).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q17OpportunityScore(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter_project" -> (Queries.q01ScanFilterProject(_, _)),
    "q02_sentinel_cleaning" -> (Queries.q02SentinelCleaning(_, _)),
    "q03_null_in_list_recode" -> (Queries.q03NullInListRecode(_, _)),
    "q04_ilike_any_categorize" -> (Queries.q04IlikeAnyCategorize(_, _)),
    "q05_duration_parse" -> (Queries.q05DurationParse(_, _)),
    "q06_mapping_join_coalesce" -> (Queries.q06MappingJoinCoalesce(_, _)),
    "q07_date_dim" -> (Queries.q07DateDim(_, _)),
    "q08_surrogate_dim" -> (Queries.q08SurrogateDim(_, _)),
    "q09_bridge_join" -> (Queries.q09BridgeJoin(_, _)),
    "q10_fact_star_join" -> (Queries.q10FactStarJoin(_, _)),
    "q11_conditional_agg" -> (Queries.q11ConditionalAgg(_, _)),
    "q12_min_case_priority" -> (Queries.q12MinCasePriority(_, _)),
    "q13_count_distinct" -> (Queries.q13CountDistinct(_, _)),
    "q14_percentile_cap" -> (Queries.q14PercentileCap(_, _)),
    "q15_having_dup_audit" -> (Queries.q15HavingDupAudit(_, _)),
    "q16_topk" -> (Queries.q16TopK(_, _)),
    "q17_opportunity_score" -> (Queries.q17OpportunityScore(_, _)),
    // LLM-data-pipeline extension (q19/q22/q25 rows-only: LSH, no oracle SQL)
    "q18_exact_dedup" -> (Queries.q18ExactDedup(_, _)),
    "q19_minhash_neardup" -> (Queries.q19MinhashNeardup(_, _)),
    "q20_text_stats" -> (Queries.q20TextStats(_, _)),
    "q21_ngram_jaccard" -> (Queries.q21NgramJaccard(_, _)),
    "q22_simhash_neardup" -> (Queries.q22SimhashNeardup(_, _)),
    "q23_lang_id" -> (Queries.q23LangId(_, _)),
    "q24_ann_cosine_topk" -> (Queries.q24AnnCosineTopk(_, _)),
    "q25_ann_lsh_topk" -> (Queries.q25AnnLshTopk(_, _)),
    "q26_doc_fingerprint" -> (Queries.q26DocFingerprint(_, _)),
    "q27_csv_roundtrip" -> (Queries.q27CsvRoundtrip(_, _)),
    "q28_star_pipeline" -> (Queries.q28StarPipeline(_, _)),
    "q29_string_clean" -> (Queries.q29StringClean(_, _)),
    "q30_impute_cap" -> (Queries.q30ImputeCap(_, _)),
    "q31_minmax_avg" -> (Queries.q31MinMaxAvg(_, _)),
    "q32_dup_audit_window" -> (Queries.q32DupAuditWindow(_, _)),
    "q33_dense_key_scale" -> (Queries.q33DenseKeyScale(_, _)),
    // Streaming + multimodal extension
    "q34_event_window_agg" -> (Queries.q34EventWindowAgg(_, _)),
    "q35_sessionize" -> (Queries.q35Sessionize(_, _)),
    "q36_multimodal" -> (Queries.q36Multimodal(_, _)),
    "q37_percentile_continuous" -> (Queries.q37PercentileContinuous(_, _)),
    "q38_categorize_full" -> (Queries.q38CategorizeFull(_, _)),
    "q39_quality_filter" -> (Queries.q39QualityFilter(_, _)),
    "q40_neardup_clusters" -> (Queries.q40NeardupClusters(_, _)),
    "q41_embedding_neardup" -> (Queries.q41EmbeddingNeardup(_, _)),
    "q42_region_rollup" -> (Queries.q42RegionRollup(_, _)),
    "q43_json_extract" -> (Queries.q43JsonExtract(_, _)),
    "q44_full_width_silver" -> (Queries.q44FullWidthSilver(_, _)),
    "q45_dim_dates_append" -> (Queries.q45DimDatesAppend(_, _)),
    "q46_bucketed_join" -> (Queries.q46BucketedJoin(_, _)),
    "q47_salted_join" -> (Queries.q47SaltedJoin(_, _)),
    "q48_vocab_topk" -> (Queries.q48VocabTopk(_, _)),
    "q49_pii_redact" -> (Queries.q49PiiRedact(_, _)),
    "q50_hash_split" -> (Queries.q50HashSplit(_, _)),
    "q51_jsonl_roundtrip" -> (Queries.q51JsonlRoundtrip(_, _)),
    "q52_ann_ivf_topk" -> (Queries.q52AnnIvfTopk(_, _)),
    "q53_rollup_revenue" -> (Queries.q53RollupRevenue(_, _)),
    "q54_moving_window" -> (Queries.q54MovingWindow(_, _)),
    "q55_set_ops" -> (Queries.q55SetOps(_, _)),
    "q56_semi_anti" -> (Queries.q56SemiAnti(_, _)),
    "q57_pivot_revenue" -> (Queries.q57PivotRevenue(_, _)),
    "q58_orc_roundtrip" -> (Queries.q58OrcRoundtrip(_, _)),
    "q59_embedding_neardup_ivf" -> (Queries.q59EmbeddingNeardupIvf(_, _)),
    "q60_asof_join" -> (Queries.q60AsofJoin(_, _)),
    "q61_range_join" -> (Queries.q61RangeJoin(_, _)),
    "q62_contamination_check" -> (Queries.q62ContaminationCheck(_, _)),
    "q63_cube_revenue" -> (Queries.q63CubeRevenue(_, _)),
    "q64_rank_functions" -> (Queries.q64RankFunctions(_, _)),
    "q65_stream_join_batch" -> (Queries.q65StreamJoinBatch(_, _)),
    "q66_unpivot" -> (Queries.q66Unpivot(_, _)),
    "q67_tfidf_topterms" -> (Queries.q67TfidfTopterms(_, _)),
    "q68_stratified_sample" -> (Queries.q68StratifiedSample(_, _)),
    "q69_chunk_dedup" -> (Queries.q69ChunkDedup(_, _)),
    "q70_desc_stats" -> (Queries.q70DescStats(_, _)),
    "q71_grouping_sets" -> (Queries.q71GroupingSets(_, _)),
    "q72_inverted_index" -> (Queries.q72InvertedIndex(_, _)),
    "q73_histogram" -> (Queries.q73Histogram(_, _)),
    "q74_ntile_quartiles" -> (Queries.q74NtileQuartiles(_, _)),
    "q75_scd2_upsert" -> (Queries.q75Scd2Upsert(_, _)),
    "q76_dedup_keep_best" -> (Queries.q76DedupKeepBest(_, _)),
    "q77_funnel_stages" -> (Queries.q77FunnelStages(_, _)),
    "q78_retention_cohorts" -> (Queries.q78RetentionCohorts(_, _)),
    "q79_quality_checks" -> (Queries.q79QualityChecks(_, _)),
    "q80_value_windows" -> (Queries.q80ValueWindows(_, _)),
    "q81_sequence_packing" -> (Queries.q81SequencePacking(_, _)),
    "q82_mixture_resample" -> (Queries.q82MixtureResample(_, _)),
    "q83a_minhash_recall" -> (Queries.q83aMinhashRecall(_, _)),
    "q83b_simhash_exact" -> (Queries.q83bSimhashExact(_, _)),
    "q83c_ann_lsh_recall" -> (Queries.q83cAnnLshRecall(_, _)),
    "q83d_ivf_recall" -> (Queries.q83dIvfRecall(_, _)),
    "q84_approx_checks" -> (Queries.q84ApproxChecks(_, _)),
    "q85_repetition_ratio" -> (Queries.q85RepetitionRatio(_, _)),
    "q86_pagerank" -> (Queries.q86Pagerank(_, _)),
    "q87_dpp_prune" -> (Queries.q87DppPrune(_, _)),
    "q88_bloom_prefilter" -> (Queries.q88BloomPrefilter(_, _)),
    "q89_incremental_agg" -> (Queries.q89IncrementalAgg(_, _)),
    "q90_variant_extract" -> (Queries.q90VariantExtract(_, _)),
    "q91_range_clustered" -> (Queries.q91RangeClustered(_, _)),
    "q92_gap_fill" -> (Queries.q92GapFill(_, _)),
    "q93_schema_evolution" -> (Queries.q93SchemaEvolution(_, _)),
    "q94_null_safe_join" -> (Queries.q94NullSafeJoin(_, _)),
    "q95_boilerplate_scrub" -> (Queries.q95BoilerplateScrub(_, _)),
    "q96_try_parse" -> (Queries.q96TryParse(_, _)),
    "q97_bmp_decode" -> (Queries.q97BmpDecode(_, _)),
    "q98_wav_decode" -> (Queries.q98WavDecode(_, _)),
    "q99_bmp_resize" -> (Queries.q99BmpResize(_, _)),
    "q100_wav_downsample" -> (Queries.q100WavDownsample(_, _)),
    "q101_kmeans_cluster" -> (Queries.q101KmeansCluster(_, _)),
    "q102_semantic_dedup" -> (Queries.q102SemanticDedup(_, _)),
    "q103_trained_ivf_topk" -> (Queries.q103TrainedIvfTopk(_, _)),
    "q104_chunk_windows" -> (Queries.q104ChunkWindows(_, _)),
    "q105_incremental_dedup" -> (Queries.q105IncrementalDedup(_, _)),
    "q106_zorder_layout" -> (Queries.q106ZorderLayout(_, _)),
    "q107_pagerank_full" -> (Queries.q107PagerankFull(_, _)),
    "q108_containment_dedup" -> (Queries.q108ContainmentDedup(_, _)),
    "q109_curation_pipeline" -> (Queries.q109CurationPipeline(_, _)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracles.parity
}
