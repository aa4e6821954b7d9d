package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Analytics, Events, Extended, Oracle, Relational, TextSim}

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * Forty declared operators (SURVEY.md §2, the contract), each a pure
  * `(SparkSession, sfDir) => DataFrame` with a matching DuckDB oracle in
  * [[graft.ops.Oracle]]. Builders live in graft.ops by family.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q38: the full 7-table star denormalization (6000 rows at sf0.001). */
  def entry(spark: SparkSession): DataFrame =
    Relational.q38StarDenorm(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_scan_filter_project" -> Relational.q01ScanFilterProject _,
    "q02_pred_complex"        -> Relational.q02PredComplex _,
    "q03_agg_pricing"         -> Relational.q03AggPricing _,
    "q04_agg_distinct"        -> Relational.q04AggDistinct _,
    "q05_agg_rollup"          -> Relational.q05AggRollup _,
    "q06_agg_cube"            -> Relational.q06AggCube _,
    "q07_agg_grouping_sets"   -> Relational.q07AggGroupingSets _,
    "q08_join_inner"          -> Relational.q08JoinInner _,
    "q09_join_multiway_topn"  -> Relational.q09JoinMultiwayTopn _,
    "q10_join_left_outer"     -> Relational.q10JoinLeftOuter _,
    "q11_join_full_outer"     -> Relational.q11JoinFullOuter _,
    "q12_join_semi"           -> Relational.q12JoinSemi _,
    "q13_join_anti"           -> Relational.q13JoinAnti _,
    "q14_join_cross"          -> Relational.q14JoinCross _,
    "q15_join_range_theta"    -> Events.q15JoinRangeTheta _,
    "q16_join_asof"           -> Events.q16JoinAsof _,
    "q17_win_rank"            -> Relational.q17WinRank _,
    "q18_win_running"         -> Events.q18WinRunning _,
    "q19_win_lead_lag"        -> Events.q19WinLeadLag _,
    "q20_win_range_frame"     -> Events.q20WinRangeFrame _,
    "q21_sort_topk"           -> Relational.q21SortTopk _,
    "q22_union"               -> Relational.q22Union _,
    "q23_intersect_except"    -> Relational.q23IntersectExcept _,
    "q24_string_funcs"        -> Relational.q24StringFuncs _,
    "q25_date_funcs"          -> Relational.q25DateFuncs _,
    "q26_math_funcs"          -> Relational.q26MathFuncs _,
    "q27_case_null"           -> Relational.q27CaseNull _,
    "q28_json_extract"        -> TextSim.q28JsonExtract _,
    "q29_array_ops"           -> TextSim.q29ArrayOps _,
    "q30_tumbling_window"     -> Events.q30TumblingWindow _,
    "q31_sliding_window"      -> Events.q31SlidingWindow _,
    "q32_session_window"      -> Events.q32SessionWindow _,
    "q33_dedup_keep_first"    -> Events.q33DedupKeepFirst _,
    "q34_dedup_exact_text"    -> TextSim.q34DedupExactText _,
    "q35_jaccard_neardup"     -> TextSim.q35JaccardNeardup _,
    "q36_cosine_topk"         -> TextSim.q36CosineTopk _,
    "q37_tfidf_top_term"      -> TextSim.q37TfidfTopTerm _,
    "q38_star_denorm"         -> Relational.q38StarDenorm _,
    "q39_wordcount_topn"      -> TextSim.q39WordcountTopn _,
    "q40_histogram"           -> Events.q40Histogram _,
    // Extended LLM-pipeline surface (graft.ops.Extended).
    // q41/q42/q45/q47/q50 carry DuckDB oracles; the rest are rows-only
    // (no SQL twin — LSH models, xxhash64, media stubs). Excluded from
    // the 40-query bench.
    "q41_text_stats"          -> Extended.q41TextStats _,
    "q42_quality_langid"      -> Extended.q42QualityLangid _,
    "q43_minhash_neardup"     -> Extended.q43MinhashNeardup _,
    "q44_simhash_neardup"     -> Extended.q44SimhashNeardup _,
    "q45_cosine_neardup"      -> Extended.q45CosineNeardup _,
    "q46_ann_lsh"             -> Extended.q46AnnLsh _,
    "q47_fingerprint_dedup"   -> Extended.q47FingerprintDedup _,
    "q48_media_features"      -> Extended.q48MediaFeatures _,
    "q49_curation_pipeline"   -> Extended.q49CurationPipeline _,
    "q50_split_assign"        -> Extended.q50SplitAssign _,
    // Analytics surface (graft.ops.Analytics) — all oracle-matched.
    "q51_stats_moments"       -> Analytics.q51StatsMoments _,
    "q52_pivot_status"        -> Analytics.q52PivotStatus _,
    "q53_percentile_price"    -> Analytics.q53PercentilePrice _,
    "q54_cohort_retention"    -> Analytics.q54CohortRetention _,
    "q55_funnel_stages"       -> Analytics.q55FunnelStages _,
    "q56_bigram_topn"         -> Analytics.q56BigramTopn _,
    "q57_decontam_overlap"    -> Analytics.q57DecontamOverlap _,
    "q58_simhash_md5"         -> Extended.q58SimhashMd5 _,
    "q59_minhash_md5"         -> Extended.q59MinhashMd5 _,
    "q60_dedup_clusters"      -> Extended.q60DedupClusters _,
    "q61_fuzzy_join"          -> Analytics.q61FuzzyJoin _,
    "q62_lm_bigram_score"     -> Extended.q62LmBigramScore _,
    "q63_outlier_zscore"      -> Analytics.q63OutlierZscore _,
    "q64_ngram_jaccard"       -> TextSim.q64NgramJaccard _,
    "q65_conversion_latency"  -> Analytics.q65ConversionLatency _,
    "q66_semantic_dedup"      -> Extended.q66SemanticDedup _,
    "q67_pack_sequences"      -> Extended.q67PackSequences _,
    "q68_mixture_sample"      -> Extended.q68MixtureSample _,
    "q69_mixture_budgets"     -> Extended.q69MixtureBudgets _,
    "q70_vocab_tokens"        -> Extended.q70VocabTokens _,
    "q71_ann_planes"          -> Extended.q71AnnPlanes _,
    "q72_vocab_token_ids"     -> Extended.q72VocabTokenIds _,
    "q73_repetition_stats"    -> Extended.q73RepetitionStats _,
    "q74_boilerplate_scrub"   -> Extended.q74BoilerplateScrub _,
    "q75_packed_token_ids"    -> Extended.q75PackedTokenIds _,
    "q76_window_stats"        -> Extended.q76WindowStats _,
    "q77_window_scrub"        -> Extended.q77WindowScrub _,
    "q78_pii_scrub"           -> Extended.q78PiiScrub _,
    "q79_temperature_mixture" -> Extended.q79TemperatureMixture _,
    "q80_shard_shuffle"       -> Extended.q80ShardShuffle _,
    "q81_source_cap"          -> Extended.q81SourceCap _,
    "q82_epoch_mixture"       -> Extended.q82EpochMixture _,
    "q83_split_leakage"       -> Extended.q83SplitLeakage _,
    "q84_semantic_dedup_cells" -> Extended.q84SemanticDedupCells _,
    "q85_transitive_leakage"  -> Extended.q85TransitiveLeakage _,
    "q86_incremental_dedup"   -> Extended.q86IncrementalDedup _,
    "q87_semantic_decontam"   -> Extended.q87SemanticDecontam _,
    "q88_incremental_semantic" -> Extended.q88IncrementalSemantic _,
    "q89_cell_balance"        -> Extended.q89CellBalance _,
    "q90_index_advance"       -> Extended.q90IndexAdvance _,
    "q91_semantic_advance"    -> Extended.q91SemanticAdvance _,
    "q92_incremental_window"  -> Extended.q92IncrementalWindow _,
    "q93_pipeline_day"        -> Extended.q93PipelineDay _,
    "q94_band_occupancy"      -> Extended.q94BandOccupancy _,
    "q95_pipeline_day_full"   -> Extended.q95PipelineDayFull _,
    "q96_pipeline_day_max"    -> Extended.q96PipelineDayMax _
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Oracle.sql
}
