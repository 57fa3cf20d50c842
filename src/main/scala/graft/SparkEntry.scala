package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 marked [batch] has a `queries` entry;
  * every [sql-oracle] one also has a DuckDB `oracleSql` entry built with
  * the same exact-decimal / identical-expression discipline (SURVEY §6)
  * so the driver's hash compare is bit-stable.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q3JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.A core relational
    "q1_agg" -> (Analytics.q1Agg _),
    "q2_filter_project" -> (Analytics.q2FilterProject _),
    "q3_join_agg" -> (Analytics.q3JoinAgg _),
    "q4_topn_window" -> (Analytics.q4TopnWindow _),
    "q5_distinct_agg" -> (Analytics.q5DistinctAgg _),
    "q6_conditional_agg" -> (Analytics.q6ConditionalAgg _),
    "q7_semi_anti" -> (Analytics.q7SemiAnti _),
    "q8_rollup" -> (Analytics.q8Rollup _),
    "q9_percentile" -> (Analytics.q9Percentile _),
    "q10_having_sub" -> (Analytics.q10HavingSub _),
    // §2.B event/time-series
    "e1_json_parse" -> (EventOps.e1JsonParse _),
    "e2_tumbling" -> (EventOps.e2Tumbling _),
    "e3_rolling" -> (EventOps.e3Rolling _),
    "e4_sessionize" -> (EventOps.e4Sessionize _),
    "e5_zscore" -> (EventOps.e5Zscore _),
    "e6_robust" -> (EventOps.e6Robust _),
    "e7_iqr" -> (EventOps.e7Iqr _),
    "e8_seasonal" -> (EventOps.e8Seasonal _),
    "e9_rate" -> (EventOps.e9Rate _),
    "e10_top_outliers" -> (EventOps.e10TopOutliers _),
    "e11_asof" -> (AsOf.e11Asof _),
    "e12_range_join" -> (RangeJoin.e12RangeJoin _),
    // §2.D dedup / §2.E similarity / §2.F text
    "d1_dedup_exact" -> (Dedup.d1DedupExact _),
    "d5_embed_neardup" -> (Dedup.d5EmbedNeardup _),
    "s1_ann_brute" -> (Similarity.s1AnnBrute _),
    "t2_quality" -> (TextOps.t2Quality _),
    "t3_tokens" -> (TextOps.t3Tokens _),
    "t5_doc_stats" -> (TextOps.t5DocStats _),
    "t6_ngram_counts" -> (TextOps.t6NgramCounts _),
    "d2_dedup_ngram" -> (Dedup.d2DedupNgram _),
    "d7_containment" -> (Dedup.d7Containment _),
    "d9_fuzzy_join" -> (Dedup.d9FuzzyJoin _),
    "d10_block_dedup" -> (Dedup.d10BlockDedup(_, _)),
    "d12_keeper_select" -> (Dedup.d12KeeperSelect _),
    "d13_dup_weight" -> (Dedup.d13DupWeight _),
    "d14_incremental_dedup" -> (Dedup.d14IncrementalDedup _),
    "d15_source_overlap" -> (Dedup.d15SourceOverlap _),
    "d16_edit_pairs" -> (Dedup.d16EditPairs _),
    "d17_dedup_report" -> (Dedup.d17DedupReport _),
    "d4_simhash" -> (DedupApprox.d4Simhash _),
    "d6_contamination" -> (Dedup.d6Contamination _),
    "t4_fingerprint" -> (TextOps.t4Fingerprint _),
    "t7_vocab_scrub" -> (TextOps.t7VocabScrub _),
    // §2.I pipeline utilities (portable-hash deterministic sampling)
    "i1_stratified_sample" -> (Sampling.i1StratifiedSample _),
    "i2_split_assign" -> (Sampling.i2SplitAssign _),
    "i3_mixture" -> (Sampling.i3Mixture _),
    "i4_pack_sequences" -> (Sampling.i4PackSequences _),
    "i5_global_shuffle" -> (Sampling.i5GlobalShuffle _),
    "t8_redact" -> (TextOps.t8Redact _),
    "t9_tfidf_topk" -> (TextOps.t9TfidfTopk _),
    "t10_repetition" -> (TextOps.t10Repetition _),
    "t14_dup_ngrams" -> (TextOps.t14DupNgrams _),
    "t15_langid_margin" -> (TextOps.t15LangidMargin _),
    "d8_dedup_clusters" -> (Dedup.d8DedupClusters _),
    "e13_gap_fill" -> (EventOps.e13GapFill _),
    "e15_interpolate" -> (EventOps.e15Interpolate _),
    "a5_mahalanobis" -> (AnomalyML.a5Mahalanobis _),
    "s5_filtered_ann" -> (Similarity.s5FilteredAnn _),
    "s7_hard_negatives" -> (Similarity.s7HardNegatives(_, _)),
    "s8_range_search" -> ((s, d) => Similarity.s8RangeSearch(s, d)),
    "i6_take_per_group" -> (Sampling.i6TakePerGroup _),
    "i7_interleave" -> (Sampling.i7Interleave _),
    "i8_token_budget" -> ((s, d) => Sampling.i8TokenBudget(s, d)),
    "i9_curriculum" -> (Sampling.i9Curriculum _),
    "i10_epoch_shuffle" -> ((s, d) => Sampling.i10EpochShuffle(s, d)),
    "q12_grouping_sets" -> (Analytics.q12GroupingSets _),
    "q13_window_suite" -> (Analytics.q13WindowSuite _),
    "q14_pivot" -> (Analytics.q14Pivot _),
    "q15_bloom_semi" -> (Analytics.q15BloomSemi _),
    "q16_colocated_join" -> (Analytics.q16ColocatedJoin _),
    "q17_incremental_agg" -> (Analytics.q17IncrementalAgg _),
    "e16_correlation" -> (EventOps.e16Correlation _),
    "e17_ensemble" -> (EventOps.e17Ensemble _),
    "e18_window_drift" -> ((s, d) => EventOps.e18WindowDrift(s, d)),
    "e19_autocorr" -> ((s, d) => EventOps.e19Autocorr(s, d)),
    "e20_rate_burst" -> (EventOps.e20RateBurst _),
    "e21_coverage" -> (EventOps.e21Coverage _),
    "e22_seasonal_strength" -> (EventOps.e22SeasonalStrength _),
    "e23_detector_scorecard" -> (EventOps.e23DetectorScorecard _),
    "a6_holt" -> (AnomalyML.a6Holt _),
    // model-fit ops whose DuckDB oracle embeds the fitted model as
    // literals, built at Verify dump time (dynamicOracleSql)
    "a1_isoforest" -> (AnomalyML.a1Isoforest _),
    "a3_kmeans_outlier" -> (AnomalyML.a3KmeansOutlier _),
    // rows-only ops (hash/ML-algorithm-defined; spec-tested, no SQL oracle)
    "q11_approx_distinct" -> (Analytics.q11ApproxDistinct _),
    "q18_sketch_rollup" -> (Analytics.q18SketchRollup _),
    "e14_approx_quantile" -> (Analytics.e14ApproxQuantile _),
    "t11_heavy_hitters" -> (TextOps.t11HeavyHitters _),
    "t12_lm_quality" -> (TextOps.t12LmQuality _),
    "t13_normalize" -> (TextOps.t13Normalize _),
    "d11_semdedup" -> (Dedup.d11SemDedup _),
    "d3_minhash_lsh" -> (DedupApprox.d3MinhashLsh _),
    "s2_ann_lsh" -> (Similarity.s2AnnLsh _),
    "t1_langid" -> (TextOps.t1Langid _),
    "a2_ewma" -> (AnomalyML.a2Ewma _),
    "a4_cusum_drift" -> (AnomalyML.a4CusumDrift _),
    "a7_pca_outlier" -> (AnomalyML.a7PcaOutlier _),
    "a8_hist_drift" -> (AnomalyML.a8HistDrift _),
    "s3_ivf" -> (Similarity.s3Ivf _),
    "s4_ann_pq" -> (Similarity.s4AnnPq _),
    "s6_knn_graph" -> ((s, d) => Similarity.s6KnnGraph(s, d)),
    "m1_binary_meta" -> (Multimodal.m1BinaryMeta _),
    "m2_feature_stub" -> ((s, d) => Multimodal.m2FeatureStub(s, d)),
    "m3_frame_sample" -> ((s, d) => Multimodal.m3FrameSample(s, d)),
    "m4_percep_dedup" -> ((s, d) => Multimodal.m4PercepDedup(s, d)),
    "m5_percep_clusters" -> (Multimodal.m5PercepClusters _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Analytics.oracle ++ EventOps.oracle ++ Dedup.oracle ++
      DedupApprox.oracle ++ Similarity.oracle ++ TextOps.oracle ++
      AsOf.oracle ++ RangeJoin.oracle ++ Sampling.oracle ++
      AnomalyML.oracle ++ Multimodal.oracle

  /** Oracles that embed a deterministically fitted model as SQL
    * literals (a1's step functions, a3's centroids) — data-dependent,
    * so they are built against the Verify run's own sfDir and merged
    * into oracle_sql.json at dump time. The fits are memoized per dir,
    * so the SQL replays exactly the model the dumped query scored with. */
  def dynamicOracleSql(s: SparkSession, dir: String): Map[String, String] =
    AnomalyML.dynOracle(s, dir) ++ Similarity.dynOracle(s, dir) ++
      Dedup.dynOracle(s, dir)
}
