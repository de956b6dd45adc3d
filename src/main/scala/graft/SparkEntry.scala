package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 gets a `queries` entry
  * (name -> DataFrame program over a testdata dir) and, when
  * SQL-expressible, a DuckDB oracle in `oracleSql` with identical
  * column names and a fully-tiebroken ORDER BY.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's getAppsByPopularity dataflow (SURVEY §3.2).
    */
  def entry(spark: SparkSession): DataFrame =
    Relational.popularity(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.pricingSummary _),
    "q02_latest_event_per_user" -> (Relational.latestEventPerUser _),
    "q03_popularity" -> (Relational.popularity _),
    "q04_difficulty" -> (Relational.difficulty _),
    "q05_join_inner" -> (Relational.joinInner _),
    "q06_join_left_agg" -> (Relational.joinLeftAgg _),
    "q07_semi_join" -> (Relational.semiJoin _),
    "q08_anti_join" -> (Relational.antiJoin _),
    "q09_count_distinct" -> (Relational.countDistinctPerGroup _),
    "q10_filters" -> ((s: SparkSession, d: String) => Relational.filters(s, d)),
    "q11_scalar_traps" -> (Relational.scalarTraps _),
    "q12_weighted_blend" -> (Relational.weightedBlend _),
    "q13_collect_pairs" -> (Relational.collectPairs _),
    "q14_upsert" -> (WritePath.upsertCustomers _),
    "q15_skip_duplicates" -> (WritePath.skipDuplicatesOrders _),
    "q16_pivot_events" -> (Reshape.pivotEventCounts _),
    "q17_report_format" -> (Reshape.reportFormat _),
    "q18_json_roundtrip" -> (Reshape.jsonRoundtrip _),
    "q19_tumbling_window" -> (Events.tumblingHourly _),
    "q20_sessionize" -> ((s: SparkSession, d: String) => Events.sessionize(s, d)),
    "q21_token_stats" -> (TextAnalysis.tokenStats _),
    "q22_lang_id" -> (TextAnalysis.langIdQuery _),
    "q23_quality_score" -> (TextAnalysis.quality _),
    "q24_fingerprints" -> (TextAnalysis.fingerprints _),
    "q25_dedup_exact" -> (Dedup.exact _),
    "q26_dedup_ngram_jaccard" -> ((s: SparkSession, d: String) => Dedup.ngramJaccardPairs(s, d)),
    "q27_dedup_minhash_lsh" -> ((s: SparkSession, d: String) => Dedup.minhashLshPairs(s, d)),
    "q28_dedup_simhash" -> ((s: SparkSession, d: String) => Dedup.simhashPairs(s, d)),
    "q29_knn_brute" -> ((s: SparkSession, d: String) => Similarity.knnBrute(s, d)),
    "q30_knn_lsh" -> ((s: SparkSession, d: String) => Similarity.knnLsh(s, d)),
    "q31_embedding_near_dups" -> ((s: SparkSession, d: String) => Similarity.embeddingNearDups(s, d)),
    "q32_multimodal_decode" -> (graft.sources.Multimodal.decodeMeta _),
    "q33_latest_event_agg" -> (Relational.latestEventPerUserAgg _),
    "q34_widen_brands" -> ((s: SparkSession, d: String) => Reshape.widenTopBrands(s, d)),
    "q35_label_centroids" -> (Similarity.labelCentroids _),
    "q36_vocabulary" -> (TextAnalysis.vocabulary _),
    "q37_knn_ivf" -> ((s: SparkSession, d: String) => Similarity.knnIvf(s, d)),
    "q38_dedup_clusters" -> ((s: SparkSession, d: String) => Dedup.dedupClusters(s, d)),
    "q39_tfidf_top_terms" -> ((s: SparkSession, d: String) => TextAnalysis.tfidfTopTerms(s, d)),
    "q40_multimodal_frames" -> ((s: SparkSession, d: String) => graft.sources.Multimodal.frameSample(s, d)),
    "q41_set_ops" -> (Relational.setOps _),
    "q42_length_quantiles" -> (Curation.lengthQuantiles _),
    "q43_hash_sample" -> ((s: SparkSession, d: String) => Curation.hashSample(s, d)),
    "q44_stratified_sample" -> ((s: SparkSession, d: String) => Curation.stratifiedSample(s, d)),
    "q45_range_join_binned" -> ((s: SparkSession, d: String) => Temporal.clicksBeforePurchase(s, d)),
    "q46_asof_join" -> (Temporal.lastSignupBeforePurchase _),
    "q47_rollup" -> (Relational.rollupPricing _),
    "q48_category_difficulty" -> (Relational.categoryDifficulty _),
    "q49_apps_by_category" -> ((s: SparkSession, d: String) => Relational.appsByCategory(s, d)),
    "q50_categories_report" -> (Report.categoriesStats _),
    "q51_sql_source" -> ((s: SparkSession, d: String) => Relational.sqlSource(s, d)),
    "q52_topk_per_source" -> ((s: SparkSession, d: String) => Curation.topKPerSource(s, d)),
    "q53_sequence_pack" -> ((s: SparkSession, d: String) => Curation.sequencePack(s, d)),
    "q54_incremental_neardups" -> ((s: SparkSession, d: String) => Dedup.incrementalNearDups(s, d)),
    "q55_repetition_signals" -> (TextAnalysis.repetitionSignals _),
    "q56_bigram_lm" -> (TextAnalysis.bigramLm _),
    "q57_redaction_audit" -> (Pii.redactionAudit _),
    "q58_window_analytics" -> (Events.windowAnalytics _),
    "q59_zorder_cells" -> ((s: SparkSession, d: String) => Layout.zorderCells(s, d)),
    "q60_length_quantiles_hist" -> ((s: SparkSession, d: String) => Curation.lengthQuantilesHist(s, d)),
    "q61_decontamination" -> ((s: SparkSession, d: String) => Dedup.decontamination(s, d)),
    "q62_mix_rebalance" -> ((s: SparkSession, d: String) => Curation.mixRebalance(s, d)),
    "q63_curation_pipeline" -> ((s: SparkSession, d: String) => CurationPipeline.curateCorpus(s, d)),
    "q64_semantic_dedup_clusters" -> ((s: SparkSession, d: String) => Similarity.semanticDedupClusters(s, d)),
    "q65_span_dedup" -> ((s: SparkSession, d: String) => Spans.spanDedup(s, d)),
    "q66_lev_neardups" -> ((s: SparkSession, d: String) => Dedup.levNearDups(s, d)),
    "q67_systematic_sample" -> ((s: SparkSession, d: String) => Curation.systematicSample(s, d)),
    "q68_rag_chunks" -> ((s: SparkSession, d: String) => Spans.chunk(s, d)),
    "q69_decontamination_bloom" -> ((s: SparkSession, d: String) => Dedup.decontaminationBloom(s, d)),
    "q70_profile" -> ((s: SparkSession, d: String) => Profile.profileDocuments(s, d)),
    "q71_knn_pq" -> ((s: SparkSession, d: String) => Similarity.knnPq(s, d)),
    "q72_knn_ivfpq" -> ((s: SparkSession, d: String) => Similarity.knnIvfPq(s, d)),
    "q73_winsorize" -> ((s: SparkSession, d: String) => Curation.winsorize(s, d)),
    "q74_bm25" -> ((s: SparkSession, d: String) => TextAnalysis.bm25(s, d)),
    "q75_hybrid_rrf" -> ((s: SparkSession, d: String) => Similarity.hybridRrf(s, d)),
    "q76_grouping_sets" -> (Relational.groupingSetsPricing _),
    "q77_above_brand_avg" -> (Relational.aboveBrandAvg _),
    "q78_time_range_windows" -> (Events.timeRangeWindows _),
    "q79_quality_deciles" -> (Curation.qualityDeciles _),
    "q80_cluster_split" -> ((s: SparkSession, d: String) => Dedup.clusterSplit(s, d)),
    "q81_ngram_diversity" -> (TextAnalysis.ngramDiversity _),
    "q82_dedup_normalized" -> (Dedup.exactNormalized _),
    "q83_cohort_retention" -> (Events.cohortRetention _),
    "q84_funnel" -> (Events.funnel _),
    "q85_scd2_intervals" -> (Temporal.scd2Intervals _),
    "q86_containment_neardups" -> ((s: SparkSession, d: String) => Dedup.containmentPairs(s, d)),
    "q87_weighted_sample" -> ((s: SparkSession, d: String) => Curation.weightedPrioritySample(s, d)),
    "q88_boilerplate_mask" -> ((s: SparkSession, d: String) => TextAnalysis.boilerplateMask(s, d)),
    "q89_survivorship" -> (Dedup.survivorship _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" -> Relational.pricingSummarySql,
    "q02_latest_event_per_user" -> Relational.latestEventPerUserSql,
    "q03_popularity" -> Relational.popularitySql,
    "q04_difficulty" -> Relational.difficultySql,
    "q05_join_inner" -> Relational.joinInnerSql,
    "q06_join_left_agg" -> Relational.joinLeftAggSql,
    "q07_semi_join" -> Relational.semiJoinSql,
    "q08_anti_join" -> Relational.antiJoinSql,
    "q09_count_distinct" -> Relational.countDistinctPerGroupSql,
    "q10_filters" -> Relational.filtersSql,
    "q11_scalar_traps" -> Relational.scalarTrapsSql,
    "q12_weighted_blend" -> Relational.weightedBlendSql,
    "q13_collect_pairs" -> Relational.collectPairsSql,
    "q14_upsert" -> WritePath.upsertCustomersSql,
    "q15_skip_duplicates" -> WritePath.skipDuplicatesOrdersSql,
    "q16_pivot_events" -> Reshape.pivotEventCountsSql,
    "q17_report_format" -> Reshape.reportFormatSql,
    "q18_json_roundtrip" -> Reshape.jsonRoundtripSql,
    "q19_tumbling_window" -> Events.tumblingHourlySql,
    "q20_sessionize" -> Events.sessionizeSql,
    "q21_token_stats" -> TextAnalysis.tokenStatsSql,
    "q22_lang_id" -> TextAnalysis.langIdSql,
    "q23_quality_score" -> TextAnalysis.qualitySql,
    "q24_fingerprints" -> TextAnalysis.fingerprintsSql,
    "q25_dedup_exact" -> Dedup.exactSql,
    "q26_dedup_ngram_jaccard" -> Dedup.ngramJaccardPairsSql,
    // q27/q28/q30/q37 (round 2): the sketch/LSH variants hash with
    // md5-derived integers (PortableHash), so DuckDB states the exact
    // same signatures/buckets/candidates — fully oracle-checked.
    "q27_dedup_minhash_lsh" -> Dedup.minhashLshPairsSql,
    "q28_dedup_simhash" -> Dedup.simhashPairsSql,
    "q29_knn_brute" -> Similarity.knnBruteSql,
    "q30_knn_lsh" -> Similarity.knnLshSql,
    "q31_embedding_near_dups" -> Similarity.embeddingNearDupsSql,
    "q32_multimodal_decode" -> graft.sources.Multimodal.decodeMetaSql,
    // same oracle as q02: the aggregation form must reproduce the
    // window form's result exactly
    "q33_latest_event_agg" -> Relational.latestEventPerUserSql,
    "q34_widen_brands" -> Reshape.widenTopBrandsSql,
    "q35_label_centroids" -> Similarity.labelCentroidsSql,
    "q36_vocabulary" -> TextAnalysis.vocabularySql,
    "q37_knn_ivf" -> Similarity.knnIvfSql,
    "q38_dedup_clusters" -> Dedup.dedupClustersSql,
    "q39_tfidf_top_terms" -> TextAnalysis.tfidfTopTermsSql,
    "q40_multimodal_frames" -> graft.sources.Multimodal.frameSampleSql,
    "q41_set_ops" -> Relational.setOpsSql,
    "q42_length_quantiles" -> Curation.lengthQuantilesSql,
    "q43_hash_sample" -> Curation.hashSampleSql,
    "q44_stratified_sample" -> Curation.stratifiedSampleSql,
    "q45_range_join_binned" -> Temporal.clicksBeforePurchaseSql,
    "q46_asof_join" -> Temporal.lastSignupBeforePurchaseSql,
    "q47_rollup" -> Relational.rollupPricingSql,
    "q48_category_difficulty" -> Relational.categoryDifficultySql,
    "q49_apps_by_category" -> Relational.appsByCategorySql,
    "q50_categories_report" ->
      Report.categoriesStatsSql(Relational.categoryDifficultySql),
    "q51_sql_source" -> Relational.sqlSourceSql,
    "q52_topk_per_source" -> Curation.topKPerSourceSql,
    "q53_sequence_pack" -> Curation.sequencePackSql,
    "q54_incremental_neardups" -> Dedup.incrementalNearDupsSql,
    "q55_repetition_signals" -> TextAnalysis.repetitionSignalsSql,
    "q56_bigram_lm" -> TextAnalysis.bigramLmSql,
    "q57_redaction_audit" -> Pii.redactionAuditSql,
    "q58_window_analytics" -> Events.windowAnalyticsSql,
    "q59_zorder_cells" -> Layout.zorderCellsSql(),
    "q60_length_quantiles_hist" -> Curation.lengthQuantilesHistSql(),
    "q61_decontamination" -> Dedup.decontaminationSql(),
    "q62_mix_rebalance" -> Curation.mixRebalanceSql(),
    "q63_curation_pipeline" -> CurationPipeline.curateCorpusSql,
    "q64_semantic_dedup_clusters" -> Similarity.semanticDedupClustersSql,
    "q65_span_dedup" -> Spans.spanDedupSql(),
    "q66_lev_neardups" -> Dedup.levNearDupsSql(),
    "q67_systematic_sample" -> Curation.systematicSampleSql(),
    "q68_rag_chunks" -> Spans.chunkSql(),
    // q69 computes the SAME relation as q61 through the bloom-
    // prefiltered physical path — the shared oracle is the proof that
    // the prefilter is correctness-preserving
    "q69_decontamination_bloom" -> Dedup.decontaminationSql(),
    "q70_profile" -> Profile.profileDocumentsSql,
    "q71_knn_pq" -> Similarity.knnPqSql(),
    "q72_knn_ivfpq" -> Similarity.knnIvfPqSql(),
    "q73_winsorize" -> Curation.winsorizeSql,
    "q74_bm25" -> TextAnalysis.bm25Sql(),
    "q75_hybrid_rrf" -> Similarity.hybridRrfSql(),
    "q76_grouping_sets" -> Relational.groupingSetsPricingSql,
    "q77_above_brand_avg" -> Relational.aboveBrandAvgSql,
    "q78_time_range_windows" -> Events.timeRangeWindowsSql,
    "q79_quality_deciles" -> Curation.qualityDecilesSql,
    // q80 wraps q38's recursive-CTE components oracle — the split
    // column is derived from the same md5 bucket on both sides
    "q80_cluster_split" -> Dedup.clusterSplitSql(),
    "q81_ngram_diversity" -> TextAnalysis.ngramDiversitySql,
    "q82_dedup_normalized" -> Dedup.exactNormalizedSql,
    "q83_cohort_retention" -> Events.cohortRetentionSql,
    "q84_funnel" -> Events.funnelSql,
    "q85_scd2_intervals" -> Temporal.scd2IntervalsSql,
    "q86_containment_neardups" -> Dedup.containmentPairsSql,
    "q87_weighted_sample" -> Curation.weightedPrioritySampleSql(),
    "q88_boilerplate_mask" -> TextAnalysis.boilerplateMaskSql(),
    // q89 wraps q38's recursive-CTE components oracle, like q80 — the
    // survivor argmax and merge stats are stated over the same labels
    "q89_survivorship" -> Dedup.survivorshipSql(),
  )
}
