package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 is exposed here as a named query over a
  * scale-factor directory, paired (when SQL-expressible) with an ANSI-SQL
  * oracle that DuckDB runs on the same parquet tables.
  */
object SparkEntry {
  import analytics.{Dedup, EventOps, Multimodal, Relational, Similarity, TextOps}

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3Join(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.1 clueso-equivalent core
    "mvcc_snapshot"      -> (analytics.CluesoOps.mvccSnapshot(_, _)),
    "mvcc_diff"          -> (analytics.CluesoOps.mvccDiff(_, _)),
    "metadata_search"    -> (analytics.CluesoOps.metadataSearch(_, _)),
    "search_pagination"  -> (analytics.CluesoOps.searchPagination(_, _)),
    "ingest_parse"       -> (analytics.CluesoOps.ingestParse(_, _)),
    "compaction_groups"  -> (analytics.CluesoOps.compactionGroups(_, _)),
    "compaction_merge"   -> (analytics.CluesoOps.compactionMerge(_, _)),
    "storage_info"       -> (analytics.CluesoOps.storageInfo(_, _)),
    // §2.2 relational analytics
    "q1_agg"             -> (Relational.q1Agg(_, _)),
    "q3_join"            -> (Relational.q3Join(_, _)),
    "q5_join"            -> (Relational.q5Join(_, _)),
    "q_window_topk"      -> (Relational.windowTopK(_, _)),
    "q_anti_join"        -> (Relational.antiJoin(_, _)),
    "q_semi_join"        -> (Relational.semiJoin(_, _)),
    "q_rollup"           -> (Relational.rollupAgg(_, _)),
    "q_cube"             -> (Relational.cubeAgg(_, _)),
    "q_promo_share"      -> (Relational.promoShare(_, _)),
    "q_pivot"            -> (Relational.pivotAgg(_, _)),
    "q_correlated_max"   -> (Relational.correlatedMax(_, _)),
    "q_distinct_agg"     -> (Relational.distinctAgg(_, _)),
    "q_custdist"         -> (Relational.custDist(_, _)),
    "q_not_in"           -> (Relational.notInAnti(_, _)),
    "q_wealthy_inactive" -> (Relational.wealthyInactive(_, _)),
    "events_windowed_agg" -> (EventOps.windowedAgg(_, _)),
    "events_sessionize"  -> (EventOps.sessionize(_, _)),
    "events_funnel"      -> (EventOps.funnel(_, _)),
    "events_range_join"  -> (EventOps.rangeJoin(_, _)),
    "events_retention"   -> (EventOps.retention(_, _)),
    "asof_join"          -> (EventOps.asofJoin(_, _)),
    "approx_distinct_kmv" -> (EventOps.approxDistinctKmv(_, _)),
    "events_moving_avg"  -> (EventOps.movingAvg(_, _)),
    // §2.3 deduplication
    "dedup_exact"         -> (Dedup.dedupExact(_, _)),
    "dedup_normalized"    -> (Dedup.dedupNormalized(_, _)),
    "dedup_fingerprint"   -> (Dedup.dedupFingerprint(_, _)),
    "dedup_ngram_jaccard" -> (Dedup.dedupNgramJaccard(_, _)),
    "dedup_minhash_lsh"   -> (Dedup.dedupMinhashLsh(_, _)),
    "dedup_simhash"       -> (Dedup.dedupSimhash(_, _)),
    "dedup_embedding"     -> (Dedup.dedupEmbedding(_, _)),
    "dedup_clusters"      -> (Dedup.dedupClusters(_, _)),
    "dedup_containment"   -> (Dedup.dedupContainment(_, _)),
    "dedup_keep_best"     -> (Dedup.dedupKeepBest(_, _)),
    "dedup_cluster_sizes" -> (Dedup.dedupClusterSizes(_, _)),
    "dedup_chunks"        -> (Dedup.dedupChunks(_, _)),
    "corpus_overlap"      -> (Dedup.corpusOverlap(_, _)),
    // §2.4 similarity search
    "knn_brute"           -> (Similarity.knnBrute(_, _)),
    "knn_lsh"             -> (Similarity.knnLsh(_, _)),
    "centroid_ivf"        -> (Similarity.centroidIvf(_, _)),
    "knn_filtered"        -> (Similarity.knnFiltered(_, _)),
    "knn_recall"          -> (Similarity.knnRecall(_, _)),
    "kmeans_iter"         -> (Similarity.kmeansIter(_, _)),
    "knn_hard_negatives"  -> (Similarity.knnHardNegatives(_, _)),
    // §2.5 text analysis
    "text_tokens"         -> (TextOps.textTokens(_, _)),
    "text_quality"        -> (TextOps.textQuality(_, _)),
    "text_langid"         -> (TextOps.textLangid(_, _)),
    "text_ngram_stats"    -> (TextOps.textNgramStats(_, _)),
    "sample_stratified"   -> (TextOps.sampleStratified(_, _)),
    "sample_fixed_k"      -> (TextOps.sampleFixedK(_, _)),
    "text_fingerprint"    -> (TextOps.textFingerprint(_, _)),
    "text_top_term"       -> (TextOps.textTopTerm(_, _)),
    "text_length_median"  -> (TextOps.textLengthMedian(_, _)),
    "text_repetition"     -> (TextOps.textRepetition(_, _)),
    "pii_scrub"           -> (TextOps.piiScrub(_, _)),
    "text_decontaminate"  -> (TextOps.textDecontaminate(_, _)),
    "seq_pack"            -> (TextOps.seqPack(_, _)),
    // §2.6 multimodal plumbing
    "mm_binary_stats"     -> (Multimodal.mmBinaryStats(_, _)),
    "mm_frame_sample"     -> (Multimodal.mmFrameSample(_, _)),
    "mm_resize"           -> (Multimodal.mmResize(_, _)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "mvcc_snapshot"      -> analytics.CluesoOps.mvccSnapshotSql,
    "mvcc_diff"          -> analytics.CluesoOps.mvccDiffSql,
    "metadata_search"    -> analytics.CluesoOps.metadataSearchSql,
    "search_pagination"  -> analytics.CluesoOps.searchPaginationSql,
    "ingest_parse"       -> analytics.CluesoOps.ingestParseSql,
    "compaction_groups"  -> analytics.CluesoOps.compactionGroupsSql,
    "compaction_merge"   -> analytics.CluesoOps.compactionMergeSql,
    "storage_info"       -> analytics.CluesoOps.storageInfoSql,
    "q1_agg"             -> Relational.q1AggSql,
    "q3_join"            -> Relational.q3JoinSql,
    "q5_join"            -> Relational.q5JoinSql,
    "q_window_topk"      -> Relational.windowTopKSql,
    "q_anti_join"        -> Relational.antiJoinSql,
    "q_semi_join"        -> Relational.semiJoinSql,
    "q_rollup"           -> Relational.rollupAggSql,
    "q_cube"             -> Relational.cubeAggSql,
    "q_promo_share"      -> Relational.promoShareSql,
    "q_pivot"            -> Relational.pivotAggSql,
    "q_correlated_max"   -> Relational.correlatedMaxSql,
    "q_distinct_agg"     -> Relational.distinctAggSql,
    "q_custdist"         -> Relational.custDistSql,
    "q_not_in"           -> Relational.notInAntiSql,
    "q_wealthy_inactive" -> Relational.wealthyInactiveSql,
    "events_windowed_agg" -> EventOps.windowedAggSql,
    "events_sessionize"  -> EventOps.sessionizeSql,
    "events_funnel"      -> EventOps.funnelSql,
    "events_range_join"  -> EventOps.rangeJoinSql,
    "events_retention"   -> EventOps.retentionSql,
    "asof_join"          -> EventOps.asofJoinSql,
    "approx_distinct_kmv" -> EventOps.approxDistinctKmvSql,
    "events_moving_avg"  -> EventOps.movingAvgSql,
    "dedup_exact"         -> Dedup.dedupExactSql,
    "dedup_normalized"    -> Dedup.dedupNormalizedSql,
    "dedup_fingerprint"   -> Dedup.dedupFingerprintSql,
    "dedup_ngram_jaccard" -> Dedup.dedupNgramJaccardSql,
    "dedup_minhash_lsh"   -> Dedup.dedupMinhashLshSql,
    "dedup_simhash"       -> Dedup.dedupSimhashSql,
    "dedup_embedding"     -> Dedup.dedupEmbeddingSql,
    "dedup_clusters"      -> Dedup.dedupClustersSql,
    "dedup_containment"   -> Dedup.dedupContainmentSql,
    "dedup_keep_best"     -> Dedup.dedupKeepBestSql,
    "dedup_cluster_sizes" -> Dedup.dedupClusterSizesSql,
    "dedup_chunks"        -> Dedup.dedupChunksSql,
    "corpus_overlap"      -> Dedup.corpusOverlapSql,
    "knn_brute"           -> Similarity.knnBruteSql,
    "knn_lsh"             -> Similarity.knnLshSql,
    "centroid_ivf"        -> Similarity.centroidIvfSql,
    "knn_filtered"        -> Similarity.knnFilteredSql,
    "knn_recall"          -> Similarity.knnRecallSql,
    "kmeans_iter"         -> Similarity.kmeansIterSql,
    "knn_hard_negatives"  -> Similarity.knnHardNegativesSql,
    "text_tokens"         -> TextOps.textTokensSql,
    "text_quality"        -> TextOps.textQualitySql,
    "text_langid"         -> TextOps.textLangidSql,
    "text_ngram_stats"    -> TextOps.textNgramStatsSql,
    "sample_stratified"   -> TextOps.sampleStratifiedSql,
    "sample_fixed_k"      -> TextOps.sampleFixedKSql,
    "text_fingerprint"    -> TextOps.textFingerprintSql,
    "text_top_term"       -> TextOps.textTopTermSql,
    "text_length_median"  -> TextOps.textLengthMedianSql,
    "text_repetition"     -> TextOps.textRepetitionSql,
    "pii_scrub"           -> TextOps.piiScrubSql,
    "text_decontaminate"  -> TextOps.textDecontaminateSql,
    "seq_pack"            -> TextOps.seqPackSql,
    "mm_binary_stats"     -> Multimodal.mmBinaryStatsSql,
    "mm_frame_sample"     -> Multimodal.mmFrameSampleSql,
    "mm_resize"           -> Multimodal.mmResizeSql,
  )
}
