package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Analytics, CorpusOps, DedupOps, EventOps, Multimodal, Queries, Relational, SimilarityOps, TextOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator gets (a) an entry in [[queries]] and (b) an
  * ANSI-SQL twin in [[oracleSql]] runnable by DuckDB over the same parquet
  * tables, with identical output column names (the driver sorts columns by
  * name before hashing). Ops whose semantics aren't SQL-expressible (sketch
  * algorithms etc.) have queries-only entries → rows-only check + ScalaTest.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1CategoryPerCountry(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_category_per_country"      -> (Queries.q1CategoryPerCountry(_, _)),
    "q2_category_per_year"         -> (Queries.q2CategoryPerYear(_, _)),
    "q3_top_poster_per_country"    -> (Queries.q3TopPosterPerCountry(_, _)),
    "q4_top_country"               -> (Queries.q4TopCountry(_, _)),
    "q5_category_per_age_group"    -> (Queries.q5CategoryPerAgeGroup(_, _)),
    "q6_median_follower_by_group"  -> (Queries.q6MedianFollowerByGroup(_, _)),
    "q6_median_approx"             -> (Queries.q6MedianApprox(_, _)),
    "q6_median_exact_agg"          -> (Queries.q6MedianExactAgg(_, _)),
    "q7_users_per_year"            -> (Queries.q7UsersPerYear(_, _)),
    "q8_median_follower_by_year"   -> (Queries.q8MedianFollowerByYear(_, _)),
    "q9_median_follower_by_group_year" ->
      (Queries.q9MedianFollowerByGroupYear(_, _)),
    // text analysis (SURVEY.md §2 extension: training-data pipeline ops)
    "txt_token_count"     -> (TextOps.tokenCount(_, _)),
    "txt_subword_count"   -> (TextOps.subwordCount(_, _)),
    "txt_quality"         -> (TextOps.qualityScore(_, _)),
    "txt_lang_id"         -> (TextOps.languageId(_, _)),
    "txt_fingerprint_md5" -> (TextOps.md5Fingerprint(_, _)),
    "txt_fingerprint_xx"  -> (TextOps.xxFingerprint(_, _)),
    "txt_pii_redact"      -> (TextOps.piiRedact(_, _)),
    "txt_train_test_split" -> (TextOps.trainTestSplit(_, _)),
    "txt_top_terms"       -> (TextOps.topTerms(_, _)),
    "txt_tfidf"           -> (TextOps.tfidfTop(_, _)),
    "txt_top_terms_cms"   -> (TextOps.topTermsCmsBound(_, _)),
    "txt_cms_rollup"      -> ((s, d) => TextOps.termFreqRollup(s, d)),
    "txt_lm_score"        -> (TextOps.lmScore(_, _)),
    "txt_lm_bigram"       -> (TextOps.lmScoreBigram(_, _)),
    "txt_ccnet_bigram"    -> (TextOps.ccnetBucketsBigram(_, _)),
    // round 8: interpolated Kneser–Ney smoothing — the KenLM formula
    "txt_kn_score"        -> (TextOps.knScore(_, _)),
    // round 8: Zipf rank–frequency fit — the datasheet fingerprint
    "txt_zipf_fit"        -> (TextOps.zipfFit(_, _)),
    // round 8: Heaps vocabulary-growth fit — Zipf's dual
    "txt_heaps_fit"       -> (TextOps.heapsFit(_, _)),
    "txt_length_quantiles" -> (TextOps.lengthQuantiles(_, _)),
    "txt_gopher_rules"    -> (TextOps.gopherRules(_, _)),
    "txt_c4_rules"        -> (TextOps.c4Rules(_, _)),
    "txt_ccnet_buckets"   -> (TextOps.ccnetBuckets(_, _)),
    "txt_dsir_weights"    -> (TextOps.dsirWeights(_, _)),
    "txt_dsir_hashed"     -> ((s, d) => TextOps.dsirWeightsHashed(s, d)),
    "txt_fertility"       -> (TextOps.fertility(_, _)),
    "txt_unimax_budget"   -> (TextOps.unimaxBudget(_, _)),
    "txt_weighted_sample" -> (TextOps.weightedSample(_, _)),
    "txt_curriculum"      -> (TextOps.curriculum(_, _)),
    "txt_classifier_score" -> (TextOps.classifierScore(_, _)),
    "txt_hash_embedding"  -> (TextOps.hashEmbedding(_, _)),
    // dedup
    // round 8: per-language duplication-rate datasheet row
    "dedup_rate_report"   -> ((s, d) =>
      graft.ops.DedupOps.dedupRateReport(s, d)),
    "dedup_exact"         -> (DedupOps.exactDedup(_, _)),
    "dedup_ngram_jaccard" -> (DedupOps.ngramJaccardPairs(_, _)),
    "dedup_minhash_lsh"   -> (DedupOps.minhashLshPairs(_, _)),
    "dedup_clusters"      -> (DedupOps.nearDupClusters(_, _)),
    "dedup_survivors"     -> (DedupOps.dedupSurvivors(_, _)),
    "dedup_simhash"       -> (DedupOps.simhash(_, _)),
    "dedup_simhash_pairs" -> (DedupOps.simhashPairs(_, _)),
    "dedup_incremental"   -> (DedupOps.incrementalJaccardPairs(_, _)),
    "dedup_containment"   -> (DedupOps.containmentPairs(_, _)),
    "dedup_substring_spans" -> (DedupOps.dupSpans(_, _)),
    "dedup_remove_spans"  -> (DedupOps.removeDupSpans(_, _)),
    "dedup_survivors_quality" -> (DedupOps.dedupSurvivorsByQuality(_, _)),
    // similarity search
    "emb_topk_brute"      -> (SimilarityOps.bruteForceTopK(_, _)),
    "emb_topk_lsh"        -> (SimilarityOps.lshTopK(_, _)),
    "emb_topk_lsh_mp"     -> (SimilarityOps.lshTopKMultiprobe(_, _)),
    // float k-means IVF (SimilarityOps.ivfTopK) is spec-only: its cell
    // assignment depends on float-sum order, so no engine-exact oracle
    // exists; the oracled twin below (medoid-seeded, decimal-exact) is
    // the driver-gated form of the same IVF shape.
    "emb_topk_ivf_seeded" -> (SimilarityOps.ivfTopKSeeded(_, _)),
    "emb_topk_pq"         -> (SimilarityOps.pqTopKSeeded(_, _)),
    "emb_topk_ivfpq"      -> (SimilarityOps.ivfPqTopK(_, _)),
    "emb_near_dup"        -> (SimilarityOps.cosineNearDupPairs(_, _, 0.3)),
    "emb_cluster_profile" -> (SimilarityOps.clusterProfile(_, _)),
    "emb_semantic_dedup"  -> (SimilarityOps.semanticDedup(_, _)),
    // events
    "ev_json_extract"     -> (EventOps.jsonExtract(_, _)),
    "ev_hourly_by_type"   -> (EventOps.hourlyByType(_, _)),
    "ev_sessionize"       -> (EventOps.sessionize(_, _)),
    "ev_session_native"   -> (EventOps.sessionizeNative(_, _)),
    "ev_session_overlap"  -> (EventOps.sessionOverlapWindows(_, _)),
    "ev_top_users"        -> (EventOps.topUsers(_, _)),
    "ev_value_stats"      -> (EventOps.valueStatsByType(_, _)),
    "ev_value_quantiles"  -> (EventOps.valueQuantilesByType(_, _)),
    "ev_value_outliers"   -> (EventOps.valueOutliers(_, _)),
    // multimodal binary-column plumbing (decode stubs, real schema/batching)
    "mm_media_stats"      -> (Multimodal.mediaStats(_, _)),
    "mm_decode_images"    -> ((s, d) =>
      Multimodal.decodeImages(Multimodal.mediaTable(s, d)).toDF()
        .orderBy("media_id")),
    "mm_features"         -> (Multimodal.featureHistogram(_, _)),
    "mm_sample_frames"    -> ((s, d) =>
      Multimodal.sampleFrameStats(Multimodal.mediaTable(s, d))
        .orderBy("media_id", "frame_idx")),
    "mm_audio_energy"     -> (Multimodal.audioStats(_, _)),
    // round 8: adjacent-frame intensity-delta shot boundary detector
    "mm_scene_detect"     -> ((s, d) => Multimodal.sceneDetect(s, d)),
    "mm_phash"            -> (Multimodal.phash(_, _)),
    "mm_phash_pairs"      -> (Multimodal.phashPairs(_, _)),
    "mm_phash_clusters"   -> (Multimodal.phashClusters(_, _)),
    "mm_resize"           -> ((s, d) =>
      Multimodal.resizeImages(Multimodal.mediaTable(s, d)).toDF()
        .orderBy("media_id")),
    // generalized relational coverage
    "r_semi_join"         -> (Relational.semiJoin(_, _)),
    "r_anti_join"         -> (Relational.antiJoin(_, _)),
    "r_outer_counts"      -> (Relational.outerJoinCounts(_, _)),
    "r_set_ops"           -> (Relational.setOps(_, _)),
    "r_explode_words"     -> (Relational.explodeWords(_, _)),
    "r_rollup"            -> (Relational.rollupCounts(_, _)),
    "r_pricing_summary"   -> (Relational.pricingSummary(_, _)),
    "r_pivot"             -> (Relational.pivotCounts(_, _)),
    "r_cube"              -> (Relational.cubeCounts(_, _)),
    "r_window_funcs"      -> (Relational.windowFunctions(_, _)),
    "r_salted_join"       -> (Relational.saltedJoinCounts(_, _)),
    "r_skew_profile"      -> (Relational.eventKeySkew(_, _)),
    "r_offset_limit"      -> (Relational.offsetLimit(_, _)),
    "r_range_join"        -> (Relational.rangeJoinBinned(_, _)),
    "r_scalar_subquery"   -> (Relational.scalarSubquery(_, _)),
    "r_exists_subquery"   -> (Relational.existsSubquery(_, _)),
    "r_lateral_topn"      -> (Relational.lateralTopN(_, _)),
    "r_grouping_sets"     -> (Relational.groupingSets(_, _)),
    "r_bloom_join"        -> (Relational.bloomSemiJoin(_, _)),
    "r_bucketed_join"     -> (Relational.bucketedJoinAgg(_, _)),
    // round 7: DSv2 storage-partitioned join (source-reported layout;
    // the sf dir is unused — the generator IS the table)
    "r_storage_partitioned_join" -> ((s, _) =>
      Relational.storagePartitionedJoinAgg(s)),
    "ev_grain_rollup"     -> (EventOps.grainRollup(_, _)),
    // round 8: additive hour-of-day seasonal decomposition
    "ev_seasonal_profile" -> (EventOps.seasonalProfile(_, _)),
    // round 8: STL-style deseasonalized MAD anomaly cells
    "ev_seasonal_anomaly" -> ((s, d) => EventOps.seasonalAnomaly(s, d)),
    "ev_anomaly_mad"      -> (EventOps.anomalyMad(_, _)),
    "ev_cusum_changepoint" -> (EventOps.cusumChangepoint(_, _)),
    // the 100 TB shape of the same detector: per-day buckets + carried
    // offsets, bit-identical by decimal associativity (same oracle)
    "ev_cusum_partitioned" -> ((s, d) =>
      EventOps.cusumChangepointPartitioned(s, d)),
    "ev_moving_stats"     -> (EventOps.movingStats(_, _)),
    "ev_moving_range"     -> (EventOps.movingRange(_, _)),
    // raw HLL values (Relational.approxDistinct) are spec-only (engine-
    // specific sketch values); the bound-contract twin is driver-gated.
    "r_approx_distinct_bound" -> (Relational.approxDistinctBound(_, _)),
    "ev_asof_purchase"    -> (EventOps.asOfLastPurchase(_, _)),
    "ev_asof_join"        -> (EventOps.asOfClickPurchase(_, _)),
    "ev_asof_native"      -> (EventOps.asOfClickPurchaseNative(_, _)),
    "ev_funnel"           -> (EventOps.funnel(_, _)),
    "ev_cohort_retention" -> (EventOps.cohortRetention(_, _)),
    "txt_sample_stratified" -> (TextOps.sampleStratified(_, _)),
    // corpus preparation (decontamination, shuffle, repetition, chunking)
    "txt_decontaminate"   -> (CorpusOps.decontaminate(_, _)),
    "txt_decontaminate_bloom" -> ((s, d) =>
      CorpusOps.decontaminateBloomFrom(Tables.documents(s, d))),
    "txt_shuffle_export"  -> (CorpusOps.shuffleExport(_, _)),
    "txt_repetition"      -> (CorpusOps.repetitionRatio(_, _)),
    "txt_segment_dedup"   -> (CorpusOps.segmentDedup(_, _)),
    "txt_chunks"          -> (CorpusOps.chunkWindows(_, _)),
    "txt_pack"            -> (CorpusOps.packSequences(_, _)),
    "corpus_datasheet"    -> (CorpusOps.corpusDatasheet(_, _)),
    "corpus_diff"         -> (CorpusOps.corpusDiff(_, _)),
    // end-to-end corpus build; the oracle re-counts the staged parquet
    "corpus_pipeline_stages" -> (CorpusPipeline.stageSummary(_, _)),
    // round 3: merge/upsert, quantized ANN, calibrated gates, mixtures,
    // incremental aggregate maintenance
    "r_merge_upsert"      -> (Relational.mergeOrders(_, _)),
    "r_table_diff"        -> (Relational.orderDiff(_, _)),
    "r_incremental_join"  -> (Relational.incrementalJoinOrders(_, _)),
    "r_constraint_audit"  -> (Relational.constraintAudit(_, _)),
    "r_scd2"              -> (Relational.scd2(_, _)),
    "r_table_stats"       -> (Relational.tableStats(_, _)),
    // round 8: equi-depth histogram — the ANALYZE-stats distribution
    "r_equidepth_hist"    -> (Relational.equidepthHist(_, _)),
    // round 8: Benford first-digit forensic audit of revenue amounts
    "r_benford_audit"     -> (Relational.benfordAudit(_, _)),
    "emb_topk_int8"       -> (SimilarityOps.bruteForceTopKInt8(_, _)),
    "txt_quality_gate"    -> (TextOps.qualityGate(_, _)),
    "txt_mixture_sample"  -> (TextOps.mixtureSample(_, _)),
    "ev_incremental_agg"  -> (EventOps.incrementalHourly(_, _)),
    "ev_gap_fill"         -> (EventOps.gapFillHourly(_, _)),
    "r_set_ops_all"       -> (Relational.setOpsAll(_, _)),
    // engine path is the iterative loop (WITH RECURSIVE pays ~1.5 s/level
    // fixed planning cost); the CTE form stays as the spec-compared twin
    "r_recursive_reach"   -> (Relational.recursiveReachIterative(_, _)),
    "r_unpivot"           -> (Relational.unpivotMetrics(_, _)),
    "ev_variant_extract"  -> (EventOps.variantExtract(_, _)),
    // round 3: multi-way join analytics over the full fact chain
    "r_shipping_priority"     -> (Analytics.shippingPriority(_, _)),
    "r_local_supplier_volume" -> (Analytics.localSupplierVolume(_, _)),
    "r_late_lines"            -> (Analytics.lateLinesByPriority(_, _)),
    "r_promo_revenue"         -> (Analytics.promoRevenueShare(_, _)),
    "r_revenue_by_tier"       -> (Analytics.revenueByTier(_, _)),
    "r_order_count_dist"      -> (Analytics.orderCountDistribution(_, _)),
    "r_large_orders"          -> (Analytics.largeOrders(_, _)),
    "r_disjunctive_revenue"   -> (Analytics.disjunctiveRevenue(_, _)),
    "r_small_qty_revenue"     -> (Analytics.smallQuantityRevenue(_, _)),
    "r_top_supplier"          -> (Analytics.topSupplier(_, _)),
    "r_supplier_part_counts"  -> (Analytics.supplierPartCounts(_, _)),
    "r_important_stock"       -> (Analytics.importantStock(_, _)),
    "r_rfm_segments"          -> (Analytics.rfmSegments(_, _)),
    "r_yoy_revenue"           -> (Analytics.yoyRevenue(_, _)),
    // round 7: the remaining TPC-H analytics shapes (Q6/Q7/Q8/Q9/Q10)
    "r_forecast_revenue"      -> (Analytics.forecastRevenueChange(_, _)),
    "r_nation_trade_volume"   -> ((s, d) => Analytics.nationTradeVolume(s, d)),
    "r_market_share"          -> ((s, d) => Analytics.marketShare(s, d)),
    "r_product_profit"        -> ((s, d) => Analytics.productProfit(s, d)),
    "r_returned_item_revenue" -> (Analytics.returnedItemRevenue(_, _)),
    // round 6: decorrelated Q21/Q22 shapes + lexical retrieval
    "r_sole_late_supplier"    -> (Analytics.soleLateSupplier(_, _)),
    "r_idle_rich"             -> (Analytics.idleRichCustomers(_, _)),
    // round 8: the last two TPC-H shapes (Q2 adapted, Q4) — all 22 covered
    "r_min_cost_supplier"     -> ((s, d) => Analytics.minCostSupplier(s, d)),
    "r_priority_waiting"      -> (Analytics.priorityWaitingOrders(_, _)),
    "txt_bm25_topk"           -> ((s, d) => TextOps.bm25TopK(s, d)),
    "txt_bpe_pairs"           -> ((s, d) => TextOps.bpePairs(s, d)),
    "txt_bpe_merges"          -> ((s, d) => TextOps.bpeMerges(s, d)),
    "txt_bpe_encode"          -> ((s, d) => TextOps.bpeEncode(s, d)),
    "txt_token_entropy"       -> (TextOps.tokenEntropy(_, _)),
    "graph_pagerank"          -> ((s, d) => graft.ops.GraphOps.pageRank(s, d)),
    // round 8: seeded-teleport (personalized) PageRank — TrustRank shape
    "graph_ppr_seeded"        -> ((s, d) =>
      graft.ops.GraphOps.personalizedPageRank(s, d)),
    // round 8: degree-oriented triangle counting (co-purchase motifs)
    "graph_triangles"         -> ((s, d) =>
      graft.ops.GraphOps.triangleCounts(s, d)),
    // round 8: connected components of the thresholded co-purchase graph
    "graph_components"        -> ((s, d) =>
      graft.ops.GraphOps.components(s, d)),
    // round 8: 3-core of the same graph (bounded simultaneous peel)
    "graph_kcore"             -> ((s, d) =>
      graft.ops.GraphOps.kcore(s, d)),
    // round 8: Adamic–Adar link prediction with the hub wedge guard
    // round 8: neighborhood-Jaccard link prediction (Liben-Nowell 2003)
    "graph_jaccard_neighbors" -> ((s, d) =>
      graft.ops.GraphOps.jaccardNeighbors(s, d)),
    "graph_adamic_adar"       -> ((s, d) =>
      graft.ops.GraphOps.adamicAdar(s, d)),
    // round 8: butterfly (2×2 biclique) census on the bipartite
    // repeat-business trade graph
    "graph_butterflies"       -> ((s, d) =>
      graft.ops.GraphOps.butterflies(s, d)),
    // round 8: multi-source BFS hop census from the seed nation
    "graph_hop_histogram"     -> ((s, d) =>
      graft.ops.GraphOps.hopHistogram(s, d)),
    // round 8: synchronous label-propagation communities + their
    // Newman–Girvan partition quality
    "graph_label_prop"        -> ((s, d) =>
      graft.ops.GraphOps.labelPropagation(s, d)),
    "graph_modularity"        -> ((s, d) =>
      graft.ops.GraphOps.modularity(s, d)),
    // round 8: degree assortativity — do hubs trade with hubs?
    "graph_assortativity"     -> ((s, d) =>
      graft.ops.GraphOps.assortativity(s, d)),
    // round 8: HyperANF neighborhood function (sketch×graph; bound
    // contract — exact audited pairs + estimate-within flag)
    "graph_anf"               -> ((s, d) =>
      graft.ops.GraphOps.neighborhoodFunction(s, d)),
    // round 11: effective diameter from the ANF curve (integer
    // 10·p ≥ 9·P rule; sketch must name the same radius)
    "graph_anf_diameter"      -> ((s, d) =>
      graft.ops.GraphOps.anfDiameter(s, d)),
    // round 8: delta-batch CC maintenance; oracle is a FULL recompute
    "graph_components_incremental" -> ((s, d) =>
      graft.ops.GraphOps.componentsIncremental(s, d)),
    // round 8: global transitivity — 3·triangles / wedges
    "graph_clustering_coeff"  -> ((s, d) =>
      graft.ops.GraphOps.clusteringCoeff(s, d)),
    // round 8: reciprocal-rank fusion of the BM25 + TF-IDF retrievers
    "txt_rrf_fusion"          -> ((s, d) => TextOps.rrfFusion(s, d)),
    // round 8: MMR diversity re-rank of the brute cosine top-10 slate
    "emb_mmr_rerank"          -> ((s, d) =>
      graft.ops.SimilarityOps.mmrRerank(s, d)),
    // round 8: recall@5 of the IVF path vs brute-force ground truth
    "emb_recall_audit"        -> ((s, d) =>
      graft.ops.SimilarityOps.annRecallAudit(s, d)),
    // round 8: Matryoshka truncation audit — first-16-dims recall@5
    "emb_dim_truncation"      -> ((s, d) =>
      graft.ops.SimilarityOps.dimTruncationAudit(s, d)),
    // round 8: embedding-space drift — per-label split-centroid cosine
    "emb_centroid_drift"      -> ((s, d) =>
      graft.ops.SimilarityOps.centroidDrift(s, d)),
    // round 8: PMI collocations (Church & Hanks 1990)
    "txt_pmi_collocations"    -> ((s, d) => TextOps.pmiCollocations(s, d)),
    // same supersteps over the bucketed layout: exchange-free rank⋈edges
    "graph_pagerank_bucketed" -> ((s, d) =>
      graft.ops.GraphOps.pageRankBucketed(s, d)),
    "txt_textrank"            -> ((s, d) => TextOps.textRank(s, d)),
    "r_market_basket"         -> ((s, d) => Analytics.marketBasket(s, d)),
    "r_correlation"           -> (Analytics.quantityDiscountCorr(_, _)),
    "ev_cross_correlation"    -> ((s, d) => EventOps.crossCorrelation(s, d)),
    "ev_sliding_distinct"     -> ((s, d) =>
      EventOps.slidingDistinctUsers(s, d)),
    // round 7: the quantile (KLL) and set-operation (theta) members of
    // the mergeable-sketch family, both surfaced as bound contracts
    "ev_quantile_rollup"      -> ((s, d) =>
      EventOps.quantileRollupDaily(s, d)),
    "ev_segment_overlap"      -> ((s, d) => EventOps.segmentOverlap(s, d)),
    "ev_sliding_quantile"     -> ((s, d) => EventOps.slidingQuantile(s, d)),
    "ev_segment_exclusive"    -> ((s, d) =>
      EventOps.segmentExclusive(s, d)),
    // round 8: last-touch conversion attribution with a 24 h lookback
    "ev_attribution"          -> ((s, d) =>
      EventOps.attributionLastTouch(s, d)),
    // round 8: first-order Markov transition matrix over user streams
    "ev_markov_transitions"   -> (EventOps.markovTransitions(_, _)),
    // round 8: hourly-count autocorrelation at lags 1..24
    "ev_acf"                  -> ((s, d) => EventOps.acfHourly(s, d)),
    // round 8: per-type Welch z-test between deterministic A/B arms
    "ev_ab_ztest"             -> (EventOps.abTestZ(_, _)),
    // round 8: sample-ratio-mismatch chi-square guardrail per type
    "ev_ab_srm"               -> (EventOps.abSrmCheck(_, _)),
    // round 8: CUPED variance-reduced A/B means (Deng et al. WSDM'13)
    "ev_ab_cuped"             -> (EventOps.abCuped(_, _)),
    // round 8: minimum detectable effect at 5%/80% — sizing readout
    "ev_ab_power"             -> (EventOps.abPowerMde(_, _)),
    // round 8: Nelson–Aalen cumulative hazard, censored conversions
    "ev_survival_hazard"      -> (EventOps.survivalHazard(_, _)),
    // round 8: exact EWMA smoothing via power-of-two geometric weights
    "ev_ewma_daily"           -> (EventOps.ewmaDaily(_, _)),
    // round 8: Theil–Sen robust daily trend (29% breakdown point)
    "ev_theil_sen"            -> (EventOps.theilSenTrend(_, _)),
    // round 8: PSI drift monitor (first-week baseline vs last week)
    "ev_psi_drift"            -> ((s, d) => EventOps.psiValueDrift(s, d)),
    // round 8: per-language Gini of token mass — corpus balance
    "txt_gini_tokens"         -> (TextOps.giniTokens(_, _)),
    // round 8: two-sample KS statistic between the split halves
    "txt_ks_drift"            -> ((s, d) => TextOps.ksSplitDrift(s, d)),
    // round 8: χ² independence of language × length bucket
    "txt_chisq_lang_length"   -> (TextOps.chisqLangLength(_, _)),
    // round 8: 2-D Pareto skyline (price, size) via the sort identity
    "r_skyline"               -> (Relational.skylineParts(_, _)),
    // round 8: HITS hubs & authorities (scaled-integer iterate)
    "graph_hits"              -> ((s, d) => graft.ops.GraphOps.hits(s, d)),
    // round 8: greedy farthest-first k-center coreset (Gonzalez 1985)
    "emb_kcenter_coreset"     -> ((s, d) =>
      SimilarityOps.kcenterCoreset(s, d)),
    // round 8: bounded-Levenshtein re-rank of the LSH near-dup pairs
    "dedup_edit_verify"       -> ((s, d) =>
      DedupOps.editVerifiedPairs(s, d)),
    // round 8: simhash-vs-exact-Jaccard pair audit (precision/recall)
    "dedup_simhash_audit"     -> (DedupOps.simhashAudit(_, _)),
    // round 8: point-in-time join against the SCD2 dimension
    "r_pit_join"              -> (Relational.pitJoin(_, _)),
    // round 8: weighted single-source shortest paths (bounded-round
    // Bellman–Ford over the shipping-latency trade graph)
    "graph_sssp"              -> ((s, d) => graft.ops.GraphOps.sssp(s, d)),
    // round 9: cohort LTV curve (retention's revenue companion)
    "ev_ltv_cohort"           -> (EventOps.ltvCohort(_, _)),
    // round 9: per-event-type Gini of user value mass (distributed rank)
    "ev_gini_value"           -> (EventOps.giniUserValue(_, _)),
    // round 9: per-doc n-gram first-occurrence novelty score
    "dedup_ngram_novelty"     -> ((s, d) => DedupOps.ngramNovelty(s, d)),
    // round 9: MinHash estimate-vs-exact-Jaccard bound audit
    "dedup_minhash_est_audit" -> ((s, d) =>
      DedupOps.minhashEstAudit(s, d)),
    // round 9: edge-grain density skeleton (triangle-support peel)
    "graph_ktruss"            -> ((s, d) => graft.ops.GraphOps.ktruss(s, d)),
    // round 9: language-ID confusion matrix vs the labeled lang column
    "txt_langid_confusion"    -> (TextOps.langIdConfusion(_, _)),
    // round 9: walk-forward OLS backtest of daily purchase revenue
    "ev_forecast_backtest"    -> (EventOps.forecastBacktest(_, _)),
    // round 9: rich-club coefficient curve of the co-purchase graph
    "graph_rich_club"         -> ((s, d) =>
      graft.ops.GraphOps.richClub(s, d)),
    // round 9: per-language hapax-legomena share (lexical sparsity)
    "txt_hapax_ratio"         -> (TextOps.hapaxRatio(_, _)),
    // round 9: equi-width histogram (the other ANALYZE histogram)
    "r_equiwidth_hist"        -> (Relational.equiwidthHist(_, _)),
    // round 9: DAU/WAU/MAU + stickiness (exact twin of the HLL path)
    "ev_dau_wau_mau"          -> (EventOps.dauWauMau(_, _)),
    // round 9: 50/80/90% Pareto cover of user value mass (count-map agg)
    "ev_pareto_cover"         -> (EventOps.paretoCover(_, _)),
    // round 9: big-ticket conversion rate + exact latency quantiles
    "ev_time_to_convert"      -> (EventOps.timeToConvert(_, _)),
    // round 10: DAU/WAU/MAU from the stored HLL partials (the 100 TB
    // serving path), gated as a sampled exact audit + bound flags
    "ev_dau_wau_mau_sketch"   -> ((s, d) =>
      EventOps.dauWauMauSketch(s, d)),
    // round 10: new-vs-returning daily split (growth accounting)
    "ev_new_returning"        -> (EventOps.newVsReturning(_, _)),
    // round 10: weekly churn (active in w, absent in w+1)
    "ev_churn_weekly"         -> (EventOps.churnWeekly(_, _)),
    // round 10: per-type inter-arrival gap quantiles (burstiness)
    "ev_interarrival"         -> (EventOps.interarrival(_, _)),
    // round 10: Flesch reading-ease per document (quality feature)
    "txt_readability"         -> (TextOps.readability(_, _)),
    // round 10: pairwise Jensen–Shannon divergence between languages
    "txt_js_divergence"       -> (TextOps.jsDivergence(_, _)),
    // round 10: OLS power-law fit of the degree CCDF (hub-heaviness)
    "graph_powerlaw_fit"      -> ((s, d) =>
      graft.ops.GraphOps.powerlawFit(s, d)),
    // round 10: consecutive-day activity streaks (gaps-and-islands)
    "ev_streaks"              -> (EventOps.streaks(_, _)),
    // round 10: top-N vocabulary coverage curve (tokenizer sizing)
    "txt_vocab_coverage"      -> ((s, d) =>
      TextOps.vocabCoverage(s, d)),
    // round 10: embedding L2-norm profile (encoder sanity page)
    "emb_norm_profile"        -> (SimilarityOps.normProfile(_, _)),
    // round 10: component-size histogram of the co-purchase graph
    "graph_component_sizes"   -> ((s, d) =>
      graft.ops.GraphOps.componentSizes(s, d)),
    // round 10: ANSI percentile_cont via Spark's exact `percentile`
    "ev_percentile_cont"      -> (EventOps.percentileCont(_, _)),
    // round 10: behavioral-entropy histogram (user diversity feature)
    "ev_user_entropy"         -> (EventOps.userEntropy(_, _)),
    // round 10: moving-average type-token ratio (lexical diversity)
    "txt_mattr"               -> ((s, d) => TextOps.mattr(s, d)),
    // round 10: embedding-curation pipeline stage reconciliation
    // (valid → semdedup → sample → int8 export; DuckDB recounts the
    // staged parquet per stage)
    "emb_pipeline_stages"     -> ((s, d) =>
      EmbPipeline.stageSummary(s, d)),
    // round 10: top in-session event-type trigram paths (path census)
    "ev_path_topk"            -> ((s, d) => EventOps.pathTopK(s, d)),
    // round 10: Lorenz revenue curve over user deciles (whale economy)
    "ev_lorenz_deciles"       -> (EventOps.lorenzDeciles(_, _)),
    // round 10: Burrows' Delta stylometric distance between sources
    "txt_burrows_delta"       -> ((s, d) => TextOps.burrowsDelta(s, d)),
    // round 10: stationary distribution of the event-type Markov chain
    "ev_markov_stationary"    -> ((s, d) =>
      EventOps.markovStationary(s, d)),
    // round 10: embedding dimension covariance/correlation matrix
    "emb_dim_covariance"      -> ((s, d) =>
      SimilarityOps.dimCovariance(s, d)),
    // round 10: landmark harmonic centrality (seeded multi-source BFS)
    "graph_harmonic"          -> ((s, d) =>
      graft.ops.GraphOps.harmonicCentrality(s, d)),
    // round 10: per-kind media payload-size quantile profile
    "mm_size_quantiles"       -> (Multimodal.sizeQuantiles(_, _)),
    // round 10: top principal component via quantized power iteration
    "emb_pca_power"           -> ((s, d) => SimilarityOps.pcaPower(s, d)),
    // round 10: simplified silhouette per embedding label
    "emb_silhouette"          -> ((s, d) =>
      SimilarityOps.silhouette(s, d)),
    // round 10: power-law fit of the pooled daily retention curve
    "ev_retention_fit"        -> (EventOps.retentionFit(_, _)),
    // round 10: strict windowed funnel with exact median step latency
    "ev_funnel_windowed"      -> ((s, d) =>
      EventOps.funnelWindowed(s, d)),
    // round 10: functional-dependency (g3) audit panel
    "r_fd_audit"              -> (Relational.fdAudit(_, _)),
    // round 10: rolling 7-day click-volume × purchase-revenue Pearson
    "ev_moving_corr"          -> ((s, d) => EventOps.movingCorr(s, d)),
    // round 10: RAKE keyword extraction (stopword-delimited phrases)
    "txt_rake_keywords"       -> ((s, d) => TextOps.rakeKeywords(s, d)),
    // round 10: nearest-centroid label confusion matrix (labeling QA)
    "emb_label_confusion"     -> ((s, d) =>
      SimilarityOps.labelConfusion(s, d)),
    // round 10: degree-distribution Gini from the degree-domain histogram
    "graph_degree_gini"       -> ((s, d) =>
      graft.ops.GraphOps.degreeGini(s, d)),
    // round 12: directed structure — SCCs of the purchase-precedence
    // graph (FW-BW-Trim coloring), its condensation DAG, and the
    // condensation's longest-path topological layering
    "graph_scc"               -> ((s, d) => graft.ops.GraphOps.scc(s, d)),
    "graph_condensation"      -> ((s, d) =>
      graft.ops.GraphOps.condensation(s, d)),
    "graph_topo_layers"       -> ((s, d) =>
      graft.ops.GraphOps.topoLayers(s, d)),
    // round 13: delta-batch SCC maintenance (bridge-graph fold over the
    // stored base labels; oracle is a FULL recompute over base ∪ delta)
    "graph_scc_incremental"   -> ((s, d) =>
      graft.ops.GraphOps.sccIncrementalFace(s, d)),
    // round 13: per-nontrivial-SCC descendant/ancestor census on the
    // contracted DAG, served from the stored scc artifact
    "graph_reach_census"      -> ((s, d) =>
      graft.ops.GraphOps.reachCensus(s, d)),
    // round 13: merged-graph layering after the delta fold (labels →
    // condensation → layers; oracle re-derives from the union graph)
    "graph_topo_layers_incremental" -> ((s, d) =>
      graft.ops.GraphOps.topoLayersIncremental(s, d)),
    // round 13: the bucketed-layout twin of graph_ppr_seeded (the
    // family's most expensive superstep loop) — bit-identical integer
    // supersteps, exchange-free rank⋈edges join, same oracle
    "graph_ppr_bucketed"      -> ((s, d) =>
      graft.ops.GraphOps.personalizedPageRankBucketed(s, d)),
  )

  private val bucketSql = Queries.acctbalBucketSql

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    OracleSql.extended ++ OracleSql.aliased ++ OracleSql.round6 ++
      OracleSql.round7 ++ OracleSql.round8 ++ OracleSql.round9 ++
      OracleSql.round12 ++ OracleSql.round13 ++ Map(
    "q1_category_per_country" ->
      """SELECT n_name AS country, o_orderpriority AS category,
        |       count(*) AS category_count
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q2_category_per_year" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS post_year,
        |       o_orderpriority AS category, count(*) AS category_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '2000-01-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q3_top_poster_per_country" ->
      """WITH ranked AS (
        |  SELECT n_name AS country, c_name AS poster_name,
        |         c_acctbal AS follower_count,
        |         ROW_NUMBER() OVER (PARTITION BY n_name
        |                            ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |SELECT country, poster_name, follower_count
        |FROM ranked WHERE rn = 1 ORDER BY country""".stripMargin,

    "q4_top_country" ->
      """WITH ranked AS (
        |  SELECT n_name AS country, c_acctbal AS follower_count,
        |         ROW_NUMBER() OVER (PARTITION BY n_name
        |                            ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
        |SELECT country, follower_count FROM ranked WHERE rn = 1
        |ORDER BY follower_count DESC, country LIMIT 1""".stripMargin,

    "q5_category_per_age_group" ->
      s"""WITH bucket AS (
         |  SELECT c_custkey, $bucketSql AS age_group FROM customer)
         |SELECT age_group, o_orderpriority AS category,
         |       count(DISTINCT o_orderkey) AS category_count
         |FROM orders JOIN bucket ON o_custkey = c_custkey
         |GROUP BY 1, 2
         |ORDER BY age_group, category_count DESC, category""".stripMargin,

    // Exact twin while every group fits the GK sketch without compression:
    // percentile_approx degenerates to the exact lower median, which is
    // DuckDB's quantile_disc convention (verified on even-sized groups
    // where lower/upper diverge). Holds at the driver's sf0.01 gate
    // (~375 rows/group); measured to break by sf0.1 (~3.7k rows/group,
    // sketch off by ~1e-4 relative) — at larger SF this entry reverts to
    // rows-only, which is the honest status of a sketch.
    "q6_median_approx" ->
      s"""WITH b AS (
         |  SELECT $bucketSql AS age_group, c_acctbal AS follower_count
         |  FROM customer)
         |SELECT age_group,
         |       quantile_disc(follower_count, 0.5) AS median_follower_count
         |FROM b GROUP BY 1
         |ORDER BY median_follower_count DESC, age_group""".stripMargin,

    "q6_median_follower_by_group" ->
      s"""WITH b AS (
         |  SELECT $bucketSql AS age_group, c_acctbal AS follower_count
         |  FROM customer),
         |r AS (
         |  SELECT age_group, follower_count,
         |         ROW_NUMBER() OVER (PARTITION BY age_group
         |                            ORDER BY follower_count) AS rn,
         |         COUNT(*) OVER (PARTITION BY age_group) AS cnt
         |  FROM b)
         |SELECT age_group, follower_count AS median_follower_count
         |FROM r WHERE rn = CAST(floor((cnt + 1) / 2) AS BIGINT)
         |ORDER BY median_follower_count DESC, age_group""".stripMargin,

    // same semantic contract as q6_median_follower_by_group — the exact
    // aggregate must reproduce the window formulation bit-for-bit
    "q6_median_exact_agg" ->
      s"""WITH b AS (
         |  SELECT $bucketSql AS age_group, c_acctbal AS follower_count
         |  FROM customer),
         |r AS (
         |  SELECT age_group, follower_count,
         |         ROW_NUMBER() OVER (PARTITION BY age_group
         |                            ORDER BY follower_count) AS rn,
         |         COUNT(*) OVER (PARTITION BY age_group) AS cnt
         |  FROM b)
         |SELECT age_group, follower_count AS median_follower_count
         |FROM r WHERE rn = CAST(floor((cnt + 1) / 2) AS BIGINT)
         |ORDER BY median_follower_count DESC, age_group""".stripMargin,

    "q7_users_per_year" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS post_year,
        |       count(DISTINCT o_custkey) AS number_users_joined
        |FROM orders GROUP BY 1
        |ORDER BY number_users_joined DESC, post_year""".stripMargin,

    "q8_median_follower_by_year" ->
      """WITH j AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS post_year,
        |         c_acctbal AS follower_count
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |r AS (
        |  SELECT post_year, follower_count,
        |         ROW_NUMBER() OVER (PARTITION BY post_year
        |                            ORDER BY follower_count) AS rn,
        |         COUNT(*) OVER (PARTITION BY post_year) AS cnt
        |  FROM j)
        |SELECT post_year, follower_count AS median_follower_count
        |FROM r WHERE rn = CAST(floor((cnt + 1) / 2) AS BIGINT)
        |ORDER BY post_year""".stripMargin,

    "q9_median_follower_by_group_year" ->
      s"""WITH bucket AS (
         |  SELECT c_custkey AS b_custkey, $bucketSql AS age_group
         |  FROM customer),
         |j AS (
         |  SELECT age_group, CAST(year(o_orderdate) AS BIGINT) AS post_year,
         |         c_acctbal AS follower_count
         |  FROM orders
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN bucket ON c_custkey = b_custkey),
         |r AS (
         |  SELECT age_group, post_year, follower_count,
         |         ROW_NUMBER() OVER (PARTITION BY age_group, post_year
         |                            ORDER BY follower_count) AS rn,
         |         COUNT(*) OVER (PARTITION BY age_group, post_year) AS cnt
         |  FROM j)
         |SELECT age_group, post_year,
         |       follower_count AS median_follower_count
         |FROM r WHERE rn = CAST(floor((cnt + 1) / 2) AS BIGINT)
         |ORDER BY age_group DESC, post_year DESC""".stripMargin,
  )
}
