package graft

/** The written scaling class of every registry query — the machine-
  * checkable form of "this plan survives a 100× scale-up" (round-11
  * verdict #5). Wall-clock lies on a shared VM; the SHUFFLE-READ
  * footprint is a property of plan + data, so the class is a band on
  * how those bytes move when the input scales 10× (4× for the
  * embeddings table):
  *
  *  - [[GroupBounded]]: the shuffle carries key-domain-sized state
  *    (groups, top-k heaps, sketch partials, scalar reductions), so
  *    bytes grow FAR slower than input — band: ratio < inputRatio/2,
  *    with a 2 MiB absolute floor under which the claim "bounded by a
  *    constant" is already proven and ratio jitter is meaningless.
  *  - [[InputLinear]]: the shuffle legitimately carries per-row state
  *    (content hashes, per-doc shingles, join rows) — band: ratio <
  *    inputRatio × 3 (never super-linear: no pair blowup, no
  *    accidental cross join; compression variance absorbed by 3×).
  *  - [[Fixed]]: the query's input does not scale with the sf dir
  *    (synthetic DSv2 sources, artifact-only readouts) — band: big-SF
  *    bytes stay under `max(4× small-SF bytes, floor)` (the multiplier
  *    ScalingSpec enforces; 4× absorbs shuffle-compression jitter on
  *    the near-floor frames these queries move).
  *
  * Classes were assigned from [[ScalingProbe]] measurements (TSV of
  * per-query footprints at both SFs), not from reading the code —
  * `ScalingSpec` re-measures and asserts every entry each run, so a
  * plan change that moves a query out of its class fails the suite.
  */
object ScalingClasses {

  sealed trait Band
  /** Shuffle bounded by the key/group/k domain, not the input. */
  case object GroupBounded extends Band
  /** Shuffle proportional to input rows — and never worse. */
  case object InputLinear extends Band
  /** Input independent of the sf dir (synthetic/artifact source). */
  final case class Fixed(reason: String) extends Band

  /** Which (small, big) SF pair exercises a query's input scaling.
    * documents are constant-sized below sf0.01 and embeddings below
    * sf0.01 (TESTDATA), so the document/embedding families scale
    * sf0.01 → sf0.1; the TPC-H/events families scale sf0.001 → sf0.01
    * (cheaper, same 10×).
    */
  def sfPair(name: String): (String, String) =
    if (name.startsWith("dedup_") || name.startsWith("txt_") ||
        name.startsWith("corpus_") || name.startsWith("mm_") ||
        name.startsWith("emb_"))
      ("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    else
      ("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  /** Queries whose FIRST run per dataset builds a fingerprint-guarded
    * disk artifact (BPE tokenizer, hourly sketch partials, CC/trade
    * label tables, the ANF curve, the bucketed PageRank layout, corpus
    * stages): the band is measured on the steady-state SERVE rep, so
    * these get one unmeasured warm call per SF first — otherwise the
    * measured bytes would depend on whether an earlier suite already
    * built the artifact (flaky bands). Derived from the
    * `Artifact.readOrCompute` call sites and their consumers.
    */
  val warmFirst: Set[String] = Set(
    "txt_bpe_merges", "txt_bpe_encode",
    "ev_dau_wau_mau_sketch", "ev_sliding_distinct", "ev_sliding_quantile",
    "ev_quantile_rollup", "ev_segment_overlap", "ev_segment_exclusive",
    "graph_components", "graph_component_sizes",
    "graph_components_incremental", "graph_anf", "graph_anf_diameter",
    "graph_scc", "graph_condensation", "graph_topo_layers",
    "graph_scc_incremental", "graph_reach_census",
    "graph_topo_layers_incremental", "graph_ppr_bucketed",
    "graph_pagerank_bucketed", "corpus_pipeline_stages")

  /** Shuffle proportional to the CANDIDATE-PAIR table, not the input:
    * the n-gram inverted-index pair generators (and their direct
    * consumers — clusters/survivors/rate/audits) shuffle Σ df² over
    * pair-forming shingles, which grows with duplicate density (the
    * fixture's pair mass measured ~x^1.5 on a 10× corpus: 0.6 → 22 MB
    * at 35× on 10× input). The df ∈ [2, maxShingleDf] cap bounds it at
    * capped-quadratic — the written band is ratio < inputRatio²/2,
    * which a genuine uncapped blowup (all-pairs, lost df guard) still
    * trips at 10× while honest pair growth does not.
    */
  final case class PairBounded(why: String) extends Band

  private val groupBounded: Set[String] = Set(
    "dedup_ngram_novelty", "emb_centroid_drift", "emb_cluster_profile",
    "emb_dim_truncation", "emb_kcenter_coreset", "emb_label_confusion",
    "emb_norm_profile", "emb_pca_power", "emb_recall_audit",
    "emb_silhouette", "emb_topk_brute", "emb_topk_int8",
    "emb_topk_ivf_seeded", "emb_topk_ivfpq", "emb_topk_pq",
    "ev_ab_cuped", "ev_ab_power", "ev_ab_srm", "ev_ab_ztest", "ev_acf",
    "ev_churn_weekly", "ev_cohort_retention", "ev_cross_correlation",
    "ev_ewma_daily", "ev_forecast_backtest", "ev_funnel",
    "ev_funnel_windowed", "ev_incremental_agg", "ev_lorenz_deciles",
    "ev_ltv_cohort", "ev_moving_corr", "ev_psi_drift",
    "ev_seasonal_anomaly", "ev_seasonal_profile", "ev_segment_exclusive",
    "ev_survival_hazard", "ev_theil_sen", "ev_time_to_convert",
    "ev_top_users", "graph_pagerank_bucketed", "graph_ppr_bucketed",
    "mm_media_stats",
    "mm_size_quantiles", "q1_category_per_country",
    "q2_category_per_year", "q3_top_poster_per_country",
    "q4_top_country", "r_benford_audit", "r_bucketed_join",
    "r_correlation", "r_cube", "r_disjunctive_revenue",
    "r_equiwidth_hist", "r_explode_words", "r_forecast_revenue",
    "r_grouping_sets", "r_idle_rich", "r_incremental_join",
    "r_late_lines", "r_local_supplier_volume", "r_offset_limit",
    "r_order_count_dist", "r_outer_counts", "r_pivot",
    "r_pricing_summary", "r_priority_waiting", "r_product_profit",
    "r_promo_revenue", "r_range_join", "r_rollup", "r_salted_join",
    "r_scalar_subquery", "r_skew_profile", "r_skyline", "r_unpivot",
    "r_yoy_revenue", "txt_bpe_pairs", "txt_burrows_delta",
    "txt_chisq_lang_length", "txt_cms_rollup", "txt_fertility",
    "txt_hapax_ratio", "txt_heaps_fit", "txt_js_divergence",
    "txt_ks_drift", "txt_length_quantiles", "txt_mixture_sample",
    "txt_pmi_collocations", "txt_top_terms_cms", "txt_unimax_budget",
    "txt_weighted_sample")

  private val inputLinear: Set[String] = Set(
    "corpus_datasheet", "corpus_diff", "corpus_pipeline_stages",
    "dedup_edit_verify", "dedup_exact", "dedup_incremental",
    "dedup_minhash_lsh", "dedup_remove_spans", "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_substring_spans", "emb_mmr_rerank", "emb_near_dup",
    "emb_pipeline_stages", "emb_semantic_dedup", "emb_topk_lsh",
    "emb_topk_lsh_mp", "ev_anomaly_mad", "ev_asof_join",
    "ev_asof_native", "ev_asof_purchase", "ev_attribution",
    "ev_cusum_changepoint", "ev_cusum_partitioned", "ev_dau_wau_mau",
    "ev_dau_wau_mau_sketch", "ev_gap_fill", "ev_gini_value",
    "ev_grain_rollup", "ev_hourly_by_type", "ev_interarrival",
    "ev_json_extract", "ev_markov_stationary", "ev_markov_transitions",
    "ev_moving_range", "ev_moving_stats", "ev_new_returning",
    "ev_pareto_cover", "ev_path_topk", "ev_percentile_cont",
    "ev_quantile_rollup", "ev_retention_fit", "ev_segment_overlap",
    "ev_session_native", "ev_session_overlap", "ev_sessionize",
    "ev_sliding_distinct", "ev_sliding_quantile", "ev_streaks",
    "ev_user_entropy", "ev_value_outliers", "ev_value_quantiles",
    "ev_value_stats", "ev_variant_extract", "graph_adamic_adar",
    "graph_assortativity", "graph_butterflies", "graph_clustering_coeff",
    "graph_component_sizes", "graph_components",
    "graph_components_incremental", "graph_condensation",
    "graph_degree_gini", "graph_harmonic", "graph_hits",
    "graph_hop_histogram", "graph_jaccard_neighbors", "graph_kcore",
    "graph_ktruss", "graph_label_prop", "graph_modularity",
    "graph_pagerank", "graph_powerlaw_fit", "graph_ppr_seeded",
    "graph_rich_club", "graph_scc",
    "graph_scc_incremental", "graph_sssp", "graph_topo_layers",
    "graph_topo_layers_incremental",
    "graph_triangles", "mm_audio_energy", "mm_decode_images",
    "mm_features", "mm_phash", "mm_phash_clusters", "mm_phash_pairs",
    "mm_resize", "mm_sample_frames", "mm_scene_detect",
    "q5_category_per_age_group", "q6_median_approx",
    "q6_median_exact_agg", "q6_median_follower_by_group",
    "q7_users_per_year", "q8_median_follower_by_year",
    "q9_median_follower_by_group_year", "r_anti_join",
    "r_approx_distinct_bound", "r_bloom_join", "r_constraint_audit",
    "r_equidepth_hist", "r_exists_subquery", "r_fd_audit",
    "r_important_stock", "r_large_orders", "r_lateral_topn",
    "r_market_basket", "r_market_share", "r_merge_upsert",
    "r_min_cost_supplier", "r_nation_trade_volume", "r_pit_join",
    "r_returned_item_revenue", "r_revenue_by_tier", "r_rfm_segments",
    "r_scd2", "r_semi_join", "r_set_ops", "r_set_ops_all",
    "r_shipping_priority", "r_small_qty_revenue", "r_sole_late_supplier",
    "r_supplier_part_counts", "r_table_diff", "r_table_stats",
    "r_top_supplier", "r_window_funcs", "txt_bm25_topk",
    "txt_bpe_encode", "txt_c4_rules", "txt_ccnet_bigram",
    "txt_ccnet_buckets", "txt_chunks", "txt_classifier_score",
    "txt_curriculum", "txt_decontaminate", "txt_decontaminate_bloom",
    "txt_dsir_hashed", "txt_dsir_weights", "txt_fingerprint_md5",
    "txt_fingerprint_xx", "txt_gini_tokens", "txt_gopher_rules",
    "txt_hash_embedding", "txt_kn_score", "txt_lang_id",
    "txt_langid_confusion", "txt_lm_bigram", "txt_lm_score", "txt_mattr",
    "txt_pack", "txt_pii_redact", "txt_quality", "txt_quality_gate",
    "txt_rake_keywords", "txt_readability", "txt_repetition",
    "txt_rrf_fusion", "txt_sample_stratified", "txt_segment_dedup",
    "txt_shuffle_export", "txt_subword_count", "txt_tfidf",
    "txt_token_count", "txt_token_entropy", "txt_top_terms",
    "txt_train_test_split", "txt_vocab_coverage", "txt_zipf_fit")

  private val pairBounded: Set[String] = Set(
    "dedup_clusters", "dedup_containment", "dedup_minhash_est_audit",
    "dedup_ngram_jaccard", "dedup_rate_report", "dedup_simhash_audit",
    "dedup_survivors", "dedup_survivors_quality")

  private val fixedReasons = Map(
    "emb_dim_covariance" -> "dim²-dominated; checkpointed frames",
    "graph_anf" -> "stored-curve artifact readout (maxR rows)",
    "graph_anf_diameter" -> "stored-curve artifact readout (maxR rows)",
    "r_recursive_reach" -> "bounded 2-row recursion fixture",
    "r_storage_partitioned_join" -> "synthetic DSv2 source, sf-independent",
    "txt_bpe_merges" -> "stored tokenizer artifact readout (8 rows)",
    "txt_textrank" -> "top-k keyword graph, output-bounded")

  /** name → band, total over the registry (ScalingSpec asserts the
    * key sets match exactly). Assignments derived from a full
    * [[ScalingProbe]] sweep (sf0.001→sf0.01 / sf0.01→sf0.1, warm
    * serve reps), reviewed by family; re-run the probe when adding an
    * operator and place it by evidence.
    */
  lazy val of: Map[String, Band] =
    groupBounded.iterator.map(_ -> (GroupBounded: Band)).toMap ++
      inputLinear.iterator.map(_ -> (InputLinear: Band)) ++
      pairBounded.iterator.map(_ ->
        (PairBounded("df-capped inverted-index pair mass"): Band)) ++
      // the reach closure's shuffle is (seed, reachable-SCC) pairs —
      // seeds (nontrivial SCCs) and reach sets both grow with the
      // graph, so the honest band is capped-quadratic, not linear
      // (probed 88× shuffle on 38× input: inside ×3-linear at this SF
      // pair but with no structural guarantee it stays there)
      Map("graph_reach_census" ->
        (PairBounded("nontrivial-seed × reachable-SCC closure pairs")
          : Band)) ++
      fixedReasons.iterator.map { case (k, v) => k -> (Fixed(v): Band) }
}
