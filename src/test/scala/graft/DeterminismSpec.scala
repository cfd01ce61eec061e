package graft

/** The engine's determinism contract: identical results regardless of
  * partitioning/parallelism — the property that makes the same job
  * reproducible on 1 core or 1000 executors. Exercised by re-running
  * representative queries under different shuffle-partition settings. */
class DeterminismSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val names = Seq("q_agg_pricing", "q_paired_ttest", "q_wilcoxon",
    "q_cosine_topk", "q_minhash_lsh", "q_impute_iqr",
    // round-2 ops whose determinism rests on md5 ordering / exact
    // fixed-point sums / window cumsums
    "q_pack_sequences", "q_rand_proj", "q_mix_counts", "q_boilerplate",
    // round-2 session-3 ops: PQ argmin/ADC ties, PPS thresholds, 8dp-ln
    // grids, percentile cuts, struct-argmax, RIFF byte parsing
    "q_pq_codes", "q_ivf_pq", "q_weighted_sample", "q_dsir_weights",
    "q_winsorize", "q_group_mode", "q_category_entropy", "q_audio_meta",
    // round-2 session-4 ops: SCD2 null-safe change split, decimal-grid
    // TF-IDF dots, hash-range folds, per-doc gram multisets, CDC
    // struct-max compaction, MI ln-grid, lead()-window sequence counts
    "q_scd2", "q_tfidf_cosine", "q_kfold", "q_dup_ngram_frac",
    "q_cdc_compact", "q_mutual_info", "q_event_trigrams", "q_corr_matrix",
    "q_twap", "q_benford", "q_js_divergence", "q_autocorr",
    "q_js_drift",
    // round-3 ops: BPE per-round argmax ties, repeated-span islands,
    // byte-level Jaro-Winkler doubles, per-block SNM rank ties, bigram
    // 8dp-ln grid means
    "q_bpe_merges", "q_repeated_spans", "q_jaro_linkage", "q_snm_linkage",
    "q_bigram_lm", "q_geo_nearest", "q_geo_within", "q_linkage_residue",
    "q_rest_lookup", "q_geo_dbscan", "q_dq_report", "q_snapshot_diff",
    // round-3 second-wave ops: BFS min-frontier ties, KN/NB/zipf 8dp-ln
    // grids + integer argmax, CUSUM decimal cumsums + peak ties, Cramer
    // double algebra, sketch-state pair merges, cluster-keyed md5 split,
    // directed-rule confidence cuts, RRF full-outer rank ties
    "q_bfs_hops", "q_kn_bigram", "q_naive_bayes", "q_zipf_fit",
    "q_cusum", "q_ols_multi", "q_trimmed_mean", "q_hll_intersect",
    "q_leakage_split", "q_assoc_rules", "q_rrf_fusion",
    // round-3 third-wave ops: grid-summed ANOVA terms, decimal
    // cumulative-weight medians, island merges, cent×hop lerp grid,
    // KM duration-grid products, Gini rank sums, sketch inner products,
    // as-of PIT payload carry, RFM percentile-cut scores
    "q_anova", "q_weighted_median", "q_gini", "q_kaplan_meier",
    "q_interval_merge", "q_resample_interp", "q_readability", "q_rfm",
    "q_join_size_est", "q_pit_join",
    "q_vocab_coverage", "q_streaks", "q_abc_class", "q_funnel_window",
    "q_skew_report", "q_cramers_v", "q_markov_trans",
    // rank-stats tier: value-domain midrank windows, grid-summed
    // R²/n terms, milli-grid deviations, calendar-pair sign sums,
    // pairwise-slope medians
    "q_spearman", "q_kruskal_wallis", "q_levene_bf", "q_mann_kendall",
    "q_theil_sen",
    // retrieval tier: 8dp idf grids + decimal doc sums, deg/freq score
    // joins, nano-grid greedy MMR over collected candidate matrices
    "q_bm25", "q_rake_keywords", "q_mmr_rerank",
    // graph additions: wedge-local AA sums, e8 floor-div renorm rounds
    "q_adamic_adar", "q_hits",
    // governance audits: rollup ladders, g3 repairs, FK coverage joins
    "q_k_anonymity", "q_fd_violations", "q_inclusion_dep",
    // time-series tier: one-pass lag grids, decimal window sums,
    // hex-threshold Poisson draws + replicate percentiles
    "q_acf_grid", "q_bollinger", "q_rolling_corr", "q_seasonal_profile",
    "q_bootstrap_ci",
    // recommender/monitoring/GLM/eval: basket-local cosine ranks,
    // decile-cut PSI grids, 6dp-sigmoid IRLS rounds, log2-grid NDCG
    "q_item_cf", "q_psi_drift", "q_logreg_irls", "q_ndcg",
    // eval tier: heap-topk votes, count-ratio metrics, quantile-cut
    // calibration bins, pooled z
    "q_knn_classify", "q_knn_classify_ann", "q_confusion_eval",
    "q_calibration", "q_ab_test",
    // temporal ops: power-of-two decay units, running-last struct
    // attribution, cell-moment anomaly flags, spine anti-joins
    "q_decayed_topk", "q_attribution", "q_seasonal_anomaly",
    "q_missing_days",
    // frontier trio: distinct-cost staircase, integer gap moments,
    // lag/lead peak compares
    "q_skyline", "q_burstiness", "q_peak_detect",
    // eval/keyness: midrank AUC, decile gains walk, 8dp-ln G² parts
    "q_auc", "q_gains_table", "q_keyness",
    // effect-size tier: pooled-variance algebra, Wilson intervals,
    // k²-bounded pair grids
    "q_cohens_d", "q_wilson_ci", "q_tukey_diffs", "q_lorenz",
    // round-4 ops: composite-block JW doubles, MP3 frame-length byte
    // walk, max-derived synthetic keys, collected p-value rows
    "q_jaro_linkage_composite", "q_mp3_meta", "q_upsert",
    "q_dpe_statistics", "q_url_host_cap",
    // feature-prep encoders: domain-rank index map, shrunk target means
    "q_index_encode", "q_target_encode", "q_hash_encode",
    // round-5: Xing/VBRI average-bitrate byte walk; IVF-candidate kNN
    // vote; feature scalers (percentile cuts, min-max map-back); WoE
    // encoder ln grid; md5 catalog draws + rank map; cell-local
    // label-filtered top-k
    "q_mp3_vbr", "q_minmax_scale", "q_robust_scale", "q_woe_encode",
    "q_neg_sample", "q_hard_negatives",
    // imbalance/uncertainty tier: count-ratio weights, ceil-div explode
    // factors, order-statistic conformal quantiles, midrank ECDF
    "q_class_weights", "q_oversample", "q_conformal",
    "q_quantile_transform",
    // FLAC STREAMINFO packed-field byte walk
    "q_flac_meta",
    // χ² presence-contingency top-k; per-group distinct-sensitive audit
    "q_chi2_select", "q_l_diversity",
    // privacy-triad EMD grid; hypergeometric grid-sum survival test
    "q_t_closeness", "q_logrank",
    // co-occurrence PageRank keywords (zipIndex partition-offset ids —
    // output must be invariant to the physical id assignment)
    "q_textrank",
    // real-decode luminance histogram: exact integer counts per bin
    "q_image_decode",
    // one-pass 2×2 causal cells; domain³ minimax isotonic grid;
    // md5 sign-flip randomization sums; covariate-axis as-of matching
    "q_did", "q_isotonic", "q_perm_test", "q_nn_match",
    // WARC CRLF-header/Content-Length byte walk; RE2 strip chain
    "q_warc_meta", "q_html_extract",
    // inference tier: md5 sign-flip p family through the BH suffix-min
    // window; Lanczos-grid hypergeometric term sums; duration-grid
    // hazard cumsums; month-grid pair signs; 8dp stratum term sums;
    // distinct-score-grid AP; moment-fit EB posteriors; chunk-grid SAX
    // z-cuts; first-occurrence pair joins; md5 inverse-CDF noise
    "q_fdr_bh", "q_fisher_exact", "q_nelson_aalen", "q_kendall_tau",
    "q_ipw_ate", "q_pr_auc", "q_eb_smooth", "q_sax_symbols",
    "q_seq_pairs", "q_dp_laplace",
    // causal/experimentation wave: stratified 8dp term sums, Lanczos
    // pmf grids, KM-segment areas, (28,8)-bounded PH cumsums, broadcast
    // θ/x̄ adjust, design-ratio χ², guarded IPF half-rounds, ustar
    // checksum byte walk
    "q_cmh", "q_binom_sign", "q_rmst", "q_page_hinkley", "q_cuped",
    "q_srm", "q_ipf_rake", "q_tar_meta",
    // crawl-pipeline tier: REAL inflate + CRC verify, group-window
    // robots parse with longest-prefix max_by ties, map-only canon
    // kernels, dual-ranking heap top-k overlap
    "q_gzip_meta", "q_robots_txt", "q_url_canon", "q_mrl_overlap",
    // corpus-statistics wave: bucket-grid first-occurrence cumsums,
    // words-before chunk division, n-scaled cumdev block ranges, ZIP
    // local-header CRC walk
    "q_heaps_law", "q_sent_chunks", "q_hurst", "q_zip_meta",
    // local-DP coin debias; two-sided exact-moment RDD intercepts
    "q_rand_response", "q_rdd_gap",
    // rlike ladder labels; bounded-heap order-statistic ln grid;
    // exploration-bonus argmax with exact-ucb tie join
    "q_license_detect", "q_hill_tail", "q_ucb_arms")

  test("query results are identical under different shuffle partitioning") {
    names.foreach { name =>
      val q = QueryRegistry.byName(name)
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val a = q.run(spark, dir).collect().map(_.toString).toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      val b = q.run(spark, dir).collect().map(_.toString).toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(a === b, s"$name differs across partitionings")
      assert(a.nonEmpty || name == "q_minhash_lsh", s"$name empty")
    }
  }
}
