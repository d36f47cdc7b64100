"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "total_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1}

The set covers every engine subsystem at its most scale-sensitive: full-scan
KNN, multi-query fan-out, two-level top-k, join+agg, window agg, shingle
dedup, MinHash LSH, SimHash, LSH signatures, and the upsert window.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from veri_spark.plans.registry import QUERIES
from veri_spark.session import get_spark

BENCH_QUERIES = [
    "knn_cosine",
    "knn_euclidean",
    "knn_multi_query",
    "knn_group_scored",
    "knn_context_rescore",
    "tpch_q1_pricing_summary",
    "tpch_q3_top_revenue",
    "events_tumbling_window",
    "upsert_latest_version",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_lsh_signature",
    "ann_lsh_bucket_join",
    "ann_ivf_search",
    "text_stats",
    "asof_last_click",
    "events_sliding_window",
    "tpch_q5_regional_revenue",
    "ann_ivf_multi_query",
    "docs_prep_pipeline",
    # round-2 heavyweights: the newest, most join-heavy shapes
    "tpch_q7_volume_shipping",
    "tpch_q17_small_quantity",
    "dedup_simhash_hamming",
    "dedup_minhash_clusters",
    "char_trigram_profile",
    # round-3: PQ scoring + training-pipeline ops
    "ann_pq_adc",
    "decontamination_overlap",
    "sequence_packing",
    # round-4: IVF-PQ end-to-end, held-out LM scoring, containment dedup,
    # estimator audit, time-series densification
    "ann_ivf_pq_search",
    "bigram_lm_scores",
    "dedup_containment",
    "minhash_estimate_error",
    "events_dense_hourly",
    # round-4: corpus-graph kNN join, chunk-grain dedup, PMI collocations,
    # shard-overlap, nearest as-of
    "knn_join_ivf",
    "chunk_dedup_summary",
    "bigram_pmi_top",
    "source_overlap_jaccard",
    "asof_nearest_view",
    # round-4: graph centrality, sparse lexical similarity, MMR re-rank,
    # BM25 retrieval, blocked triplet mining
    "pagerank_step",
    "tfidf_doc_similarity",
    "mmr_rerank",
    "bm25_ranking",
    "hard_example_mining",
    # round-5: converged PageRank loop, real image-header decode,
    # Misra-Gries merge audit, two-stage IVF-PQ + exact re-rank
    "pagerank_converged",
    "multimodal_image_dims",
    "heavy_hitters_merge",
    "ann_ivf_rerank",
    # round-5 batch 2: graph-structure audit, packed binary Hamming
    # retrieval, sketch audit, skip-gram mining, IVF-blocked kNN classify.
    "graph_degree_assortativity",
    "embedding_binary_hamming",
    "countmin_audit",
    "skipgram_pairs_top",
    "knn_label_accuracy",
    # round-6 (verdict task 4): the deliberately super-linear wedge-join
    # audits are now TRACKED instead of excluded — their runtime is exactly
    # what most needs a number — plus the DOULION sampled estimate and the
    # orientation fan-out audit that price their mitigations, and the two
    # most expensive un-benched round-5 queries. Since round 10 all three
    # exact-audit entries (census, doulion, common_neighbors) bench only
    # on EVEN rounds (EXACT_AUDIT_EVERY_OTHER_ROUND below).
    "graph_triangle_census",
    "graph_common_neighbors",
    "graph_triangle_doulion",
    "graph_orientation_fanout",
    "label_noise_candidates",
    "semantic_dedup_threshold_sweep",
    # round-7 (verdict task 4): the round-6 iterative/expensive additions
    # now tracked — checkpointed peel/BFS loops, the LSH banding planner,
    # the Z-order layout audit — plus the round-7 work: the capped
    # common-neighbors mitigation (capped-ONLY since round 8; its
    # exact-agreement twin graph_common_neighbors_cap_audit pays the full
    # uncapped wedge join and is deliberately local-gate-only, not
    # benched), the distributed-rank rewrites, and one representative of
    # the K10 group-reduce family. Since round 8 the graph family shares
    # one session-cached edge frame and one exact triangle count
    # (plans/graph.py _SHARED) — the first graph query in the sweep pays
    # the build, the rest reuse it, which is the production deployment
    # shape (SINGLE_RUN keeps those timings honest: a median-of-3 would
    # mostly measure the warm cache).
    "graph_kcore_peel",
    "graph_bfs_hops",
    "lsh_param_planner",
    "zorder_multicol_audit",
    "data_skipping_audit",
    "sorted_neighborhood_pairs",
    "graph_common_neighbors_capped",
    # round-9 (verdict task 1): the third capped ranker — rides the same
    # session-shared one-pass wedge aggregate as the Jaccard and RA
    # rankers. Listed AFTER the capped-Jaccard query so the build
    # attribution stays on the historical payer; this entry's warm cost
    # is a 20-row checkpoint read.
    "graph_adamic_adar_capped",
    "knn_group_reduce_mean",
    # round-7 batch 3: the prefix-scan operator's corpus-scale users (KS
    # drift CDFs, ABC revenue cumsum), the duplicate-coverage shingle join,
    # the co-purchase connected-components fixpoint loop, the blocked FS
    # linkage join, and the hashed domain-affinity scan.
    "ks_value_drift",
    "parts_abc_pareto_classes",
    "dup_ngram_coverage",
    "graph_connected_components",
    "record_linkage_fs_top_pairs",
    "domain_affinity_hashdot",
    "knn_reciprocal_pairs",
    "kmeans_pp_farthest_seeds",
    "winnowing_shared_fingerprints",
    "consistent_hash_ring_balance",
    "neyman_allocation_plan",
    "roaring_bitmap_sizing_audit",
    "rendezvous_hash_balance",
    "lang_simpson_diversity_by_source",
    "poisson_bootstrap_ci",
    "calibration_reliability_bins",
    # round-8: the evaluation/statistics batch (AUC via distributed
    # prefix-scan midranks, Murphy decomposition, KM survival, QQ grid,
    # Theil-Sen pairwise median, Heaps first-occurrence fit, KMV set
    # intersection, SpotSigs inverted-index dedup, SCD-2 intervals)
    "score_auc_mann_whitney",
    "brier_score_decomposition",
    "kaplan_meier_time_to_purchase",
    "value_qq_normal_audit",
    "theil_sen_daily_trend",
    "heaps_law_fit",
    "kmv_intersection_estimate",
    "spotsigs_neardup",
    "scd2_intervals_from_events",
    "hourly_seasonal_naive_mase",
    "markov_entropy_rate",
    "orders_little_law_audit",
    "user_lorenz_curve",
    # round-8 batch 2: trend significance, rank stability, symmetric
    # drift, the second capped link predictor (shares the session graph
    # frames with the Jaccard one), and the AP retrieval metric
    "mann_kendall_daily_trend",
    "kendall_tau_part_demand",
    "js_divergence_event_drift",
    "graph_resource_allocation_capped",
    "ann_map_audit",
    # round-8 batch 3: sequential changepoint (integer PH recursion),
    # family-wise-error control over segment tests, IVF geometry audit
    "events_page_hinkley",
    "holm_weekday_conversion_tests",
    "ivf_silhouette_audit",
    # round-8 batch 4: integrated-CDF drift (prefix-scan CvM), robust
    # location drift, association significance on the basket pairs
    "cvm_value_drift",
    "value_trimmed_winsorized_drift",
    "copurchase_lift_chi2",
    # round-8 batch 5: storage-encoding sizing, CV-fold label balance,
    # extreme-value tail index
    "columnar_encoding_audit",
    "kfold_label_balance_audit",
    "doc_length_hill_tail",
    # round-8 batch 6: FDR control (the step-up contrast to Holm),
    # classical trend/seasonal decomposition, SPC p-chart
    "bh_weekday_conversion_fdr",
    "daily_seasonal_decomposition",
    "ship_late_p_chart",
    # round-8 batch 7: ANN-feasibility geometry, capture-recapture
    # cardinality
    "knn_distance_concentration",
    "capture_recapture_distinct",
    # round-9: nonparametric statistics (rank midranks via the prefix
    # scan, DECIMAL moment folds), Gopher/C4-style corpus-quality gates
    # (explode-to-bigram/word grain), ordered funnel + retention
    # cohorts, the AMS F2 sketch audit, the cosine-vs-dot agreement
    # readout, and the degree-product link-prediction baseline
    "spearman_qty_price",
    "kruskal_wallis_value_by_type",
    "runs_test_daily_revenue",
    "acf_daily_revenue",
    "ams_f2_sketch_audit",
    "gopher_repetition_gate",
    "gopher_quality_flags",
    "doc_type_token_ratio",
    "doc_word_entropy_by_source",
    "funnel_view_click_purchase",
    "weekly_retention_cohorts",
    "cosine_dot_rank_agreement",
    "graph_preferential_attachment",
    # round-9 batch 2: paired/omnibus rule tests, ordinal effect size,
    # the median test, and the lag-1 autocorrelation single number
    "mcnemar_rule_agreement",
    "cochran_q_rules",
    "cliffs_delta_purchase_view",
    "mood_median_test_by_type",
    "durbin_watson_daily_revenue",
    # round-9 batch 3: paired and blocked rank tests, spread equality,
    # seasonal-forecast value
    "wilcoxon_signed_rank_yoy",
    "friedman_weekday_revenue",
    "levene_value_by_type",
    "theil_u2_daily_forecast",
    # round-10: the effect-size/association panel (plans/effects.py) —
    # contingency effect sizes, standardized mean difference, 2x2 odds
    # panel, pair-concordance family on the bounded cell join,
    # chance-corrected rater agreement, normalized MI, and the 1-df
    # ordered-trend test
    "cramers_v_type_weekday",
    "pearson_residuals_type_weekday",
    "cohens_d_purchase_view",
    "weekend_purchase_effect",
    "ordinal_association_qty_line",
    "cohens_kappa_rules",
    "fleiss_kappa_rules",
    "matthews_corr_lang_id",
    "uncertainty_coeff_lang_source",
    "cochran_armitage_weekday_trend",
    # round-10 batch 2: training-pipeline planning tables — curriculum
    # staging and the gains deciles ride the distributed global rank,
    # the threshold sweep and epoch planner are broadcast fan-outs
    "curriculum_quality_buckets",
    "quality_threshold_sweep",
    "epochs_per_source_plan",
    "cumulative_gains_deciles",
    # round-10 batch 3: prefix-scan AP, experiment-calibration CUPED,
    # the robust HL location estimate, top-weighted rank overlap, and
    # the deliberately-quadratic TwoNN intrinsic-dimension audit
    "average_precision_value_score",
    "cuped_variance_reduction",
    "hodges_lehmann_quantity",
    "rbo_cosine_vs_dot",
    "twonn_intrinsic_dimension",
    # round-10 batch 4: exact micro-int Lloyd training, Lee-et-al maximal
    # duplicated spans, the parametric mean-test panel (Welch/ANOVA/
    # randomization), distribution-shape and drift distances
    # (JB, GoF, W1, Hellinger/TV), the calibration scalar, bipartite
    # HITS, the Gini stump, and the readability panel
    "kmeans_lloyd_converged",
    "dup_span_extents",
    "welch_ttest_purchase_view",
    "oneway_anova_value_by_type",
    "randomization_test_weekend_value",
    "jarque_bera_value",
    "chi2_goodness_weekday_orders",
    "wasserstein_value_drift",
    "hellinger_tv_event_drift",
    "expected_calibration_error",
    "hits_authorities_bipartite",
    "decision_stump_value_purchase",
    "readability_flesch_by_source",
    # round-10 batch 5: the post-hoc / homogeneity / reliability trio
    "tukey_hsd_value_by_type",
    "bartlett_test_value_by_type",
    "cronbachs_alpha_rules",
    "nelson_aalen_time_to_purchase",
    "g_test_type_weekday",
    "chao1_vocab_richness",
    "lang_shannon_evenness_by_source",
    # round-10 batch 7: cascade-model ranking audit, margin-free rule
    # association, proportion effect/interval panel, stratified MH OR
    "ann_err_audit",
    "yule_q_rules",
    "cohens_h_weekend_conversion",
    "mantel_haenszel_weekend_or",
    "wilson_ci_conversion",
    # round-11: trained-vs-seed IVF recall (2 Lloyd iterations + 2x the
    # full probe path)
    "ann_ivf_recall_trained",
    # round-11 batch 1: classical-test completions (plans/stats_tests.py)
    "fisher_exact_weekend_purchase",
    "dagostino_k2_value",
    "anderson_darling_weekend_value",
    "ansari_bradley_weekend_value",
    "kendalls_w_weekday_revenue",
    "krippendorff_alpha_rules",
    "quade_test_weekday_revenue",
    # round-11 batch 2: time-series (plans/temporal.py)
    "pacf_daily_revenue",
    "ljung_box_daily_revenue",
    "binseg_changepoint_daily",
    "hurst_rs_hourly",
    "spectral_peak_hourly",
    "hourly_seasonality_strength",
    "permutation_entropy_hourly",
    # round-11 batch 3: classifier-evaluation panel (plans/mleval.py)
    "f1_threshold_sweep",
    "youden_j_threshold",
    "ks_class_separation",
    "expected_cost_threshold",
    "balanced_accuracy_lang_id",
    "logloss_by_calibration_bin",
    # round-11 batch 4: graph readouts, priority sampling, CDC dedup
    "graph_rich_club_coefficient",
    "graph_degree_powerlaw_alpha",
    "priority_sample_estimator",
    "cdc_chunk_dedup",
    # round-11 batch 5: stylometry/diversity, exact pair moments,
    # ANOVA effect sizes
    "burrows_delta_sources",
    "gries_dp_dispersion",
    "mattr_type_token",
    "embedding_pairwise_cosine_moments",
    "anova_effect_sizes",
    # round-11 batch 6: inequality panel + data valuation
    "theil_index_decomposition",
    "atkinson_index_doclen",
    "knn_shapley_data_values",
    # round-11 batch 7: survival test, modern dependence, joint
    # location-scale, seasonal trend, vocabulary mass
    "logrank_test_ab_arms",
    "chatterjee_xi_qty_price",
    "cucconi_test_weekend_value",
    "seasonal_mann_kendall_daily",
    "good_turing_vocab",
    # round-11 batch 8: sequential testing, blocked causal estimate,
    # kernel two-sample drift, privacy-triplet completion
    "sprt_daily_conversion",
    "stratified_ate_weekend_value",
    "mmd_label_groups",
    "t_closeness_audit",
    # round-11 batch 9: reweighting go/no-go, distribution-free
    # intervals, quantile-loss forecast profile
    "importance_weight_ess",
    "split_conformal_value_interval",
    "pinball_loss_hourly",
    # round-12 batch 1: incremental delta-vs-corpus dedup — builds the
    # persisted signature index in a throwaway store then dedups the
    # hash shard against it (parquet writes + delta-only signatures)
    "dedup_incremental_delta",
    # round-12: trained IVF-PQ end-to-end (coarse Lloyd x2 + one PQ Lloyd
    # round + two full serving replays) — SF-invariant training/compile
    # fixed cost dominates. Round 14 (r13 verdict task 2): the training
    # replay benches on EVEN rounds only (EXACT_AUDIT_EVERY_OTHER_ROUND);
    # the seed-codebook SERVING path below is the every-round number.
    "ann_ivfpq_trained_audit",
    "ann_ivfpq_seed_serving",
    # round-12 batch A/B: simhash incremental path + index-skew audit,
    # robust two-sample (Brunner-Munzel), ordered-trend (Jonckheere-
    # Terpstra, Page), outlier/randomness day-spine tests
    "dedup_incremental_simhash",
    "dedup_index_band_skew",
    "brunner_munzel_weekend_value",
    "jonckheere_terpstra_priority_trend",
    "page_trend_weekday_revenue",
    "grubbs_outlier_daily_revenue",
    "bartels_rank_daily_revenue",
    # round-12 batch C: stationarity pair (KPSS + Dickey-Fuller),
    # regularity (sample entropy), regression influence (Cook's D)
    "kpss_daily_revenue",
    "dickey_fuller_daily_revenue",
    "sample_entropy_hourly",
    "cooks_distance_daily",
    # round-12 batch D: community/structure metrics on the shared
    # co-purchase frames (modularity, hub clustering, 2-round LPA)
    "graph_modularity_partition",
    "graph_local_clustering_top",
    "graph_label_propagation",
    # round-12 batch E/F: KN-smoothed bigram LM, vocabulary repeat-rate,
    # clustered ratio-metric CI, DiD, experiment power planning
    "kneser_ney_bigram_scores",
    "yules_k_by_source",
    "delta_method_ratio_ci",
    "difference_in_differences_priority",
    "ab_power_mde",
    "hoover_index_customer_spend",
    "palma_ratio_customer_spend",
    "spectral_entropy_hourly",
    # round-12 batch G: dependence-robust FDR, OR-homogeneity,
    # walk-counting centrality, phrase keyword extraction
    "by_weekday_conversion_fdr",
    "breslow_day_weekend_or",
    "graph_katz_centrality",
    "rake_keyword_phrases",
    "weibull_shape_time_to_purchase",
    # round-12 batch H: rank changepoint + sign trend + oscillation
    "pettitt_changepoint_daily",
    "cox_stuart_trend_daily",
    "turning_points_daily",
    # round-13: SemDeDup cell-blocked semantic dedup (verdict task 5),
    # energy-distance two-sample, Conover squared-ranks scale,
    # Hoeffding's D independence on the day spine
    "semantic_dedup_semdedup",
    "energy_distance_weekend_value",
    "conover_squared_ranks_scale",
    "hoeffding_d_daily",
    "multimodal_audio_wav_meta",
    "multimodal_video_mp4_meta",
    # round-13: the persisted incremental IVF serving path under the gate
    "ann_persisted_incremental_search",
    "distance_correlation_daily",
    "siegel_repeated_median_trend",
    # round-14: the composed nine-stage curation pipeline (r13 verdict
    # task 4) — one corpus scan, each tier consumes the prior tier's
    # checkpointed survivors
    "curation_pipeline_ledger",
    # round-14: the damped maintenance loop (stamp + A5 skips) serving
    # from the persisted index
    "ann_damped_refresh_serving",
    # round-14 stats batch: combined location+scale (Lepage), the BWS
    # tail-weighted rank test, Dunn's KW post-hoc, O'Brien's
    # transformed-ANOVA scale test, Goodman-Kruskal lambda
    "lepage_test_weekend_value",
    "bws_test_weekend_value",
    "dunn_posthoc_value_by_type",
    "obrien_scale_value_by_type",
    "goodman_kruskal_lambda_lang_source",
    # round-14 batch 2: Kuiper CDF drift (the KS machinery's
    # rotation-invariant sibling), paired sign test
    "kuiper_value_drift",
    "sign_test_yoy_revenue",
]

# m^1.5 offline audits and iterative multi-job loops (5-30 s each at
# sf0.1). Round-9 (verdict task 2): these now get TWO timed runs instead
# of one — every prior heavy-entry spread was [x, x], which made
# round-over-round graph regressions unadjudicable (the round-7 doulion
# "regression" was a phantom; round-8's pagerank_converged flagged the
# same gap). The REPORTED number stays the FIRST (cold) run — for the
# shared-frame graph family the first consumer pays the session build,
# which is the attribution every earlier round used, so medians remain
# comparable — and the warm second run lands in the spread, making
# min != max and showing the shared-frame effect explicitly.
HEAVY_TWO_RUN = {
    "graph_triangle_census",
    "graph_common_neighbors",
    "graph_triangle_doulion",
    "graph_common_neighbors_capped",
    "graph_kcore_peel",
    "graph_bfs_hops",
    "lsh_param_planner",
    "zorder_multicol_audit",
    "graph_connected_components",
    # 32x row-explode map+reduce: deterministic single-shape job, low
    # variance — two runs record the variance cheaply
    "poisson_bootstrap_ci",
    # round-8: the distributed-rank + exploded-corpus first-occurrence
    # fit is the one multi-job entry of the evaluation batch
    "heaps_law_fit",
    # round-8 batch 2 / round-9: the capped rankers now share ONE wedge
    # exchange (plans/graph._capped_ranker_top20s); whichever runs first
    # pays the build, the others read the 60-row checkpoint
    "graph_resource_allocation_capped",
    "graph_adamic_adar_capped",
    # round-10: 3 update iterations + final assignment = 7 jobs over the
    # persisted micro corpus (exact-integer Lloyd loop)
    "kmeans_lloyd_converged",
    # round-11: 2 Lloyd iterations + 12 bounded top-10s — a multi-job
    # iterative loop like the above
    "ann_ivf_recall_trained",
    # round-12: store writes (corpus parquet + signature index) dominate;
    # median-of-3 would triple the disk churn for no extra signal
    "dedup_incremental_delta",
    # round-12: 3 training loops + 2 serving replays — multi-job iterative
    "ann_ivfpq_trained_audit",
    # round-14: the seed-serving half of the same audit — multi-job too
    "ann_ivfpq_seed_serving",
    # round-14: nine checkpointed tiers + per-stage stats aggs — the
    # composed pipeline is inherently multi-job; a median-of-3 would
    # triple the checkpoint churn for no extra signal
    "curation_pipeline_ledger",
    # round-14: corpus write + full build on run 1; runs 2+ measure the
    # damped skips (cold-run attribution keeps the build visible)
    "ann_damped_refresh_serving",
    # round-12: store writes like its minhash sibling
    "dedup_incremental_simhash",
    # round-12: share the session graph frames (first run pays the edge
    # build — same attribution convention as the rest of the family) or
    # are explode-heavy corpus passes where a median-of-3 only re-prices
    # the same scan
    "graph_modularity_partition",
    "graph_local_clustering_top",
    "graph_label_propagation",
    "graph_katz_centrality",
    "kneser_ney_bigram_scores",
    "rake_keyword_phrases",
    # round-15: first-in-sweep payers of the four NEW session-shared
    # frames (capped jaccard pairs, minhash candidate set, knn k=3
    # edges, cell-labeled pairs). Reporting their COLD first run keeps
    # the shared build visible in the reported number instead of the
    # median hiding it in run 1 — the exact attribution convention the
    # graph family established (see the block comment above). The
    # follower queries stay median-of-3: they replay checkpoints in any
    # order.
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "knn_join_ivf",
    "hard_example_mining",
}

# Round-9 (verdict task 6): the exact-triangle audits exist to price the
# DOULION mitigation; the exact wedge-join build they share is the graph
# family's second-biggest bench cost but is pure offline-audit weight —
# the strict local gate still runs both queries at BOTH SFs every round.
# Bench them on every OTHER round. Skipped names are printed in the JSON
# line as "deferred_audits" so a smaller total is never misread as
# coverage loss. Round 10 (round-9 judge finding 2): the exact-Jaccard
# truth side joins the same cadence — graph_common_neighbors pays the
# UNCAPPED wedge exchange (the bench's #2 entry, 37 s on the driver box)
# to produce a 20-row audit head whose mitigation now has THREE capped
# production rankers plus a synthetic-skew binding proof
# (tests/test_round9_graph_cap.py); its strict-gate rows still run at
# both SFs every round.
EXACT_AUDIT_EVERY_OTHER_ROUND = [
    "graph_triangle_census",
    "graph_triangle_doulion",
    "graph_common_neighbors",
    # round-14 (r13 verdict task 2): the 2-generation codebook TRAINING
    # comparison is offline-audit weight like the wedge census — its
    # serving path benches every round as ann_ivfpq_seed_serving
    "ann_ivfpq_trained_audit",
]

# Round 12 (round-11 verdict task 3): the capped-trio COLD cache build is
# the bench's largest and most volatile entry (21.5-65.1 s spread across
# same-code runs at r11 — pure columnar-cache-write volatility; the plan
# shape itself is proven best-of-four with executed-run evidence, variant
# space closed r9-r11, see _capped_ranker_top20s). It joins the exact
# censuses' every-other-round cadence: on ODD rounds the cold payer is
# listed in deferred_audits and its cache is pre-built UNTIMED before the
# sweep, so the trio's warm consumers (graph_adamic_adar_capped etc.)
# keep their ~1 s session-cache attribution instead of silently
# inheriting the cold build. Correctness gates are unaffected — the
# strict local gate still runs all trio queries at both SFs every round.
TRIO_COLD_EVERY_OTHER_ROUND = [
    "graph_common_neighbors_capped",
]


# Round 15 (r14 verdict task 2): the compact stdout line sheds entries
# past its 1900-char budget, and by round 14 that meant 221 of 279
# queries were invisible to the driver — including cheap-but-adjudicated
# entries like asof_last_click, which then surfaced in PERF as phantom
# "dropped" queries. The line now protects a PINNED HEADLINE SET — the
# 59 queries the round-14 driver artifact carried (so round-over-round
# PERF always has a stable common set) plus the paths the optimization
# rounds touched — and sheds ONLY from the remainder (still
# cheapest-first); headline entries are shed last, and only if the
# pinned set alone overflows the budget. Every number always lands in
# BENCH_local.json regardless.
HEADLINE_QUERIES = {
    # the 59 entries of BENCH_r14.json's driver-captured line
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "ann_lsh_bucket_join",
    "ann_ivf_multi_query", "dedup_minhash_clusters",
    "decontamination_overlap", "dedup_containment",
    "minhash_estimate_error", "knn_join_ivf", "hard_example_mining",
    "pagerank_converged", "knn_label_accuracy", "graph_triangle_census",
    "graph_common_neighbors", "graph_triangle_doulion",
    "graph_orientation_fanout", "label_noise_candidates",
    "graph_kcore_peel", "graph_bfs_hops", "lsh_param_planner",
    "zorder_multicol_audit", "data_skipping_audit",
    "graph_common_neighbors_capped", "dup_ngram_coverage",
    "graph_connected_components", "knn_reciprocal_pairs",
    "winnowing_shared_fingerprints", "poisson_bootstrap_ci",
    "heaps_law_fit", "orders_little_law_audit", "copurchase_lift_chi2",
    "spearman_qty_price", "twonn_intrinsic_dimension",
    "kmeans_lloyd_converged", "dup_span_extents",
    "randomization_test_weekend_value", "hits_authorities_bipartite",
    "ann_ivf_recall_trained", "anderson_darling_weekend_value",
    "binseg_changepoint_daily", "cdc_chunk_dedup",
    "knn_shapley_data_values", "chatterjee_xi_qty_price",
    "dedup_incremental_delta", "ann_ivfpq_trained_audit",
    "dedup_incremental_simhash", "dedup_index_band_skew",
    "jonckheere_terpstra_priority_trend", "kpss_daily_revenue",
    "graph_label_propagation", "kneser_ney_bigram_scores",
    "graph_katz_centrality", "rake_keyword_phrases",
    "semantic_dedup_semdedup", "ann_persisted_incremental_search",
    "distance_correlation_daily", "curation_pipeline_ledger",
    "ann_damped_refresh_serving",
    # the round-14 "phantom dropped" set — cheap entries the driver's
    # PERF flagged when cost-only shedding hid them
    "asof_last_click", "ann_err_audit", "ann_map_audit",
    "graph_local_clustering_top", "ivf_silhouette_audit",
    "knn_distance_concentration", "source_overlap_jaccard",
    "split_conformal_value_interval",
}


def _current_round() -> int:
    """Round number for the audit-deferral parity. Prefers the explicit
    SPARK_GRAFT_ROUND env var; else 1 + the highest GIT-TRACKED
    BENCH_r*.json (the driver COMMITS r{N} only at the end of round N,
    so throughout round N the tracked max is N-1 — even after the
    driver's own first bench run has already WRITTEN BENCH_r{N}.json to
    the working tree). Round 15 (r14 verdict task 2): the previous
    glob-the-working-tree rule made the driver's second run in the same
    round (the low-core scaling pass) compute round N+1, flip the
    audit-deferral parity, and silently defer the five heaviest audits —
    corrupting exactly the scaling comparison it was running.
    ``git ls-files`` sees only committed state, so every run inside one
    round computes the same round and the same deferral set. The
    working-tree glob remains as the no-git fallback, and the computed
    round is logged into the JSON ("bench_round") either way so any
    drift is visible in the artifact itself."""
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env and env.isdigit():
        return int(env)
    import glob
    import re
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    names: list[str] = []
    try:
        out = subprocess.run(
            ["git", "-C", here, "ls-files", "BENCH_r*.json"],
            capture_output=True, text=True, timeout=30,
        )
        if out.returncode == 0:
            names = out.stdout.split()
    except Exception:
        names = []
    if not names:
        names = glob.glob(os.path.join(here, "BENCH_r*.json"))
    rounds = [
        int(m.group(1))
        for p in names
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    return (max(rounds) if rounds else 0) + 1


def _shed_to_budget(
    compact: dict, timings: dict, budget: int = 1950
) -> None:
    """Shrink the compact stdout line to ``budget`` chars in place.

    The driver keeps only the LAST 2000 chars of output; if the growing
    query set pushes the line past that, shed queries from stdout (every
    number stays in BENCH_local.json) and count how many in "omitted".
    Round 15 (r14 verdict task 2): shed NON-HEADLINE entries first (see
    HEADLINE_QUERIES), cheapest-first within each class, so the
    driver-adjudicated set stays visible every round; headline entries go
    only if the pinned set alone overflows the budget. Budget is 1950
    (was 1900): this line is the final stdout write (only "\\n" follows),
    so 50 chars of slack suffice and the extra 50 keep ~2 more headline
    entries visible."""

    def _shed_order(k: str):
        return (k in HEADLINE_QUERIES, timings[k], k)

    while (
        len(json.dumps(compact, separators=(",", ":"))) > budget
        and compact["queries"]
    ):
        cheapest = min(compact["queries"], key=_shed_order)
        del compact["queries"][cheapest]
        compact["omitted"] = compact.get("omitted", 0) + 1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("veri-bench")

    # warm the JVM/codegen path on the tiny SF so first-query JIT cost does
    # not land on the measured numbers
    QUERIES["knn_euclidean"](spark, "/root/testdata/sf0.001").collect()

    # fixed synthetic probe, independent of any query code: exposes machine
    # drift across rounds (BENCH_r01 vs r02 differed ~1.8x on identical
    # code purely from host speed). Compare query times ACROSS rounds only
    # after normalizing by calib_sec.
    t0 = time.time()
    spark.range(500_000_000).selectExpr("sum(id * 2 + 1)").collect()
    calib = round(time.time() - t0, 3)

    # round-13 (r12 verdict task 3): the CPU probe above demonstrably does
    # not track I/O-bound sweep shifts (two same-HEAD r12 runs: a 68% calib
    # swing moved the total 3%, while the driver box ran the probe 23%
    # FASTER yet I/O-heavy queries 79% slower). This probe is shaped like
    # the sweep's other half: a 64-way shuffle plus a parquet write and
    # read-back of a fixed 20M-row frame on the same disk the queries use.
    # Round-over-round regression adjudication should cite BOTH numbers.
    import shutil
    import tempfile

    io_dir = tempfile.mkdtemp(prefix="veri_calib_io_")
    t0 = time.time()
    spark.range(20_000_000).repartition(64, "id").write.mode(
        "overwrite"
    ).parquet(io_dir + "/probe")
    spark.read.parquet(io_dir + "/probe").selectExpr("sum(id)").collect()
    calib_io = round(time.time() - t0, 3)
    shutil.rmtree(io_dir, ignore_errors=True)

    # median of 3 runs per query: a single GC / compaction hiccup on one
    # run (BENCH_r03's 15.9 s dedup_minhash_lsh outlier, 4.4 s on re-run)
    # cannot dominate a round verdict. Spread (min/max) is reported so a
    # noisy median is visible too. Heavy entries get 2 runs with cold-run
    # attribution (see HEAVY_TWO_RUN).
    rnd = _current_round()
    deferred = (
        []
        if rnd % 2 == 0
        else list(EXACT_AUDIT_EVERY_OTHER_ROUND)
        + list(TRIO_COLD_EVERY_OTHER_ROUND)
    )
    # pre-pay the deferred trio cold build untimed so the warm consumers
    # later in the sweep keep their ~1 s attribution (the 60-row literal
    # session frame survives the per-query clearCache)
    for name in TRIO_COLD_EVERY_OTHER_ROUND:
        if name in deferred:
            QUERIES[name](spark, sf_dir).collect()
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in BENCH_QUERIES:
        if name in deferred:
            continue
        # free the previous query's persisted blocks (plan builders pin
        # small reused intermediates) so 68 queries in one session don't
        # accumulate storage memory; kept BETWEEN queries, not between the
        # 3 timed runs, so medians stay comparable with earlier rounds
        spark.catalog.clearCache()
        runs = []
        for _ in range(2 if name in HEAVY_TWO_RUN else 3):
            t0 = time.time()
            QUERIES[name](spark, sf_dir).collect()
            runs.append(round(time.time() - t0, 3))
        timings[name] = runs[0] if name in HEAVY_TWO_RUN else sorted(runs)[1]
        spread[name] = [min(runs), max(runs)]

    total = round(sum(timings.values()), 3)
    # ONE compact line for the driver (BENCH_r04 was lost to a null parse:
    # the per-query spread grew the line past the driver's tail-capture
    # window). Medians only on stdout; spread + calibration go to a side
    # file the judge can read from the repo.
    # stdout values at 2dp: the driver captures only the LAST 2000 chars of
    # stdout, and 60 queries at full precision leave little margin
    compact = {
        "metric": "total_sec",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": sf,
    }
    # round-11 (round-10 verdict task 5): bench_round + calib_sec ride the
    # compact stdout line UNCONDITIONALLY so the driver-captured artifact
    # is self-describing on even rounds too (previously only emitted when
    # audits were deferred); SPARK_GRAFT_ROUND stays authoritative
    compact["bench_round"] = rnd
    compact["calib_sec"] = calib
    compact["calib_io_sec"] = calib_io
    # round 15 (r14 verdict task 8): the even/odd audit cadence makes raw
    # totals incomparable across adjacent rounds; even_only_sec is the
    # timed cost of the cadence-deferred entries (0.0 on odd rounds), so
    # a total-seconds comparison can be cadence-adjusted from the
    # artifact alone: comparable_total = value - even_only_sec.
    even_only = set(EXACT_AUDIT_EVERY_OTHER_ROUND) | set(
        TRIO_COLD_EVERY_OTHER_ROUND
    )
    compact["even_only_sec"] = round(
        sum(v for k, v in timings.items() if k in even_only), 3
    )
    if deferred:
        compact["deferred_audits"] = deferred
    _shed_to_budget(compact, timings)
    detail = dict(
        {k: v for k, v in compact.items() if k != "omitted"},
        queries=timings, spread=spread, calib_sec=calib,
        calib_io_sec=calib_io, bench_round=rnd,
    )
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_local.json"), "w") as f:
        json.dump(detail, f, indent=1)
        f.write("\n")
    print(json.dumps(compact, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
