"""Benchmark harness.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N}

--scaling: run the flagship pipeline in FRESH taskset-pinned
subprocesses at N and 4N CPUs (default 2→8, GRAFT_SCALE_N) on the same
input and report both throughputs + scaling efficiency + a host
pure-CPU ceiling calibration (the sandbox substitute for the
N-vs-4N-node cluster criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# Headline benchmark queries (a representative slice of the registry —
# flagship covers parse→enrich→route→aggregate end-to-end).
BENCH_QUERIES = [
    "masked_counts",
    "masked_hour_rollup",
    "anomaly_hour_levels",
    "sink_counts",
    "events_hourly",
    "events_top_users",
    "events_type_quantiles",
    "doc_dedup_hash",
    "doc_minhash_pairs",
    "doc_textstats",
    "knn_cosine",
    "customer_nation_counts",
    "lineitem_pricing",
    # round-2 operators
    "asof_order_stats",
    "heavy_hitter_tokens",
    "search_logs",
]

# Round-3 operators, timed separately so the headline "value" stays
# comparable across rounds (BENCH_QUERIES is frozen; these report in
# "queries" + "value_extras"). knn_ivf exercises the persisted
# partition-pruned ANN store (first run builds it; cached after).
BENCH_EXTRA = [
    # session-9 engine surfaces
    "skew_hybrid_join_revenue",
    "domain_scc",
    "littles_law_audit",
    "subsequence_pair_support",
    "weibull_gap_fit",
    "mahalanobis_outliers",
    "asof_order_stats_partitioned",
    "gz_level_counts",
    "event_gaps",
    "hourly_top_templates",
    "doc_repetition",
    "doc_simhash_pairs",
    "doc_lm_score",
    "knn_ivf",
    "pii_redacted_lines",
    "docs_above_lang_median",
    "dataset_splits",
    "html_extracted_text",
    "domain_boilerplate",
    "bm25_search",
    "bloom_semijoin_revenue",
    "doc_dedup_normalized",
    "nation_revenue",
    "knn_ivf_q8",
    # round-3 (cont.) operators
    "shared_ngram_clusters",
    "events_latest_per_user",
    "hourly_active_users",
    "doc_chunks",
    "events_zscore_norm",
    "domain_pagerank",
    # round-3 session-3 operators
    "kmeans_assign",
    "grouped_value_quantiles",
    "events_iqr_outliers",
    "user_customer_coverage",
    "incremental_hourly",
    "event_type_markov",
    "user_streaks",
    "source_token_entropy",
    "top_events_diversified",
    # round-3 session-4 operators
    "bigram_pmi",
    "corpus_diff",
    "domain_hits",
    "oov_ratio_by_source",
    "events_range_sorted_sample",
    "top_unshipped_orders",
    "purchase_attribution",
    "data_quality_checks",
    "warc_lang_stats",
    "embedding_gram",
    "late_event_audit",
    "customer_coverage_days",
    # round-3 session-5 operators
    "promo_revenue_share",
    "trade_volume_pairs",
    "idle_rich_customers",
    "trimmed_mean_by_type",
    "equi_depth_price_hist",
    "hourly_acf",
    "zonemap_window_counts",
    "prefix_jaccard_join",
    "upsert_corrections",
    "gopher_rules",
    "embedding_top_pc",
    "slo_burn_alerts",
    "funnel_3step_strict",
    "order_backlog_daily",
    "basket_part_pairs",
    "km_signup_purchase",
    "domain_triangles",
    "domain_bfs_hops",
    "event_type_trigrams",
    "part_best_supplier",
    "bloom_trace_lookup",
    "type_cooccurrence",
    "events_time_window_sum",
    "analyze_events",
    "bpe_token_counts",
    "page_kcore",
    "basket_size_hist",
    # round-3 session-6 operators
    "custdist",
    "small_qty_brand_revenue",
    "late_solo_suppliers",
    "dense_hourly",
    "user_event_paths",
    "events_percent_rank",
    "lineitem_measures_long",
    "user_twap",
    "churned_users",
    "line_numeric_tokens",
    "quiet_orders_by_priority",
    "knn_cosine_filtered",
    "user_top_type",
    "rapid_reorder_pairs",
    "sliding_distinct_users",
    "users_all_types",
    "user_value_balance",
    "customer_revenue_pareto",
    "template_exemplars",
    "weekly_revenue",
    "reorder_interval_median",
    "user_type_scd2",
    "source_langs_str",
    "domain_weighted_paths",
    "approx_common_users",
    # round-3 session-7 additions (stats/ML-training batch)
    "kmeans_lloyd",
    "nb_train_apply",
    "freq_triples",
    "recsys_hitrate",
    "bootstrap_mean_ci",
    "pit_features",
    "ship_latency_percentiles",
    "order_total_reconciliation",
    "user_active_seconds",
    "kendall_tau_qty_discount",
    "lookalike_scores",
    "hourly_interpolated",
    # round-3 session-8 additions (tests/robust/transport/engine batch)
    "welch_ttest_types",
    "kruskal_wallis_type",
    "isotonic_hourly_revenue",
    "zipf_token_slope",
    "qty_qn_scale",
    "shapley_attribution",
    "domain_lpa_communities",
    "qty_energy_distance",
    "qty_wasserstein",
    "greedy_token_cover",
    "cms_token_check",
    "embedding_geomedian",
    "bucketed_join_revenue",
    "source_readability",
    "sprt_arm_test",
    "domain_harmonic_centrality",
    "domain_influence_spread",
    "token_budget_selection",
    "mcnemar_predictors",
    "page_cusum_alarm",
    "stratified_allocation_split",
    "csv_roundtrip_counts",
    "iv_wald_estimate",
    "dedup_survivorship",
    "jsonl_roundtrip_counts",
    "top_phrase_bigram",
    "transition_latency_median",
    "peak_concurrent_users",
    "type_skew_kurtosis",
    "anomaly_ensemble_hours",
    "markov_attribution",
    "viterbi_volume_states",
    "langid_mcc",
    "mmr_diversified_selection",
    "nelson_aalen_hazard",
    "walkforward_model_selection",
    "segment_migration_matrix",
    "nation_shift_share",
    "huber_location_by_type",
    "hourly_type_diversity",
    "price_index_halves",
    "scan_hotspot_dow_hour",
    "local_supplier_volume",
    "q6_revenue_filter",
    "parts_supplier_breadth",
    "order_value_theil",
    "kendalls_w_sources",
    "type_corr_matrix",
    "granger_click_purchase",
    "forecast_reconciliation",
    "user_count_nb_fit",
    "var_kupiec_backtest",
    "poisson_bh_hours",
    "capture_recapture_users",
    "good_turing_unseen",
    "langid_ari",
    "pr_auc_doc_length",
    "most_similar_days",
    "ljung_box_daily",
    "best_revenue_streak",
    "domain_dag_layers",
    "placebo_did",
    "duplicate_invoice_screen",
    "session_bounce_rate",
    "bradley_terry_types",
    "hurst_rs_daily",
    "term_adaptation",
    "embedding_intrinsic_dim",
    "image_centroid_stats",
    "domain_reciprocity",
    "qty_transport_plan",
    "markov_stationary",
    "type_bowley_skew",
    "type_logloss_drift",
    "weekly_max_gumbel_fit",
    "record_days_audit",
    "heaps_law_fit",
    "cohens_d_types",
    "wilcoxon_signed_rank",
    "friedman_types_daily",
    "cramers_v_type_hour",
    "brown_forsythe_types",
    # session-10 operators
    "theil_u_type_hour",
    "gamma_somers_qty_discount",
    "transfer_entropy_click_purchase",
    "permutation_entropy_hourly",
    "sample_entropy_daily",
    "higuchi_fd_daily",
    "arch_lm_daily",
    "erlang_c_staffing",
    "nn_matched_att",
    "rdd_acctbal_orders",
    "matrix_profile_daily",
    "rake_keywords",
    "pages_trend_test",
    "cochran_armitage_trend",
    "james_stein_type_means",
    "domain_tier_modularity",
    "dfa_alpha_daily",
    "lz76_complexity_daily",
    "hoeffding_d_qty_discount",
    "blomqvist_beta_qty_price",
    "distance_corr_click_purchase",
    "process_footprint_matrix",
    "allan_variance_hourly",
    "domain_spectral_radius",
    "assoc_rules_types",
    "deming_regression_qty_price",
    "source_braycurtis_matrix",
    "half_sample_mode_daily",
    "mcf_purchases",
    "token_burstiness",
    "ridge_price_fit",
    "cca_daily_types",
    "cep_no_error_conversion",
    "hotelling_t2_weekend",
    "tukey_hsd_types",
    "partition_skew_audit",
    "dup_share_by_source",
    "benford_mad_by_source",
    "rayleigh_time_of_day",
    "domain_mst_weight",
    "circular_linear_corr_value",
    "gini_covariance_qty_price",
    "median_polish_dow_hour",
    "lof_daily_outliers",
    "fe_within_slope_nation",
    "smallworld_sigma",
    "pettitt_changepoint_daily",
    "bass_diffusion_fit",
    "siegel_repeated_median",
    "ipf_dow_hour",
    "dbscan_daily",
    "kmedoids_build_daily",
    "hmm_forward_loglik",
    "hill_numbers_by_source",
    "tier1_pagerank_enrichment",
    "jaro_winkler_name_pairs",
    "webgraph_bowtie",
    "seasonal_esd_hours",
    "fourier_phase_lag_weekly",
    "rqa_daily",
    "crps_persistence_daily",
    "mmd_poly2_weekend",
    "youden_j_threshold",
    "lilliefors_daily",
    "kde_epanechnikov_daily",
    "atkinson_lorenz_daily",
    # session-11 operators
    "dict_encoding_audit",
    "selectivity_estimate_audit",
    "feature_hash_buckets",
    "lin_ccc_click_view",
    "bland_altman_click_view",
    "agreement_coeffs_langid",
    "cucconi_click_view",
    "brunner_munzel_click_view",
    "bartels_rvn_daily",
    "white_test_daily",
    "goldfeld_quandt_daily",
    "dickey_fuller_daily",
    "laplace_trend_purchases",
    "ulcer_martin_daily",
    "spectral_entropy_daily",
    "hoover_palma_daily",
    "getis_ord_hotspots",
    "ripley_k_minutes",
    "textrank_keywords",
    "craig_zeta_sources",
    "hdd_lexical_diversity",
    "domain_betweenness",
    "domain_effective_size",
    "woolf_or_homogeneity",
    "dp_noise_calibration",
    "erlang_b_blocking",
    "image_hu_moments",
    "audio_spectral_centroid",
    "weighted_kappa_quartiles",
    "hilbert_locality_audit",
    "theta_forecast_daily",
    "katz_petrosian_fd_daily",
    "anderson_darling_2samp",
    "cochran_c_dow",
    "breusch_godfrey_daily",
    "bloom_fpr_audit",
    "cusum_squares_daily",
    "concentration_index_users",
    "tost_equivalence_weekend",
    "bayes_ab_purchase",
    "prefix_compression_audit",
    "timestamp_dod_audit",
    "fligner_killeen_types",
    "interaction_information_tdh",
    "fightin_words_sources",
    "rank_turbulence_divergence",
    "qlr_supf_daily",
    "zip_fit_purchases",
    "mardia_multinormality_daily",
    "bitmap_index_audit",
    "poisson_rate_weekend",
    "skellam_fit_daily",
    # session-11 close + session-12 additions
    "aa_test_calibration",
    "cmh_test_hour",
    "codec_selector_audit",
    "consistent_hash_ring",
    "conover_squared_ranks_types",
    "bws_weekend_weekday",
    "ww_runs_weekend_weekday",
    "cooks_distance_daily",
    "shapiro_francia_daily",
    "breslow_day_hourseg",
    "stuart_maxwell_quartiles",
    "lsm_tiered_write_amp",
    "threshold_algorithm_audit",
    "lsm_leveled_write_amp",
    "mantel_day_revenue",
    "bds_gap_daily",
    "lru_reuse_distance_audit",
    "group_commit_audit",
    "nb_vs_poisson_lrt",
    "lad_regression_daily",
    "wavelet_synopsis_audit",
    "join_order_audit",
    "fleiss_kappa_types",
    "jl_projection_audit",
    "holt_winters_daily",
    "linear_probe_audit",
    "rendezvous_hash_audit",
    "markov_dobrushin_mixing",
    "kcenter_greedy_embeddings",
    "database_cracking_audit",
    "mvcc_conflict_audit",
    "fsst_bigram_audit",
    "tukey_gh_fit_daily",
    "schnabel_user_estimate",
    "dtw_dow_profiles",
    "sorted_neighborhood_linkage",
    "pickands_tail_values",
    "session_timeout_sensitivity",
    "quantile_regression_p90",
    "knn_hubness_audit",
    "box_m_weekend",
    "p99_aggregation_pitfall",
    "sampled_quantile_error",
    "copula_tail_fit",
    "theilsen_slope_ci",
    "rbo_source_rankings",
]


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False


def scaling_pages_dir() -> str:
    """Dedicated, larger corpus for the scaling runs: fixed per-run
    overhead (actor/worker spin-up, write finalize) must be small
    against compute for the efficiency ratio to measure the ENGINE."""
    from log_analysis_ai_ray import synth

    n = int(os.environ.get("GRAFT_SCALE_PAGES", "1600000"))
    return synth.ensure_pages(f"/tmp/graft_pages/scaling-{n}", n, n_files=32)


def run_flagship(num_cpus: int, warmup: bool = False,
                 pages: str | None = None, reps: int = 1) -> dict:
    """Flagship end-to-end; returns rows/sec and stage timings.

    warmup=True runs the pipeline once before measuring — first-run
    numbers on this sandbox are dominated by cold page faults (the VM
    lazily restores memory) and Ray worker spin-up. reps>1 keeps the
    best (min-wall) measured run, same rationale as the per-query
    best-of-3 in main().
    """
    _init_ray(num_cpus)
    import shutil

    from log_analysis_ai_ray.pipelines import flagship, queries

    pages = pages or queries.pages_dir_for(SF_DIR)
    out_dir = f"/tmp/bench_flagship_{num_cpus}"
    best = None
    runs = (1 if warmup else 0) + max(reps, 1)
    for i in range(runs):
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        res = flagship.run(pages, out_dir)
        wall = time.time() - t0
        if warmup and i == 0:
            continue  # warmup run discarded
        if best is None or wall < best[0]:
            best = (wall, res)
    wall, res = best
    rows = res["metrics"]["rows_routed"]
    return {
        "wall_sec": wall,
        "rows": rows,
        "rows_per_sec": rows / wall,
        "mine_sec": res["metrics"]["mine_sec"],
        "route_sec": res["metrics"]["route_sec"],
        "agg_sec": res["metrics"]["agg_sec"],
        "n_templates": res["metrics"]["n_templates"],
    }


def _warm_driver_heap(mb: int = 1536) -> None:
    """Pre-fault driver-process heap pages. This snapshot-restored VM
    serves FIRST-TOUCH anonymous pages at ~6-70 MB/s (measured; ~5 GB/s
    once faulted), so any driver-side numpy work in a cold process is
    dominated by page faults, not compute. The package import already
    raised glibc's M_MMAP_THRESHOLD and disabled trim
    (state/malloc_tuning.py), so pages faulted here STAY in the heap
    and back every later large temporary. Chunks must stay BELOW the
    mmap threshold (1 GB) or they bypass the retained heap entirely."""
    import numpy as np

    held = []
    for _ in range(mb // 128):
        scratch = np.empty((128, 1 << 20 >> 3), dtype=np.int64)
        scratch[:] = 1
        held.append(scratch)  # freeing early would reuse ONE region
    del held


def main() -> None:
    # Host calibration BEFORE Ray spins up: pure-CPU throughput pinned
    # to 8 cores. Recorded again after the suite — when both probes are
    # depressed vs BASELINE.md's quiet-host reference, a slow suite is
    # host co-tenancy, not an engine regression (VERDICT r2 required
    # the per-query bench to carry the same control as --scaling).
    probe_before = _cpu_units_per_sec(8, reps=1)

    _init_ray(NUM_CPUS)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from log_analysis_ai_ray.pipelines.queries import QUERIES, pages_dir_for

    pages_dir_for(SF_DIR)  # materialize pages outside the timed region
    _warm_driver_heap()

    wall_t0 = time.time()
    flag = run_flagship(NUM_CPUS, warmup=True, reps=3)
    per_query: dict[str, float] = {"flagship": flag["wall_sec"]}
    all_runs: dict[str, list[float]] = {}

    # Per-query: best of three runs. The sandbox host reclaims memory
    # from random processes between runs (see _warm_driver_heap);
    # re-touching reclaimed pages costs ~30x, hitting arbitrary runs in
    # arbitrary processes. The min is the engine's reproducible time.
    # BASELINE.md documents the protocol; all three raw timings are
    # emitted too so both semantics are recorded (ADVICE r2).
    def _time_query(name: str) -> None:
        fn, _sql = QUERIES[name]
        times = []
        for _ in range(3):
            t0 = time.time()
            res = fn(SF_DIR)
            # consume lazily-returned datasets
            if hasattr(res, "count") and not hasattr(res, "num_rows"):
                res.count()
            times.append(round(time.time() - t0, 3))
        per_query[name] = min(times)
        all_runs[name] = times

    for name in BENCH_QUERIES:
        _time_query(name)
    total = sum(per_query.values())
    for name in BENCH_EXTRA:
        _time_query(name)
    value_extras = round(sum(per_query[n] for n in BENCH_EXTRA), 3)
    wall_clock = time.time() - wall_t0
    probe_after = _cpu_units_per_sec(8, reps=1)

    print(json.dumps({
        "metric": "end-to-end parse→enrich→route→aggregate + operator suite",
        "value": round(total, 3),
        "unit": "sec",
        "protocol": "warm: per-query best-of-3, flagship warmup run first"
                    " (cold VM page-fault tax excluded; BASELINE.md); "
                    "value = sum of best-of-3 minima, wall_clock_sec = "
                    "true elapsed incl. warmups and repeats",
        "queries": per_query,
        "queries_all_runs": all_runs,
        "value_extras": value_extras,
        "extra_queries": BENCH_EXTRA,
        "wall_clock_sec": round(wall_clock, 3),
        "host_cpu_probe": {"before": round(probe_before, 3),
                           "after": round(probe_after, 3),
                           "unit": "spin-units/sec at 8 pinned cores"},
        "flagship_rows_per_sec": round(flag["rows_per_sec"], 1),
        "flagship_rows": flag["rows"],
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }))
    import ray

    ray.shutdown()


def scaling() -> None:
    """Fresh-process runs at N and 4N CPUs → scaling efficiency.

    Default N=2 (GRAFT_SCALE_N): a pure-CPU microbenchmark shows this
    VM's 32 vCPUs deliver only ~20 cores of real compute under load, so
    higher level pairs measure the host's oversubscription rather than
    the engine. Each level runs a warmup pass first (cold page faults
    on this snapshot-restored VM otherwise dominate; see BASELINE.md).
    """
    n_lo = int(os.environ.get("GRAFT_SCALE_N", "2"))
    levels = (n_lo, 4 * n_lo)
    pages = scaling_pages_dir()  # generate once, outside the timed runs

    # Host-ceiling calibration: this sandbox VM's vCPUs are host-
    # oversubscribed — even a pure-CPU multiprocessing spin does not
    # scale 4× from N to 4N pinned cores. Measure that ceiling with the
    # same pinning, ADJACENT to each leg (host load drifts on the scale
    # of minutes here; a single up-front probe can miss a shift between
    # the two legs and mis-attribute it to the engine), so the
    # engine's efficiency reads against what the host delivered to
    # that leg: engine_efficiency_vs_host ==
    # (rows/sec per spin-unit at 4N) / (rows/sec per spin-unit at N).
    ceiling = {}
    results = {}
    for n in levels:
        ceiling[n] = _cpu_units_per_sec(n)
        code = (
            "import json,sys; sys.path.insert(0,'/root/repo');"
            "import bench; r = bench.run_flagship(%d, warmup=True, pages=%r);"
            "import ray; ray.shutdown();"
            "print('RESULT ' + json.dumps(r))" % (n, pages)
        )
        # Pin the whole process tree (Ray workers inherit the affinity)
        # to n physical CPUs: ray.init(num_cpus=n) only limits TASK
        # concurrency, while Arrow's internal thread pools (parquet
        # encode/decode) would otherwise use every physical core and
        # flatter the small-cluster run.
        cmd = ["taskset", "-c", f"0-{n - 1}", sys.executable, "-c", code]
        out = subprocess.run(cmd,
                             capture_output=True, text=True,
                             env={**os.environ, "GRAFT_SF_DIR": SF_DIR})
        line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(out.stdout[-2000:], file=sys.stderr)
            print(out.stderr[-2000:], file=sys.stderr)
            raise RuntimeError(f"scaling run at {n} cpus failed")
        results[n] = json.loads(line[-1][len("RESULT "):])
        results[n]["cpu_units_at_leg"] = round(ceiling[n], 3)
    host_ceiling = ceiling[levels[1]] / (4 * ceiling[levels[0]])
    tp_lo = results[levels[0]]["rows_per_sec"]
    tp_hi = results[levels[1]]["rows_per_sec"]
    eff = tp_hi / (4 * tp_lo)
    print(json.dumps({
        "metric": f"scaling efficiency ({levels[0]} → {levels[1]} CPUs, "
                  "fresh processes, warmed)",
        f"throughput_{levels[0]}": round(tp_lo, 1),
        f"throughput_{levels[1]}": round(tp_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "host_cpu_ceiling": round(host_ceiling, 3),
        # eff / ceiling == (rows/sec per spin-unit at 4N) / (same at N)
        # exactly — no clamp: a ceiling > 1 (transient-load probe) must
        # DEFLATE the vs-host number, not be rounded up to neutral
        "engine_efficiency_vs_host": round(eff / host_ceiling, 3),
        "detail": results,
        "sf": SF_DIR,
    }))


def _cpu_units_per_sec(n: int, reps: int = 2) -> float:
    """Pure-CPU multiprocessing throughput pinned to n cores (max of
    reps — host noise only ever subtracts)."""
    code = (
        "import multiprocessing as mp, time\n"
        "def spin(k):\n"
        "    x = 0\n"
        "    for i in range(8_000_000): x += i*i\n"
        "    return x\n"
        "if __name__ == '__main__':\n"
        f"    t0 = time.time()\n"
        f"    with mp.Pool({n}) as p: p.map(spin, range({n} * 3))\n"
        f"    print({n} * 3 / (time.time() - t0))\n"
    )
    best = 0.0
    for _ in range(reps):
        out = subprocess.run(
            ["taskset", "-c", f"0-{n - 1}", sys.executable, "-c", code],
            capture_output=True, text=True)
        try:
            best = max(best, float(out.stdout.strip().splitlines()[-1]))
        except (ValueError, IndexError):
            pass
    return best or 1.0


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
