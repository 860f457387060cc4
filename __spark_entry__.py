"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are backed by the engine's declared
query registry (data_pipeline_001_spark.plans.queries et al.), one
entry per implemented operator from SURVEY.md §2. ``entry`` runs the
flagship pricing-summary aggregation at sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    # importing the satellite modules populates the shared REGISTRY
    from data_pipeline_001_spark.plans import queries as base
    from data_pipeline_001_spark.plans import queries_agg2  # noqa: F401
    from data_pipeline_001_spark.plans import queries_analytics  # noqa: F401
    from data_pipeline_001_spark.plans import queries_bucketed  # noqa: F401
    from data_pipeline_001_spark.plans import queries_curation  # noqa: F401
    from data_pipeline_001_spark.plans import queries_curation2  # noqa: F401
    from data_pipeline_001_spark.plans import queries_curation3  # noqa: F401
    from data_pipeline_001_spark.plans import queries_llm  # noqa: F401
    from data_pipeline_001_spark.plans import queries_scalar  # noqa: F401
    from data_pipeline_001_spark.plans import queries_tpch2  # noqa: F401
    from data_pipeline_001_spark.plans import queries_tpch3  # noqa: F401
    from data_pipeline_001_spark.plans import queries_udf  # noqa: F401

    # round-4+ additions import LAST: new registry entries must land
    # behind the existing coverage queue so the driver's prefix sample
    # finishes the never-checked backlog before seeing new names
    from data_pipeline_001_spark.plans import queries_multimodal  # noqa: F401
    from data_pipeline_001_spark.plans import queries_textprep  # noqa: F401
    from data_pipeline_001_spark.plans import queries_mlprep  # noqa: F401
    from data_pipeline_001_spark.plans import queries_graph  # noqa: F401
    from data_pipeline_001_spark.plans import queries_er  # noqa: F401
    from data_pipeline_001_spark.plans import queries_mleval  # noqa: F401
    from data_pipeline_001_spark.plans import queries_forecast  # noqa: F401
    from data_pipeline_001_spark.plans import queries_geo  # noqa: F401
    from data_pipeline_001_spark.plans import queries_mining  # noqa: F401
    from data_pipeline_001_spark.plans import queries_spc  # noqa: F401
    # (time_holt_winters / join_asof_nearest live in queries_forecast /
    # queries_geo, already imported above)

    return base.REGISTRY, base.ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry, _ = _registry()
    return registry["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


#: the 49 registry entries that had no driver CORRECTNESS row after
#: round 3 (all oracle-verified green via tools/check_oracle.py).
#: Pinned so queries ADDED in round 4+ cannot displace them from the
#: driver's ~50-entry prefix sample — the ledger closes for the
#: existing surface first; new queries queue behind it.
_R3_BACKLOG = (
    "window_pct_change_daily", "curation_token_budget_plan",
    "curation_interleave_order", "agg_autocorr_daily_counts",
    "time_spine_dst_week", "scalar_duration_curves",
    "scalar_granularity_string", "scalar_regexp_extract",
    "scalar_least_greatest", "array_ops_text_tokens",
    "filter_predicate_stack", "derived_projection_window_day",
    "json_variant_extract", "scalar_bitwise_ops", "array_set_ops",
    "time_business_day_lag", "time_month_arithmetic",
    "q06_forecast_revenue", "q04_order_priority_check",
    "q14_promo_revenue", "q18_large_orders",
    "subquery_scalar_above_avg", "subquery_in_list", "null_semantics",
    "pivot_event_type_by_day", "unpivot_nation_activity",
    "window_first_last_values", "q07_volume_shipping",
    "q08_market_share", "q09_product_profit",
    "q11_balance_concentration", "q13_order_count_distribution",
    "q15_top_supplier", "q16_supplier_variety",
    "q17_small_quantity_revenue", "q19_disjunctive_predicates",
    "q20_part_suppliers", "q22_idle_customers",
    "q02_min_balance_supplier", "q12_late_shipment_priority",
    "q21_last_shipper_in_shared_orders", "explode_word_frequency",
    "text_token_counts", "map_ops_props", "udf_scalar_sigmoid",
    "udf_grouped_weighted_mean", "udtf_word_counts",
    # embedding_pca / dedup_semantic_clusters moved to _R5_BACKLOG when
    # their graduated oracles re-fronted them (one pin per query)
)


#: the 51 registry entries that had no driver CORRECTNESS row after
#: round 4 (the round-4 session additions; all oracle-verified green
#: or rows-only-by-design via tools/check_oracle.py). Pinned for the
#: same reason as _R3_BACKLOG: round-5+ additions and newly graduated
#: oracles must not displace these from the driver's prefix sample.
_R4_BACKLOG = (
    "q05_nation_revenue_bucketed", "multimodal_decoded_features",
    "multimodal_sampled_features", "text_html_extract",
    "text_url_canonicalize", "text_line_dedup",
    "profile_lineitem_columns", "embedding_quant_calibration",
    "text_bpe_pair_stats", "agg_theta_set_algebra",
    "agg_approx_topk_merge", "dedup_bloom_incremental",
    "text_bpe_encode", "curation_session_assembly",
    "graph_event_reachability", "time_ewma_daily", "sql_lateral_topn",
    "sql_parameterized_exec", "curation_keyword_tags",
    "json_schema_profile", "text_sentence_stats",
    "window_funnel_conversion", "agg_rfm_segmentation",
    "time_interarrival_stats", "time_seasonality_matrix",
    "join_temporal_dimension", "agg_ab_experiment_lift",
    "time_to_convert_stats", "stats_corr_matrix", "stats_mad_outliers",
    "itemset_part_pairs", "stats_mutual_information",
    "text_pmi_bigrams", "events_bounce_rate", "stats_chi_squared",
    "agg_pareto_share", "text_hapax_ratio", "stats_ks_test",
    "time_monthly_growth", "text_trigram_coverage",
    "stats_jackknife_se", "text_readability", "events_new_vs_returning",
    "stats_welch_ttest", "agg_hhi_concentration",
    "events_session_duration", "stats_anova_weekday",
    "events_load_imbalance", "text_bpe_train",
    # orders_status_aging moved to _R5_BACKLOG (ranked 51st in round
    # 4's 50-row sample; one pin per query)
    "text_compressibility",
)


#: the 32 registry entries with no GREEN-HASH driver row after round 5:
#: 23 never sampled in any round (the round-5 graph/ML-prep/trend waves,
#: pHash, plus ``orders_status_aging`` which ranked 51st in a 50-row
#: sample) followed by 9 whose latest ledger row is a stale ``no_oracle``
#: err from rounds 2/4 — they have since graduated to contract oracles
#: and owe the ledger their first hash-gate run. Never-sampled first,
#: per the round-5 verdict. Pinned so round-6+ additions cannot displace
#: them from the driver's ~50-entry prefix sample.
_R5_BACKLOG = (
    # -- never sampled in any round (registration order) --
    "multimodal_phash_neardup", "orders_status_aging",
    "graph_degree_buckets", "graph_triangle_stats",
    "graph_pagerank_top", "survival_kaplan_meier",
    "ml_target_encoding", "ml_kfold_assignment", "ml_quantile_binning",
    "stats_cusum_changepoint", "stats_crosscorr_lags",
    "graph_component_sizes", "stats_mann_kendall",
    "stats_spearman_corr", "stats_runs_test", "ml_feature_hashing",
    "ml_scaler_params", "ml_feature_crosses", "ml_classifier_eval",
    "ml_roc_auc", "ml_calibration_bins", "stats_abc_analysis",
    "stats_markov_stationary",
    # -- graduated to oracles after their last (rows-only) sample --
    "embedding_pca", "dedup_minhash_lsh", "dedup_simhash",
    "similarity_lsh_topk", "similarity_ivf_topk",
    "dedup_cluster_components_lsh", "dedup_embedding_lsh",
    "dedup_semantic_clusters", "similarity_pq_topk",
)


#: the 33 round-6 additions (waves 1-10), all oracle-backed, none yet
#: sampled by the driver. Pinned in registration order right behind
#: _R5_BACKLOG so the round-6 driver sample (~50 rows) covers the 32
#: round-5 leftovers first, then as many of these as fit; the
#: remainder stays fronted for round 7 ahead of any round-7 adds.
_R6_BACKLOG = (
    "multimodal_png_features", "graph_triangle_approx",
    "er_customer_entities", "ml_ndcg_ranking",
    "multimodal_wav_spectrum", "stats_theil_sen",
    "stats_bootstrap_ci", "graph_link_prediction",
    "ml_cumulative_gains", "ml_average_precision", "ml_ks_separation",
    "time_holt_forecast", "time_seasonal_decompose",
    "stats_kendall_tau", "governance_l_diversity", "time_holt_winters",
    "geo_haversine_pairs", "events_attribution_touch",
    "join_asof_nearest", "itemset_association_rules",
    "er_fellegi_sunter", "text_keyword_rake",
    "multimodal_video_framesample", "embedding_mahalanobis_outliers",
    "quality_spc_xmr", "time_hampel_filter", "events_markov_attribution",
    "ml_lag_features", "stats_lagged_regression", "forecast_backtest",
    "events_dau_wau_mau", "events_power_user_curve",
    "text_collocations_llr",
)

#: round 8 adds ONE entry: the daily retention triangle recovered from
#: a years-silent name collision (queries_agg2.retention_cohorts was
#: shadowed by queries_mlprep's weekly matrix registering the same
#: ``agg_retention_cohorts`` name; the @query decorator now rejects
#: duplicates). The ledger entered round 8 fully closed, so this is
#: the only entry owing a hash row — it leads the driver's sample.
_R8_BACKLOG = ("agg_retention_daily",)

#: round 9 adds ONE entry: the boundary-point interval sweep (peak
#: concurrent activity per day) — the one classic windowed interval
#: analytic the registry lacked. Oracle-backed at registration
#: (exact hash parity incl. the half-open tie rule); queues behind
#: the round-8 pin per the sampling contract.
_R9_BACKLOG = ("window_peak_concurrency",)

#: round 10 adds the two production-dictionary tokenizer APPLY paths
#: (rank-heap BPE encode, Aho-Corasick keyword tagging) — scale twins
#: registering the SAME oracles as their literal demo-size forms, so
#: a green hash row proves the scale path exact. Queue behind the
#: round-9 pin per the sampling contract.
_R10_BACKLOG = (
    "text_bpe_encode_udf",
    "curation_keyword_tags_ac",
    "text_vocab_tokenize",
)

#: round 11 adds the three denormalized-fact headliner twins — the
#: second (custkey-clustered) lineitem layout that removes the last
#: structural exchange. Each registers the SAME oracle as its plain
#: and orderkey-bucketed twins, so a green hash row proves the layout
#: changed only the physical plan. Queue behind the round-10 pin per
#: the sampling contract.
_R11_BACKLOG = (
    "q03_shipping_priority_denorm",
    "q05_nation_revenue_denorm",
    "q10_returned_revenue_denorm",
)


def _coverage_order(names, oracles=None) -> list[str]:
    """Queries with no driver CORRECTNESS row from any past round come
    FIRST (in registration order), so a driver that samples a prefix of
    the dict converges to full coverage across rounds. A query whose
    past rows are all rows-only (``hash_match`` null) but that NOW has
    an oracle is fronted too — its hash gate has never actually run.
    Within the fronted block the pinned round-4 backlog outranks
    anything newly added or newly graduated."""
    import glob
    import json
    import os

    latest: dict[str, dict] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for n, r in rows.items():
            if isinstance(r, dict):
                latest[n] = r  # rounds sort ascending: last write wins
    oracles = oracles or {}
    seen = set(latest)

    def fronted(n: str) -> bool:
        # front anything never sampled, plus any oracle-backed query
        # whose LATEST ledger row is not a green hash pass (an err row,
        # a since-fixed mismatch, or a rows-only row that has since
        # gained an oracle) — its hash gate owes a green result
        if n not in latest:
            return True
        return n in oracles and latest[n].get("hash_match") is not True

    ordered = list(names)
    # within the fronted block: the pinned round-4 backlog first
    # (oracle-backed before rows-only — a sampled oracle query yields
    # a hash-gate row, a rows-only one only an execution row), then
    # graduated/red oracle-backed entries, then round-5+ additions
    backlog = set(_R3_BACKLOG) | set(_R4_BACKLOG)
    r4 = set(_R4_BACKLOG)
    r5 = {n: i for i, n in enumerate(_R5_BACKLOG)}
    r6 = {n: i for i, n in enumerate(_R6_BACKLOG)}
    r8 = {n: i for i, n in enumerate(_R8_BACKLOG)}
    r9 = {n: i for i, n in enumerate(_R9_BACKLOG)}
    r10 = {n: i for i, n in enumerate(_R10_BACKLOG)}
    r11 = {n: i for i, n in enumerate(_R11_BACKLOG)}

    def rank(n: str):
        # the round-5 pinned backlog precedes everything, in its own
        # declared order (never-sampled entries first); the round-6
        # pin queues immediately behind it, then round-8's
        if n in r5:
            return (-4, r5[n])
        if n in r6:
            return (-3, r6[n])
        if n in r8:
            return (-2, r8[n])
        if n in r9:
            return (-1, r9[n])
        if n in r10:
            return (-0.5, r10[n])
        if n in r11:
            return (-0.25, r11[n])
        if n in r4 and n in oracles:
            return (0, 0)
        if n in oracles and n in seen:
            # sampled before but its hash gate never ran (an err row —
            # a rows-only entry since graduated to a contract oracle,
            # or a since-fixed mismatch): clearing the ledger's red
            # row outranks sampling new additions
            return (1, 0)
        if n in backlog:
            return (2, 0)
        return (3, 0) if n in oracles else (4, 0)

    fronted_block = sorted(
        (n for n in ordered if fronted(n)),
        key=lambda n: (rank(n), ordered.index(n)),
    )
    return fronted_block + [n for n in ordered if not fronted(n)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry, oracles = _registry()
    return {n: registry[n] for n in _coverage_order(registry, oracles)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    registry, oracles = _registry()
    order = _coverage_order(registry, oracles)
    out = {n: oracles[n] for n in order if n in oracles}
    out.update({n: s for n, s in oracles.items() if n not in out})
    return out
