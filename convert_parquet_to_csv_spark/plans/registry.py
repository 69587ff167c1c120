"""Central registry mapping query names → (Spark callable, oracle SQL).

The driver contract (``/root/repo/__spark_entry__.py``) needs
``queries()`` and ``oracle_sql()`` dicts; every operator module
registers its demonstration queries here with the :func:`query`
decorator so the two stay in lockstep by construction.

Cross-engine determinism rules every registered query follows
(SURVEY.md §7.3d — hash-match the DuckDB oracle):

- **Alias every computed column identically** in Spark and SQL (the
  driver sorts columns by name before hashing).
- **Floating aggregation goes through DECIMAL.** ``SUM(double)`` is
  order-dependent in the last ulp; ``SUM(CAST(x AS DECIMAL(18,4)))``
  is exact and engine-independent; cast the result back to DOUBLE so
  both engines report the same column type.
- **No RNG.** Deterministic "randomness" uses cryptographic hashes of
  key columns (md5), identical in both engines.
- **The DECIMAL→DOUBLE closing cast is 1-ulp-unportable.** When the
  exact decimal sum lands within half an ulp of a double boundary,
  DuckDB (scaled division) and Java (correctly-rounded parse) pick
  different neighbors — observed once on the r3 sf0.1 fixture
  (q1's sum_disc_price). The fully-safe form is exact INTEGER
  fixed-point sums with ONE closing double divide (int→double is
  IEEE-correctly-rounded in both engines) — used by q1, the TWA,
  moments, correlation, OLS, and z-score queries; the DECIMAL form
  remains acceptable where gates stay green, but any future
  hash-mismatch in the 7th+ significant digit is this class.
- **Timestamps stay timestamps** (session TZ pinned to UTC; DuckDB is
  naive — values align).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; optionally with DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check —
    reserved for genuinely non-SQL-expressible ops (LSH bucketing,
    streaming state), per ``__spark_entry__.py:34-37``.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver gate checks a ~50-query prefix of this ordering each
# round (CORRECTNESS_r01/r02 are exact prefixes). Iteration order of
# QUERIES/ORACLES is therefore a CORRECTNESS-COVERAGE decision, not
# cosmetics.
#
# r3 strategy (VERDICT r2 item 1): rounds 1+2 gated 83 distinct
# queries but spent both budgets on the same families, leaving the
# similarity/sketch/streaming/multimodal/format/scale/DQ/Spark4
# families with ZERO driver rows. This prefix is therefore exactly:
# 2 canaries (flagship + an ex-red) → the 4 queries new in r3 → the
# 44 highest-value never-gated names with ≥1 representative of every
# family inside the 50 boundary. Positions 51+ hold the remaining
# never-gated (family-duplicate or slow) queries, then the rows-only
# ones, then everything already green in r1/r2 in registration order
# — so a larger budget keeps adding new signal and a smaller one
# cuts where it costs least.
#
# r4 note: once CORRECTNESS_r03 lands, rotate the prefix again — the
# ~40 continuation queries (bucketed_join_no_exchange ..
# interarrival_log2_histogram, currently positions ~96-145) will then
# be the largest never-driver-gated block and should lead the r4
# prefix, with the usual 2-3 canaries.
FIRST_TIER: list[str] = [
    # canaries: flagship + an ex-red regression sentinel
    "convert_roundtrip",
    "quantity_array_agg",
    # new in r3: Python sink roundtrip + the last TPC-H shapes
    "python_datasource_write_roundtrip",
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q20_potential_promotion",
    "span_dedup_c4",
    # similarity / embeddings (zero driver rows before r3)
    "similarity_topk_bruteforce",
    "dedup_embedding_cosine",
    "embedding_centroids",
    "similarity_ivf_recall",
    "arrow_vector_checksum",
    # sketches
    "hll_distinct_customers",
    "approx_quantile_sketch",
    "cms_heavy_hitters",
    # robust aggs + regex surface
    "robust_stats_orders",
    "regex_zoo_docs",
    # streaming (5 live micro-batch drains + batch window shape)
    "windowed_agg",
    "streaming_stream_join_live",
    "streaming_windowed_agg_live",
    "streaming_session_windows_live",
    "streaming_running_counts_live",
    "streaming_foreachbatch_upsert_live",
    "streaming_dedup_live",
    "graph_triangle_copurchase",
    # multimodal
    "multimodal_stats",
    "multimodal_frame_sample",
    # format / layout
    "partition_pruned_scan",
    "range_layout_scan",
    "binaryfile_ingest",
    "python_datasource_scan",
    # scale ops
    "salted_join_revenue",
    "json_roundtrip",
    "kafka_roundtrip_events",
    "compaction_roundtrip",
    "upsert_orders_roundtrip",
    "zorder_layout_scan",
    "table_checksum_orders",
    "skew_diagnostic_events",
    "incremental_agg_refresh",
    "snapshot_diff_orders",
    # DQ / dimension history
    "dq_constraint_checks",
    "scd2_user_state_history",
    # analytics family
    "negative_sampling_pairs",
    "multi_touch_attribution",
    "price_decile_binning",
    # type-surface zoos
    "nested_struct_zoo",
    "null_semantics_zoo",
    # Spark 4 SQL surface
    "recursive_cte_hierarchy",
    "variant_json_path",
    # ---- position 50 boundary ----
    # new-in-r3 surface past the boundary (next-best slots if the
    # budget runs larger), then remaining never-gated family
    # duplicates (cheapest loss under a budget cut), then the four
    # slow recall/complete checks
    "sql_pipe_syntax",
    "lateral_topn_per_nation",
    "collation_casefold_group",
    "ohlc_bars_events",
    "ewma_trailing_value",
    "transpose_status_summary",
    "moment_stats_exact",
    "observe_metrics_single_pass",
    "sparse_cosine_topk_pairs",
    "zscore_anomaly_events",
    "epoch_resample_replacement",
    "kcore_copurchase",
    "xml_roundtrip",
    "streaming_static_enrich_live",
    "weighted_median_price",
    "winsorize_prices",
    "pareto_frontier_parts",
    "schema_evolution_append",
    "ab_experiment_readout",
    "listagg_nations_by_region",
    "twohop_neighborhood_size",
    "rolling_28d_active_users",
    "mom_revenue_growth",
    "prefix_autocomplete_topk",
    "market_concentration_hhi",
    "try_cast_zoo",
    "paginate_orders_page5",
    "dynamic_partition_pruning_join",
    "rolling_28d_mau_hll",
    "udtf_analyze_first_tokens",
    "sql_table_lifecycle_dml",
    "null_ordering_topk",
    "ks_drift_ab_arms",
    "arrow_interop_roundtrip",
    "correlation_exact",
    "audience_overlap_matrix",
    "status_transition_matrix",
    "conversion_latency_percentiles",
    "ols_price_trend",
    "multimodal_resize_geometry",
    "gini_order_value",
    "cohort_ltv_curve",
    "rfm_segmentation",
    "basket_lift_part_pairs",
    "abc_pareto_classification",
    "new_vs_returning_revenue",
    "label_centroid_distances",
    "bucketed_join_no_exchange",
    "max_concurrent_intervals",
    "kmv_distinct_sketch",
    "dedup_cluster_size_histogram",
    "sql_parameterized_args",
    "oov_rate_vs_topk_vocab",
    "char_trigram_familiarity",
    "embedding_power_iteration_pc1",
    "source_language_prune",
    "chisq_independence_cells",
    "dow_seasonality_index",
    "textfile_roundtrip",
    "compression_codec_roundtrip",
    "arrow_python_udf_tokens",
    "tokenizer_fertility_by_lang",
    "empty_input_semantics_zoo",
    "gdpr_erasure_cascade",
    "dynamic_partition_overwrite",
    "join_hint_strategies",
    "udtf_table_argument",
    "band_join_nonequi",
    "null_safe_join_semantics",
    "not_in_null_trap",
    "max_drawdown_daily_value",
    "longest_daily_streak",
    "trimmed_mean_price",
    "order_to_ship_cycle_buckets",
    "clamped_running_balance",
    "wau_mau_stickiness",
    "binary_codec_zoo",
    "surrogate_key_dimension",
    "doc_topic_projection",
    "collapse_consecutive_events",
    "mode_per_group",
    "langid_confusion_matrix",
    "decile_lift_curve",
    "survivorship_golden_record",
    "rls_masked_view",
    "csv_adversarial_roundtrip",
    "interarrival_log2_histogram",
    "rollup_grouping_id_labels",
    "decile_binning_mapside",
    "agg_filter_zoo",
    "forward_fill_ignore_nulls",
    "skewness_exact",
    "multimodal_audio_energy",
    "max_records_per_file_cap",
    "anova_f_between_status",
    "asof_tolerance_attribution",
    "sql_udf_scalar",
    "asof_forward_next_error",
    "inverted_index_postings",
    "hopping_window_agg",
    "embedding_quantize_int8",
    "orc_roundtrip",
    "cohort_retention_matrix",
    "datetime_zoo",
    "group_by_all_sugar",
    "time_weighted_avg_value",
    "bigram_collocations_lift",
    "similarity_lsh_recall",
    "similarity_ivf_kmeans_recall",
    "dedup_simhash_complete",
    "pagerank_dup_graph",
    # rows-only (weaker check by contract — after every oracled name)
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "multimodal_features",
    "decontaminate_ngram_overlap_hashed",
    # everything else (TPC-H suite, text/dedup/sampling/curation —
    # all already driver-green in r1/r2) follows in registration order
]


def ordered_names() -> list[str]:
    """FIRST_TIER names first (their list order), then the rest in
    registration order."""
    tier = {n: i for i, n in enumerate(FIRST_TIER)}
    reg = {n: i for i, n in enumerate(QUERIES)}
    return sorted(
        QUERIES, key=lambda n: (tier.get(n, len(tier)), reg[n])
    )


def ordered_queries() -> dict[str, QueryFn]:
    return {n: QUERIES[n] for n in ordered_names()}


def ordered_oracles() -> dict[str, str]:
    return {n: ORACLES[n] for n in ordered_names() if n in ORACLES}


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    # Imports are at call time so the registry can be populated without
    # circular-import headaches; each module registers on first import.
    from convert_parquet_to_csv_spark.plans import (  # noqa: F401
        conversion_queries,
    )
    _optional = [
        "convert_parquet_to_csv_spark.plans.analytics_queries",
        "convert_parquet_to_csv_spark.plans.relational_queries",
        "convert_parquet_to_csv_spark.plans.temporal_queries",
        "convert_parquet_to_csv_spark.plans.sampling_queries",
        "convert_parquet_to_csv_spark.plans.dedup_queries",
        "convert_parquet_to_csv_spark.plans.similarity_queries",
        "convert_parquet_to_csv_spark.plans.text_queries",
        "convert_parquet_to_csv_spark.plans.streaming_queries",
        "convert_parquet_to_csv_spark.plans.multimodal_queries",
        "convert_parquet_to_csv_spark.plans.format_queries",
        "convert_parquet_to_csv_spark.plans.kafka_queries",
        "convert_parquet_to_csv_spark.plans.sketch_queries",
        "convert_parquet_to_csv_spark.plans.scale_queries",
        "convert_parquet_to_csv_spark.plans.tpch_queries",
        "convert_parquet_to_csv_spark.plans.curation_queries",
        "convert_parquet_to_csv_spark.plans.dq_queries",
        "convert_parquet_to_csv_spark.plans.modern_sql_queries",
    ]
    import importlib
    import warnings

    for mod in _optional:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            # Only the module itself being absent is "optional" — a
            # missing TRANSITIVE import is a real defect that would
            # otherwise silently shrink the correctness gate.
            if exc.name != mod:
                raise
            warnings.warn(
                f"query module {mod} not found; its queries are "
                f"excluded from the registry",
                stacklevel=2,
            )
