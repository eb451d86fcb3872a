"""Query registry — the driver contract's source of truth.

Each implemented operator from SURVEY.md §2 registers a named
``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible) a
DuckDB oracle string with IDENTICAL output column names. ``__spark_entry__``
re-exports this registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # None -> driver does rows-only check


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name: {name}")
    _REGISTRY[name] = RegisteredQuery(name, fn, oracle)


def query(name: str, oracle: str | None = None):
    """Decorator form of :func:`register`."""

    def deco(fn: QueryFn) -> QueryFn:
        register(name, fn, oracle)
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from . import queries_reference  # noqa: F401
    from . import queries_sources  # noqa: F401
    from . import queries_tpch  # noqa: F401
    from . import queries_tpch2  # noqa: F401
    from . import queries_events  # noqa: F401
    from . import queries_text  # noqa: F401
    from . import queries_dedup  # noqa: F401
    from . import queries_curation  # noqa: F401
    from . import queries_training  # noqa: F401
    from . import queries_search  # noqa: F401
    from . import queries_timeseries  # noqa: F401
    from . import queries_similarity  # noqa: F401
    from . import queries_multimodal  # noqa: F401
    from . import queries_wafer  # noqa: F401
    from . import queries_sqlfeatures  # noqa: F401
    from . import queries_sketches  # noqa: F401
    from . import pipeline_ps  # noqa: F401


# The driver's correctness sweep covers the registry in iteration order and
# samples only ~50 entries per round, so with 161 registered queries the
# order must ROTATE. Round 4 front-loads (a) the 34 queries that have never
# received a driver row across rounds 1-3 (the union of CORRECTNESS_r01-03
# — closing this evidence gap is VERDICT r3's top item), (b) queries whose
# implementation or oracle changed this round and need re-verification,
# then (c) known-green sentinels spanning families so a systemic regression
# is still visible. Everything driver-green in r1-r3 rotates to the back;
# pytest keeps covering all of them every session. Names not listed here
# follow in registration order; a listed name missing from the registry is
# a hard error (catches renames).
_PRIORITY: list[str] = [
    # (a) never-driver-tested in r1-r3 — oracle-bearing first
    "tpch_q8_market_share",
    "tpch_q9_profit_by_nation",
    "tpch_q11_important_parts",
    "tpch_q12_priority_lines",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_counts",
    "tpch_q18_large_orders",
    "tpch_q20_promotion_suppliers",
    "tpch_q21_waiting_suppliers",
    "events_user_profile",
    "events_range_join",
    "events_cohort_retention",
    "text_fingerprints",
    "text_language_profile",
    "text_sentence_stats",
    "text_top_terms",
    "sample_shuffled_head",
    "text_pii_scan",
    "embedding_quantization_recall",
    "window_ntile_quartiles",
    "text_boilerplate_ngrams",
    "text_quality_rank_filter",
    "text_unigram_logprob",
    "multimodal_size_by_lang",
    "multimodal_frame_sample",
    # (a'') new this session — oracle-bearing, no driver row yet
    "embedding_covariance",
    "dedup_prefix_jaccard_pairs",
    "zonemap_pruned_agg",
    "bloom_runtime_filter_join",
    "sketch_kmv_distinct",
    "sketch_cms_frequency",
    "graph_triangle_count",
    "dq_audit_lineitem",
    "schema_evolution_read",
    "events_streaming_static_enrich",
    "rag_chunk_retrieval",
    "training_hard_negatives",
    "dedup_quality_keep",
    "sketch_cms_join_size",
    "events_streaming_available_now",
    "dedup_cluster_assignment_star",
    "privacy_k_anonymity",
    "price_histogram",
    "numeric_correlations",
    "events_windowed_quantiles",
    # (b) new in round 4 — oracle-bearing, no driver row yet
    "multimodal_image_decode_stats",  # new: executed pixel path, full oracle
    "multimodal_audio_decode_stats",  # new: executed RIFF/PCM path, full oracle
    "multimodal_video_frame_stats",  # new: executed Y4M frame sampling, full oracle
    "multimodal_audio_spectrum_peak",  # new: executed FFT peak detection, full oracle
    "text_pii_redact",  # new: redaction (not just detection), redacted text in oracle
    "text_url_domain_stats",  # new: per-domain corpus mass
    "text_paragraph_dedup",  # new: within-doc dedup counts
    "sample_stratified",  # latest row was an err; now hash-threshold with exact oracle
    # (a') never-driver-tested, rows-only by nature — weakest marginal
    # signal (driver checks rows>0 only; each has pytest structure checks
    # and an exact-oracle twin in its family), so they take the slots AFTER
    # every oracle-bearing gap is covered. 42 oracle-bearing + 8 of these
    # fill the driver's ~50-query window; the 3 stream-stream rows-only
    # queries and the 4 re-verification entries land just past the cut and
    # front a future rotation.
    "events_hll_weekly_users",
    "dedup_mllib_minhash_lsh",
    "similarity_bruteforce_topk_arrow",
    "similarity_lsh_pairs",
    "embedding_pca_projection",  # new this session (eigh not SQL-expressible)
    "text_bpe_token_stats",  # new this session (BPE merge loop not SQL-expressible)
    "events_streaming_tumbling",
    "events_streaming_sessions",
    "events_streaming_dedup",
    "events_streaming_join",
    "events_streaming_left_join",
    # (b') changed in round 4, prior driver rows green — re-verification
    "wafer_pipeline_on_lineitem",  # pin-free metadata row id
    "events_streaming_foreachbatch_upsert",  # state moved off-driver
    "events_session_window_native",  # oracle tie-break by event_id
    "events_streaming_mv_q1",  # null-safe merge
    # (c) known-green sentinels, one per major family
    "flagship_iqr_summary",
    "filter_project",
    "csv_roundtrip",
    "dedup_exact",
    "similarity_bruteforce_topk",
    "text_quality_scores",
    "events_tumbling_window",
    "curation_pipeline",
    "tpch_q1_pricing_summary",
    "semantic_dedup_keep",
    # previously-green queries rotate to the back (r1-r3 driver rows exist)
    "events_sessionization",
    "events_lag_lead",
    "json_extract",
    "events_sliding_window",
    "bucketed_join_zeroshuffle",
    "orc_roundtrip",
    "json_variant_agg",
    "events_stateful_profile_exact",
    "python_datasource_scan",
    "recursive_cte_hierarchy",
    "sql_scripting_doubling",
    "wafer_features_pandas_api",
    "observed_scan_metrics",
    "compaction_small_files",
    "events_user_topk_arrow",
    "xml_roundtrip",
    "transpose_metrics",
    "split_leakage_audit",
    "merge_upsert",
    "graph_pagerank_suppliers",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "doc_chunking",
    "corpus_datacard",
    "text_inverted_index",
    "text_bm25_topk",
    "events_gapfill_ffill",
    "events_anomaly_mad",
    "scd2_priority_history",
    "unpivot_measures",
    "text_editdist_pairs",
    "text_geomean_chars_udaf",
    "events_moving_median",
    "json_roundtrip",
    "partitioned_pruned_read",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q7_region_volume",
    "range_filter",
    "drop_nulls",
    "derived_ratio",
    "conditional_label",
    "cast_columns",
    "grouped_quantiles",
    "iqr_bounds",
    "null_counts",
    "distinct_sorted",
    "value_counts",
    "boolean_sum",
    "crosstab_pivot",
    "union_by_name",
    "iqr_cascade_rows",
    "conditional_label_join",
    "iqr_cascade_approx",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "dedup_jaccard_pairs",
    "dedup_cluster_assignment",
    "embedding_vector_stats",
    "similarity_neardup_pairs",
    "embedding_label_centroids",
    "similarity_ivf_topk",
    "text_token_stats",
    "text_language_id",
    "text_tfidf_topk",
    "text_repetition_scores",
    "text_benchmark_contamination",
    "layout_zorder_stats",
    "multimodal_binary_metadata",
    "sample_hash_split",
    "sample_mixture_weights",
    "sample_topk_per_group",
    "pack_sequences",
    "events_asof_join",
    "events_funnel",
    "events_hypertable_rollup",
    "events_stateful_profile",
]


def _ordered() -> dict[str, RegisteredQuery]:
    _load_all()
    missing = [n for n in _PRIORITY if n not in _REGISTRY]
    if missing:
        raise KeyError(f"_PRIORITY names not in registry: {missing}")
    out = {n: _REGISTRY[n] for n in _PRIORITY}
    out.update({n: r for n, r in _REGISTRY.items() if n not in out})
    return out


def all_queries() -> dict[str, QueryFn]:
    return {n: r.fn for n, r in _ordered().items()}


def all_oracles() -> dict[str, str]:
    return {n: r.oracle for n, r in _ordered().items() if r.oracle is not None}
