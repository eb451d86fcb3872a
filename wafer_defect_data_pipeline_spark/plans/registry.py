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


# The driver's correctness sweep covers the registry in iteration order (50
# entries in round 1), so the emitted order must span EVERY query family
# early: reference §2 parity first, then ≥1 representative of each extension
# family (sources, dedup, similarity, text, multimodal, sampling, events,
# streaming, wafer pipeline) before any redundant TPC-H variant. Names not
# listed here follow in registration order; a listed name that is missing
# from the registry is a hard error (catches renames).
_PRIORITY: list[str] = [
    # reference §2 parity block (P/A/U/M ops)
    "flagship_iqr_summary",
    "filter_project",
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
    # wafer pipeline capstone (M1-M3 / O1)
    "wafer_pipeline_on_lineitem",
    # sources (S1/S2/S5)
    "csv_roundtrip",
    # dedup family
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_pairs",
    "dedup_jaccard_pairs",
    "dedup_cluster_assignment",
    # similarity family
    "embedding_vector_stats",
    "similarity_bruteforce_topk",
    "similarity_neardup_pairs",
    "embedding_label_centroids",
    "similarity_ivf_topk",
    # text family
    "text_token_stats",
    "text_quality_scores",
    "text_language_id",
    "text_tfidf_topk",
    "text_repetition_scores",
    "text_benchmark_contamination",
    "curation_pipeline",
    "layout_zorder_stats",
    # multimodal family
    "multimodal_binary_metadata",
    # sampling / token-budget family
    "sample_hash_split",
    "sample_stratified",
    "sample_mixture_weights",
    "sample_topk_per_group",
    "pack_sequences",
    # event-time family
    "events_tumbling_window",
    "events_sessionization",
    "events_asof_join",
    "events_funnel",
    "events_hypertable_rollup",
    # structured streaming (rows-only by nature)
    "events_stateful_profile",
    # training-data governance family — first past the 50-entry line so a
    # wider driver sweep reaches them immediately
    "split_leakage_audit",
    "semantic_dedup_keep",
    "doc_chunking",
    "corpus_datacard",
    "text_inverted_index",
    "text_bm25_topk",
    "events_gapfill_ffill",
    "events_anomaly_mad",
    "scd2_priority_history",
    "unpivot_measures",
    "text_editdist_pairs",
    "events_hll_weekly_users",
    "events_streaming_foreachbatch_upsert",
    "text_geomean_chars_udaf",
    "events_moving_median",
    "graph_pagerank_suppliers",
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
