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
    # Machine-checked evidence pointer for oracle-less queries: either the
    # name of an oracle-backed registry entry exercising the same logic with
    # deterministic arithmetic, or "pytest:<path>" naming the golden test
    # that pins the values. Required whenever oracle is None (structural
    # pytest in tests/test_registry_contract.py enforces both directions).
    exact_twin: str | None = None


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(
    name: str,
    fn: QueryFn,
    oracle: str | None = None,
    exact_twin: str | None = None,
) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name: {name}")
    _REGISTRY[name] = RegisteredQuery(name, fn, oracle, exact_twin)


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
    from . import queries_entity  # noqa: F401
    from . import queries_search  # noqa: F401
    from . import queries_timeseries  # noqa: F401
    from . import queries_similarity  # noqa: F401
    from . import queries_multimodal  # noqa: F401
    from . import queries_wafer  # noqa: F401
    from . import queries_sqlfeatures  # noqa: F401
    from . import queries_sketches  # noqa: F401
    from . import pipeline_ps  # noqa: F401


# The driver's correctness sweep covers the registry in iteration order and
# samples only ~50 entries per round, so the order must ROTATE so no green
# row ever predates the implementation it vouches for. Round 13 front-loads:
# (a) queries NEW or CHANGED this round — the IVF->NSW priced dispatch, the
# derived-sample-mod IVF auto probe (new sample_mod_used column), the
# refactored DP release, the span family whose auto path gained hot-gram
# window salting, the quarantine/JPEG queries whose decode paths gained the
# missing-DHT error classification; (b) the 2 rows-only queries so each
# keeps a fresh executes-cleanly row; (c) the STALEST cohort by last driver
# green row — the r1/r2 relational, window, TPC-H, reference-§2, text and
# embedding families the 50-query window hasn't revisited since rounds 1-2
# (computed from CORRECTNESS_r01-r12; every one is still pytest
# oracle-parity-covered per session, but the driver record should vouch for
# them again too). Names not listed follow in registration order; a listed
# name missing from the registry is a hard error (catches renames).
_PRIORITY: list[str] = [
    # (a) new or changed THIS round (r13)
    "similarity_ann_auto_dispatch",  # NEW r13: IVF vs graph-ANN priced dispatch
    "similarity_ann_dispatch_prebuilt",  # NEW r13: decision+index persisted, served loaded
    "similarity_ann_dispatch_labelfree",  # NEW r13: quantizer cells, no partition column
    "similarity_ivf_auto_topk",  # CHANGED r13: derived sample_mod (+ new column)
    "privacy_dp_group_counts",  # CHANGED r13: mechanism factored to operators/privacy
    "privacy_dp_long_doc_share",  # NEW r13: eps-budget composition + post-processing
    "curation_diversity_cap",  # NEW r13: per-cluster keep-at-most-M window
    "curation_export_shards",  # NEW r13: shard write + read-back manifest
    "dedup_cluster_assignment",  # CHANGED r13: oracle refactored to shared CTE block
    "dedup_duplicated_spans",  # CHANGED r13: auto window salts sampled hot grams
    "dedup_strip_spans",  # CHANGED r13: same auto path via strip_duplicated_spans
    "dedup_span_stats",  # CHANGED r13: same auto path
    "multimodal_audio_quarantine",  # CHANGED r13: fixture rate term de-deadened
    "multimodal_jpeg_decode_stats",  # CHANGED r13: missing-DHT ValueError class
    "multimodal_jpeg_420_decode_stats",  # CHANGED r13: same decode path
    "multimodal_jpeg_progressive_decode_stats",  # CHANGED r13: same decode path
    "multimodal_decode_quarantine",  # CHANGED r13: error taxonomy includes DHT class
    "similarity_ivf_kmeans_topk",  # NEW r13: production IVF (quantizer cells)
    "similarity_nsw_topk",  # CHANGED r13: build shares the refactored quantizer
    "similarity_nsw_scale_topk",  # anchor twin of the dispatch's NSW branch
    # (b) rows-only refresh (wafer KMeans + float stateful profile, both
    # inherently non-SQL, both exact-twinned)
    "events_stateful_profile",
    "wafer_pipeline_on_lineitem",
    # (c) stalest cohort: last driver-green row r1 (relational/window/TPC-H
    # surface from round 1 — never re-sampled since)
    "timeseries_monthly_growth",
    "tpch_q3_top_orders",
    "tpch_q5_regional_revenue",
    "tpch_q17_small_quantity",
    "tpch_q22_idle_balance",
    "tpch_q13_order_counts",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q14_promo_share",
    "tpch_q19_disjunctive",
    "window_topk_per_group",
    "window_running_sum",
    "window_above_customer_avg",
    "join_salted_skew",
    "join_semi",
    "join_anti",
    "join_left_outer",
    "join_null_safe",
    "rollup_counts",
    "cube_counts",
    "distinct_aggregates",
    "global_topk",
    "string_functions",
    "date_functions",
    "grouped_string_agg",
    "set_ops_customers",
    "histogram_order_price",
    # (c) last driver-green row r2 (reference-§2 ops, text, embeddings,
    # events, sampling/packing/layout families)
    "events_hypertable_rollup",
    "events_asof_join",
    "events_funnel",
    "range_filter",
    "grouped_quantiles",
    "crosstab_pivot",
    "value_counts",
    "drop_nulls",
    "derived_ratio",
    "conditional_label",
    "conditional_label_join",
    "cast_columns",
    "iqr_bounds",
    "iqr_cascade_rows",
    "null_counts",
    "distinct_sorted",
    "boolean_sum",
    "union_by_name",
    "text_tfidf_topk",
    "text_language_id",
    "text_token_stats",
    "text_benchmark_contamination",
    "embedding_vector_stats",
    "embedding_label_centroids",
    "dedup_minhash_signatures",
    "dedup_jaccard_pairs",
    "sample_mixture_weights",
    "sample_hash_split",
    "pack_sequences",
    "layout_zorder_stats",
    # everything else (fresh r12 rows or pytest-covered) follows in
    # registration order; pytest's oracle-parity sweep still covers all of
    # them every session
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
