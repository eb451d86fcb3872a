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
# row ever predates the implementation it vouches for. Round 15 front-loads:
# (a) queries NEW or CHANGED this round — the recall-drift trigger twin, the
# redecide query's count-derived spine modulus, the MLlib minhash's JVM-side
# sparse-vector construction (no Python worker), the curation flagship's
# stage_walls side channel, the persistent PrivacyLedger (released values
# must stay unchanged), and the ANN/serving queries riding quantization.py's
# module-level numpy bind + scratch.py's age-fallback sweep; (b) the 2
# rows-only queries so each keeps a fresh executes-cleanly row; (c) the
# STALEST cohort by last driver green row — the union of CORRECTNESS_r01-r14
# puts 4 queries at r2 and the 35-query r3 cohort next. Names not listed
# follow in registration order; a listed name missing from the registry is a
# hard error (catches renames).
_PRIORITY: list[str] = [
    # (a) new or changed THIS round (r15)
    "similarity_ann_dispatch_recall_drift",  # NEW r15: recall-drift trigger, constant-size shape drift, staged flip
    "similarity_ann_dispatch_redecide",  # CHANGED r15: count-derived spine modulus (m=1 at sf<=0.1 — hash-identical)
    "dedup_mllib_minhash_lsh",  # CHANGED r15: sparse VectorUDT built JVM-side (parquet round-trip), zero F.udf
    "curation_end_to_end",  # CHANGED r15: stage_walls side channel (plan + oracle unchanged)
    "privacy_dp_stable_histogram",  # CHANGED r15: PrivacyLedger persistence (values must stay unchanged)
    "privacy_dp_group_counts",  # CHANGED r15: same
    "privacy_dp_long_doc_share",  # CHANGED r15: same
    "similarity_ann_dispatch_prebuilt",  # CHANGED r15: scratch age-fallback sweep + quantization numpy bind
    "similarity_nsw_probe_prebuilt",  # CHANGED r15: same
    "curation_export_shards",  # CHANGED r15: scratch age-fallback sweep
    "similarity_ivf_kmeans_topk",  # CHANGED r15: quantization module-level numpy
    "similarity_nsw_topk",  # CHANGED r15: same kernels in build+search
    "similarity_ann_auto_dispatch",  # CHANGED r15: same + dispatch machinery control
    # (b) rows-only refresh (wafer KMeans + float stateful profile, both
    # inherently non-SQL, both exact-twinned)
    "events_stateful_profile",
    "wafer_pipeline_on_lineitem",
    # (c) stalest cohort: the 4 queries whose last green row is still r2
    # (they fell off the end of r14's 50-query window), then the r3 cohort
    # (35 queries) computed from the union of CORRECTNESS_r01-r14
    "pack_sequences",
    "layout_zorder_stats",
    "text_repetition_scores",
    "sample_topk_per_group",
    "observed_scan_metrics",
    "json_roundtrip",
    "partitioned_pruned_read",
    "orc_roundtrip",
    "bucketed_join_zeroshuffle",
    "python_datasource_scan",
    "compaction_small_files",
    "xml_roundtrip",
    "json_extract",
    "json_variant_agg",
    "transpose_metrics",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_order_priority",
    "tpch_q7_region_volume",
    "unpivot_measures",
    "events_sliding_window",
    "events_lag_lead",
    "events_sessionization",
    "events_stateful_profile_exact",
    "events_user_topk_arrow",
    "text_geomean_chars_udaf",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "split_leakage_audit",
    "doc_chunking",
    "corpus_datacard",
    "text_inverted_index",
    "text_editdist_pairs",
    "events_gapfill_ffill",
    "events_anomaly_mad",
    "events_moving_median",
    "graph_pagerank_suppliers",
    "recursive_cte_hierarchy",
    "sql_scripting_doubling",
    "wafer_features_pandas_api",
    # everything else (fresh r12-r14 rows or pytest-covered) follows in
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
