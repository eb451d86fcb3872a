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
# samples only ~50 entries per round, so with 190 registered queries the
# order must ROTATE. Round 5 finishes the evidence matrix (VERDICT r4 item
# 1): front-load (a) the 3 oracle-bearing queries that have never seen a
# driver row, (b) sample_stratified (its only driver row is a stale r2
# "no_oracle" err from before it was rebuilt with an exact oracle), (c) the
# 4 queries whose implementation changed in round 4 after their last green
# row, (d) the queries added or changed THIS round (new exact-oracle twins
# for ZCA/BPE/Misra-Gries; the ceil-relaxed prefix join; the cloned-session
# Bloom join), (e) the 13 rows-only queries that have never had a rows>0
# row, (f) the 3 r2-era rows-only entries whose latest row predates two
# rounds of rework, then (g) known-green sentinels spanning families so a
# systemic regression is still visible. Names not listed follow in
# registration order; a listed name missing from the registry is a hard
# error (catches renames).
_PRIORITY: list[str] = [
    # (a) oracle-bearing, never driver-tested (r1-r4)
    "text_url_domain_stats",
    "text_paragraph_dedup",
    "events_streaming_static_left_enrich",
    # (b) stale r2 err row; now deterministic hash-threshold with exact oracle
    "sample_stratified",
    # (c) changed in round 4 after their last green row — re-verification
    "wafer_pipeline_on_lineitem",  # pin-free metadata row id
    "events_streaming_foreachbatch_upsert",  # state moved off-driver
    "events_session_window_native",  # oracle tie-break by event_id
    "events_streaming_mv_q1",  # null-safe merge
    # (d) new or changed this round
    "embedding_zca_identity_check",  # new: whitened covariance == identity
    "text_bpe_fixture_merges",  # new: provable micro-corpus merge table
    "text_bpe_fixture_stats",  # new: learn->encode roundtrip vs VALUES
    "sketch_mg_heavy_hitters",  # new: deterministic two-level Misra-Gries
    "embedding_pq_codes",  # new: integer-exact product quantization encode
    "embedding_pq_adc_topk",  # new: ADC search over PQ codes
    "embedding_pq_recall_at5",  # new: ADC recall vs exact integer-L2 top-k
    "embedding_pq_train_step",  # new: one distributed Lloyd step, monotone error
    "sketch_kmv_threshold_prune",  # new: sketch-gated exact hot-key profiling
    "dedup_incremental_vs_index",  # new: batch-vs-prebuilt-index LSH probe
    "privacy_l_diversity",  # new: sensitive-attribute diversity audit
    "rag_rerank_mmr",  # new: MMR diversification of the BM25 pool
    "pack_sequences_nosplit",  # new: stateful greedy packing, recursive oracle
    "events_drift_psi",  # new: population stability index drift monitor
    "basket_part_pairs_lift",  # new: association rules over order baskets
    "events_seasonal_backtest",  # new: day-of-week forecast MAE backtest
    "skew_key_diagnosis",  # new: Gini + top-k share salting report
    "graph_kcore_suppliers",  # new rows-only: iterative peeling k-core
    "text_containment_pairs",  # new: asymmetric wrapper/quote detection
    "pack_length_bucketing_waste",  # new: padding-waste accounting
    "similarity_ivfpq_topk",  # new: composed coarse-probe + ADC index
    "sample_group_split",  # new: group-coherent train/val/test split
    "dedup_prefix_jaccard_pairs",  # ceil relaxation in prefix/size filters
    "bloom_runtime_filter_join",  # cloned-session planning, no checkpoint
    "dq_audit_lineitem",  # empty-rules short-circuit in predicate_audit
    "similarity_neardup_pairs",  # knn_join_pairs quadratic guard added
    # (e) rows-only, never driver-tested — weakest marginal signal but each
    # should carry a rows>0 row at least once
    "events_hll_weekly_users",
    "dedup_mllib_minhash_lsh",
    "similarity_bruteforce_topk_arrow",
    "similarity_lsh_pairs",
    "embedding_pca_projection",
    "embedding_zca_whiten",
    "text_bpe_token_stats",
    "text_bpe_learned_merges",
    "events_streaming_tumbling",
    "events_streaming_sessions",
    "events_streaming_dedup",
    "events_streaming_join",
    "events_streaming_left_join",
    # (f) rows-only entries whose latest row is r2-era
    "iqr_cascade_approx",
    "approx_aggregates",
    "events_stateful_profile",
    # (g) known-green sentinels, one per family, fill the ~50-query window
    "flagship_iqr_summary",
    "filter_project",
    "csv_roundtrip",
    "dedup_exact",
    "dedup_cluster_assignment_star",
    "similarity_bruteforce_topk",
    "text_quality_scores",
    "events_tumbling_window",
    "curation_pipeline",
    "tpch_q1_pricing_summary",
    "tpch_q9_profit_by_nation",
    "semantic_dedup_keep",
    "multimodal_image_decode_stats",
    "sketch_cms_frequency",
    "graph_triangle_count",
    "zonemap_pruned_agg",
    "merge_upsert",
    "rag_chunk_retrieval",
    "training_hard_negatives",
    "events_windowed_quantiles",
    # everything else (driver-green in r1-r4) follows in registration order;
    # pytest's oracle-parity sweep still covers all of them every session
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
