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
# row ever predates the implementation it vouches for. Round 6 front-loads:
# (a) the 8 rows-only queries promoted to exact oracles this round (5
# streaming drains, 3 approx-error-bound reworks), (b) the queries added
# this round (persisted IVF-PQ probe, auto-CC), (c) every query whose
# implementation changed AFTER its round-5 green row — the end-of-round-5
# hardening commit touched pq_codebook (all PQ/IVF-PQ consumers), the ivf
# cell-sim rounding, the LSH divisibility guard (all MinHash-LSH consumers)
# and the neardup quadratic call site, and this round folded the top-k tails
# into shared helpers, (d) the remaining rows-only queries so each keeps a
# fresh executes-cleanly row, then (e) known-green sentinels spanning
# families so a systemic regression is still visible. Names not listed
# follow in registration order; a listed name missing from the registry is
# a hard error (catches renames).
_PRIORITY: list[str] = [
    # (r7) new queries this round — must front the ~50-query driver window
    "dedup_duplicated_spans",  # ExactSubstr k-gram span dedup (was orphan code)
    "dedup_jaccard_pairs_auto",  # density-probe exact/LSH dispatch
    "dedup_strip_spans",  # span-removal action step over the spans output
    "text_contamination_spans",  # span-level benchmark decontamination
    "text_decontaminate_strip",  # decontaminate-by-surgery action step
    "dedup_incremental_spans",  # new-batch spans vs prebuilt gram index
    "dedup_incremental_spans_persisted",  # same probe from the parquet-loaded index
    "dedup_span_stats",  # per-source duplication datacard rollup
    "similarity_bruteforce_topk_arrow",  # within_tol oracle (was rows-only)
    "similarity_bruteforce_topk",  # size-gated arrow delegation added
    # (a0) round-6 session-2: new queries + rows-only promotions
    "graph_kcore_suppliers",  # unrolled-peeling oracle (was rows-only)
    # (a) promoted from rows-only to exact-oracle this round
    "events_streaming_tumbling",
    "events_streaming_sessions",
    "events_streaming_dedup",
    "events_streaming_join",
    "events_streaming_left_join",  # sentinel-punctuation watermark flush
    "iqr_cascade_approx",  # within_tol boolean vs exact cascade
    "approx_aggregates",  # within_tol booleans vs exact aggs
    "events_hll_weekly_users",  # within_tol boolean vs exact distinct
    # (b) new this round
    "similarity_ivfpq_probe_prebuilt",  # persisted parquet index, no retrain
    "dedup_cluster_assignment_auto",  # budgeted-propagation probe + star fallback
    "similarity_nsw_topk",  # graph ANN: kNN-graph build + fixed-hop beam search
    # (c) implementation changed after the last green driver row
    "embedding_pq_codes",  # pq_codebook k-lowest-ids seed (r5-end hardening)
    "embedding_pq_adc_topk",  # + shared _two_level_topk tail (this round)
    "embedding_pq_recall_at5",
    "embedding_pq_train_step",
    "similarity_ivfpq_topk",  # probe helper + shared top-k tail
    "similarity_ivf_topk",  # 6dp cell-sim rounding before probe ranking
    "dedup_minhash_lsh_pairs",  # n_hashes % n_bands guard
    "dedup_incremental_vs_index",  # same guard in minhash_lsh_probe
    "similarity_neardup_pairs",  # allow_quadratic at the intentional call site
    "dedup_cluster_assignment",  # cluster_assignment algorithm dispatch dict
    "dedup_cluster_assignment_star",
    # (d) rows-only refresh (weaker rows — keep them recent anyway)
    "dedup_mllib_minhash_lsh",
    "similarity_lsh_pairs",
    "embedding_pca_projection",
    "embedding_zca_whiten",
    "text_bpe_token_stats",
    "text_bpe_learned_merges",
    "events_stateful_profile",
    "wafer_pipeline_on_lineitem",
    # (e) known-green sentinels, one per family, fill the ~50-query window
    "flagship_iqr_summary",
    "filter_project",
    "csv_roundtrip",
    "dedup_exact",
    "dedup_prefix_jaccard_pairs",
    "text_quality_scores",
    "events_tumbling_window",
    "events_session_window_native",
    "events_streaming_mv_q1",
    "events_streaming_foreachbatch_upsert",
    "curation_pipeline",
    "tpch_q1_pricing_summary",
    "tpch_q9_profit_by_nation",
    "semantic_dedup_keep",
    "multimodal_image_decode_stats",
    "sketch_cms_frequency",
    "sketch_mg_heavy_hitters",
    "graph_triangle_count",
    "zonemap_pruned_agg",
    "merge_upsert",
    "rag_rerank_mmr",
    "sample_group_split",
    "events_windowed_quantiles",
    # everything else (driver-green in r1-r5) follows in registration order;
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
