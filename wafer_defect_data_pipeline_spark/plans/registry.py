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
# row ever predates the implementation it vouches for. Round 16 (optimization
# round 2) front-loads: (a) queries whose EXECUTION changed this round — the
# exact_dedup single-shuffle min_by callers, the dispatch family (decision
# readout fused to one collect, size probes threaded, brute-force truth
# stage fanned out + re-measured arrow crossover), the quantizer-build
# collect fusion consumers, the span-family filter-before-fan_out reorder,
# and the multimodal attach feeds behind the new size gate (closed at the
# oracle sfs — plans byte-identical there, listed anyway because the code
# path changed); (b) the 2 rows-only queries so each keeps a fresh
# executes-cleanly row (the wafer pipeline additionally carries this
# round's size-gated cascade pin); (c) the STALEST cohort by last driver
# green row — the union of CORRECTNESS_r01-r15 puts 4 queries at r3 and
# the r4 cohort next (alphabetical within cohort). Names not listed follow
# in registration order; a listed name missing from the registry is a hard
# error (catches renames).
_PRIORITY: list[str] = [
    # (a) execution changed THIS round (r16)
    "dedup_exact",  # exact_dedup unique_order=True: one min_by exchange
    "curation_pipeline",  # same single-shuffle exact_dedup call site
    "curation_end_to_end",  # same + stage counters over the min_by stage 1
    "similarity_bruteforce_topk",  # fan_out on the HOF scoring corpus
    "similarity_ivf_topk",  # fan_out on the member-scoring corpus
    "similarity_ivf_auto_topk",  # fused recall readout + arrow crossover
    "similarity_ann_auto_dispatch",  # one-collect decision + arrow crossover
    "similarity_ann_dispatch_labelfree",  # decision machinery
    "similarity_ann_dispatch_prebuilt",  # decision + collect()-max load
    "similarity_ann_dispatch_redecide",  # n= threading + fused readout
    "similarity_ann_dispatch_recall_drift",  # same + n_corpus recall counts
    "similarity_streaming_ann_probe",  # rides the dispatch machinery
    "similarity_ivf_kmeans_topk",  # quantizer seed-check fused into codebook collect
    "similarity_nsw_topk",  # same quantizer build inside knn_graph
    "multimodal_image_decode_stats",  # size-gated attach fan_out (gate closed at oracle sfs)
    "multimodal_jpeg_decode_stats",  # same
    "multimodal_image_phash_pairs",  # same
    "dedup_duplicated_spans",  # span gram filter before fan_out (plan-identical)
    "text_decontaminate_strip",  # same
    # (b) rows-only refresh (wafer also carries the r16 size-gated pin)
    "events_stateful_profile",
    "wafer_pipeline_on_lineitem",
    # (c) stalest cohort: last green r3, then the r4 cohort (alphabetical)
    "graph_pagerank_suppliers",
    "recursive_cte_hierarchy",
    "sql_scripting_doubling",
    "wafer_features_pandas_api",
    "dedup_quality_keep",
    "embedding_covariance",
    "embedding_quantization_recall",
    "events_cohort_retention",
    "events_range_join",
    "events_streaming_available_now",
    "events_streaming_static_enrich",
    "events_user_profile",
    "events_windowed_quantiles",
    "graph_triangle_count",
    "multimodal_audio_decode_stats",
    "multimodal_frame_sample",
    "multimodal_size_by_lang",
    "numeric_correlations",
    "price_histogram",
    "privacy_k_anonymity",
    "rag_chunk_retrieval",
    "sample_shuffled_head",
    "schema_evolution_read",
    "sketch_cms_join_size",
    "sketch_kmv_distinct",
    "text_boilerplate_ngrams",
    "text_fingerprints",
    "text_language_profile",
    # everything else (fresh r12-r15 rows or pytest-covered) follows in
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
