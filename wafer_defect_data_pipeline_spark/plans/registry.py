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
# row ever predates the implementation it vouches for. Round 11 front-loads:
# (a) queries NEW or CHANGED this round — the restart drills (durable
# DeltaManifest transaction log + checkpointLocation-real recovery), the
# hyperplane-LSH and graph-ANN-scale promotions/additions, the PNG decode
# path, every delta loop whose body gained the durable checkpoint call,
# and the r10 cohort whose helpers were touched; (b) the 4 remaining
# rows-only queries so each keeps a fresh executes-cleanly row; (c)
# REPRESENTATIVES OF EVERY FAMILY with older last-seen driver rows so the
# 248-oracle matrix doesn't age. Names not listed follow in registration
# order; a listed name missing from the registry is a hard error (catches
# renames).
_PRIORITY: list[str] = [
    # (a) new or changed THIS round (r12): the 4:2:0 chroma-subsampled JPEG
    # decode (2x2 luma MCUs + box-downsampled chroma + DRI/RSTn restart
    # markers — narrows the codec honesty gate to progressive scans only)
    "multimodal_jpeg_420_decode_stats",  # NEW r12: 4:2:0 + restart markers
    "multimodal_jpeg_progressive_decode_stats",  # NEW r12: SOF2 multi-scan decode
    "similarity_ivf_auto_topk",  # NEW r12: self-recall-derived probe count
    "privacy_dp_group_counts",  # NEW r12: discrete-Laplace DP counts
    "multimodal_decode_quarantine",  # NEW r12: corrupt-payload quarantine split
    "multimodal_audio_quarantine",  # NEW r12: audio twin of the quarantine split
    "multimodal_video_quarantine",  # NEW r12: video twin (per-frame rows + error rows)
    "dedup_mllib_minhash_lsh",  # CHANGED r12: hashed feature space (no global window)
    "text_bpe_token_stats",  # PROMOTED r12: exact SQL replay of greedy BPE
    "text_bpe_learned_merges",  # PROMOTED r12: unrolled 6-round learning oracle
    # (a, r11) new or changed last round: the restart drills (durable
    # DeltaManifest transaction log + checkpointLocation-real recovery),
    # their delta/rewrite siblings (shared bodies refactored into
    # factories), the hyperplane-LSH promotion to an exact oracle (staged
    # seed-42 hyperplanes), and the PNG decode path
    "dedup_streaming_incremental_spans_restart",  # NEW: kill-between-days recovery
    "dedup_streaming_minhash_probe_restart",  # NEW: kill-between-days recovery
    "entity_streaming_linkage_restart",  # NEW: kill-between-days recovery
    "similarity_streaming_ann_restart",  # NEW: kill-between-days recovery (all 5 loops)
    "text_bm25_standing_restart",  # NEW: kill-between-days recovery (all 5 loops)
    "dedup_streaming_spans_time_travel",  # NEW: as-of reads from the manifest log
    "multimodal_jpeg_decode_stats",  # NEW: executed baseline JPEG codec
    "curation_token_budget_select",  # NEW: token-budget mixture selection
    "multimodal_jpeg_color_decode_stats",  # NEW: 4:4:4 color JPEG path
    "similarity_lsh_pairs",  # PROMOTED: exact oracle (staged hyperplanes)
    "similarity_nsw_scale_topk",  # NEW: sampled-entry scale config, recall 0.97@sf1
    "multimodal_png_decode_stats",  # NEW: executed zlib PNG decode
    "dedup_streaming_incremental_spans_delta",  # body refactored into factory
    "dedup_streaming_incremental_spans",  # rewrite twin, shared-oracle refactor
    "similarity_streaming_ann_probe",  # delta discipline + retry idempotency
    "entity_matches_multipass",  # NEW: rotated-key multi-pass SNM
    "graph_lpa_communities",  # internal symmetrize (undirected semantics)
    "training_lr_quality",  # loss-term clamp for saturated sigmoids
    "training_lr_scores",
    "csv_roundtrip",  # sink module touched (defaultFS-aware BOM guard)
    "text_bm25_standing_query",  # NEW: streaming index maintenance, standing query
    "dedup_streaming_minhash_probe_delta",  # NEW: O(batch) signature admits
    "dedup_streaming_minhash_probe",  # streaming family siblings (shared stager)
    "entity_streaming_linkage_delta",  # NEW: O(batch) record admits
    "entity_streaming_linkage",
    "entity_matches_sorted",  # SNM single-pass siblings (shared operator)
    "entity_matches_blocked",
    "entity_clusters",
    "entity_golden_records",
    "entity_incremental_clusters",
    "entity_match_weights",
    "entity_match_scores",
    "dedup_incremental_spans_merged",  # span-family siblings (shared probe)
    "dedup_incremental_spans",
    "dedup_incremental_spans_persisted",
    "dedup_duplicated_spans",
    "dedup_strip_spans",
    "dedup_span_stats",
    "dedup_jaccard_pairs_auto",
    "dedup_minhash_lsh_pairs",  # exact-twin anchor of the promoted query
    "similarity_nsw_probe_prebuilt",
    "training_importance_resample",
    "curation_snapshot_diff",
    "privacy_delete_propagation",
    "multimodal_image_phash_pairs",
    "multimodal_audio_fingerprint_pairs",
    "multimodal_video_neardup_pairs",
    "text_html_strip",
    "text_split_contamination_stats",
    "embedding_pca_projection",
    "embedding_zca_whiten",
    "similarity_bruteforce_topk",
    "similarity_bruteforce_topk_arrow",
    "text_contamination_spans",
    "text_decontaminate_strip",
    # (b) rows-only refresh (now only 2: wafer KMeans + float stateful
    # profile, both inherently non-SQL; the BPE pair was PROMOTED in r12;
    # similarity_lsh_pairs left this list in r11 — promoted to an exact
    # oracle with staged hyperplanes, now in section (a))
    "events_stateful_profile",
    "wafer_pipeline_on_lineitem",
    # (c) stale-family representatives (last driver row r5 or older)
    "multimodal_video_frame_stats",  # r4 — multimodal video
    "multimodal_audio_spectrum_peak",  # r4
    "multimodal_binary_metadata",  # r2
    "scd2_priority_history",  # r3 — curation SCD2/CDC
    "merge_upsert",  # r3
    "curation_pipeline",
    "text_bm25_topk",  # r3 — search
    "text_inverted_index",  # r3
    "rag_chunk_retrieval",  # r4
    "timeseries_monthly_growth",  # r1 — timeseries
    "events_hypertable_rollup",  # r2
    "events_asof_join",  # r2
    "events_funnel",  # r2
    "events_streaming_static_enrich",  # r4 — stream-static join
    "tpch_q3_top_orders",  # r1 — TPC-H joins
    "tpch_q5_regional_revenue",  # r1
    "tpch_q17_small_quantity",  # r1
    "tpch_q22_idle_balance",  # r1
    "window_topk_per_group",  # r1 — window family
    "join_salted_skew",  # r1 — skew handling
    "rollup_counts",  # r1 — grouping sets
    "range_filter",  # r2 — reference §2 ops
    "grouped_quantiles",  # r2
    "crosstab_pivot",  # r2
    "value_counts",  # r2
    "text_tfidf_topk",  # r2 — text analysis
    "text_language_id",  # r2
    "text_benchmark_contamination",  # r2
    "embedding_vector_stats",  # r2 — embeddings
    "embedding_label_centroids",  # r2
    "sample_mixture_weights",  # r2 — sampling
    "pack_sequences",  # r2 — packing
    "layout_zorder_stats",  # r2 — layout
    "json_variant_agg",  # r3 — semi-structured
    "recursive_cte_hierarchy",  # r3 — SQL features
    "graph_pagerank_suppliers",  # r3 — graph
    "privacy_k_anonymity",  # r4 — privacy
    "sketch_kmv_distinct",  # r4 — sketches
    "dq_audit_lineitem",  # r5 — data quality
    "wafer_features_pandas_api",  # r3 — pandas-on-Spark surface
    # everything else (driver-green in r1-r7) follows in registration order;
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
