"""Per-step standardization + KMeans with label write-back (reference M1-M3).

Reference semantics (``/root/reference/src/preprocessing.py:153-208``): for
each analysed step, take rows with ``IS_DEFECT == 'REAL'`` and that step,
project the 18 cluster features, drop rows with any null, z-score the
subset, run KMeans(k=2, seed=42, n_init=10), and write labels back at the
original row positions — all other rows get a null ``KMeans_Cluster``.

Two execution modes, same API:

- ``mode="distributed"`` (default, the 100 TB path): per step, compute
  mean/stddev_pop per feature in ONE aggregate (map-side combinable, tiny
  result), broadcast them into the projection, and run MLlib
  ``KMeans(k, seed)`` on the assembled vector. Label write-back is a join on
  a pinned row id — no index alignment, no driver-side data.
- ``mode="parity"``: one ``applyInPandas`` over the analysed subset grouped
  by step; inside each Arrow batch the numpy kernel
  (:mod:`..functions.kmeans_np`) reproduces the reference's
  scale→kmeans→label flow bit-for-bit with the test replica. Requires each
  step's REAL-defect subset to fit one task — the small-data parity mode.
- ``mode="auto"``: one tiny count-per-step agg decides: every step under
  ``auto_parity_max_rows`` → the single-job Arrow/numpy path (an MLlib fit
  costs a fixed multi-job overhead that dwarfs small-group math); any step
  over it → the distributed path. The 100 TB run picks MLlib by itself; a
  per-step-small run skips the scheduler overhead entirely.

Cluster ids are arbitrary in every implementation (sklearn, MLlib, numpy);
comparisons must be label-permutation-invariant (SURVEY.md §2.6 M2).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.kmeans_np import kmeans_fit_predict, standardize
from ..schema import CLUSTER_FEATURES, DEFAULT_STEPS_TO_ANALYSE

ROW_ID = "__row_id"

#: run_kmeans_by_step's persisted narrow subsets, unpersisted at the next
#: invocation (every bench/oracle run must compute from parquet — r15).
_PERSISTED_SUBSETS: list[DataFrame] = []


def with_row_id(df: DataFrame) -> DataFrame:
    """Attach a stable surrogate row id, pin-free whenever possible.

    Default path: derive the id from the scan's hidden file metadata —
    ``_metadata.file_path`` densely ranked per file, plus
    ``_metadata.row_index`` within the file. That id is a pure function of
    the stored bytes: deterministic across re-executions with NO
    materialization, so branch-and-rejoin lineages (the label write-back
    join) need no pin at any data scale. The file-rank side of the join is
    one row per input FILE (metadata-scale) and broadcast. The metadata
    column resolves through narrow transforms (project/filter/withColumn)
    but not through joins — attach the id at the scan, as
    ``WaferPipeline.preprocess`` and the registered wafer query do.

    Fallback (non-file sources, or metadata hidden by an upstream join):
    ``monotonically_increasing_id`` is deterministic only within one
    materialization, so the id'd frame is pinned with localCheckpoint to
    stop re-execution renumbering rows (SURVEY.md §7 risk register). The
    pin materializes the FULL-WIDTH frame in executor memory — the cost the
    metadata path exists to avoid; on a cluster prefer reliable
    ``df.checkpoint()`` if the fallback must run on a big frame.
    """
    import re as _re

    try:
        tagged = df.withColumns(
            {
                "__src_file": F.col("_metadata.file_path"),
                "__src_pos": F.col("_metadata.row_index"),
            }
        )
        files = df.inputFiles()
    except Exception:
        return df.withColumn(ROW_ID, F.monotonically_increasing_id()).localCheckpoint(eager=False)
    if not files:
        return df.withColumn(ROW_ID, F.monotonically_increasing_id()).localCheckpoint(eager=False)

    # Dense file rank built DRIVER-SIDE from the scan's file listing (pure
    # metadata — no Spark job; a first cut ranked via distinct()+window over
    # the _metadata column, which re-scanned the table once per action).
    # inputFiles() renders local URIs as file:///p while _metadata.file_path
    # renders file:/p, so both sides compare on the scheme-stripped form.
    _SCHEME = r"^[a-zA-Z][a-zA-Z0-9+.-]*:/+"
    rank_rows = [(p, i) for i, p in enumerate(sorted({_re.sub(_SCHEME, "", f) for f in files}))]
    norm = F.regexp_replace("__src_file", _SCHEME, "")
    # row_index fits 40 bits for any real parquet file; 2^23 files headroom
    if len(rank_rows) <= 64:
        # few files: a literal-map lookup is a PURE PROJECTION — no join, no
        # broadcast exchange re-executed by every downstream job (the
        # branch-heavy wafer pipeline runs ~10 jobs per action; a broadcast
        # join here cost it ~2s at sf0.1)
        mapping = F.create_map(*[x for p, i in rank_rows for x in (F.lit(p), F.lit(i))])
        fidx = F.element_at(mapping, norm)
    else:
        # many files (the 100 TB shape): broadcast hash join on the rank
        # table — one tiny exchange, hash-lookup per row
        file_rank = df.sparkSession.createDataFrame(rank_rows, "__src_norm string, __src_fidx int")
        tagged = tagged.withColumn("__src_norm", norm).join(F.broadcast(file_rank), on="__src_norm")
        fidx = F.col("__src_fidx")
    return (
        tagged.withColumn(ROW_ID, F.shiftleft(fidx.cast("long"), 40) + F.col("__src_pos"))
        .drop("__src_norm", "__src_file", "__src_pos", "__src_fidx")
    )


def _analysed_subset(df: DataFrame, steps: list[str], features: list[str]) -> DataFrame:
    return (
        df.filter((F.col("IS_DEFECT") == "REAL") & F.col("Step_desc").isin(steps))
        .select(ROW_ID, "Step_desc", *features)
        .na.drop("any", subset=features)
    )


def _step_stats(subset: DataFrame, features) -> list:
    """ONE job for every step's mean/stddev_pop/count (map-side combinable,
    |steps| result rows — safe to collect at any scale). Doubles as the
    empty-step guard and the auto-mode size probe, and populates the
    persisted narrow subset before any concurrent fits race to be first."""
    return (
        subset.groupBy("Step_desc")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.avg(c).alias(f"m_{c}") for c in features],
            *[F.stddev_pop(c).alias(f"s_{c}") for c in features],
        )
        .collect()
    )


def _predictions_distributed(subset: DataFrame, steps, features, n_clusters, random_state, stats) -> DataFrame | None:
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.ml.clustering import KMeans as MLKMeans
    from pyspark.ml.feature import VectorAssembler

    by_step = {r["Step_desc"]: r for r in stats if r["__n"] > 0}
    todo = [s for s in steps if s in by_step]
    if not todo:
        return None

    def fit_one(step: str) -> DataFrame:
        r = by_step[step]
        # z-score with collected literals (ddof=0 parity; zero-std scales 1.0)
        scaled_cols = [
            (
                (F.col(c) - F.lit(float(r[f"m_{c}"])))
                / F.lit(1.0 if not r[f"s_{c}"] else float(r[f"s_{c}"]))
            ).alias(f"z_{c}")
            for c in features
        ]
        scaled = subset.filter(F.col("Step_desc") == step).select(ROW_ID, *scaled_cols)
        assembled = VectorAssembler(
            inputCols=[f"z_{c}" for c in features], outputCol="__features"
        ).transform(scaled)
        model = MLKMeans(k=n_clusters, seed=random_state, featuresCol="__features").fit(assembled)
        return model.transform(assembled).select(
            ROW_ID, F.col("prediction").cast("int").alias("KMeans_Cluster")
        )

    # per-step models are independent — fit them as concurrent Spark jobs
    with ThreadPoolExecutor(max_workers=len(todo)) as ex:
        preds = list(ex.map(fit_one, todo))
    out = preds[0]
    for p in preds[1:]:
        out = out.unionByName(p)
    return out


def _predictions_parity(subset: DataFrame, features, n_clusters, random_state) -> DataFrame:
    feat_list = list(features)

    def cluster_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ROW_ID)  # deterministic row order per group
        X = standardize(pdf[feat_list].to_numpy(dtype=np.float64))
        labels = kmeans_fit_predict(X, n_clusters=n_clusters, random_state=random_state)
        return pd.DataFrame({ROW_ID: pdf[ROW_ID].to_numpy(), "KMeans_Cluster": labels.astype(np.int32)})

    return subset.groupBy("Step_desc").applyInPandas(
        cluster_group, schema=f"{ROW_ID} long, KMeans_Cluster int"
    )


def run_kmeans_by_step(
    df: DataFrame,
    steps_to_analyse: Iterable[str] | None = None,
    features: Sequence[str] | None = None,
    n_clusters: int = 2,
    random_state: int = 42,
    mode: str = "distributed",
    auto_parity_max_rows: int = 1_000_000,
) -> DataFrame:
    """Cluster each analysed step's REAL defects; null label elsewhere.

    Returns the input plus nullable int ``KMeans_Cluster`` (the pandas
    ``Int64`` workaround at reference preprocessing.py:185,207 disappears —
    Spark ints are natively nullable).
    """
    steps = list(steps_to_analyse) if steps_to_analyse else DEFAULT_STEPS_TO_ANALYSE
    feats = list(features) if features else CLUSTER_FEATURES

    had_row_id = ROW_ID in df.columns
    base = df if had_row_id else with_row_id(df)
    # Persist the NARROW analysed subset (row id + step + features), not the
    # full-width frame: the stats job and every per-step fit re-read exactly
    # these columns, and without a reuse point each would recompute the whole
    # upstream lineage (scan + outlier cascade) per job. This replaces the
    # old full-width localCheckpoint — O(analysed rows × |features|) storage
    # instead of O(table), spillable to disk, and no longer load-bearing for
    # correctness (the metadata row id is deterministic without it).
    #
    # Unpersist the PRIOR invocation's subset here (r15 ADVICE): Spark's
    # CacheManager matches entries by analyzed plan, so a leaked persist
    # would silently serve run 1's blocks to every later same-plan
    # invocation in the process (the r15 bench-honesty bug). Evicting the
    # tracked frame is scoped to THIS operator's leak — unlike the former
    # spark.catalog.clearCache() at one query's entry, which wiped every
    # cache entry in the session.
    while _PERSISTED_SUBSETS:
        try:
            _PERSISTED_SUBSETS.pop().unpersist()
        except Exception:  # noqa: BLE001 — a dead session's handle is fine
            pass
    subset = _analysed_subset(base, steps, feats).persist()
    _PERSISTED_SUBSETS.append(subset)

    stats = None
    if mode == "auto":
        stats = _step_stats(subset, feats)
        biggest = max((r["__n"] for r in stats), default=0)
        mode = "parity" if biggest <= auto_parity_max_rows else "distributed"

    if mode == "distributed":
        if stats is None:
            stats = _step_stats(subset, feats)
        preds = _predictions_distributed(subset, steps, feats, n_clusters, random_state, stats)
    elif mode == "parity":
        preds = _predictions_parity(subset, feats, n_clusters, random_state)
    else:
        raise ValueError(f"unknown clustering mode: {mode!r}")

    if preds is None:
        out = base.withColumn("KMeans_Cluster", F.lit(None).cast("int"))
    else:
        out = base.join(preds, on=ROW_ID, how="left")
    return out if had_row_id else out.drop(ROW_ID)
