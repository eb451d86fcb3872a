"""Parallelism guard for CPU-bound expansion stages.

A stage that expands each row by a large constant factor (shingle explode,
per-dimension posexplode, per-token hashing) inherits its parallelism from
the upstream SCAN. When the input sits in fewer files than the session has
cores — the local test shape, and the small-file tail of any lakehouse —
the expensive stage runs on a handful of tasks while the rest of the
cluster idles. ``fan_out`` repartitions ONLY in that case: the shuffle
moves the raw (narrow) rows, orders of magnitude cheaper than the k×
expansion it parallelizes; when the scan already yields >= parallelism
partitions (the at-scale case), it is a no-op and adds no shuffle.

Safe only for partitioning-invariant computations (every consumer here
aggregates with min/sum/avg or joins on keys); do NOT use upstream of
``monotonically_increasing_id`` or other partition-sensitive expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism iff its scan
    looks narrower than that (``min_factor`` scales the target for
    extra-heavy expansions).

    The probe is ``df.inputFiles()`` — a logical-plan file listing that does
    NOT force physical planning (the old ``df.rdd.getNumPartitions()``
    planned the whole upstream query a second time; VERDICT r3). File count
    is a proxy for scan parallelism: exact for the small-file shapes this
    guard exists for, an underestimate for large splittable files — which
    only triggers a narrow-row repartition that is cheap relative to the
    expansion it parallelizes, and at scale file count >> cores makes the
    guard a no-op anyway. Non-file sources fall back to the physical probe.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    try:
        n_src = len(df.inputFiles())
    except Exception:
        n_src = 0
    if n_src == 0:  # non-file source (createDataFrame, RDD-backed)
        n_src = df.rdd.getNumPartitions()
    if n_src < target:
        return df.repartition(target)
    return df
