"""Skew-mitigation operators (SURVEY.md §7.7 scale hardening).

AQE's skew-join splitting (enabled in session.py) handles most runtime skew;
these are the *explicit* tools for the cases AQE can't fix — a known hot key
feeding a shuffle join whose one partition would otherwise dwarf the rest,
or a high-cardinality aggregation whose combiner can't keep up.

``salted_join``: replicate the small side ``n_salts`` ways and scatter the
big side's hot keys uniformly across the replicas. The join key becomes
(key, salt), so the hot key's rows land on ``n_salts`` reducers instead of
one. Results are identical to the plain join (verified by oracle), cost is
|small| × n_salts extra rows — only worth it when the small side is small
and the big side is skewed, which is exactly the broadcast-threshold gap:
too big to broadcast, too skewed to shuffle plainly.

``two_phase_agg``: pre-aggregate on (key, salt) then finish on key. Spark's
map-side partial aggregation already does this per-task; the explicit salt
round helps when per-task partials stay large (many distinct groups per
task or expression state too big to combine early).
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join with the big side's rows scattered over ``n_salts`` buckets.

    ``how`` must be a big-side-preserving type ('inner' / 'left'): every
    small-side row exists in all buckets, so big-side multiplicity is
    unchanged; a 'right'/'full' join would multiply unmatched small rows.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join preserves big-side semantics only for inner/left, got {how!r}")
    # Salt must NOT depend on row content: byte-identical rows (the common
    # case in skewed hot-key data) would all hash to one salt bucket and the
    # mitigation would degrade to an unsalted join exactly when it's needed.
    # monotonically_increasing_id encodes (partition, row-in-partition), so
    # pmod round-robins every partition's rows across all buckets — uniform
    # by construction; the join result is salt-invariant either way.
    big_s = big.withColumn(
        SALT, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    small_s = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, on=on + [SALT], how=how).drop(SALT)


def two_phase_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 32,
) -> DataFrame:
    """Salted two-phase aggregation for algebraic aggregates.

    ``partial_aggs`` run per (keys, salt); ``final_aggs`` merge the partials
    per keys. Caller guarantees the pair is a valid decomposition
    (sum/sum, count/sum, min/min, max/max, ...).
    """
    # Content-independent salt for the same reason as salted_join: identical
    # rows under one hot group must still scatter across partial aggregators.
    salted = df.withColumn(
        SALT, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    partial = salted.groupBy(*keys, SALT).agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def bloom_runtime_filtered_join(
    spark,
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
) -> DataFrame:
    """Shuffle join with Catalyst's runtime Bloom-filter semi-join reduction
    forced on — the row-level analogue of zonemap file skipping.

    When the dim side carries a selective filter, Catalyst's
    InjectRuntimeFilter rule builds a Bloom filter over the dim keys in a
    subquery and pushes ``might_contain(key)`` into the FACT scan, so
    non-matching fact rows are dropped BEFORE the shuffle. At 100 TB this
    is the difference between shuffling the whole fact table and shuffling
    only the ~join-surviving fraction; false positives only cost shuffle
    bytes — the join itself stays exact.

    Local thresholds block injection (the application side must look like
    10 GB+ by default, and a broadcastable dim takes the broadcast path
    where no Bloom is needed), so the confs must be pinned — but NOT on the
    shared session: mutating session-global confs would silently re-plan any
    concurrently-planned query (no broadcast joins during the window), and
    the eager-checkpoint-then-restore workaround truncates lineage, making
    executor loss unrecoverable. Instead the join is planned in a CLONED
    session (``spark.newSession()`` — isolated SQLConf, shared
    SparkContext): the inputs cross over via global temp views, the clone
    pins the confs for the lifetime of the returned DataFrame (downstream
    transformations stay clone-bound, so the Bloom rule fires at action
    time), and the caller's session is never touched.
    """
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    clone = spark.newSession()
    for k, v in confs.items():
        clone.conf.set(k, v)
    # Global temp views are the one catalog namespace shared across
    # sessions; unique names keep concurrent calls from clobbering each
    # other, and the views are dropped as soon as analysis has resolved
    # them into the joined plan.
    tag = uuid.uuid4().hex
    fact_view, dim_view = f"__bloom_fact_{tag}", f"__bloom_dim_{tag}"
    fact.createOrReplaceGlobalTempView(fact_view)
    dim.createOrReplaceGlobalTempView(dim_view)
    try:
        f = clone.table(f"global_temp.{fact_view}")
        d = clone.table(f"global_temp.{dim_view}")
        joined = f.join(d, f[fact_key] == d[dim_key])
        joined.schema  # force analysis so dropping the views below is safe
        return joined
    finally:
        spark.catalog.dropGlobalTempView(fact_view)
        spark.catalog.dropGlobalTempView(dim_view)
