"""Mergeable sketch operators, built relationally (extension surface §2.9).

A 100 TB curation pipeline constantly needs cheap cardinality / frequency
answers ("how many distinct urls per shard?", "which n-grams are hot?")
where exact counting would shuffle the corpus. Spark ships HLL
(``hll_sketch_agg`` — used by the weekly-rollup queries) and a binary
``count_min_sketch`` aggregate, but the JVM sketch blobs are opaque to SQL
and to the DuckDB oracle. These operators build the same two classic
sketches RELATIONALLY — md5-derived hash functions, sketch state as plain
(row, bucket, count) tables — so they are deterministic, mergeable with a
``groupBy().sum()``, and every estimate is exactly reproducible in the
oracle SQL. The md5-as-hash trick mirrors the MinHash/SimHash operators
(operators/dedup.py).

- **KMV (k minimum values)** distinct-count estimator: keep the k smallest
  normalized hashes of the distinct values; estimate = (k-1)/u_k where u_k
  is the k-th smallest. Per-group state is k longs — a groupBy window over
  hashes, never a count-distinct shuffle of raw values. (Bar-Yossef et al.,
  RANDOM'02 — public literature; the same estimator family as Theta/KMV
  sketches in Apache DataSketches.)
- **Count-Min** frequency estimator: depth×width counter matrix, cell
  (r, md5_r(x) mod w) += weight; point estimate = min over rows. State is
  d·w cells regardless of corpus size; builds map-side like any groupBy.
  (Cormode & Muthukrishnan, J. Algorithms'05 — public literature.)

Hash convention: ``md5(prefix || value)`` first 15 hex chars → 60-bit
integer (fits a signed long on both Spark and DuckDB's 0x-cast).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_BITS = 60
_HASH_SPACE = float(1 << _HASH_BITS)


def _hash60(prefix: str, c: Column) -> Column:
    """Deterministic 60-bit hash of a column value (string-cast)."""
    h = F.md5(F.concat(F.lit(prefix), c.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def kmv_distinct_estimate(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Per-group approximate distinct count via k minimum hash values.

    Output ``(group_col, est_distinct)`` with ``est_distinct`` = (k-1)/u_k,
    u_k the k-th smallest distinct normalized hash (falls back to the exact
    distinct count when a group has fewer than k distinct values — the
    sketch holds them all, so exactness is free).

    Shuffle: one distinct on (group, hash60) — same key shape an exact
    count-distinct needs. The k-minimum selection is TWO-LEVEL because
    min-k is a mergeable aggregate (the global k smallest of a union are
    among the k smallest of each part): level 1 keeps k per (group,
    physical partition), so no single reducer ever sorts a whole group's
    distinct hashes — the thing that melts on a billion-distinct group —
    and the global window then ranks at most k·partitions survivors per
    group. The distinct-hash count rides a separate map-side-combinable
    agg (it must count ALL hashes, not survivors, for the exact-below-k
    fallback). Results are independent of the physical partitioning
    (asserted by the shuffle-partition-invariance test).
    """
    from pyspark.sql import Window as W

    hashed = df.select(
        F.col(group_col), _hash60("kmv:", F.col(value_col)).alias("__h")
    ).distinct()
    counts = hashed.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    w1 = W.partitionBy(group_col, "__pid").orderBy("__h")
    surv = (
        hashed.withColumn("__pid", F.spark_partition_id())
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .select(group_col, "__h")
    )
    w = W.partitionBy(group_col).orderBy("__h")
    ranked = surv.select(
        group_col, "__h", F.row_number().over(w).alias("__r")
    ).join(F.broadcast(counts), group_col)
    kth = ranked.filter(
        (F.col("__r") == F.least(F.lit(k), F.col("__n")))
    )
    return kth.select(
        group_col,
        F.when(F.col("__n") < k, F.col("__n").cast("double"))
        .otherwise(F.lit(float(k - 1)) / (F.col("__h") / F.lit(_HASH_SPACE)))
        .alias("est_distinct"),
    )


def cms_build(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-Min sketch as a ``(r, b, cnt)`` table (depth·width cells max).

    Each input row increments one bucket per hash row; the groupBy combines
    map-side, so the shuffle carries at most depth·width rows per task.
    Sketches for different shards/days union + re-groupBy to merge.

    ONE scan: the depth bucket ids are computed as an array per input row
    and exploded — a union of per-row projections would re-read the corpus
    ``depth`` times.
    """
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (_hash60(f"cms{r}:", F.col(value_col)) % width).alias("b"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("p"))
        .select("p.r", "p.b")
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_point_estimate(
    sketch: DataFrame, probes: DataFrame, value_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Estimated frequency for each probe value: min over hash rows of the
    probe's bucket counter. The sketch is tiny (depth·width cells) and is
    broadcast; probes never shuffle. Estimates only over-count (collisions
    add), never under-count — the classic CMS guarantee, asserted in tests.
    """
    keyed = probes.select(F.col(value_col).alias("probe")).distinct()
    for r in range(depth):
        keyed = keyed.withColumn(f"__b{r}", _hash60(f"cms{r}:", F.col("probe")) % width)
    longf = keyed.selectExpr(
        "probe",
        "stack({}, {}) as (r, b)".format(
            depth, ", ".join(f"{r}, __b{r}" for r in range(depth))
        ),
    )
    joined = longf.join(F.broadcast(sketch), ["r", "b"], "left").fillna(0, subset=["cnt"])
    return joined.groupBy("probe").agg(F.min("cnt").alias("est_count"))


def cms_inner_product(sk1: DataFrame, sk2: DataFrame) -> DataFrame:
    """Join-size estimate from two Count-Min sketches over the join keys:
    ``|R1 JOIN R2 on k| = sum_k f1(k)*f2(k)``, estimated as the MIN over
    hash rows of the bucket-wise inner product (Cormode & Muthukrishnan's
    inner-product query; one-sided overestimate, like point queries).

    This is how an optimizer prices a join WITHOUT running it: the two
    sketches are depth·width cells each regardless of table size, built in
    one map-side-combinable pass per side, and the estimate is a
    depth-row join + sum. Returns a 1-row ``(est_join_size)`` frame.
    """
    a = sk1.select("r", "b", F.col("cnt").alias("c1"))
    b = sk2.select("r", "b", F.col("cnt").alias("c2"))
    per_row = (
        a.join(b, ["r", "b"])
        .groupBy("r")
        .agg(F.sum(F.col("c1") * F.col("c2")).alias("ip"))
    )
    return per_row.agg(F.min("ip").alias("est_join_size"))


def misra_gries_summary(
    df: DataFrame,
    value_col: str,
    key_col: str,
    k: int = 32,
    n_groups: int = 8,
) -> DataFrame:
    """Two-level deterministic Misra-Gries heavy-hitter summary
    (Misra & Gries '82; merge rule from Agarwal et al., PODS'12 mergeable
    summaries — public literature).

    The streaming MG decrement loop ("k+1 live counters -> decrement all")
    has a deterministic offline fixed point: given a segment's exact
    frequencies, every counter ends at ``f - theta`` where ``theta`` is the
    segment's (k+1)-th largest frequency (each decrement round subtracts 1
    from all live counters until only k survive, so the total subtracted is
    exactly the (k+1)-th largest). That makes the whole sketch expressible
    as column algebra with NO batch-boundary nondeterminism — unlike a
    per-Arrow-batch imperative MG, the result is invariant to partitioning
    and exactly replayable by the SQL oracle:

    - level 1: rows scatter into ``n_groups`` segments by md5 of
      ``key_col`` (content-deterministic, not partition-dependent); exact
      per-(segment, value) counts — map-side combinable; each segment
      keeps ``count - theta_g > 0`` (<= k survivors, one window rank over
      <= distinct-values rows per segment);
    - level 2 (the MERGE of the g summaries): residuals sum per value —
      Agarwal's pairwise counter-wise add — then one final subtract of the
      merged (k+1)-th largest keeps the state at <= k counters.

    Output ``(value_col, mg_estimate, max_deficit)``: ``mg_estimate``
    under-counts by at most ``max_deficit`` (the sum of every subtracted
    threshold), so any value with true frequency > max_deficit is
    GUARANTEED to appear — the MG heavy-hitter contract, asserted by
    pytest against exact counts.
    """
    from pyspark.sql import Window as W

    seg = df.select(
        F.pmod(_hash60("mg:", F.col(key_col)), F.lit(n_groups)).alias("__g"),
        F.col(value_col).alias("__v"),
    )
    counts = seg.groupBy("__g", "__v").agg(F.count(F.lit(1)).alias("__c"))
    wg = W.partitionBy("__g").orderBy(F.desc("__c"), F.asc("__v"))
    ranked = counts.withColumn("__r", F.row_number().over(wg))
    # theta_g = (k+1)-th largest count in the segment (0 when <= k values)
    thetas = ranked.filter(F.col("__r") == k + 1).select(
        "__g", F.col("__c").alias("__theta")
    )
    level1 = (
        ranked.join(F.broadcast(thetas), "__g", "left")
        .withColumn("__theta", F.coalesce("__theta", F.lit(0)))
        .filter(F.col("__c") > F.col("__theta"))
        .select("__v", (F.col("__c") - F.col("__theta")).alias("__res"), "__theta")
    )
    merged = level1.groupBy("__v").agg(F.sum("__res").alias("__sum"))
    wm = W.orderBy(F.desc("__sum"), F.asc("__v"))
    mranked = merged.withColumn("__r", F.row_number().over(wm))
    mtheta = mranked.filter(F.col("__r") == k + 1).select(
        F.col("__sum").alias("__mtheta")
    )
    # total deficit bound: every segment threshold plus the merge threshold
    deficit = (
        thetas.agg(F.coalesce(F.sum("__theta"), F.lit(0)).alias("__d"))
        .crossJoin(
            mtheta.agg(F.coalesce(F.max("__mtheta"), F.lit(0)).alias("__md"))
        )
        .select((F.col("__d") + F.col("__md")).alias("max_deficit"))
    )
    final = (
        mranked.crossJoin(
            F.broadcast(mtheta.agg(F.coalesce(F.max("__mtheta"), F.lit(0)).alias("__mt")))
        )
        .filter(F.col("__sum") > F.col("__mt"))
        .select(F.col("__v").alias(value_col), (F.col("__sum") - F.col("__mt")).alias("mg_estimate"))
    )
    return final.crossJoin(F.broadcast(deficit))
