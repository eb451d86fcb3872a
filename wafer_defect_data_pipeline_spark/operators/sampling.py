"""Sampling operators for training-data pipelines (extension surface §2.9).

Three tools a 100 TB curation pipeline needs constantly:

- ``hash_split``: deterministic train/val/test assignment from a stable hash
  of the row key. Unlike ``df.randomSplit`` the assignment is a pure
  projection — reproducible across runs, engines, and partitionings, and a
  row keeps its split when the dataset grows (critical for dedup-safe eval
  sets). md5-based so the DuckDB oracle computes the identical split.
- ``stratified_sample``: per-stratum Bernoulli sampling via ``sampleBy`` —
  seeded, no shuffle (filter at the scan), fractions per key.
- ``deterministic_shuffle``: a stable pseudo-random row order from a keyed
  hash — the "shuffle the corpus once, same order every epoch" primitive;
  at scale this is a sort, which Spark does out-of-core.
- ``mixture_sampling_rates`` + ``apply_mixture_sample``: temperature-weighted
  per-source keep-rates hitting a global token budget (the pretraining
  mixture), applied as a broadcast join + hash filter — no corpus shuffle.
- ``topk_per_group``: deterministic fixed-size uniform sample per stratum
  (hash-ranked row_number), where ``sampleBy`` only fixes the fraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket_00_99(key: Column, seed: str) -> Column:
    # First 8 hex chars of md5 -> 32 bits -> bucket in [0, 100). 2^32 % 100
    # leaves a ~2e-8 per-bucket bias (vs ~1.5e-3 with 16 bits, which skewed
    # the train fraction measurably); bigint cast because 32-bit values
    # overflow a signed int.
    return (F.conv(F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, 8), 16, 10)
            .cast("bigint") % 100).cast("int")


def hash_split(
    df: DataFrame,
    key_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    seed: str = "split:",
    split_col: str = "split",
) -> DataFrame:
    """Attach 'train'/'val'/'test' by stable hash bucket of ``key_col``."""
    b = _bucket_00_99(F.col(key_col), seed)
    return df.withColumn(
        split_col,
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int | str = 42,
    key_col: str | None = None,
) -> DataFrame:
    """Per-stratum sample (scan-level filter, no shuffle).

    With ``key_col``: keep rows where the md5 hash-fraction of the key falls
    under the stratum's fraction — a pure projection+filter that is
    reproducible across runs, partitionings, and ENGINES (a SQL oracle
    computing the identical md5 expression selects the identical rows), the
    same primitive as :func:`hash_split`. Strata absent from ``fractions``
    are dropped, matching ``sampleBy``.

    Without ``key_col``: seeded ``sampleBy`` (per-stratum Bernoulli). The RNG
    stream is engine- and partitioning-specific, so results are only
    statistically checkable — prefer the keyed form whenever a stable row
    key exists.
    """
    if key_col is None:
        return df.sampleBy(strata_col, fractions, seed=int(seed))
    frac_col = None
    for k, v in fractions.items():
        cond = F.col(strata_col) == k
        frac_col = F.when(cond, float(v)) if frac_col is None else frac_col.when(cond, float(v))
    frac_col = frac_col.otherwise(0.0) if frac_col is not None else F.lit(0.0)
    return df.filter(_hash_frac(F.col(key_col), f"strat{seed}:") < frac_col)


def _hash_frac(key: Column, seed: str) -> Column:
    """Uniform [0,1) fraction from the first 32 md5 bits of ``seed + key``.

    The value is an exact dyadic rational (m / 2³²), so Spark and a DuckDB
    oracle computing the same expression compare bit-identically — the
    engine-portable replacement for ``rand()`` in sampling decisions.
    """
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, 8), 16, 10)
        .cast("bigint")
        / F.lit(4294967296.0)
    )


def mixture_sampling_rates(
    df: DataFrame,
    source_col: str,
    size_col: str,
    token_budget: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-source temperature-weighted sampling rates hitting a token budget.

    The standard LLM-pretraining mixture: source ``s`` with ``n_s`` tokens
    gets weight ``w_s = n_s^alpha / Σ n^alpha`` (``alpha < 1`` upweights
    small sources, ``alpha = 1`` is proportional) and keep-rate
    ``min(1, budget·w_s / n_s)``. Output is one row per source —
    ``(source, n_tokens, weight, rate)`` — tiny at any corpus scale, so the
    caller broadcasts it back onto the corpus (:func:`apply_mixture_sample`);
    the corpus itself is touched by exactly one map-side-combinable agg.

    ``rate`` is rounded to 6 decimals BEFORE it is compared against the
    sampling hash so Spark and the DuckDB oracle make identical keep/drop
    decisions (the unrounded value can differ in the last ulp because
    Σ n^alpha is order-sensitive).
    """
    per = df.groupBy(source_col).agg(F.sum(size_col).alias("n_tokens"))
    z = per.agg(F.sum(F.pow("n_tokens", F.lit(alpha))).alias("__z"))
    return (
        per.crossJoin(F.broadcast(z))
        .withColumn("weight", F.round(F.pow("n_tokens", F.lit(alpha)) / F.col("__z"), 6))
        .withColumn(
            "rate",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(float(token_budget))
                    * F.pow("n_tokens", F.lit(alpha))
                    / F.col("__z")
                    / F.col("n_tokens"),
                ),
                6,
            ),
        )
        .drop("__z")
    )


def apply_mixture_sample(
    df: DataFrame,
    rates: DataFrame,
    source_col: str,
    key_col: str,
    seed: str = "mix:",
) -> DataFrame:
    """Keep each row iff its stable hash fraction clears its source's rate.

    Broadcast join (rates has one row per source) + scan-level filter — the
    corpus never shuffles. Deterministic: the same row keeps its fate across
    runs and engines. Rows whose source is absent from ``rates`` are dropped
    (inner join), matching "unknown source -> not in the mixture".
    """
    r = F.broadcast(rates.select(source_col, "rate"))
    return (
        df.join(r, on=source_col)
        .filter(_hash_frac(F.col(key_col), seed) < F.col("rate"))
        .drop("rate")
    )


def topk_per_group(
    df: DataFrame, group_col: str, key_col: str, k: int, seed: str = "topk:"
) -> DataFrame:
    """Deterministic uniform sample of exactly ``min(k, |group|)`` rows per group.

    Rank rows inside each group by a stable hash of their key (tie-broken by
    the key itself) and keep the first ``k`` — a reproducible
    fixed-size-per-stratum sample, where ``sampleBy`` only gives a fixed
    *fraction*. One shuffle on ``group_col``; the per-group sort is the cost.
    At extreme group sizes replace ``row_number`` with a bounded
    ``mapInPandas`` heap per partition + merge, but the window form is exact
    and Catalyst-native.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string"))), key_col
    )
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")


def deterministic_shuffle(df: DataFrame, key_col: str, seed: str = "shuffle:") -> DataFrame:
    """Stable pseudo-random total order keyed by md5(seed + key)."""
    return df.orderBy(F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string"))))
