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
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample (seeded, scan-level filter, no shuffle)."""
    return df.sampleBy(strata_col, fractions, seed=seed)


def deterministic_shuffle(df: DataFrame, key_col: str, seed: str = "shuffle:") -> DataFrame:
    """Stable pseudo-random total order keyed by md5(seed + key)."""
    return df.orderBy(F.md5(F.concat(F.lit(seed), F.col(key_col).cast("string"))))
