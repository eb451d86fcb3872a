"""Sinks.

Parquet is the native sink (columnar, splittable, schema-carrying).
``write_csv_single`` exists only for parity with the reference's
single-file CSV output (``/root/reference/main.py:104-111``): a
``coalesce(1)`` funnels everything through one task and MUST NOT be used at
scale — the default CSV sink writes one file per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", encoding: str = "UTF-8") -> None:
    """Distributed CSV sink — one file per partition (the scale path)."""
    df.write.mode(mode).option("header", True).option("encoding", encoding).csv(path)


def write_csv_single(df: DataFrame, path: str, mode: str = "overwrite", encoding: str = "UTF-8") -> None:
    """Single-file CSV, parity with the reference sink. Small outputs only."""
    df.coalesce(1).write.mode(mode).option("header", True).option("encoding", encoding).csv(path)
