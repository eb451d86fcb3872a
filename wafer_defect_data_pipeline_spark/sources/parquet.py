"""Parquet table source for the driver test tables.

Columnar scan is the engine's native path: Catalyst pushes predicates and
column pruning into the Parquet reader (check ``PushedFilters``/``ReadSchema``
in ``df.explain("formatted")``), so a 2-column projection over a 100 TB table
reads only those column chunks.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import TESTDATA_TABLES


def table_path(sf_dir: str, name: str) -> str:
    return str(Path(sf_dir) / f"{name}.parquet")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one driver table; schema comes from parquet footers.

    ``events.ts`` is stored as parquet timestamp[us] (no tz annotation), which
    Spark reads as TIMESTAMP_NTZ — left as-is; event-time arithmetic casts it
    to TIMESTAMP inside expressions only (session tz is pinned UTC, so the
    instant equals the wall-clock value). Earlier testdata generations stored
    TIMESTAMP(NANOS), which Spark reads as a nanos-since-epoch long under
    ``spark.sql.legacy.parquet.nanosAsLong``; that branch is kept so a future
    regeneration back to nanos converts (integer division — a double division
    would lose precision on ~1.7e18 nanosecond values) instead of breaking.
    """
    # Self-contained regardless of which session invokes us (the driver runs
    # queries under a vanilla SparkSession); runtime-settable, idempotent,
    # and a no-op for micros footers. The UTC pin makes NTZ→TIMESTAMP casts
    # value-preserving even when the invoking session didn't come from
    # get_spark (a non-UTC host zone would make watermark/window arithmetic
    # DST-sensitive).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(table_path(sf_dir, name))
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
    return df


def read_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view so SQL-form queries can run."""
    for n, df in read_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
