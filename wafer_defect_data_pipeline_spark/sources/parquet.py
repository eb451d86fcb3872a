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

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark reads
    as a nanos-since-epoch long (``spark.sql.legacy.parquet.nanosAsLong``);
    convert to a microsecond timestamp with integer division — a double
    division would lose precision on ~1.7e18 nanosecond values.
    """
    # Self-contained regardless of which session invokes us: the driver runs
    # queries under a vanilla SparkSession, and without this conf any scan of
    # events.parquet dies with PARQUET_TYPE_ILLEGAL: INT64 (TIMESTAMP(NANOS)).
    # The conf is runtime-settable, so set it idempotently before every read.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def read_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: read_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Register each table as a temp view so SQL-form queries can run."""
    for n, df in read_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(n)
