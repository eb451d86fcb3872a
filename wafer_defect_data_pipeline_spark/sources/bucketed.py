"""Bucketed tables — co-located joins and aggregations without shuffles.

The 100 TB lever for repeated joins on the same key (SURVEY.md §7.7): write
both sides bucketed (and sorted) by the join key into the warehouse once,
and every subsequent equi-join on that key becomes a zero-exchange
sort-merge over matching bucket files. The shuffle is paid once at write
time instead of per query. ``spark.sql.sources.bucketing.enabled`` is on by
default; bucket pruning applies for point predicates on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) parquet table."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table; the output partitioning carries the bucket spec,
    letting Catalyst elide exchanges for joins/aggs on the bucket columns."""
    return spark.table(table)
