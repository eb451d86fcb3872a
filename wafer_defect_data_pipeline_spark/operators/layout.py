"""Data-layout clustering — Z-order (Morton) interleave for multi-column
locality (extension surface, 100 TB data-skipping).

A table sorted by one column prunes scans filtered on that column only.
Interleaving the bits of two quantized columns into a single *z-value* and
range-partitioning by it bounds BOTH columns within every file/bucket, so
parquet min/max (or Delta/Iceberg file stats) prune selective filters on
either column — the layout trick behind ``OPTIMIZE ZORDER BY``.

Everything is integer arithmetic (quantize by exact bigint division, extract
bits by ``div``/``%``, reassemble by multiplication), so the z-value is
bit-identical in Spark and the DuckDB oracle — no doubles anywhere.

Scale shape: quantization bounds come from ONE min/max aggregate (4 scalars
to the driver); the z-value itself is a pure projection;
``repartitionByRange(zvalue)`` does one range-exchange (sampled boundaries)
and writes files whose z-ranges — hence whose (a, b) bounding boxes — are
disjoint. No global sort, no single-reducer stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_expr(col: str, lo: int | str, hi: int | str, bits: int, div: str) -> str:
    """SQL for mapping ``col`` in [lo, hi] onto the integer grid [0, 2^bits).

    ``div`` is the engine's integer-division spelling (Spark ``div``,
    DuckDB ``//``); everything stays in bigint. ``lo``/``hi`` may be SQL
    expressions (e.g. scalar-CTE columns) — the degenerate hi==lo collapse
    is only pre-folded when they are Python ints.
    """
    levels = (1 << bits) - 1
    if isinstance(lo, int) and isinstance(hi, int) and hi <= lo:
        return "0"
    return f"((({col} - ({lo})) * {levels}) {div} (({hi}) - ({lo})))"


def zvalue_expr(qa: str, qb: str, bits: int, div: str) -> str:
    """SQL interleaving two ``bits``-wide quantized values into one z-value.

    Bit i of ``qa`` lands at position 2i+1, of ``qb`` at 2i — built from
    ``div``/``%``/``*`` only, portable across engines with no bitwise
    operators needed.
    """
    terms = []
    for i in range(bits):
        terms.append(f"((({qa}) {div} {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"((({qb}) {div} {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def _bounds(df: DataFrame, col_a: str, col_b: str) -> tuple[int, int, int, int]:
    r = df.agg(
        F.min(col_a).alias("la"), F.max(col_a).alias("ha"),
        F.min(col_b).alias("lb"), F.max(col_b).alias("hb"),
    ).collect()[0]
    return int(r["la"]), int(r["ha"]), int(r["lb"]), int(r["hb"])


def with_zvalue(
    df: DataFrame, col_a: str, col_b: str, bits: int = 8, zcol: str = "zvalue"
) -> DataFrame:
    """Attach the Morton z-value of two integer columns (pure projection)."""
    la, ha, lb, hb = _bounds(df, col_a, col_b)
    qa = quantize_expr(col_a, la, ha, bits, "div")
    qb = quantize_expr(col_b, lb, hb, bits, "div")
    return df.withColumn(zcol, F.expr(zvalue_expr(qa, qb, bits, "div")).cast("bigint"))


def zorder_by(
    df: DataFrame, col_a: str, col_b: str, bits: int = 8, num_partitions: int | None = None
) -> DataFrame:
    """Re-layout rows so files bound both columns: range-partition + local
    sort on the z-value. Feed this straight to a parquet writer."""
    z = with_zvalue(df, col_a, col_b, bits)
    parts = num_partitions or z.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return z.repartitionByRange(int(parts), "zvalue").sortWithinPartitions("zvalue")


# --- file-statistics zonemap (data skipping) --------------------------------

def build_zonemap(spark, path: str, cols: list[str]) -> "DataFrame":
    """Per-file min/max statistics index — the data-skipping companion to
    :func:`zorder_by` (clustering only pays off when something PRUNES on it).

    One scan with the ``_metadata.file_path`` hidden column groups rows by
    their physical file and records ``(file, n_rows, min_<c>, max_<c>, ...)``.
    Build cost is a single pass (that is how every file-statistics index is
    built); amortized over every subsequent pruned read. The groupBy key is
    the file path, so partial aggregation collapses each scan task's rows to
    one row before the (tiny) shuffle.

    This is the mechanism under lakehouse-format data skipping (Delta/
    Iceberg manifests keep exactly these stats per file); here it is an
    explicit, queryable DataFrame that can be persisted next to the data.
    """
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        df.select(F.col("_metadata.file_path").alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )


def zonemap_pruned_read(
    spark, path: str, zonemap: "DataFrame", col: str, lo, hi
) -> tuple["DataFrame", int, int]:
    """Read only the files whose ``[min, max]`` zone overlaps ``[lo, hi]``.

    Returns ``(df, files_kept, files_total)``. The zonemap readout is
    bounded (one row per file — ~800k rows for 100 TB of 128 MB files, a
    driver-safe list; beyond that, keep the zonemap as a table and prune
    via a join on ``_metadata.file_path`` instead). The range predicate is
    RE-APPLIED to the surviving files, so pruning is a pure optimization:
    zone overlap is a superset guarantee, never a correctness input. Files
    with a null min/max (all-null zone) are kept — nulls carry no range
    evidence either way.
    """
    rows = zonemap.select("file", f"min_{col}", f"max_{col}").collect()
    keep = [
        r["file"]
        for r in rows
        if r[f"min_{col}"] is None
        or r[f"max_{col}"] is None
        or not (r[f"max_{col}"] < lo or r[f"min_{col}"] > hi)
    ]
    pred = F.col(col).between(F.lit(lo), F.lit(hi))
    if not keep:
        empty = spark.read.parquet(path).filter(F.lit(False))
        return empty, 0, len(rows)
    return spark.read.parquet(*keep).filter(pred), len(keep), len(rows)
