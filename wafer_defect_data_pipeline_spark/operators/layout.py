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
