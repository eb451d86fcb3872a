"""Flagship query: reference semantics recast onto the driver's lineitem.

Per-group sequential IQR outlier filter (reference A2, group=l_returnflag ↔
Class, values=[l_extendedprice, l_quantity] ↔ SIZE_*) → epsilon-guarded
derived ratio (reference P6) → grouped summary (reference A9-shaped).
Exercises scan → agg → broadcast join → filter → derive → agg → sort, all
JVM-side, with zero full-table shuffles before the final (small) group-agg.

Aggregate outputs are rounded to 4 decimals in BOTH the Spark plan and the
DuckDB oracle so the driver's value-hash compares stable digits, not the
last ulp of a float sum whose addend order differs per engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.derived import ratio
from ..operators.outliers import remove_outliers_by_group
from ..sources import read_table

FLAGSHIP_CASCADE = ["l_extendedprice", "l_quantity"]


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    filtered = remove_outliers_by_group(li, "l_returnflag", FLAGSHIP_CASCADE)
    derived = filtered.withColumn("price_per_qty", ratio("l_extendedprice", "l_quantity"))
    return (
        derived.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_revenue"),
            F.round(F.avg("price_per_qty"), 4).alias("avg_price_per_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


#: DuckDB mirror — the same sequential cascade as correlated CTE rounds.
FLAGSHIP_ORACLE_SQL = """
WITH b1 AS (
  SELECT l_returnflag AS g,
         quantile_cont(l_extendedprice, 0.25) AS q1,
         quantile_cont(l_extendedprice, 0.75) AS q3,
         count(l_extendedprice) AS cnt
  FROM lineitem GROUP BY 1
),
r1 AS (
  SELECT l.* FROM lineitem l JOIN b1 ON l.l_returnflag = b1.g
  WHERE (b1.cnt < 2 OR (b1.q3 - b1.q1) = 0)
     OR l.l_extendedprice <= b1.q3 + 1.5 * (b1.q3 - b1.q1)
),
b2 AS (
  SELECT l_returnflag AS g,
         quantile_cont(l_quantity, 0.25) AS q1,
         quantile_cont(l_quantity, 0.75) AS q3,
         count(l_quantity) AS cnt
  FROM r1 GROUP BY 1
),
r2 AS (
  SELECT r1.* FROM r1 JOIN b2 ON r1.l_returnflag = b2.g
  WHERE (b2.cnt < 2 OR (b2.q3 - b2.q1) = 0)
     OR r1.l_quantity <= b2.q3 + 1.5 * (b2.q3 - b2.q1)
)
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_revenue,
       round(avg(l_extendedprice / (l_quantity + 1e-6)), 4) AS avg_price_per_qty
FROM r2
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
