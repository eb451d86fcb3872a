"""Wafer pipeline (reference O1/M1-M4) exercised on driver data.

The driver has no wafer table, so the full pipeline runs on ``lineitem``
remapped to wafer semantics: Class↔l_returnflag, Step_desc↔l_linestatus,
IS_DEFECT derived from l_discount, 4 numeric features. KMeans makes this
non-SQL-expressible → registered WITHOUT an oracle (driver rows-only check);
value-level parity is covered by the golden test against the pandas replica
(tests/test_wafer_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.clustering import run_kmeans_by_step, with_row_id
from ..operators.labeling import label_killer_defects
from ..operators.outliers import remove_outliers_by_group
from ..sources import read_table
from .registry import register

_FEATURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _as_wafer(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.col("l_returnflag").alias("Class"),
        F.when(F.col("l_discount") > 0.05, "REAL").otherwise("FALSE").alias("IS_DEFECT"),
        F.col("l_linestatus").alias("Step_desc"),
        *[F.col(c) for c in _FEATURES],
    )


def _wafer_pipeline_on_lineitem(spark, sf_dir):
    # r15 measurement-hygiene fix: run_kmeans_by_step persists its analysed
    # subset, and Spark's CacheManager matches cache entries by ANALYZED
    # PLAN — so when the bench invokes this query 4x in one session, runs
    # 2-4 silently reused run 1's materialized blocks (the "Asked to cache
    # already cached data" warnings; 24 jobs cold vs 16 warm) and the warm
    # timings measured cache reads, not the pipeline. Every bench/oracle
    # invocation must compute from the parquet inputs, so stale entries are
    # dropped at query entry. In-flight localCheckpoints are not
    # CacheManager entries and are unaffected; the bench runs queries
    # sequentially, so nothing else's cache can be live here.
    spark.catalog.clearCache()
    # attach the row id HERE, while the lineage is still a narrow select over
    # the parquet scan — the _metadata-derived id is pin-free; waiting until
    # after the outlier bounds join would force the localCheckpoint fallback
    df = with_row_id(_as_wafer(spark, sf_dir))
    df = remove_outliers_by_group(df, "Class", ["l_extendedprice", "l_quantity"])
    df = df.withColumn("price_per_qty", F.col("l_extendedprice") / (F.col("l_quantity") + F.lit(1e-6)))
    df = run_kmeans_by_step(
        df, steps_to_analyse=["F", "O"], features=_FEATURES, n_clusters=2, random_state=42,
        mode="auto",
    )
    df = label_killer_defects(df, {"F": 1, "O": 0})
    return (
        df.groupBy("Class", "Step_desc")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("KMeans_Cluster").isNotNull().cast("long")).alias("n_clustered"),
            F.sum(F.col("is_killer_defect").cast("long")).alias("n_killer"),
        )
        .orderBy("Class", "Step_desc")
    )


register("wafer_pipeline_on_lineitem", _wafer_pipeline_on_lineitem, None, exact_twin="pytest:tests/test_wafer_pipeline.py")
