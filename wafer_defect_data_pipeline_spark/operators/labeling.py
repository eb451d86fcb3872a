"""Killer-defect labeling (reference M4).

Reference (``/root/reference/src/preprocessing.py:210-243``): start all-False,
then for each ``step -> killer_cluster_id`` mapping entry set True where
``IS_DEFECT=='REAL' AND Step_desc==step AND KMeans_Cluster==id``.

Two relational forms, both shuffle-free:

- ``label_killer_defects``: the mapping folded into one ``when`` chain —
  a single codegen'd projection, the default.
- ``label_killer_defects_join``: the mapping as a broadcast-joined tiny
  DataFrame — the idiomatic form when the mapping is itself data (e.g.
  thousands of step rules maintained in a table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import KILLER_CLUSTER_MAPPING


def killer_condition(mapping: dict[str, int]):
    cond = F.lit(False)
    for step, cluster_id in mapping.items():
        cond = cond | (
            (F.col("IS_DEFECT") == "REAL")
            & (F.col("Step_desc") == F.lit(step))
            & (F.col("KMeans_Cluster") == F.lit(cluster_id))
        )
    return cond


def label_killer_defects(df: DataFrame, mapping: dict[str, int] | None = None) -> DataFrame:
    m = mapping if mapping else KILLER_CLUSTER_MAPPING
    # three-valued logic: `False | (null == id)` is null, but the reference
    # initializes False and only ever sets True — coalesce restores that
    return df.withColumn("is_killer_defect", F.coalesce(killer_condition(m), F.lit(False)))


def label_killer_defects_join(
    df: DataFrame, mapping: dict[str, int] | None = None, spark: SparkSession | None = None
) -> DataFrame:
    m = mapping if mapping else KILLER_CLUSTER_MAPPING
    spark = spark or df.sparkSession
    map_df = spark.createDataFrame(
        [(s, int(c)) for s, c in m.items()], "Step_desc string, __killer_cluster int"
    )
    out = df.join(F.broadcast(map_df), on="Step_desc", how="left")
    flag = (
        (F.col("IS_DEFECT") == "REAL")
        & F.col("__killer_cluster").isNotNull()
        & (F.col("KMeans_Cluster") == F.col("__killer_cluster"))
    )
    return out.withColumn("is_killer_defect", F.coalesce(flag, F.lit(False))).drop("__killer_cluster")
