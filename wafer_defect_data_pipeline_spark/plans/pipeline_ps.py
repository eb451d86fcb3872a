"""Pandas-API-on-Spark twin of the reference's feature engineering.

The reference is a pandas pipeline (``/root/reference/src/preprocessing.py``);
``pyspark.pandas`` lets its users keep pandas idioms — ``df["x"] / (df["y"]
+ eps)``, ``np.where``, ``value_counts`` — while every expression compiles
to the same Catalyst plans the native engine uses. This module re-expresses
the reference's derived-ratio features (preprocessing.py:138-149) and
killer-defect labeling (preprocessing.py:39-43,233) in pandas syntax and is
held to the SAME exactness bar as the native ops: the registered query
carries a full DuckDB value-hash oracle, and pytest asserts bit-parity with
``functions/derived.add_engineered_features``.

Scope note: the IQR-cascade stage is NOT mirrored here because
``pyspark.pandas`` groupby-quantile is approximate (approx_percentile
under the hood) while the engine's outlier cascade is exact — a pandas-API
twin of that stage would silently weaken semantics. Migrating users keep
pandas syntax for the algebraic stages and call the engine's exact
operators for quantile work.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame

from ..sources import read_table
from .registry import register

_EPS = 1e-6


def derived_features_ps(psdf):
    """The reference's ratio features in pandas syntax (pyspark.pandas).

    Mirrors preprocessing.py:138-149 on the lineitem-as-wafer mapping:
    two plain ratios plus two with the inf->null quirk (reference applies
    ``replace([inf, -inf], nan)`` to only 2 of the 4 columns).
    """
    psdf = psdf.copy()
    psdf["ratio_qty_price"] = psdf["l_quantity"] / (psdf["l_extendedprice"] + _EPS)
    psdf["ratio_disc_tax"] = psdf["l_discount"] / (psdf["l_tax"] + _EPS)
    aspect = psdf["l_extendedprice"] / (psdf["l_quantity"] + _EPS)
    density = psdf["l_discount"] / (psdf["l_quantity"] + _EPS)
    # the 2-of-4 inf->null quirk, in pandas idiom
    psdf["aspect_ratio"] = aspect.replace([np.inf, -np.inf], np.nan)
    psdf["density_signal"] = density.replace([np.inf, -np.inf], np.nan)
    return psdf


def label_killer_ps(psdf, mapping=None):
    """Killer labeling (preprocessing.py:39-43) via pandas ``map``."""
    mapping = mapping or {"F": 1, "O": 0}
    psdf = psdf.copy()
    psdf["is_killer_defect"] = (
        psdf["l_linestatus"].map(mapping).fillna(0).astype("int64")
    )
    return psdf


def _wafer_features_ps(spark, sf_dir) -> DataFrame:
    """Registered query: pandas-syntax feature engineering, exact oracle.

    ``to_spark()`` at the end shows the whole thing was one lazy Catalyst
    plan — the pandas API added zero execution machinery.
    """
    import pyspark.pandas as ps

    sdf = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    )
    psdf = sdf.pandas_api()
    psdf = derived_features_ps(psdf)
    psdf = label_killer_ps(psdf)
    psdf["ratio_qty_price"] = psdf["ratio_qty_price"].round(6)
    psdf["aspect_ratio"] = psdf["aspect_ratio"].round(6)
    out = psdf.groupby("l_returnflag").agg(
        n=("l_orderkey", "count"),
        killer=("is_killer_defect", "sum"),
        # min/max are summation-order-independent (unlike mean), so the
        # per-row-rounded doubles hash identically in any engine/partitioning
        min_rqp=("ratio_qty_price", "min"),
        max_rqp=("ratio_qty_price", "max"),
        min_ar=("aspect_ratio", "min"),
        max_ar=("aspect_ratio", "max"),
    )
    joined = out.reset_index()
    sdf_out = joined.to_spark()
    return sdf_out.orderBy("l_returnflag")


register(
    "wafer_features_pandas_api",
    _wafer_features_ps,
    f"""
    WITH d AS (
      SELECT l_returnflag, l_orderkey,
             round(l_quantity / (l_extendedprice + {_EPS}), 6) AS ratio_qty_price,
             round(l_extendedprice / (l_quantity + {_EPS}), 6) AS aspect_ratio,
             CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END AS is_killer_defect
      FROM lineitem
    )
    SELECT l_returnflag,
           count(*) AS n,
           CAST(sum(is_killer_defect) AS BIGINT) AS killer,
           min(ratio_qty_price) AS min_rqp,
           max(ratio_qty_price) AS max_rqp,
           min(aspect_ratio) AS min_ar,
           max(aspect_ratio) AS max_ar
    FROM d GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
