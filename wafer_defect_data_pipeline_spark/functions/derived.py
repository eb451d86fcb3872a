"""Derived ratio features + null/NaN/inf normalization convention.

The reference (``/root/reference/src/preprocessing.py:138-149``) derives four
epsilon-guarded ratios and replaces ±inf with NaN on exactly two of them
(ASPECT_RATIO, DENSITY_SIGNAL — py:145,149). Spark DoubleType distinguishes
null / NaN / ±Infinity while pandas conflates NaN-as-missing, so the engine
convention (SURVEY.md §1.2) is: missing is ``null``; derivations propagate
null; the inf->null replacement also maps NaN->null so downstream
``dropna``-equivalents see one missing sentinel.

All column expressions here are built-in ``pyspark.sql.functions`` — they stay
inside WholeStageCodegen; no Python is executed per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schema import DERIVED_FEATURES

EPSILON = 1e-6


def ratio(numerator: str | Column, denominator: str | Column, eps: float = EPSILON) -> Column:
    """``num / (den + eps)`` — the reference's epsilon-guarded division."""
    num = F.col(numerator) if isinstance(numerator, str) else numerator
    den = F.col(denominator) if isinstance(denominator, str) else denominator
    return num / (den + F.lit(eps))


def non_finite_to_null(col: Column) -> Column:
    """±inf and NaN -> null (engine missing-value convention)."""
    return F.when(F.isnan(col) | (F.abs(col) == F.lit(float("inf"))), F.lit(None)).otherwise(col)


def add_engineered_features(df: DataFrame, features: dict[str, tuple[str, str, bool]] | None = None) -> DataFrame:
    """Add the four derived ratios in one projection (single codegen stage).

    Preserves the reference quirk that only ASPECT_RATIO and DENSITY_SIGNAL
    get inf->null replacement (the ``inf_to_null`` flag in the registry).
    """
    feats = features or DERIVED_FEATURES
    cols = []
    for name, (num, den, inf_to_null) in feats.items():
        c = ratio(num, den)
        if inf_to_null:
            c = non_finite_to_null(c)
        cols.append(c.alias(name))
    return df.select("*", *cols)
