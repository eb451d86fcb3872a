"""Single-node pandas replica of the reference pipeline — the golden oracle.

Independent re-implementation of the semantics documented in SURVEY.md §2
(reference /root/reference/src/preprocessing.py:69-243), sharing the engine's
numpy k-means kernel so Spark parity mode and this replica agree bit-for-bit.
NOT imported by the engine — test-only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from wafer_defect_data_pipeline_spark.functions.kmeans_np import kmeans_fit_predict, standardize
from wafer_defect_data_pipeline_spark.schema import (
    CLUSTER_FEATURES,
    DEFAULT_STEPS_TO_ANALYSE,
    KILLER_CLUSTER_MAPPING,
    SIZE_COLUMNS,
)


def replica_remove_outliers(pdf: pd.DataFrame, columns=SIZE_COLUMNS) -> pd.DataFrame:
    parts = []
    for _, grp in pdf.groupby("Class", sort=True):
        cur = grp
        for col in columns:
            if col not in cur.columns or cur[col].count() < 2:
                continue
            q1, q3 = cur[col].quantile(0.25), cur[col].quantile(0.75)
            if q3 - q1 == 0:
                continue
            cur = cur[cur[col] <= q3 + 1.5 * (q3 - q1)]
        parts.append(cur)
    return pd.concat(parts).sort_index()  # index kept for order-parity joins


def replica_add_features(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out["SNR_OFFSET_GL"] = out["MDAT_OFFSET"] / (out["MDAT_GL"] + 1e-6)
    out["SNR_INTENSITY_NOISE"] = out["INTENSITY"] / (out["PATCHNOISE"] + 1e-6)
    out["ASPECT_RATIO"] = (out["SIZE_X"] / (out["SIZE_Y"] + 1e-6)).replace([np.inf, -np.inf], np.nan)
    out["DENSITY_SIGNAL"] = (out["INTENSITY"] / (out["DEFECT_AREA"] + 1e-6)).replace([np.inf, -np.inf], np.nan)
    return out


def replica_kmeans(pdf: pd.DataFrame, steps=None, features=None, n_clusters=2, random_state=42) -> pd.DataFrame:
    steps = list(steps or DEFAULT_STEPS_TO_ANALYSE)
    feats = list(features or CLUSTER_FEATURES)
    out = pdf.copy()
    out["KMeans_Cluster"] = pd.Series(pd.NA, index=out.index, dtype="Int64")
    for s in steps:
        sub = out.loc[(out["IS_DEFECT"] == "REAL") & (out["Step_desc"] == s), feats].dropna()
        if sub.empty:
            continue
        labels = kmeans_fit_predict(standardize(sub.to_numpy(np.float64)), n_clusters, random_state)
        out.loc[sub.index, "KMeans_Cluster"] = labels
    return out


def replica_label_killer(pdf: pd.DataFrame, mapping=None) -> pd.DataFrame:
    m = mapping or KILLER_CLUSTER_MAPPING
    out = pdf.copy()
    out["is_killer_defect"] = False
    for s, cid in m.items():
        hit = (out["IS_DEFECT"] == "REAL") & (out["Step_desc"] == s) & (out["KMeans_Cluster"] == cid)
        out.loc[hit, "is_killer_defect"] = True
    return out


def replica_full(pdf: pd.DataFrame) -> pd.DataFrame:
    return replica_label_killer(replica_kmeans(replica_add_features(replica_remove_outliers(pdf))))
