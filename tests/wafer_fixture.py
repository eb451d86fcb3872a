"""Deterministic synthetic wafer_defects fixture (FIXTURES.md §1, seed=42).

Bakes in every edge case the reference's branches need: nulls across
features, an IQR==0 group, a tiny group, zero denominators, an unanalysed
extra step, and an analysed step whose REAL subset is empty after dropna.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from wafer_defect_data_pipeline_spark.schema import CLUSTER_FEATURES

STEPS = ["PC", "RMG", "CBCMP", "ET", "WET"]


def make_wafer_pdf(n: int = 2000, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    classes = rng.choice([1, 2, 3, 4, 5, 6], size=n, p=[0.35, 0.25, 0.15, 0.13, 0.10, 0.02])
    step = rng.choice(STEPS, size=n, p=[0.3, 0.25, 0.2, 0.15, 0.1])
    is_defect = np.where(rng.random(n) < 0.4, "REAL", "FALSE")

    pdf = pd.DataFrame({
        "Class": classes.astype(np.int32),
        "IS_DEFECT": is_defect,
        "Step_desc": step,
    })
    for c in CLUSTER_FEATURES:
        base = rng.lognormal(mean=1.0, sigma=0.8, size=n)
        pdf[c] = base
    pdf["POLARITY"] = rng.normal(0, 1, n)
    for c in ["ANGLE"]:
        pdf[c] = rng.uniform(0, 360, n)
    for c in ["ALIGNRATIO", "SPOTLIKENESS", "ACTIVERATIO"]:
        pdf[c] = rng.uniform(0, 1, n)

    # heavy right tails on the IQR-filtered size columns (~19% loss target)
    for c in ["SIZE_X", "SIZE_Y", "DEFECT_AREA"]:
        tail = rng.random(n) < 0.07
        pdf.loc[tail, c] = pdf.loc[tail, c] * rng.uniform(5, 50, int(tail.sum()))

    # ~4% nulls across the numeric features
    for c in CLUSTER_FEATURES:
        mask = rng.random(n) < 0.04
        pdf.loc[mask, c] = np.nan

    # exact zeros in denominators (epsilon + inf->null paths)
    for c in ["MDAT_GL", "PATCHNOISE", "SIZE_Y", "DEFECT_AREA"]:
        zmask = rng.random(n) < 0.01
        pdf.loc[zmask, c] = 0.0

    # class 5: SIZE_Y constant -> IQR == 0 skip
    pdf.loc[pdf["Class"] == 5, "SIZE_Y"] = 7.5
    # class 6 (tiny): at most 1 non-null SIZE_X -> count<2 guard
    c6 = pdf.index[pdf["Class"] == 6]
    pdf.loc[c6[1:], "SIZE_X"] = np.nan
    # analysed step CBCMP: every REAL row gets a null feature -> empty after
    # dropna -> cluster-skip branch, null labels
    cb = (pdf["Step_desc"] == "CBCMP") & (pdf["IS_DEFECT"] == "REAL")
    pdf.loc[cb, "ENERGY_PARAM"] = np.nan

    # 4 unreferenced filler columns (25-col parity)
    pdf["DEFECT_ID"] = np.arange(n, dtype=np.int64)
    pdf["LOT_ID"] = ["LOT%03d" % (i % 37) for i in range(n)]
    pdf["COORD_X"] = rng.uniform(-150, 150, n)
    pdf["COORD_Y"] = rng.uniform(-150, 150, n)
    return pdf
