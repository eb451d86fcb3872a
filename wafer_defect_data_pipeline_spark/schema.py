"""Schema registry: explicit StructTypes for every table the engine reads.

The reference infers schemas from CSV (``/root/reference/src/data_loader.py:45``);
this engine declares them (SURVEY.md §1.3) so reads never depend on sampling
and Parquet/CSV scans get exact pruning. The wafer schema is reconstructed
from column references in ``/root/reference/src/preprocessing.py:14-43`` and
``main.py:50-54`` (see FIXTURES.md).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# wafer_defects — the reference's one table
# ---------------------------------------------------------------------------

#: per-class IQR filter targets (reference preprocessing.py:14)
SIZE_COLUMNS = ["SIZE_X", "SIZE_Y", "DEFECT_AREA"]

#: 18 clustering features (reference preprocessing.py:16-35)
CLUSTER_FEATURES = [
    "ENERGY_PARAM",
    "MDAT_OFFSET",
    "RELATIVEMAGNITUDE",
    "PATCHDEFECTSIGNAL",
    "INTENSITY",
    "POLARITY",
    "MDAT_GL",
    "MDAT_NOISE",
    "PATCHNOISE",
    "SIZE_X",
    "SIZE_Y",
    "DEFECT_AREA",
    "SIZE_D",
    "RADIUS",
    "ANGLE",
    "ALIGNRATIO",
    "SPOTLIKENESS",
    "ACTIVERATIO",
]

#: steps analysed by the per-step KMeans (reference preprocessing.py:37)
DEFAULT_STEPS_TO_ANALYSE = ["PC", "RMG", "CBCMP"]

#: which KMeans cluster id is "killer" per step (reference preprocessing.py:39-43)
KILLER_CLUSTER_MAPPING = {"PC": 1, "RMG": 1, "CBCMP": 0}

#: derived ratio features: name -> (numerator, denominator, inf_to_null)
#: formulas at reference preprocessing.py:138-149; note the deliberate quirk
#: that only ASPECT_RATIO and DENSITY_SIGNAL get inf->null replacement
#: (preprocessing.py:145,149) — preserved for parity.
DERIVED_FEATURES: dict[str, tuple[str, str, bool]] = {
    "SNR_OFFSET_GL": ("MDAT_OFFSET", "MDAT_GL", False),
    "SNR_INTENSITY_NOISE": ("INTENSITY", "PATCHNOISE", False),
    "ASPECT_RATIO": ("SIZE_X", "SIZE_Y", True),
    "DENSITY_SIGNAL": ("INTENSITY", "DEFECT_AREA", True),
}

WAFER_SCHEMA = T.StructType(
    [
        T.StructField("Class", T.IntegerType(), True),
        T.StructField("IS_DEFECT", T.StringType(), True),
        T.StructField("Step_desc", T.StringType(), True),
    ]
    + [T.StructField(c, T.DoubleType(), True) for c in CLUSTER_FEATURES]
    # 4 columns present in the 25-col reference CSV but never referenced by
    # any operator (FIXTURES.md §1) — carried through projection/sink only.
    + [
        T.StructField("DEFECT_ID", T.LongType(), True),
        T.StructField("LOT_ID", T.StringType(), True),
        T.StructField("COORD_X", T.DoubleType(), True),
        T.StructField("COORD_Y", T.DoubleType(), True),
    ]
)

# ---------------------------------------------------------------------------
# driver test tables (/root/testdata/sf*/ — TESTDATA.md / FIXTURES.md §3)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: small dimension tables that should always be broadcast in joins
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}
