"""Source/sink queries (SURVEY.md §2 S1-S6) made driver-visible.

The validated CSV reader (``sources/csv.py``, reference
``/root/reference/src/data_loader.py:11-77``) and the CSV sink
(``sources/sinks.py``, reference ``main.py:104-111``) previously had only
pytest coverage. ``csv_roundtrip`` exercises the full S1+S2+S5 path under
the driver: write a deterministic table slice to CSV, read it back through
the validated loader with an explicit schema, and oracle the result against
the original parquet — round-trip fidelity is exactly the contract a
source/sink pair must keep.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import types as T

from ..sources import read_table
from ..sources.csv import load_wafer_csv
from ..sources.sinks import write_csv_single
from .registry import register

# Mirrors the driver nation.parquet footer exactly (int32 keys) so the
# CSV read-back schema round-trips bit-for-bit against the parquet oracle.
_NATION_SCHEMA = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)


def _csv_roundtrip(spark, sf_dir):
    """S1/S2/S5: CSV sink -> validated CSV source -> same rows as parquet.

    The temp path is keyed on the sf dir name so concurrent runs at
    different scale factors don't clobber each other. ``write_csv_single``
    is the reference-parity single-file sink (fine here: nation is 25
    rows); the read-back uses the explicit schema so the scan is
    single-pass (no inference job).
    """
    n = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    out = Path(tempfile.gettempdir()) / f"wdps_csv_roundtrip_{Path(sf_dir).name}"
    write_csv_single(n, str(out))
    df = load_wafer_csv(spark, str(out), schema=_NATION_SCHEMA)
    return df.orderBy("n_nationkey")


register(
    "csv_roundtrip",
    _csv_roundtrip,
    """
    SELECT n_nationkey, n_name, n_regionkey
    FROM nation ORDER BY n_nationkey
    """,
)
