"""Wafer CSV source with pre-flight validation.

Re-expresses the reference loader (``/root/reference/src/data_loader.py:11-77``)
Spark-first: explicit schema instead of pandas inference (S1), the same two
validation failures (S2: missing file -> FileNotFoundError, zero rows ->
ValueError), and default-path resolution (S3). ``load_data`` mirrors the
reference's functional wrapper (S4, data_loader.py:61-77).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schema import WAFER_SCHEMA

# S3 default-path parity (reference data_loader.py:23-27): ``data_path=None``
# resolves to ``<project root>/dataset.csv``, where project root is the parent
# of the package directory — the same "two levels up from the loader module"
# rule the reference uses.
DEFAULT_DATA_PATH = Path(__file__).resolve().parent.parent.parent / "dataset.csv"


def load_wafer_csv(
    spark: SparkSession,
    data_path: str | None = None,
    schema: T.StructType | None = None,
    encoding: str = "utf-8",
    infer_schema: bool = False,
) -> DataFrame:
    """CSV scan with header row and explicit schema.

    The explicit schema keeps the scan single-pass (inference reads the file
    twice) and pins column types independent of file contents — at 100 TB an
    inference pass over the data is a full extra job.
    """
    p = Path(data_path) if data_path is not None else DEFAULT_DATA_PATH
    if not p.exists():
        raise FileNotFoundError(f"Data file not found: {p}")
    reader = spark.read.option("header", True).option("encoding", encoding)
    if infer_schema or schema is False:
        reader = reader.option("inferSchema", True)
    else:
        reader = reader.schema(schema or WAFER_SCHEMA)
    df = reader.csv(str(p))
    if df.isEmpty():
        raise ValueError(f"Data file is empty: {p}")
    return df


def load_data(
    spark: SparkSession, data_path: str | None = None, encoding: str = "utf-8"
) -> DataFrame:
    """Functional wrapper matching the reference's ``load_data`` surface."""
    return load_wafer_csv(spark, data_path, encoding=encoding)
