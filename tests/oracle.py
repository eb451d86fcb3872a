"""DuckDB-oracle comparison harness mirroring the driver's correctness gate:
row-count + schema-shape + order-insensitive value comparison with columns
sorted by name."""

from __future__ import annotations

from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

from wafer_defect_data_pipeline_spark.schema import TESTDATA_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            try:
                s = s.dt.tz_localize(None)
            except TypeError:
                pass
            out[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_bool_dtype(s) or str(s.dtype) == "boolean":
            out[c] = s.astype("object").where(s.notna(), None)
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("float64")  # unify int32/int64/Int64 for compare
    sort_cols = list(out.columns)
    if sort_cols:
        out = out.sort_values(by=sort_cols, na_position="first", kind="mergesort").reset_index(drop=True)
    return out


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, rtol=1e-7, atol=1e-8) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    errs: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        errs.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        errs.append(f"columns: spark={sc} oracle={oc}")
    if errs:
        return errs
    a, b = _normalize(spark_pdf), _normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            ok = np.isclose(av.to_numpy(), bv.to_numpy(), rtol=rtol, atol=atol, equal_nan=True)
            if not ok.all():
                i = int(np.argmin(ok))
                errs.append(f"col {c}: {int((~ok).sum())} diffs, first at sorted-row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}")
        else:
            eq = (av.astype(object).where(av.notna(), None) == bv.astype(object).where(bv.notna(), None)) | (
                av.isna() & bv.isna()
            )
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                errs.append(f"col {c}: {int((~eq).sum())} diffs, first at sorted-row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}")
    return errs


def run_pair(spark, sf_dir: str, fn, sql: str) -> list[str]:
    spark_pdf = fn(spark, sf_dir).toPandas()
    con = duckdb_conn(sf_dir)
    try:
        oracle_pdf = con.execute(sql).fetchdf()
    finally:
        con.close()
    return compare_frames(spark_pdf, oracle_pdf)
