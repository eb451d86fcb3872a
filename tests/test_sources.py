"""Source/sink layer tests (SURVEY.md §2.1 S1-S6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wafer_defect_data_pipeline_spark.sources.csv import load_data, load_wafer_csv
from wafer_defect_data_pipeline_spark.sources.sinks import (
    write_csv,
    write_csv_single,
    write_parquet,
)
from tests.wafer_fixture import make_wafer_pdf


@pytest.fixture(scope="module")
def wafer_csv(tmp_path_factory):
    path = tmp_path_factory.mktemp("csv") / "dataset.csv"
    make_wafer_pdf(200).to_csv(path, index=False)
    return str(path)


def test_csv_scan_with_schema(spark, wafer_csv):
    df = load_wafer_csv(spark, wafer_csv)
    assert df.count() == 200
    # explicit schema, not inference: numeric features must be double
    assert dict(df.dtypes)["SIZE_X"] == "double"
    assert dict(df.dtypes)["IS_DEFECT"] == "string"


def test_missing_file_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        load_data(spark, str(tmp_path / "nope.csv"))


def test_empty_file_raises(spark, tmp_path):
    p = tmp_path / "empty.csv"
    p.write_text("")
    with pytest.raises(ValueError):
        load_data(spark, str(p))


def test_csv_sink_roundtrip(spark, wafer_csv, tmp_path):
    df = load_wafer_csv(spark, wafer_csv)
    out = str(tmp_path / "out_csv")
    write_csv(df.select("Class", "SIZE_X"), out)
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 200


def test_csv_single_file_sink(spark, wafer_csv, tmp_path):
    df = load_wafer_csv(spark, wafer_csv)
    out = tmp_path / "single"
    write_csv_single(df.select("Class"), str(out))
    parts = [p for p in out.iterdir() if p.name.endswith(".csv")]
    assert len(parts) == 1  # reference-parity single file


def test_partitioned_parquet_write(spark, wafer_csv, tmp_path):
    df = load_wafer_csv(spark, wafer_csv)
    out = tmp_path / "part_parquet"
    write_parquet(df, str(out), partition_by=["Class"])
    # hive-style partition dirs exist and partition pruning sees them
    assert any(p.name.startswith("Class=") for p in out.iterdir())
    back = spark.read.parquet(str(out)).filter(F.col("Class") == 1)
    assert back.count() == df.filter(F.col("Class") == 1).count()


def test_cli_main_end_to_end(spark, wafer_csv, tmp_path, capsys):
    from wafer_defect_data_pipeline_spark.cli import main

    out = main(wafer_csv, output_dir=str(tmp_path / "out"), save_processed=True, show_summary=True)
    assert "is_killer_defect" in out.columns and "KMeans_Cluster" in out.columns
    printed = capsys.readouterr().out
    assert "[load] rows=200" in printed and "loss=" in printed and "[sink]" in printed
    csvs = list((tmp_path / "out" / "processed_data.csv").glob("*.csv"))
    assert len(csvs) == 1
