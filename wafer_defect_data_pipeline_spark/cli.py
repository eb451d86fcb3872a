"""CLI entry point — the engine's equivalent of the reference's ``main.py``.

Functional parity with ``/root/reference/main.py:14-132``: load a wafer CSV
(validated), run the four pipeline stages, print per-stage summary metrics
(row counts, loss rate, cluster distribution, killer counts), and sink the
processed table. Flags mirror the reference's ``main(data_path, output_dir,
save_processed, show_summary)`` signature.

Summary metrics are Spark actions over the lazy pipeline; the post-stage
frame is cached once so the metric actions and the sink don't recompute the
lineage (SURVEY.md §3).

Usage::

    python -m wafer_defect_data_pipeline_spark.cli dataset.csv \
        --output-dir processed_data [--no-save] [--no-summary] [--parquet]
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .plans.pipeline import WaferPipeline
from .session import get_spark
from .sources.csv import load_data
from .sources.sinks import write_csv_single, write_parquet


def _print_summary(label: str, df: DataFrame) -> int:
    n = df.count()
    print(f"[{label}] rows={n}")
    return n


def main(
    data_path: str | None = None,
    output_dir: str = "processed_data",
    save_processed: bool = True,
    show_summary: bool = True,
    parquet: bool = False,
) -> DataFrame:
    spark = get_spark(app_name="wafer-pipeline-cli")
    raw = load_data(spark, data_path)

    n_raw = raw.count()
    if show_summary:
        print(f"[load] rows={n_raw} cols={len(raw.columns)}")
        null_total = raw.select(
            sum(F.sum(F.col(c).isNull().cast("long")) for c in raw.columns).alias("n")
        ).first()["n"]
        print(f"[load] total nulls={null_total}")

    pipeline = WaferPipeline()
    out = pipeline.preprocess(raw).cache()

    try:
        n_out = out.count()
        if show_summary:
            loss = (n_raw - n_out) / n_raw * 100 if n_raw else 0.0
            # outlier loss is the only row-dropping stage, so raw-vs-final
            # row delta is the filter's loss rate (reference prints 19.06%)
            print(f"[outliers] rows={n_out} loss={loss:.2f}%")
            print("[clusters] distribution (null = not in an analysed step):")
            for r in (
                out.groupBy("KMeans_Cluster").count().orderBy(F.desc("count")).collect()
            ):
                print(f"  cluster={r['KMeans_Cluster']} n={r['count']}")
            n_killer = out.select(
                F.sum(F.col("is_killer_defect").cast("long")).alias("n")
            ).first()["n"]
            print(f"[killer] flagged={n_killer} ({(n_killer or 0) / n_out * 100 if n_out else 0:.2f}%)")
            print("[crosstab] Class x IS_DEFECT:")
            (
                out.groupBy("Class").pivot("IS_DEFECT").count().na.fill(0).orderBy("Class")
            ).show(truncate=False)

        if save_processed:
            if parquet:
                write_parquet(out, f"{output_dir}/processed_data.parquet")
            else:
                # reference-parity single CSV; use --parquet for the scale sink
                write_csv_single(out, f"{output_dir}/processed_data.csv")
            print(f"[sink] wrote {output_dir}")
        return out
    finally:
        out.unpersist()


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument(
        "data_path",
        nargs="?",
        default=None,
        help="wafer CSV path (default: <repo root>/dataset.csv, reference parity)",
    )
    p.add_argument("--output-dir", default="processed_data")
    p.add_argument("--no-save", action="store_true")
    p.add_argument("--no-summary", action="store_true")
    p.add_argument("--parquet", action="store_true", help="parquet sink instead of single CSV")
    return p


if __name__ == "__main__":
    args = _build_parser().parse_args()
    main(
        args.data_path,
        output_dir=args.output_dir,
        save_processed=not args.no_save,
        show_summary=not args.no_summary,
        parquet=args.parquet,
    )
