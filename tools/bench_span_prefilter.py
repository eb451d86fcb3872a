"""Span-family cost probe (r10 verdict item 7): does a semi-join prefilter
that restricts the islands window to docs containing at least one
duplicated gram help duplicated_spans at sf1/sf3?

Structural expectation, recorded up front: in the window shape, the
islands merge's input (``covered``) is ALREADY exactly the positions of
duplicated grams — a doc that carries none contributes zero rows — so a
doc-level ``distinct`` + ``left_semi`` can only ADD two exchanges without
removing a single row. This probe measures it anyway so the question
closes on numbers, not reasoning (negative results count; see BASELINE.md
round-11).

Usage: SPARK_GRAFT_SF_DIR=localdata/sf1 python tools/bench_span_prefilter.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from wafer_defect_data_pipeline_spark.session import get_spark  # noqa: E402
from wafer_defect_data_pipeline_spark.sources import read_table  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="span-prefilter-probe")
    from wafer_defect_data_pipeline_spark.operators.dedup import (
        _gram_positions,
        _merge_covered_spans,
        duplicated_spans,
    )

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    tail = d.select(
        (F.col("doc_id") + F.lit(2_000_000)).alias("doc_id"),
        F.expr("substring(text, 31)").alias("text"),
    )
    corpus = d.unionByName(tail)

    def stock():
        return duplicated_spans(corpus, "doc_id", "text", k=20, min_span=40, min_count=2)

    def prefiltered():
        # window shape + the probed doc-level semi-join before the islands
        # window (the r10 verdict's suggested variant, replicated verbatim)
        pos = _gram_positions(corpus, "doc_id", "text", 20)
        covered = (
            pos.withColumn("n", F.count(F.lit(1)).over(W.partitionBy("gh")))
            .filter(F.col("n") >= 2)
            .select("__id", "pos")
        )
        dup_docs = covered.select("__id").distinct()
        covered = covered.join(dup_docs, "__id", "left_semi")
        return _merge_covered_spans(covered, "doc_id", 20, 40)

    # correctness first: identical output (the prefilter must be a no-op)
    a = sorted(tuple(r) for r in stock().collect())
    b = sorted(tuple(r) for r in prefiltered().collect())
    assert a == b, f"variant changed output: {len(a)} vs {len(b)} rows"

    results = {}
    for name, fn in (("stock", stock), ("prefiltered", prefiltered)):
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 2))
        results[name] = {"warm_median": sorted(times)[1], "runs": times}
    print(json.dumps({"sf_dir": sf_dir, "rows": len(a), **results}))

    from wafer_defect_data_pipeline_spark.ledger import record_run

    record_run(
        "span_prefilter_probe",
        f"{sf_dir}: stock {results['stock']['warm_median']}s vs "
        f"prefiltered {results['prefiltered']['warm_median']}s over {len(a)} spans",
    )
    spark.stop()


if __name__ == "__main__":
    main()
