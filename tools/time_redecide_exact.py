"""Mirror _ann_dispatch_redecide's body exactly, with per-step timing marks
(staging / day1 decision / day1 serve build / day2 decision / final action).
Run twice in one session; prints JSON lines."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from wafer_defect_data_pipeline_spark.plans.queries_similarity import (  # noqa: E402
    _redecide_serve,
    _staged_redecide_snapshots,
)
from wafer_defect_data_pipeline_spark.operators.similarity import (  # noqa: E402
    ann_dispatch_decision,
    ann_dispatch_should_redecide,
    load_latest_dispatch_decision,
    persist_dispatch_decision,
)
from wafer_defect_data_pipeline_spark.scratch import scratch_dir  # noqa: E402
from wafer_defect_data_pipeline_spark.session import get_spark  # noqa: E402


def run(spark, sf_dir, tag):
    marks = {}
    t0 = time.perf_counter()

    def mark(name):
        nonlocal t0
        marks[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()

    snap1, batch = _staged_redecide_snapshots(spark, sf_dir)
    snap1 = snap1.localCheckpoint(eager=False)
    n1 = snap1.count()
    base = scratch_dir(f"ann_redecide_{sf_dir.rstrip('/').rsplit('/', 1)[-1]}")
    shutil.rmtree(f"{base}/decision", ignore_errors=True)
    mark("staging")

    p1, c1, b1 = ann_dispatch_decision(snap1, target_queries=50)
    mark("decision1")
    persist_dispatch_decision(spark, base, 1, b1, p1, c1, 0, n1)
    dec1 = load_latest_dispatch_decision(spark, base)
    mark("persist_load1")
    day1 = _redecide_serve(
        snap1, snap1.filter(F.col("vec_id") % 50 == 0), dec1
    ).select(
        F.lit(1).cast("int").alias("day"),
        "query_id", "rank", "corpus_id",
        F.lit(dec1["branch"]).alias("branch_used"),
        F.lit(int(dec1["n_probe"])).cast("int").alias("n_probe_used"),
        F.lit(int(dec1["n_cells"])).cast("int").alias("n_cells_used"),
        F.lit(int(dec1["version"])).cast("int").alias("decision_version"),
        F.lit(0 - int(dec1["decided_at_batch"])).cast("int").alias(
            "decision_age_batches"
        ),
    )
    mark("day1_build_lazy")

    snap2 = snap1.unionByName(batch).localCheckpoint(eager=False)
    n2 = snap2.count()
    mark("snap2_count")
    if ann_dispatch_should_redecide(
        n2, int(dec1["n_at_decision"]), 1 - int(dec1["decided_at_batch"])
    ):
        p2, c2, b2 = ann_dispatch_decision(snap2, target_queries=50)
        persist_dispatch_decision(
            spark, base, int(dec1["version"]) + 1, b2, p2, c2, 1, n2
        )
    mark("decision2_persist")
    dec2 = load_latest_dispatch_decision(spark, base)
    day2 = _redecide_serve(
        snap2, snap2.filter(F.col("vec_id") % 50 == 0), dec2
    ).select(
        F.lit(2).cast("int").alias("day"),
        "query_id", "rank", "corpus_id",
        F.lit(dec2["branch"]).alias("branch_used"),
        F.lit(int(dec2["n_probe"])).cast("int").alias("n_probe_used"),
        F.lit(int(dec2["n_cells"])).cast("int").alias("n_cells_used"),
        F.lit(int(dec2["version"])).cast("int").alias("decision_version"),
        F.lit(1 - int(dec2["decided_at_batch"])).cast("int").alias(
            "decision_age_batches"
        ),
    )
    mark("day2_build_lazy")
    out = day1.unionByName(day2).orderBy("day", "query_id", "rank")
    out.write.format("noop").mode("overwrite").save()
    mark("final_action")
    marks["total"] = round(sum(marks.values()), 3)
    print(json.dumps({"tag": tag, **marks}), flush=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time-redecide-exact")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    for i in range(3):
        run(spark, sf_dir, f"run{i}")
    spark.stop()


if __name__ == "__main__":
    main()
