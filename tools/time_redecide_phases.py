"""Ad-hoc phase timer for the redecide query (optimization guide §1: isolate
the expensive query; label jobs). Times each phase with the noop sink or the
query's own actions, 3 repeats, prints one JSON line per phase."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from wafer_defect_data_pipeline_spark.plans.queries_similarity import (  # noqa: E402
    _REDECIDE_NSW,
    _staged_redecide_snapshots,
)
from wafer_defect_data_pipeline_spark.operators.similarity import (  # noqa: E402
    ann_dispatch_decision,
    ivf_topk,
)
from wafer_defect_data_pipeline_spark.operators.graph_ann import (  # noqa: E402
    knn_graph,
    nsw_search,
)
from wafer_defect_data_pipeline_spark.session import get_spark  # noqa: E402


def t(label, fn, n=3):
    walls = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        walls.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"phase": label, "walls": walls}), flush=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time-redecide-phases")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    snap1, batch = _staged_redecide_snapshots(spark, sf_dir)
    snap1 = snap1.localCheckpoint(eager=False)
    snap1.count()
    snap2 = snap1.unionByName(batch).localCheckpoint(eager=False)
    snap2.count()
    q1 = snap1.filter(F.col("vec_id") % 50 == 0)
    q2 = snap2.filter(F.col("vec_id") % 50 == 0)

    t("probe_day1", lambda: ann_dispatch_decision(snap1, target_queries=50))
    t("probe_day2", lambda: ann_dispatch_decision(snap2, target_queries=50))
    t(
        "serve_day1_ivf",
        lambda: ivf_topk(snap1, q1, k=5, n_probe=1)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    p = _REDECIDE_NSW

    def build():
        g = knn_graph(
            snap2, dim=64, k_build=p["k_build"], n_probe=p["n_probe"],
            n_cells=p["n_cells"],
        )
        g.write.format("noop").mode("overwrite").save()
        return g

    t("build_day2_graph", build)

    g = knn_graph(
        snap2, dim=64, k_build=p["k_build"], n_probe=p["n_probe"],
        n_cells=p["n_cells"],
    ).localCheckpoint(eager=False)
    g.count()

    t(
        "search_day2_nsw",
        lambda: nsw_search(
            g, snap2, q2, dim=64, beam_width=p["beam_width"],
            n_hops=p["n_hops"], k_top=5, n_entry=p["n_entry"],
            entry_sample_mod=p["entry_sample_mod"],
        )
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
