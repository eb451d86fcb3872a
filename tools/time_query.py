"""Time named registered queries: 1 cold + N warm noop-sink runs in one
session (the bench methodology, isolated). One JSON line per query."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

from wafer_defect_data_pipeline_spark.plans.registry import all_queries  # noqa: E402
from wafer_defect_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_warm = int(os.environ.get("TIME_QUERY_WARM", "3"))
    names = sys.argv[1:]
    spark = get_spark(app_name="time-query")
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    registry = all_queries()
    for name in names:
        fn = registry[name]
        walls = []
        for _ in range(1 + n_warm):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        print(
            json.dumps(
                {"query": name, "cold": walls[0], "warm": walls[1:],
                 "warm_median": sorted(walls[1:])[len(walls[1:]) // 2]}
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
