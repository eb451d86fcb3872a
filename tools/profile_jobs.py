"""Per-query job/stage/task profiler (optimization guide §1).

For each query name given on argv, runs the query once cold and once warm
against $SPARK_GRAFT_SF_DIR (noop sink), grouped with setJobGroup, and
reports wall seconds plus the number of Spark JOBS the query submitted —
the fixed-overhead census that explains why small-sf timings are dominated
by job count, not data volume. Output: one JSON line per query.
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

from wafer_defect_data_pipeline_spark.plans.registry import all_queries  # noqa: E402
from wafer_defect_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    spark = get_spark(app_name="profile-jobs")
    sc = spark.sparkContext
    registry = all_queries()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    for name in names:
        fn = registry[name]
        out = {"query": name}
        for run in ("cold", "warm"):
            gid = f"prof_{name}_{run}"
            sc.setJobGroup(gid, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - t0, 3)
            sc.setJobGroup(None, None)
            jt = sc._jsc.sc().statusTracker()
            job_ids = list(jt.getJobIdsForGroup(gid))
            n_stages = 0
            n_tasks = 0
            for jid in job_ids:
                ji = jt.getJobInfo(jid)
                if ji.isEmpty():
                    continue
                for sid in list(ji.get().stageIds()):
                    si = jt.getStageInfo(sid)
                    if not si.isEmpty():
                        n_stages += 1
                        n_tasks += si.get().numTasks()
            out[run] = {"wall_s": wall, "jobs": len(job_ids), "stages": n_stages, "tasks": n_tasks}
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
