"""Per-job census for one query via the Spark event log (guide §1).

Runs each named query once cold + once warm with
``spark.eventLog.enabled=true``, then parses the event log and prints every
job of the warm run: wall ms, callsite (the action that submitted it), and
job group. This is the tool that answers "where do the N jobs of a
job-count-bound query come from?" — the statusTracker API exposes no job
descriptions or times, the event log has both.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

from wafer_defect_data_pipeline_spark.plans.registry import all_queries  # noqa: E402
from wafer_defect_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    log_dir = tempfile.mkdtemp(prefix="wdps_eventlog_")
    spark = get_spark(
        app_name="job-census",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    sc = spark.sparkContext
    registry = all_queries()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    for name in names:
        fn = registry[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # cold
        sc.setJobGroup(f"census_{name}", name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        print(f"=== {name}: warm {wall:.3f}s ===", flush=True)
    app_id = sc.applicationId
    spark.stop()

    # Spark 4 rolling layout: <dir>/eventlog_v2_<appId>/events_*_<appId>.zstd
    cands = sorted(Path(log_dir).glob(f"eventlog_v2_{app_id}/events_*")) or sorted(
        Path(log_dir).glob(f"{app_id}*")
    )
    if not cands:
        print(f"no event log under {log_dir}", file=sys.stderr)
        return

    def _lines():
        for p in cands:
            yield from p.read_text().splitlines()

    starts: dict[int, dict] = {}
    jobs: list[dict] = []
    for line in _lines():
        ev = json.loads(line)
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            props = ev.get("Properties") or {}
            starts[ev["Job ID"]] = {
                "t0": ev["Submission Time"],
                "group": props.get("spark.jobGroup.id", ""),
                "callsite": props.get("callSite.short", ""),
                "n_stages": len(ev.get("Stage Infos", [])),
            }
        elif e == "SparkListenerJobEnd":
            s = starts.pop(ev["Job ID"], None)
            if s is not None:
                jobs.append(
                    {
                        "job": ev["Job ID"],
                        "ms": ev["Completion Time"] - s["t0"],
                        "group": s["group"],
                        "callsite": s["callsite"],
                        "n_stages": s["n_stages"],
                    }
                )
    for name in names:
        gid = f"census_{name}"
        mine = [j for j in jobs if j["group"] == gid]
        total = sum(j["ms"] for j in mine)
        print(f"--- {name}: {len(mine)} jobs, {total} ms summed ---")
        for j in mine:
            print(f"  job {j['job']:>4}  {j['ms']:>6} ms  stages={j['n_stages']:>2}  {j['callsite']}")
        unfinished = [jid for jid, s in starts.items() if s["group"] == gid]
        if unfinished:
            print(f"  (unfinished/in-flight jobs with no JobEnd: {sorted(unfinished)})")


if __name__ == "__main__":
    main()
