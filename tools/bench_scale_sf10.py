"""sf10 decade probe (r11 verdict item 5).

Extends the sf0.1 -> sf1 -> sf3 scale series one decade on the three
heaviest families — span dedup, streaming admit loops, entity clusters —
using the byte-stable crc32-seeded localdata (tools/gen_testdata.py,
lineitem 60M rows / documents 500k / embeddings 200k at sf10) and the
same median-of-3 protocol as bench.py (1 cold + 3 warm, median + spread).

Modes run SEQUENTIALLY in separate processes (one Spark session at a
time — concurrent sessions on this host skew readings up to 60%,
BASELINE.md round-8 note):

    python tools/bench_scale_sf10.py span   [localdata/sf10]
    python tools/bench_scale_sf10.py entity [localdata/sf10]
    python tools/bench_scale_sf10.py loops  [localdata/sf10]

One JSON line per mode at the end; everything ledgered via record_run.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Family representatives = the heaviest r11 queries per family (VERDICT.md
# plan audit) rather than the full 7-query span table — the decade probe
# prices the families' scaling shape, not every variant.
SPAN = ["dedup_duplicated_spans", "dedup_incremental_spans_merged"]
ENTITY = ["entity_matches_blocked", "entity_clusters"]


def _median3(spark, fn, sf_dir) -> dict:
    times: list[float] = []
    cold = None
    for i in range(4):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t = round(time.perf_counter() - t0, 2)
        if i == 0:
            cold = t
        else:
            times.append(t)
    return {
        "cold": cold,
        "warm": sorted(times)[1],
        "spread": [min(times), max(times)],
    }


def _queries_mode(names: list[str], sf_dir: str, tag: str) -> None:
    from wafer_defect_data_pipeline_spark.ledger import record_run
    from wafer_defect_data_pipeline_spark.plans.registry import all_queries
    from wafer_defect_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"sf10-{tag}")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    registry = all_queries()
    out = {}
    for n in names:
        out[n] = _median3(spark, registry[n], sf_dir)
        print(json.dumps({n: out[n]}), flush=True)
    line = json.dumps({"mode": tag, "sf_dir": sf_dir, "results": out})
    print(line)
    record_run(f"sf10_{tag}", line[:400])
    spark.stop()


def _loops_mode(sf_dir: str) -> None:
    """Admit loops: single-run delta twin vs restart runner, wall + rows
    (the sf1 protocol of tools/bench_restart_overhead.py, one decade up).
    Loops are multi-batch pipelines with their own staged state dirs, so
    each runs ONCE per variant — the cold/warm split doesn't apply."""
    from wafer_defect_data_pipeline_spark.ledger import record_run
    from wafer_defect_data_pipeline_spark.session import get_spark
    from wafer_defect_data_pipeline_spark.streaming.dedup import (
        run_streaming_entity_linkage_delta,
        run_streaming_entity_linkage_delta_restart,
        run_streaming_minhash_probe_delta,
        run_streaming_minhash_probe_delta_restart,
        run_streaming_span_dedup_delta,
        run_streaming_span_dedup_delta_restart,
    )

    spark = get_spark(app_name="sf10-loops")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    def wall(fn, **kw):
        t0 = time.perf_counter()
        n = fn(spark, sf_dir, **kw).count()
        return round(time.perf_counter() - t0, 2), n

    out = {}
    for tag, single, restart, kw in (
        ("span", run_streaming_span_dedup_delta,
         run_streaming_span_dedup_delta_restart, {}),
        ("minhash", run_streaming_minhash_probe_delta,
         run_streaming_minhash_probe_delta_restart, {"threshold": 0.4}),
        ("entity", run_streaming_entity_linkage_delta,
         run_streaming_entity_linkage_delta_restart, {}),
    ):
        s_wall, s_rows = wall(single, **kw)
        r_wall, r_rows = wall(restart, **kw)
        out[tag] = {
            "single_wall": s_wall, "restart_wall": r_wall,
            "rows": s_rows, "rows_equal": s_rows == r_rows,
        }
        print(json.dumps({tag: out[tag]}), flush=True)
    line = json.dumps({"mode": "loops", "sf_dir": sf_dir, "results": out})
    print(line)
    record_run("sf10_loops", line[:400])
    spark.stop()


def main() -> None:
    mode = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else f"{_REPO}/localdata/sf10"
    if mode == "span":
        _queries_mode(SPAN, sf_dir, "span")
    elif mode == "entity":
        _queries_mode(ENTITY, sf_dir, "entity")
    elif mode == "loops":
        _loops_mode(sf_dir)
    else:
        raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
