"""Measure kill-between-days recovery overhead at scale (round 11).

The restart drills prove bit-equality; this tool prices them: for each
admit loop, wall-clock the single-run delta twin vs the restart runner
(same staged days, same bodies — the delta is two extra query lifetimes,
one DeltaManifest.recover per day, and Spark's checkpointLocation
bookkeeping), plus the time-travel read. Evidence for BASELINE.md: a
multi-day 100 TB crawl restarts daily, so recovery must cost seconds,
not a re-index.

Usage: python tools/bench_restart_overhead.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else f"{_REPO}/localdata/sf1"
    from wafer_defect_data_pipeline_spark.ledger import record_run
    from wafer_defect_data_pipeline_spark.session import get_spark
    from wafer_defect_data_pipeline_spark.streaming.dedup import (
        run_streaming_minhash_probe_delta,
        run_streaming_minhash_probe_delta_restart,
        run_streaming_span_dedup_delta,
        run_streaming_span_dedup_delta_restart,
        run_streaming_span_dedup_time_travel,
    )
    from wafer_defect_data_pipeline_spark.streaming.search import (
        run_streaming_bm25_standing,
        run_streaming_bm25_standing_restart,
    )
    from wafer_defect_data_pipeline_spark.streaming.similarity import (
        run_streaming_ann_probe,
        run_streaming_ann_probe_restart,
    )

    spark = get_spark(app_name="restart-overhead-bench")
    spark.read.parquet(f"{sf}/region.parquet").count()  # warm-up

    def wall(fn, **kw) -> tuple[float, int]:
        t0 = time.perf_counter()
        n = fn(spark, sf, **kw).count()
        return round(time.perf_counter() - t0, 2), n

    pairs = [
        ("span", run_streaming_span_dedup_delta,
         run_streaming_span_dedup_delta_restart, {}),
        ("minhash", run_streaming_minhash_probe_delta,
         run_streaming_minhash_probe_delta_restart, {"threshold": 0.4}),
        ("ann", run_streaming_ann_probe, run_streaming_ann_probe_restart,
         {"k": 3}),
        ("bm25", run_streaming_bm25_standing,
         run_streaming_bm25_standing_restart, {"k": 10}),
    ]
    lines = []
    for name, single, restart, kw in pairs:
        s_wall, s_rows = wall(single, **kw)
        r_wall, r_rows = wall(restart, **kw)
        assert s_rows == r_rows, (name, s_rows, r_rows)
        lines.append(
            f"{name}: single {s_wall}s vs restart {r_wall}s "
            f"(+{round(r_wall - s_wall, 2)}s, {s_rows} rows equal)"
        )
        print(lines[-1], flush=True)
    tt_wall, tt_rows = wall(run_streaming_span_dedup_time_travel)
    lines.append(f"time_travel: {tt_wall}s ({tt_rows} versions)")
    print(lines[-1], flush=True)
    record_run("restart_overhead", f"{sf}: " + "; ".join(lines))


if __name__ == "__main__":
    main()
