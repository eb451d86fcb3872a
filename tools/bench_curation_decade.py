"""Curation end-to-end decade probe (r14 verdict item 5).

`curation_end_to_end` is the composed flagship a real LLM-data user runs
first, but its scale evidence stopped at sf1 (12.5 s total, no per-stage
attribution). This runs the REGISTERED query fn at localdata/sf1 (50k docs)
and localdata/sf10 (500k docs — the 10x decade) with the query's own
``stage_walls`` side-channel, and reports per-stage walls alongside the
per-stage survivor counts the manifest already carries — so the decade
table can name the first stage whose growth exceeds the data ratio.

Same protocol as the other decade probes (bench_dispatch_sf10 et al.):
single-shot per sf (runs are minutes long; host noise is a rounding
error), one Spark session at a time — run modes SEQUENTIALLY in separate
processes:

    python tools/bench_curation_decade.py sf1  [localdata/sf1]
    python tools/bench_curation_decade.py sf10 [localdata/sf10]

One JSON line at the end; ledgered via record_run.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from wafer_defect_data_pipeline_spark.ledger import record_run  # noqa: E402
from wafer_defect_data_pipeline_spark.session import get_spark  # noqa: E402

_MODES = {"sf1": "localdata/sf1", "sf10": "localdata/sf10"}


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "sf1"
    if mode not in _MODES:
        raise SystemExit(f"mode must be one of {sorted(_MODES)}")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else str(Path(_REPO) / _MODES[mode])

    from wafer_defect_data_pipeline_spark.plans.queries_curation import (
        _curation_end_to_end,
    )

    spark = get_spark(app_name=f"curation-decade-{mode}")
    # warm-up: JVM classloading + parquet footers, not billed to stage 1
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    walls: dict[str, float] = {}
    t0 = time.perf_counter()
    out = _curation_end_to_end(spark, sf_dir, stage_walls=walls)
    rows = out.collect()
    walls["manifest_agg"] = round(time.perf_counter() - t0 - sum(walls.values()), 3)
    total = round(time.perf_counter() - t0, 3)

    r0 = rows[0].asDict()
    survivors = {
        k: int(r0[k])
        for k in ("n_input", "n_after_exact", "n_after_cap", "n_after_quality",
                  "n_curated", "n_packs")
    }
    rec = {
        "metric": "curation_e2e_decade",
        "mode": mode,
        "sf_dir": sf_dir,
        "total_s": total,
        "stages_s": walls,
        "survivors": survivors,
        "n_shards": len(rows),
    }
    print(json.dumps(rec))
    record_run(
        "bench-curation-decade",
        f"{mode}: total {total}s; stages {json.dumps(walls)}; "
        f"survivors {json.dumps(survivors)}",
    )
    spark.stop()


if __name__ == "__main__":
    main()
