"""Interleaved A/B for the CC pair-fusion on its consumers (r15 VERDICT
item 1): times registered queries with connected_components running 1 vs 2
relax rounds per driver action, alternating A,B,A,B within one session so
host drift cannot masquerade as a code effect. Usage:
    python tools/ab_cc_fusion.py [n_pairs] [query ...]
"""
from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
sys.path.insert(0, _REPO)

import wafer_defect_data_pipeline_spark.operators.graph as G  # noqa: E402
from wafer_defect_data_pipeline_spark.plans.registry import all_queries  # noqa: E402
from wafer_defect_data_pipeline_spark.session import get_spark  # noqa: E402

_ORIG = G.connected_components


def main() -> None:
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    n_pairs = int(args[0]) if args and args[0].isdigit() else 5
    names = [a for a in args if not a.isdigit()] or ["dedup_cluster_assignment"]
    spark = get_spark(app_name="ab-cc-fusion")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    reg = all_queries()

    def run(name: str, rpa: int) -> float:
        G.connected_components = lambda *a, **k: _ORIG(*a, **{**k, "rounds_per_action": rpa})
        try:
            t0 = time.perf_counter()
            reg[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            return round(time.perf_counter() - t0, 3)
        finally:
            G.connected_components = _ORIG

    for name in names:
        run(name, 2)  # warm-up (cold run discarded)
        a, b = [], []
        for _ in range(n_pairs):
            a.append(run(name, 1))
            b.append(run(name, 2))
        print(
            f"{name}: single-round median {statistics.median(a)} {a} | "
            f"fused-pair median {statistics.median(b)} {b}"
        )


if __name__ == "__main__":
    main()
