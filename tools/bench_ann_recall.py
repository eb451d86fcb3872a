"""ANN recall-vs-speed evidence (r10 verdict item 8).

The NSW and IVF paths are bit-equal to their unrolled oracles — that pins
CORRECTNESS of the implementation, but says nothing about how much of the
true top-k the approximate search surfaces. This tool records recall@k vs
the exact ground truth at a given SF, across the knobs a deployment would
turn (NSW beam width, IVF probe count), the way the int8/PQ quantization
table in BASELINE.md already does for its recall axis.

Ground truths match each path's own metric so recall isolates the SEARCH
approximation, not a metric mismatch: NSW searches integer-quantized L2
(ground truth ``exact_int_l2_topk``), IVF ranks by rounded cosine (ground
truth ``brute_force_topk``).

Usage: SPARK_GRAFT_SF_DIR=localdata/sf1 python tools/bench_ann_recall.py
Prints one JSON line per configuration plus a summary table.
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

from pyspark.sql import functions as F  # noqa: E402

from wafer_defect_data_pipeline_spark.session import get_spark  # noqa: E402
from wafer_defect_data_pipeline_spark.sources import read_table  # noqa: E402


def recall_at_k(approx_df, truth_df, k: int) -> float:
    """Mean over queries of |approx top-k ∩ true top-k| / k. Both inputs
    carry (query_id, rank, corpus_id) with rank <= k."""
    a = approx_df.select("query_id", "corpus_id")
    t = truth_df.select("query_id", "corpus_id")
    hits = a.join(t, ["query_id", "corpus_id"]).groupBy("query_id").count()
    n_q = t.select("query_id").distinct().count()
    total_hits = hits.agg(F.sum("count")).collect()[0][0] or 0
    return total_hits / (n_q * k)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    k = 5
    spark = get_spark(app_name="ann-recall")

    from wafer_defect_data_pipeline_spark.operators.graph_ann import (
        knn_graph,
        nsw_search,
    )
    from wafer_defect_data_pipeline_spark.operators.quantization import (
        exact_int_l2_topk,
    )
    from wafer_defect_data_pipeline_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)
    n_corpus, n_q = e.count(), q.count()
    print(f"# corpus={n_corpus} queries={n_q} k={k} sf_dir={sf_dir}")
    rows = []

    # --- NSW: integer-L2 ground truth, one graph build per config ----------
    t0 = time.perf_counter()
    truth_l2 = exact_int_l2_topk(e, q, "vec_id", "embedding", dim=64, k_top=k)
    truth_l2 = truth_l2.localCheckpoint(eager=False)
    truth_l2.count()
    t_exact = time.perf_counter() - t0

    # m ≈ √n keeps the coarse entry pass at ~√n scored nodes per query
    mod = max(2, int(round(n_corpus ** 0.5 / 2)))
    for k_build, n_probe in ((8, 2), (16, 3)):
        t0 = time.perf_counter()
        g = knn_graph(e, dim=64, k_build=k_build, n_probe=n_probe, n_cells=16)
        g = g.localCheckpoint(eager=False)
        g.count()
        t_build = time.perf_counter() - t0
        for beam, n_entry, sample_mod in (
            (4, 4, None), (8, 4, None), (12, 4, None), (16, 4, None),
            (8, 8, mod), (12, 12, mod), (16, 16, mod),
        ):
            t0 = time.perf_counter()
            approx = nsw_search(
                g, e, q, dim=64, beam_width=beam, n_hops=4, k_top=k,
                n_entry=n_entry, entry_sample_mod=sample_mod,
            )
            approx = approx.localCheckpoint(eager=False)
            approx.count()
            wall = time.perf_counter() - t0
            r = recall_at_k(approx, truth_l2, k)
            knob = f"k_build={k_build},n_probe={n_probe},beam={beam}" + (
                f",entry_mod={sample_mod}" if sample_mod else ",fixed_entries"
            )
            rows.append(
                {"path": "nsw", "knob": knob, "recall_at_5": round(r, 4),
                 "search_s": round(wall, 2),
                 "extra": {"build_s": round(t_build, 2), "exact_s": round(t_exact, 2)}}
            )
            print(json.dumps(rows[-1]))

    # --- IVF: cosine ground truth ------------------------------------------
    t0 = time.perf_counter()
    truth_cos = brute_force_topk(e, q, k=k)
    truth_cos = truth_cos.localCheckpoint(eager=False)
    truth_cos.count()
    t_bf = time.perf_counter() - t0
    for n_probe in (1, 3, 5):
        t0 = time.perf_counter()
        approx = ivf_topk(e, q, k=k, n_probe=n_probe)
        approx = approx.localCheckpoint(eager=False)
        approx.count()
        wall = time.perf_counter() - t0
        r = recall_at_k(approx, truth_cos, k)
        rows.append(
            {"path": "ivf", "knob": f"n_probe={n_probe}", "recall_at_5": round(r, 4),
             "search_s": round(wall, 2), "extra": {"bruteforce_s": round(t_bf, 2)}}
        )
        print(json.dumps(rows[-1]))

    print("\n| path | knob | recall@5 | search s |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['path']} | {r['knob']} | {r['recall_at_5']} | {r['search_s']} |")

    from wafer_defect_data_pipeline_spark.ledger import record_run

    record_run(
        "ann_recall",
        "; ".join(f"{r['path']} {r['knob']} r@5={r['recall_at_5']}" for r in rows)
        + f" at {sf_dir}",
    )
    spark.stop()


if __name__ == "__main__":
    main()
