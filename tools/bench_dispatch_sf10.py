"""Dispatch decade probe (r13 verdict item 4): `ann_topk_auto_quantized`
end-to-end at localdata/sf1 (20k vectors) and localdata/sf10 (200k — the
`nsw_scale_params` upper anchor), same stable-seed data and median-free
single-shot protocol as the r12 span/entity decade tables (these runs are
minutes long; host noise is a rounding error at this duration).

Measures, per sf:
- probe_s     — quantizer build + cell assignment + the capped-sample
                decision (the O(target x n) term whose LINEARITY is the
                claim under test: sf10/sf1 should read ~10x on 10x data)
- decision    — (branch, n_probe, n_cells) the dispatch derived
- serve_s     — the chosen branch answering the query batch
- recall@5    — vs the branch's own exact metric (cosine brute force for
                IVF, exact integer L2 for NSW — the bench_ann_recall
                convention, so recall isolates the search approximation)
- exact_s     — the ground-truth cost (what the dispatch is priced against)

Run modes SEQUENTIALLY in separate processes (one Spark session at a time
— concurrent sessions skew readings up to 60%, BASELINE.md round-8 note):

    python tools/bench_dispatch_sf10.py sf1  [localdata/sf1]
    python tools/bench_dispatch_sf10.py sf10 [localdata/sf10]

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

from pyspark.sql import functions as F  # noqa: E402

from wafer_defect_data_pipeline_spark.ledger import record_run  # noqa: E402
from wafer_defect_data_pipeline_spark.session import get_spark  # noqa: E402
from wafer_defect_data_pipeline_spark.sources import read_table  # noqa: E402

#: serving-query sampling modulus per mode — 200 queries at sf10 keeps the
#: exact ground truth (~200 x 200k scored pairs) inside ~20 min
_QUERY_MOD = {"sf1": 50, "sf10": 1000}
#: quantizer cell count: the production IVF sf1 table used 64; the decision
#: rule (ivf iff 2 * n_probe <= n_cells) then has real pruning headroom
_N_CELLS = 64


def recall_at_k(approx_df, truth_df, k: int) -> float:
    a = {(r["query_id"], r["corpus_id"]) for r in approx_df.collect()}
    t = [(r["query_id"], r["corpus_id"]) for r in truth_df.collect()]
    return round(sum(1 for p in t if p in a) / max(len(t), 1), 4)


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "sf10"
    if mode not in _QUERY_MOD:  # fail BEFORE Spark startup, with the menu
        sys.exit(f"unknown mode {mode!r}; expected one of {sorted(_QUERY_MOD)}")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else f"localdata/{mode}"
    spark = get_spark(app_name=f"dispatch-decade-{mode}")

    from wafer_defect_data_pipeline_spark.operators.graph_ann import (
        assign_coarse_cells,
        build_coarse_quantizer,
        nsw_scale_params,
    )
    from wafer_defect_data_pipeline_spark.operators.quantization import (
        exact_int_l2_topk,
    )
    from wafer_defect_data_pipeline_spark.operators.similarity import (
        ann_dispatch_decision,
        ann_topk_auto,
        brute_force_topk,
    )

    e = read_table(spark, sf_dir, "embeddings").localCheckpoint(eager=False)
    n = e.count()
    q = e.filter(F.col("vec_id") % _QUERY_MOD[mode] == 0).localCheckpoint(
        eager=False
    )
    nq = q.count()

    # --- probe phase (the linearity claim): quantizer + cells + decision
    t0 = time.perf_counter()
    C = build_coarse_quantizer(e, dim=64, n_cells=_N_CELLS, lloyd_steps=2)
    cells = assign_coarse_cells(e, C, n_top=1).select(
        F.col("id").alias("vec_id"), F.col("code").alias("__qcell")
    )
    corpus2 = (
        e.select("vec_id", "embedding")
        .join(cells, "vec_id")
        .localCheckpoint(eager=False)
    )
    corpus2.count()
    n_probe, n_cells, branch = ann_dispatch_decision(
        corpus2, cell_col="__qcell", target_queries=500
    )
    probe_s = round(time.perf_counter() - t0, 2)

    # --- serve phase: the chosen branch answers the batch (ann_topk_auto
    # on the assigned corpus with the decision knobs pinned via defaults —
    # it re-derives the same decision; serve_s isolates the branch by
    # subtracting nothing, so it is an upper bound on the serving cost)
    nsw_p = nsw_scale_params(n)
    t1 = time.perf_counter()
    served = ann_topk_auto(
        corpus2, q, cell_col="__qcell", k=5, target_recall=0.95,
        target_queries=500, dim=64, nsw_params=nsw_p,
    ).localCheckpoint(eager=False)
    served.count()
    serve_s = round(time.perf_counter() - t1, 2)

    # --- ground truth in the branch's own metric
    t2 = time.perf_counter()
    if branch == "ivf":
        truth = brute_force_topk(corpus2, q, k=5)
    else:
        truth = exact_int_l2_topk(corpus2, q, "vec_id", "embedding", dim=64, k_top=5)
    truth = truth.localCheckpoint(eager=False)
    truth.count()
    exact_s = round(time.perf_counter() - t2, 2)
    rec = recall_at_k(served.select("query_id", "corpus_id"), truth, 5)

    out = {
        "mode": mode,
        "sf_dir": sf_dir,
        "n_vectors": n,
        "n_queries": nq,
        "n_cells": _N_CELLS,
        "branch": branch,
        "n_probe": n_probe,
        "probe_s": probe_s,
        "serve_s": serve_s,
        "recall_at_5": rec,
        "exact_s": exact_s,
        "nsw_params": nsw_p,
    }
    line = json.dumps(out)
    print(line)
    record_run(f"dispatch_decade_{mode}", line)
    spark.stop()


if __name__ == "__main__":
    main()
