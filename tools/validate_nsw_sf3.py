"""Validate nsw_scale_params BETWEEN its measured anchors (r12 verdict
item 5): the rule interpolates a power-law fit to exactly two points
(20k -> k_build 16, 200k -> 32); this measures recall@5 at sf3 (~60k
vectors, mid-decade) with the INTERPOLATED parameters so the rule's
interior is evidence, not extrapolation.

Generates localdata/sf3/embeddings.parquet byte-identically to what
tools/gen_testdata.py --sf 3 would emit (same crc32-seeded RNG stream;
the embeddings table draws from its own named generator, so no other
table needs to exist), builds the graph with nsw_scale_params(n), runs
the search, and prints one JSON line with recall@5 and timings vs the
exact integer-L2 ground truth.

Usage: python tools/validate_nsw_sf3.py  [--queries-mod 500]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import zlib
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def ensure_sf3_embeddings(out_dir: str) -> str:
    """Write localdata/sf3/embeddings.parquet exactly as gen_testdata.gen
    would (same _rng stream: default_rng([seed, crc32("embeddings")]))."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(out_dir, "embeddings.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(out_dir, exist_ok=True)
    n_emb = max(500, int(20_000 * 3))
    r = np.random.default_rng([42, zlib.crc32(b"embeddings") & 0x7FFFFFFF])
    labels = r.integers(0, 10, n_emb)
    centers = r.normal(0, 1, (10, 64))
    vecs = centers[labels] + r.normal(0, 0.6, (n_emb, 64))
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(n_emb), pa.int64()),
            "embedding": pa.array(
                [v for v in vecs.astype(np.float32)], pa.list_(pa.float32())
            ),
            "label": pa.array(labels, pa.int32()),
        }),
        path,
    )
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries-mod", type=int, default=500)
    ap.add_argument("--out", default=os.path.join(_REPO, "localdata", "sf3"))
    a = ap.parse_args()

    from pyspark.sql import functions as F

    from wafer_defect_data_pipeline_spark.ledger import record_run
    from wafer_defect_data_pipeline_spark.operators.graph_ann import (
        knn_graph,
        nsw_scale_params,
        nsw_search,
    )
    from wafer_defect_data_pipeline_spark.operators.quantization import (
        exact_int_l2_topk,
    )
    from wafer_defect_data_pipeline_spark.session import get_spark

    ensure_sf3_embeddings(a.out)
    spark = get_spark(app_name="nsw-sf3-validate")
    e = spark.read.parquet(os.path.join(a.out, "embeddings.parquet"))
    q = e.filter(F.col("vec_id") % a.queries_mod == 0)
    n, n_q = e.count(), q.count()
    p = nsw_scale_params(n)
    print(f"# n={n} queries={n_q} params={p}", flush=True)

    t0 = time.perf_counter()
    truth = exact_int_l2_topk(e, q, "vec_id", "embedding", dim=64, k_top=5)
    truth = truth.localCheckpoint(eager=False)
    n_truth = truth.count()
    t_exact = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    g = knn_graph(
        e, dim=64, k_build=p["k_build"], n_probe=p["n_probe"],
        n_cells=p["n_cells"],
    ).localCheckpoint(eager=False)
    n_edges = g.count()
    t_build = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    approx = nsw_search(
        g, e, q, dim=64, beam_width=p["beam_width"], n_hops=4, k_top=5,
        n_entry=p["n_entry"], entry_sample_mod=p["entry_sample_mod"],
    ).localCheckpoint(eager=False)
    approx.count()
    t_search = round(time.perf_counter() - t0, 1)

    hits = (
        approx.select("query_id", "corpus_id")
        .join(truth.select("query_id", "corpus_id"), ["query_id", "corpus_id"])
        .count()
    )
    out = {
        "n_corpus": n, "n_queries": n_q, "params": p, "edges": n_edges,
        "recall_at_5": round(hits / n_truth, 4),
        "exact_s": t_exact, "build_s": t_build, "search_s": t_search,
    }
    line = json.dumps(out)
    print(line)
    record_run("nsw_sf3_validate", line[:400])
    spark.stop()


if __name__ == "__main__":
    main()
