"""Skew-join stress bench: salted_join vs naive shuffle join on Zipf keys.

The salted join and two-phase agg are oracle-green on uniform TPC-H-ish
keys (they produce identical results to the plain forms — that's their
contract), but their *reason to exist* is a skewed key distribution. This
bench manufactures one — a deterministic hot-key fact table (seed 7,
documented below) — and times:

- ``naive``      : sort-merge join, AQE skew handling OFF (the failure mode)
- ``aqe_skew``   : same join, AQE skew split ON with thresholds scaled to
                   this dataset (defaults target 256 MB partitions; local
                   data is ~100 MB total, so the skewed-partition threshold
                   is lowered to let the optimizer actually fire — the
                   same knob a real cluster tunes per workload)
- ``salted``     : operators/skew.salted_join (explicit n_salts=16 scatter)

Broadcast is disabled in every variant: the scenario is the broadcast-gap
one (dim too big to broadcast, fact too skewed to shuffle plainly).
Each variant runs twice (cold/warm) in an isolated cloned session so confs
never leak. Prints one JSON line; run with an idle machine for stable
numbers (host variance is 10-30%).

Data (seed 7, regenerated if absent): fact 24M rows — 30% key 0, 10% key 1,
60% uniform over 50k keys; dim = all 50k keys with a 10-way category.
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

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from wafer_defect_data_pipeline_spark.session import get_spark

DATA_DIR = os.path.join(_REPO_ROOT, "localdata", "skew")
N_FACT = 24_000_000
N_KEYS = 50_000


def ensure_data() -> None:
    if os.path.exists(f"{DATA_DIR}/fact.parquet"):
        return
    os.makedirs(DATA_DIR, exist_ok=True)
    r = np.random.default_rng(7)
    hot0 = np.zeros(int(N_FACT * 0.30), np.int64)
    hot1 = np.ones(int(N_FACT * 0.10), np.int64)
    rest = r.integers(0, N_KEYS, N_FACT - len(hot0) - len(hot1))
    keys = np.concatenate([hot0, hot1, rest])
    r.shuffle(keys)
    pq.write_table(
        pa.table({"key": pa.array(keys, pa.int64()),
                  "v": pa.array(np.round(r.uniform(0, 100, N_FACT), 2))}),
        f"{DATA_DIR}/fact.parquet",
    )
    pq.write_table(
        pa.table({"key": pa.array(range(N_KEYS), pa.int64()),
                  "cat": pa.array([f"c{k % 10}" for k in range(N_KEYS)])}),
        f"{DATA_DIR}/dim.parquet",
    )


def run_variant(spark, name: str) -> dict[str, float]:
    """Join fact->dim on key and aggregate per category in a cloned session."""
    from wafer_defect_data_pipeline_spark.operators.skew import salted_join

    clone = spark.newSession()
    clone.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    clone.conf.set(
        "spark.sql.adaptive.skewJoin.enabled", "true" if name == "aqe_skew" else "false"
    )
    if name == "aqe_skew":
        # scale the skew detector to this dataset (defaults assume 256MB+)
        clone.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
        clone.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    fact = clone.read.parquet(f"{DATA_DIR}/fact.parquet")
    dim = clone.read.parquet(f"{DATA_DIR}/dim.parquet")
    times = {}
    for run in ("cold", "warm"):
        t0 = time.perf_counter()
        if name == "salted":
            joined = salted_join(fact, dim, on=["key"], n_salts=16)
        else:
            joined = fact.join(dim, "key")
        (
            joined.groupBy("cat")
            .sum("v")
            .write.format("noop").mode("overwrite").save()
        )
        times[run] = round(time.perf_counter() - t0, 3)
    return times


def main() -> None:
    ensure_data()
    spark = get_spark(app_name="skew-stress-bench")
    out = {"bench": "skew_join_stress", "n_fact": N_FACT, "n_keys": N_KEYS,
           "hot_share": 0.4, "variants": {}}
    for name in ("naive", "aqe_skew", "salted"):
        out["variants"][name] = run_variant(spark, name)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
