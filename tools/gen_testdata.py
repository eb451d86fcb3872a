"""Deterministic scale-factor test-data generator (sf1+, bench-only).

The driver ships read-only parquet at sf0.001/0.01/0.1 (TESTDATA.md); the
round-5 verdict's top item is scale-grade bench evidence past sf0.1. This
generator reproduces the SAME star schema, column types, and value
distributions (measured from the driver's sf0.1 tables — see docstrings per
table) at arbitrary sf, so `bench.py` can run unmodified against e.g.
``localdata/sf1`` via ``SPARK_GRAFT_SF_DIR``.

Bench-only by design: correctness gates (driver t2, pytest parity) always
run on the driver's own parquet. Nothing here is used for oracle checks.

Usage:  python tools/gen_testdata.py --sf 1 [--out localdata] [--seed 42]

Deterministic for a given (sf, seed): every column is drawn from a
numpy PCG64 stream seeded per-table, so reruns are byte-stable.
"""

from __future__ import annotations

import argparse
import os
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

US = 1_000_000

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
PART_ADJ = ["large", "small", "hot", "cold", "dim", "bright", "plain", "fancy"]
PART_NOUN = ["ring", "bolt", "gear", "cog", "pin", "rod", "cap", "nut"]
PART_TYPES = ["LARGE", "ECONOMY", "STANDARD", "SMALL", "PROMO", "MEDIUM"]
LANGS = (["en"] * 8 + ["de"] * 3 + ["es"] * 3 + ["fr"] * 3 + ["zh"] * 3)
VOCAB = (
    "spark batch part line column order small sort value scan hash slow fast "
    "group query table stream filter big merge agg join window key customer "
    "the a vector row shuffle stage plan broadcast skew cache disk memory"
).split()


def _rng(seed: int, table: str) -> np.random.Generator:
    # zlib.crc32, NOT hash(): str hash is salted per process (PYTHONHASHSEED)
    # so hash(table) would make "byte-stable reruns" silently false across
    # runs/machines — every cross-run bench comparison depends on this.
    return np.random.default_rng([seed, zlib.crc32(table.encode()) & 0x7FFFFFFF])


def _dates_us(rng, n, start_days, span_days):
    base = np.datetime64("1970-01-01", "us").astype("int64")
    day = 86_400 * US
    return base + (start_days + rng.integers(0, span_days, n)) * day


def gen(sf: float, out_dir: str, seed: int = 42) -> None:
    os.makedirs(out_dir, exist_ok=True)
    n_cust = max(150, int(150_000 * sf))
    n_supp = max(10, int(10_000 * sf))
    n_part = max(200, int(200_000 * sf))
    n_ord = max(1500, int(1_500_000 * sf))
    n_li = max(6000, int(6_000_000 * sf))
    n_ev = max(1000, int(1_000_000 * sf))
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    def write(name: str, table: pa.Table) -> None:
        pq.write_table(table, f"{out_dir}/{name}.parquet")
        print(f"  {name}: {table.num_rows} rows")

    write("region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS),
    }))

    write("nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    r = _rng(seed, "customer")
    write("customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(r.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array(np.round(r.uniform(-999, 9999, n_cust), 2)),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[r.integers(0, 5, n_cust)]),
    }))

    r = _rng(seed, "supplier")
    write("supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(r.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array(np.round(r.uniform(-999, 9999, n_supp), 2)),
    }))

    r = _rng(seed, "part")
    write("part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": pa.array([
            f"{PART_ADJ[i % 8]} {PART_NOUN[(i // 8) % 8]}" for i in range(n_part)
        ]),
        "p_brand": pa.array([f"Brand#{int(b)}" for b in r.integers(1, 26, n_part)]),
        "p_type": pa.array(np.array(PART_TYPES)[r.integers(0, len(PART_TYPES), n_part)]),
        "p_size": pa.array(r.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(np.round(900 + 0.1 * np.arange(n_part) % 1200, 2)),
    }))

    r = _rng(seed, "orders")
    o_dates = _dates_us(r, n_ord, 9131, 2405)  # 1995-01-01 .. ~2001-08
    write("orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(r.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(STATUSES)[r.integers(0, 3, n_ord)]),
        "o_totalprice": pa.array(np.round(r.uniform(1000, 500000, n_ord), 2)),
        "o_orderdate": pa.array(o_dates, pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[r.integers(0, 5, n_ord)]),
    }))

    r = _rng(seed, "lineitem")
    lk = np.sort(r.integers(0, n_ord, n_li))  # ~4 lines/order, clustered
    # per-order line numbers 1..k (max observed 7): rank within equal keys
    ln = np.ones(n_li, np.int64)
    same = np.flatnonzero(lk[1:] == lk[:-1]) + 1
    for idx in same:  # runs are short (avg 4), this stays O(n)
        ln[idx] = ln[idx - 1] + 1
    qty = r.integers(1, 51, n_li).astype(np.float64)
    price = np.round(r.uniform(900, 105000, n_li), 2)
    ship = _dates_us(r, n_li, 9132, 2405) + r.integers(0, 90, n_li) * 86_400 * US
    write("lineitem", pa.table({
        "l_orderkey": pa.array(lk, pa.int64()),
        "l_partkey": pa.array(r.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(r.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(np.minimum(ln, 7), pa.int32()),
        "l_quantity": pa.array(qty),
        "l_extendedprice": pa.array(price),
        "l_discount": pa.array(np.round(r.integers(0, 11, n_li) / 100.0, 2)),
        "l_tax": pa.array(np.round(r.integers(0, 9, n_li) / 100.0, 2)),
        "l_returnflag": pa.array(np.array(RETURNFLAGS)[r.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(LINESTATUSES)[r.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    }))

    r = _rng(seed, "events")
    n_users = max(150, int(1500 * (n_ev / 100_000)))
    base = np.datetime64("2024-01-01", "us").astype("int64")
    ts = base + np.sort(r.integers(0, 30 * 86_400 * US, n_ev))
    et = np.array(EVENT_TYPES)[r.integers(0, 5, n_ev)]
    val = np.round(np.where(et == "purchase", r.exponential(80, n_ev), r.exponential(20, n_ev)), 2)
    write("events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(r.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(et),
        "value": pa.array(np.minimum(val, 600.0)),
        "props": pa.array([f'{{"k": {int(k)}}}' for k in r.integers(0, 100, n_ev)]),
    }))

    r = _rng(seed, "documents")
    vocab = np.array(VOCAB)
    lens = r.integers(8, 90, n_doc)
    texts = [" ".join(vocab[r.integers(0, len(vocab), L)]) for L in lens]
    # dup structure like the driver's corpus: ~0.2% exact dups + some
    # near-dups (suffix-perturbed copies) so dedup queries have signal
    for i in range(0, n_doc, 500):
        if i + 1 < n_doc:
            texts[i + 1] = texts[i]
        if i + 2 < n_doc:
            texts[i + 2] = texts[i] + " tail"
    srcs = [f"src{int(s)}" for s in r.integers(0, 20, n_doc)]
    write("documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(np.array(LANGS)[r.integers(0, len(LANGS), n_doc)]),
        "source": pa.array(srcs),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    r = _rng(seed, "embeddings")
    labels = r.integers(0, 10, n_emb)
    centers = r.normal(0, 1, (10, 64))
    vecs = centers[labels] + r.normal(0, 0.6, (n_emb, 64))
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    write("embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array([v for v in vecs.astype(np.float32)],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", default="localdata")
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    sf_name = f"sf{a.sf:g}"
    out = os.path.join(a.out, sf_name)
    print(f"generating {sf_name} -> {out} (seed={a.seed})")
    gen(a.sf, out, a.seed)
