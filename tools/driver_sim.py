"""Full driver-contract simulation: the round's verification sweep.

Replays exactly what the grading driver does — ``entry(spark)`` smoke,
then EVERY ``queries()`` entry at sf0.01 compared to its ``oracle_sql()``
twin in DuckDB (row count + column-name set + order-insensitive exact
value hash); oracle-less queries must still execute. One line per failure,
a final ``FAILED: ...`` summary line, and an UNCONDITIONAL append to
TESTRUNS.jsonl (the ledger lives in the tool, not a wrapper — r8 #3).

Usage: python tools/driver_sim.py [sf_dir] [--conf k=v ...]
(default sf0.01; --conf pins Spark confs for invariance sweeps, e.g.
``--conf spark.sql.shuffle.partitions=200`` or
``--conf spark.sql.adaptive.enabled=false``)
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
sys.path.insert(0, str(Path(_REPO) / "tests"))


def main() -> None:
    args = sys.argv[1:]
    conf: dict[str, str] = {}
    pos: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--conf":
            k, _, v = args[i + 1].partition("=")
            conf[k] = v
            i += 2
        else:
            pos.append(args[i])
            i += 1
    sf = pos[0] if pos else "/root/testdata/sf0.01"

    import __spark_entry__ as e  # noqa: E402
    from oracle import run_pair  # noqa: E402

    from wafer_defect_data_pipeline_spark.ledger import record_run
    from wafer_defect_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="driver-sim", extra_conf=conf or None)
    # entry smoke: runs, >0 rows, stable schema across invocations. Guarded
    # so a broken entry (testdata drift, regression) still produces the
    # FAILED summary and the ledger record — the whole point of the tool is
    # that no sweep can run without leaving evidence.
    try:
        df = e.entry(spark)
        entry_ok = len(df.collect()) > 0 and df.schema == e.entry(spark).schema
    except Exception as exc:  # noqa: BLE001
        entry_ok = False
        print(f"ERROR entry: {type(exc).__name__}: {exc}"[:300], flush=True)

    qs, os_ = e.queries(), e.oracle_sql()
    fails: list[str] = []
    rows_only = 0
    for name, fn in qs.items():
        try:
            if name in os_:
                errs = run_pair(spark, sf, fn, os_[name])
                if errs:
                    fails.append(name)
                    print(f"FAIL {name}: {'; '.join(errs)}", flush=True)
            else:
                fn(spark, sf).count()
                rows_only += 1
        except Exception as exc:  # noqa: BLE001 — isolate, record, continue
            fails.append(name)
            print(f"ERROR {name}: {type(exc).__name__}: {exc}"[:300], flush=True)

    n_oracle = len([n for n in qs if n in os_])
    tail = (
        f"{n_oracle - len([f for f in fails if f in os_])} oracle queries "
        f"hash-green, {rows_only} rows-only execute, entry smoke "
        f"{'ok' if entry_ok else 'FAILED'} ({Path(sf).name})"
    )
    if conf:
        tail += "; conf " + ", ".join(f"{k}={v}" for k, v in sorted(conf.items()))
    if fails:
        tail += f"; FAILED: {', '.join(fails)}"
    record_run("driver-sim-sweep", tail)
    print("FAILED:", fails or "none")
    spark.stop()
    sys.exit(1 if (fails or not entry_ok) else 0)


if __name__ == "__main__":
    main()
