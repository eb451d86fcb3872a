"""Ad-hoc oracle-parity runner for a named subset of registered queries.

Usage: python tools/check_new.py [--sf-dir=PATH ...] <query-name> [...]
Runs each at sf0.001 and sf0.01 (or at each --sf-dir, when given) through
the same compare the driver uses. --sf-dir exists for branches that only
activate at scale — e.g. the staged-spine m=3 subsample past 10k
embeddings rows, which no driver sf reaches (r15 self-review: that branch
had never been cross-engine-verified)."""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
sys.path.insert(0, str(Path(_REPO) / "tests"))

from oracle import run_pair  # noqa: E402

from wafer_defect_data_pipeline_spark.plans.registry import (  # noqa: E402
    all_oracles,
    all_queries,
)
from wafer_defect_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dirs = [
        a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--sf-dir=")
    ] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    names = [a for a in sys.argv[1:] if not a.startswith("--sf-dir=")]
    queries, oracles = all_queries(), all_oracles()
    spark = get_spark(app_name="check-new")
    rc = 0
    failed: list[str] = []
    for name in names:
        for sf in sf_dirs:
            if name not in oracles:
                print(f"{name}: NO ORACLE")
                rc = 1
                failed.append(name)
                break
            # guarded like driver_sim: a raising query must report FAIL,
            # keep checking the remaining names, and still reach the ledger
            try:
                errs = run_pair(spark, sf, queries[name], oracles[name])
            except Exception as exc:  # noqa: BLE001
                errs = [f"{type(exc).__name__}: {exc}"[:300]]
            tag = "OK" if not errs else "FAIL " + "; ".join(errs)
            print(f"{name} @ {sf.rsplit('/',1)[-1]}: {tag}")
            if errs:
                rc = 1
                failed.append(name)
    # unconditional ledger append — in the tool, not a wrapper (r8 #3)
    from wafer_defect_data_pipeline_spark.ledger import record_run

    sftag = "+".join(d.rstrip("/").rsplit("/", 1)[-1] for d in sf_dirs)
    record_run(
        "check-new",
        f"{len(names) - len(set(failed))}/{len(names)} oracle-green at "
        f"{sftag}: {', '.join(names)[:160]}"
        + (f"; FAILED: {', '.join(sorted(set(failed)))}" if failed else ""),
    )
    spark.stop()
    sys.exit(rc)


if __name__ == "__main__":
    main()
