"""Append-only run ledger (TESTRUNS.jsonl).

Every sweep/bench/pytest run appends one JSON line HERE, from the tool
itself — not from a Makefile wrapper someone can bypass (r8 advice item 3,
demonstrated to matter in r9: a 243-line refactor of a driver-checked file
shipped with no recorded run). The ledger is evidence, not control flow:
appends must never fail the run they record.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

_REPO_ROOT = Path(__file__).resolve().parent.parent


def record_run(kind: str, tail: str, **extra: object) -> None:
    """Append one ``{ts, kind, tail, ...}`` line to TESTRUNS.jsonl.

    Swallows every error — a read-only checkout or full disk must not turn
    a green run red just because the ledger could not be written.
    """
    try:
        rec = {"ts": time.time(), "kind": kind, "tail": tail}
        rec.update(extra)
        line = json.dumps(rec, default=str)  # non-serializable extras stringify
        with open(_REPO_ROOT / "TESTRUNS.jsonl", "a") as f:
            f.write(line + "\n")
    except Exception:  # noqa: BLE001 — the ledger must never fail the run
        pass
