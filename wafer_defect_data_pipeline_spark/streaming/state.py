"""Shared state manifest for the streaming admit loops.

Five admit loops (span grams, minhash signatures, entity records, ANN
vectors, search postings/stats) carry the same delta-append state machine:
a base snapshot plus per-batch delta parts, a probe view, a cadence
compaction, and post-termination vacuum. The retry-correctness invariants
live HERE, once, instead of five hand-copied blocks that can drift:

- **Own-delta exclusion, probe side**: a Structured-Streaming retry runs
  after the first attempt may already have written ``delta/batch=N`` and
  appended it to the manifest; a pre-admit probe must read base ∪ deltas
  EXCLUDING the batch's own delta or every key self-matches.
- **Own-delta exclusion, compaction side**: compaction runs inside the
  batch body, so folding the CURRENT batch's delta into the new base
  would reintroduce the self-match on retry through the base — the
  current delta is therefore left OUT of every fold and kept as the sole
  surviving delta. Compaction lags the newest batch by design; it is an
  operational amortization, never a semantic step (cadence-invariance
  tests pin this).
- **Guarded append**: the manifest append is membership-checked so a
  retry never double-counts a delta (and never double-records its bytes).
- **Deterministic paths + overwrite**: delta and compacted-base paths are
  pure functions of ``batch_id``, written in overwrite mode, so a retry
  replaces its own previous attempt byte-for-byte.
- **Vacuum after termination only**: superseded parts are deleted once
  the query has drained — a retried batch must still find the parts it
  first read.

The REWRITE twins get the same treatment through :func:`version_path`:
the probe snapshot is derived from ``batch_id`` (``v{batch_id}``), never
from driver state mutated mid-body, so a retry re-probes the exact
snapshot the first attempt did even though the admit already wrote
``v{batch_id + 1}``.

**Durability (round 11)**: with ``log_dir`` set, the manifest persists
itself as a versioned transaction log next to the index —
``{log_dir}/batch={id}.json``, one full-state snapshot per batch, written
atomically (tmp + ``os.replace``) at a deterministic batch-derived path so
a retry overwrites its own previous log entry. :meth:`DeltaManifest.
recover` rebuilds driver state from the highest-batch entry, so a loop
that dies between days restarts with the exact parts view it had — the
Delta-Lake-style log the module docstring in ``streaming/dedup.py``
promised. A crash BETWEEN the data write and the log write is safe by the
same invariants as a Structured-Streaming retry: the orphaned
``delta/batch=N`` is not in the recovered manifest, the retried batch
re-probes without it (own-delta exclusion would have excluded it anyway)
and overwrites it deterministically before re-admitting.

Two further log protocols (round 11): ``checkpoint`` carries the
single-writer half of optimistic concurrency — a stale/zombie driver
publishing BEHIND the log head raises :class:`ManifestConflictError`
instead of forking history — and ``recover(as_of_batch=N)`` is an exact
time-travel read (every entry is a full-state snapshot; ``vacuum()``
bounds the travel horizon exactly as Delta Lake retention does), with
``prune_log`` as the retention knob for the log itself (old entries
serve only time travel — the head alone carries recovery).
"""

from __future__ import annotations

import json
import os
import shutil


class ManifestConflictError(RuntimeError):
    """A stale writer tried to publish a log entry BEHIND the log's head.

    Single-writer loops never see this: a Structured-Streaming retry of
    batch N re-publishes ``batch=N`` while the head is still N (allowed —
    deterministic path, atomic replace, same-content discipline). A head
    PAST the batch being checkpointed means another driver (a zombie's
    replacement, or a misconfigured second writer) already admitted later
    batches — publishing would fork the manifest history, so the stale
    writer must die instead. This is the single-writer half of Delta
    Lake's optimistic log-conflict protocol; a true multi-writer
    deployment would add a lock service or CAS on the log entry itself.
    """


def tree_bytes(path: str, max_files: int = 100_000) -> int:
    """Total bytes under ``path`` — the per-batch state-write cost a
    BASELINE row compares across the rewrite vs delta disciplines.

    Stats are diagnostics, never semantics: above ``max_files`` files the
    walk stops and returns ``-1`` ("not measured") instead of letting a
    driver-side O(files) scan become a hidden per-admit cost on a large
    accumulated index tree."""
    total = 0
    seen = 0
    for root, _dirs, files in os.walk(path):
        seen += len(files)
        if seen > max_files:
            return -1
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def version_path(idx_dir: str, batch_id: int) -> str:
    """Deterministic snapshot path for the REWRITE loops: batch N probes
    ``v{N}`` and admits by writing ``v{N+1}`` (overwrite). Derived from
    ``batch_id`` alone so a retry probes the same snapshot its first
    attempt did, regardless of what the admit already wrote."""
    return f"{idx_dir}/v{batch_id}"


class DeltaManifest:
    """Base + deltas bookkeeping for one delta-append admit loop.

    The caller owns all relation I/O (what a "part" contains differs per
    loop); this class owns WHICH parts each step may read or fold.
    """

    def __init__(
        self, base: str, compact_every: int = 2, log_dir: str | None = None,
        log_checkpoint_every: int = 10,
    ) -> None:
        self.base = base
        self.deltas: list[str] = []
        self.superseded: list[str] = []
        self.compact_every = compact_every
        self.admit_bytes: list[int] = []
        self.compact_bytes: list[int] = []
        self.log_dir = log_dir
        # Delta-style log cadence: every Nth entry is a FULL-state snapshot
        # ("checkpoint"); the rest are field-level deltas. Recovery reads the
        # newest snapshot at-or-before the target plus the delta tail.
        self.log_checkpoint_every = log_checkpoint_every
        self._last_logged: dict | None = None  # state as of the head entry
        self._last_logged_batch: int | None = None
        self._prev_logged: dict | None = None  # state BEFORE the head entry
        self._since_full = 0  # delta entries written since the last snapshot

    # --- durable transaction log -------------------------------------------
    _LOG_FIELDS = (
        "base", "deltas", "superseded", "compact_every",
        "admit_bytes", "compact_bytes",
    )

    def _state(self) -> dict:
        return {
            f: (list(v) if isinstance(v := getattr(self, f), list) else v)
            for f in self._LOG_FIELDS
        }

    @classmethod
    def _entry_is_full(cls, entry: dict) -> bool:
        """A self-contained entry: new-format snapshot (``state``) or a
        legacy pre-r12 entry (full state at the top level)."""
        return "state" in entry or ("ops" not in entry and "base" in entry)

    @classmethod
    def _apply_entry(cls, state: dict | None, entry: dict) -> dict:
        """Fold one log entry into a reconstructed state dict."""
        if "state" in entry:  # snapshot entry
            return dict(entry["state"])
        if "ops" not in entry:  # legacy full-state entry (pre-r12 format)
            return {f: entry[f] for f in cls._LOG_FIELDS}
        if state is None:
            raise ValueError("delta log entry with no preceding snapshot")
        state = dict(state)
        for f, op in entry["ops"].items():
            if "append" in op:
                state[f] = list(state[f]) + list(op["append"])
            else:
                state[f] = op["set"]
        return state

    @staticmethod
    def _diff_ops(prev: dict, cur: dict) -> dict:
        """Field-level delta: append-suffix for grown lists, set otherwise,
        omit unchanged fields."""
        ops: dict = {}
        for f, v in cur.items():
            old = prev[f]
            if v == old:
                continue
            if (
                isinstance(v, list)
                and isinstance(old, list)
                and len(v) >= len(old)
                and v[: len(old)] == old
            ):
                ops[f] = {"append": v[len(old):]}
            else:
                ops[f] = {"set": v}
        return ops

    def checkpoint(self, batch_id: int) -> None:
        """Persist the manifest state as ``{log_dir}/batch={id}.json`` —
        a Delta-style log entry: every ``log_checkpoint_every``-th entry
        (and every genesis/first entry) is a FULL-state snapshot
        (``{"state": ...}``, Delta Lake's checkpoint parquet analogue);
        the entries between are field-level deltas (``{"ops": ...}``,
        the analogue of per-commit JSON actions), O(changes) bytes each.
        Recovery reads snapshot + tail, so the log can keep its FULL
        time-travel horizon at O(days) small records instead of O(days)
        full snapshots; ``prune_log`` stays available to bound it anyway.

        Called LAST in a batch body (after the data writes it describes —
        the log must never reference a part that does not exist yet).
        Atomic (tmp + ``os.replace``) and at a batch-derived deterministic
        path, so a Structured-Streaming retry overwrites its own previous
        entry instead of appending a duplicate (a head republish diffs
        against the state BEFORE the head, so the overwritten entry keeps
        the batch's real changes rather than degenerating to empty ops).
        No-op without ``log_dir``.

        Optimistic-concurrency guard: raises :class:`ManifestConflictError`
        when the log head is already PAST ``batch_id`` — a zombie driver
        whose replacement has admitted later batches must die rather than
        fork the manifest history (re-publishing the head itself is the
        legitimate retry case and stays allowed). The guard is
        check-publish-RECHECK, not CAS: a zombie that passes the head scan
        can still land its ``os.replace`` concurrently with the
        replacement's, so the head is re-read AFTER the publish and a
        conflict raised if another writer advanced past ``batch_id`` in
        the window. The zombie's entry for its own batch may have been
        durably (re-)published by then — harmless, it is byte-equal to
        what that batch legitimately checkpointed — but the zombie itself
        dies here instead of continuing to the next batch. True
        mutual-exclusion publishing needs a lock service or a
        rename-is-atomic-and-exclusive store, which the documented
        single-writer-per-log_dir scope deliberately avoids.
        """
        if self.log_dir is None:
            return
        head = self._head_entry()
        if head is not None and head > batch_id:
            raise ManifestConflictError(
                f"stale writer: log head is batch={head}, refusing to "
                f"publish batch={batch_id} behind it ({self.log_dir})"
            )
        os.makedirs(self.log_dir, exist_ok=True)
        state = self._state()
        if self._last_logged_batch == batch_id and self._prev_logged is not None:
            prev = self._prev_logged  # head republish: diff vs pre-head state
            republish = True
        else:
            prev = self._last_logged
            self._prev_logged = self._last_logged
            republish = False
        full = prev is None or (
            not republish and self._since_full + 1 >= self.log_checkpoint_every
        ) or (republish and self._since_full == 0)
        entry: dict = {"batch_id": batch_id}
        if full:
            entry["state"] = state
        else:
            entry["ops"] = self._diff_ops(prev, state)
        tmp = os.path.join(self.log_dir, f".batch={batch_id}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(entry, fh)
        os.replace(tmp, os.path.join(self.log_dir, f"batch={batch_id}.json"))
        if not republish:
            self._since_full = 0 if full else self._since_full + 1
        self._last_logged = state
        self._last_logged_batch = batch_id
        head = self._head_entry()
        if head is not None and head > batch_id:
            raise ManifestConflictError(
                f"concurrent writer advanced the log to batch={head} while "
                f"batch={batch_id} was publishing ({self.log_dir}); dying "
                "rather than forking the manifest history"
            )

    def _head_entry(self) -> int | None:
        """Highest batch_id in the log, or None when the log is empty /
        absent (genesis)."""
        if self.log_dir is None or not os.path.isdir(self.log_dir):
            return None
        ids = [
            int(f[len("batch="):-len(".json")])
            for f in os.listdir(self.log_dir)
            if f.startswith("batch=") and f.endswith(".json")
        ]
        return max(ids) if ids else None

    @classmethod
    def recover(
        cls, log_dir: str, as_of_batch: int | None = None
    ) -> "DeltaManifest":
        """Rebuild driver state from the highest-batch log entry — the
        restart path: a loop killed between days resumes with the exact
        base/deltas view its last completed batch checkpointed. Raises
        ``FileNotFoundError`` when no log entry exists (callers write a
        ``batch=-1`` genesis entry right after the initial base).

        ``as_of_batch`` is the TIME-TRAVEL read: recover the state the
        manifest checkpointed at the highest batch ``<= as_of_batch``.
        Reads the newest SNAPSHOT entry at-or-before the target, then
        folds the delta-entry tail up to the target — checkpoint + tail,
        never the whole history. Valid only while the parts the
        reconstructed state names still exist — ``vacuum()`` bounds the
        travel horizon exactly as Delta Lake's retention does; callers
        keeping history readable defer vacuum."""
        ids = sorted(
            int(f[len("batch="):-len(".json")])
            for f in os.listdir(log_dir)
            if f.startswith("batch=") and f.endswith(".json")
        )
        if as_of_batch is not None:
            ids = [i for i in ids if i <= as_of_batch]
        if not ids:
            raise FileNotFoundError(
                f"no manifest log entries under {log_dir}"
                + (f" at or before batch={as_of_batch}" if as_of_batch is not None else "")
            )

        def load(i: int) -> dict:
            with open(os.path.join(log_dir, f"batch={i}.json")) as fh:
                return json.load(fh)

        entries = {i: load(i) for i in ids}
        anchor = max(
            (i for i in ids if cls._entry_is_full(entries[i])), default=None
        )
        if anchor is None:
            raise ValueError(
                f"manifest log under {log_dir} has no snapshot entry at or "
                f"before batch={ids[-1]} — pruned past its replay anchor"
            )
        state: dict | None = None
        since_full = 0
        for i in ids:
            if i < anchor:
                continue
            state = cls._apply_entry(state, entries[i])
            since_full = 0 if cls._entry_is_full(entries[i]) else since_full + 1
        man = cls(state["base"], state["compact_every"], log_dir=log_dir)
        man.deltas = list(state["deltas"])
        man.superseded = list(state["superseded"])
        man.admit_bytes = list(state["admit_bytes"])
        man.compact_bytes = list(state["compact_bytes"])
        man._last_logged = dict(state)
        man._last_logged_batch = ids[-1]
        man._since_full = since_full
        return man

    def prune_log(self, keep_last: int = 30) -> int:
        """Retention for the log itself: entries older than the last
        ``keep_last`` serve time travel alone — delete them and the as-of
        horizon shrinks with them, exactly like vacuum bounds the data
        horizon. Delta entries are only replayable from a preceding
        snapshot, so the oldest RETAINED entry is first rewritten as a
        full-state snapshot (reconstructed by checkpoint + tail replay,
        byte-equal state) — then everything older can go, mirroring how
        Delta Lake writes a checkpoint before expiring the commits it
        subsumes. Returns the number of entries removed. Never removes
        the head."""
        if self.log_dir is None or not os.path.isdir(self.log_dir):
            return 0
        ids = sorted(
            int(f[len("batch="):-len(".json")])
            for f in os.listdir(self.log_dir)
            if f.startswith("batch=") and f.endswith(".json")
        )
        kept = ids[-keep_last:] if keep_last > 0 else ids[-1:]
        if not kept:
            return 0
        boundary = kept[0]
        with open(os.path.join(self.log_dir, f"batch={boundary}.json")) as fh:
            if not self._entry_is_full(json.load(fh)):
                # snapshot the boundary so the tail stays replayable
                at_boundary = type(self).recover(self.log_dir, as_of_batch=boundary)
                entry = {"batch_id": boundary, "state": at_boundary._state()}
                tmp = os.path.join(self.log_dir, f".batch={boundary}.json.tmp")
                with open(tmp, "w") as ofh:
                    json.dump(entry, ofh)
                os.replace(tmp, os.path.join(self.log_dir, f"batch={boundary}.json"))
        doomed = [i for i in ids if i < boundary]
        for i in doomed:
            try:
                os.remove(os.path.join(self.log_dir, f"batch={i}.json"))
            except OSError:
                pass
        return len(doomed)

    def probe_parts(self, own_delta: str, include_own: bool = False) -> list[str]:
        """Parts a probe may read: base + deltas, excluding ``own_delta``
        unless the loop's semantics INCLUDE the current batch (standing
        queries report the post-admit corpus; their self-inclusion is
        intentional and retry-safe because the delta write is overwrite)."""
        deltas = [
            p for p in self.deltas if include_own or p != own_delta
        ]
        if include_own and own_delta not in deltas:
            deltas.append(own_delta)
        return [self.base, *deltas]

    def admit(self, delta_path: str) -> bool:
        """Membership-guarded append. Returns True iff newly appended (a
        retry returns False and must not re-record bytes)."""
        if delta_path in self.deltas:
            return False
        self.deltas.append(delta_path)
        self.admit_bytes.append(tree_bytes(delta_path))
        return True

    def want_compact(self) -> bool:
        return len(self.deltas) >= self.compact_every

    def compact_parts(self, own_delta: str) -> list[str]:
        """Parts a compaction may fold: base + deltas EXCLUDING the current
        batch's delta — folding it into the base would reintroduce the
        self-match a retry's probe exclusion exists to prevent."""
        return [self.base, *[p for p in self.deltas if p != own_delta]]

    def finish_compact(self, new_base: str, own_delta: str) -> None:
        """Swap in the compacted base; the current batch's delta (if any)
        survives as the sole delta, everything folded is superseded."""
        folded = [p for p in self.deltas if p != own_delta]
        self.superseded.extend([self.base, *folded])
        self.compact_bytes.append(tree_bytes(new_base))
        self.base = new_base
        self.deltas = [p for p in self.deltas if p == own_delta]

    def vacuum(self) -> None:
        """Delete superseded parts — call ONLY after the query terminates
        (a retried batch must still find the parts it first read)."""
        for p in self.superseded:
            shutil.rmtree(p, ignore_errors=True)
        self.superseded = []

    def fill_stats(self, stats: dict | None) -> None:
        if stats is not None:
            stats["admit_bytes_per_batch"] = self.admit_bytes
            stats["compact_bytes"] = self.compact_bytes
            stats["base_bytes"] = tree_bytes(self.base)
