"""Process-private /tmp scratch paths for the build-once serving queries.

The prebuilt/export queries persist an artifact (index, decision manifest,
shard set) and answer from the LOADED copy. Their scratch paths went
through two failure modes already: uuid-fresh dirs leaked one artifact copy
per invocation until /tmp filled (fixed r13), and the fixed sf-keyed
replacement races across concurrent runs on the same sf — one process can
read a parquet dir mid-overwrite by another and serve a mixed
decision/index/manifest (r13 ADVICE). :func:`scratch_dir` closes both:

- the path is suffixed with the OWNING PID, so two live processes never
  share a dir (same-process re-runs still overwrite in place, keeping the
  r13 no-accumulation property within a sweep);
- stale siblings left by DEAD processes are swept on entry — cleanup can't
  run at query exit because the returned DataFrame reads the artifact
  lazily, at the caller's collect time.
"""

from __future__ import annotations

import os
import re
import shutil


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:  # pragma: no cover — exists, owned by another user
        return True
    return True


def scratch_dir(tag: str, base: str = "/tmp") -> str:
    """Return ``{base}/wdps_{tag}_pid{os.getpid()}`` after sweeping dead
    siblings (``wdps_{tag}_pid<N>`` where process N no longer exists).
    ``tag`` should carry the sf key so distinct datasets never collide
    within one process either."""
    pat = re.compile(re.escape(f"wdps_{tag}_pid") + r"(\d+)$")
    try:
        for name in os.listdir(base):
            m = pat.match(name)
            if m and int(m.group(1)) != os.getpid() and not _pid_alive(int(m.group(1))):
                shutil.rmtree(os.path.join(base, name), ignore_errors=True)
    except OSError:  # pragma: no cover — unreadable base dir; path still valid
        pass
    return os.path.join(base, f"wdps_{tag}_pid{os.getpid()}")
