"""Driver-environment mirror: every registered query must run under a BARE
SparkSession (no engine_conf).

The round-1 events failure was exactly this class of bug — a conf that only
existed in the repo's own session factory, so queries worked in pytest but
died under the driver's vanilla session. This test runs the whole registry
in a subprocess (so the in-process pytest session can't leak its conf) with
``SparkSession.builder.getOrCreate()`` and nothing else.
"""

from __future__ import annotations

import subprocess
import sys

import pytest

from .conftest import REPO_ROOT, SF_SMALL

_SCRIPT = f"""
import sys
sys.path.insert(0, {str(REPO_ROOT)!r})
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[8]").getOrCreate()
from wafer_defect_data_pipeline_spark.plans.registry import all_queries
errs = []
for name, fn in all_queries().items():
    try:
        fn(spark, {SF_SMALL!r}).count()
    except Exception as ex:
        errs.append((name, type(ex).__name__, str(ex)[:200]))
for e in errs:
    print("ERR", *e, sep="|")
sys.exit(1 if errs else 0)
"""


@pytest.mark.medium
def test_every_query_runs_under_vanilla_session():
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT], capture_output=True, text=True, timeout=1200
    )
    errs = [ln for ln in res.stdout.splitlines() if ln.startswith("ERR|")]
    assert res.returncode == 0, "queries failed under vanilla session:\n" + "\n".join(
        errs or [res.stdout[-2000:], res.stderr[-2000:]]
    )
