"""Structural registry contracts (no Spark session needed).

Round-6 verdict item 5: the rows-only -> exact-twin mapping used to live
only in docstrings; here it is machine-checked in both directions so
"rows-only" can never silently mean "unverified".
"""

from __future__ import annotations

from wafer_defect_data_pipeline_spark.plans.registry import _ordered

from .conftest import REPO_ROOT


def test_every_rows_only_query_names_a_live_exact_twin():
    reg = _ordered()
    for name, rq in reg.items():
        if rq.oracle is not None:
            continue
        assert rq.exact_twin, f"{name} is rows-only but declares no exact_twin"
        if rq.exact_twin.startswith("pytest:"):
            path = REPO_ROOT / rq.exact_twin.removeprefix("pytest:")
            assert path.is_file(), f"{name}: twin test file {path} missing"
        else:
            twin = reg.get(rq.exact_twin)
            assert twin is not None, f"{name}: twin {rq.exact_twin} not registered"
            assert twin.oracle is not None, (
                f"{name}: twin {rq.exact_twin} is itself rows-only — a twin "
                "must carry a DuckDB oracle"
            )


def test_exact_twin_only_set_on_rows_only_queries():
    for name, rq in _ordered().items():
        if rq.oracle is not None:
            assert rq.exact_twin is None, (
                f"{name} has an oracle AND an exact_twin — twin is only the "
                "evidence channel for oracle-less queries"
            )
