"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This is a local mirror of the driver's t2 gate (which runs at sf0.01 —
see test marked `medium` for that scale).
"""

from __future__ import annotations

import pytest

from wafer_defect_data_pipeline_spark.plans.registry import all_oracles, all_queries

from .oracle import run_pair

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity_small(spark, sf_small, name):
    errs = run_pair(spark, sf_small, QUERIES[name], ORACLES[name])
    assert not errs, f"{name}: " + "; ".join(errs)


@pytest.mark.medium
@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity_medium(spark, sf_medium, name):
    errs = run_pair(spark, sf_medium, QUERIES[name], ORACLES[name])
    assert not errs, f"{name}: " + "; ".join(errs)


def test_every_query_runs_small(spark, sf_small):
    for name, fn in QUERIES.items():
        df = fn(spark, sf_small)
        assert df.columns, name
        df.limit(5).collect()
