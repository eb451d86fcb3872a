"""Docs must not drift from the registry (round-1 verdict: README said 66
queries while the registry had 90). The counts in README.md are asserted
against the live registry so a new query without a doc bump fails fast."""

from __future__ import annotations

import re

from wafer_defect_data_pipeline_spark.plans.registry import all_oracles, all_queries

from .conftest import REPO_ROOT


def test_readme_counts_match_registry():
    text = (REPO_ROOT / "README.md").read_text()
    n_q, n_o = len(all_queries()), len(all_oracles())
    m = re.search(r"query registry \((\d+) queries\)", text)
    assert m and int(m.group(1)) == n_q, f"README layout count != {n_q} queries"
    m = re.search(r"\((\d+) of (\d+) queries oracle-checked", text)
    assert m, "README verification count line missing"
    assert (int(m.group(1)), int(m.group(2))) == (n_o, n_q), (
        f"README says {m.group(1)}/{m.group(2)}, registry has {n_o}/{n_q}"
    )
