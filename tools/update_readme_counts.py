"""Regenerate the registry counts embedded in README.md from the live
registry (round-6 verdict item 2: assert-equals drifted twice; the counts
are now GENERATED, and tests/test_docs.py asserts the generator is a no-op).

Usage: python tools/update_readme_counts.py   (run after adding queries)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent


def render_readme(text: str) -> str:
    """Return README text with the two registry-count phrases rewritten
    from the live registry. Pure function so the docs test can diff."""
    sys.path.insert(0, str(REPO_ROOT))
    from wafer_defect_data_pipeline_spark.plans.registry import all_oracles, all_queries

    n_q, n_o = len(all_queries()), len(all_oracles())
    text, n1 = re.subn(
        r"query registry \(\d+ queries\)", f"query registry ({n_q} queries)", text
    )
    text, n2 = re.subn(
        r"\(\d+ of \d+ queries oracle-checked",
        f"({n_o} of {n_q} queries oracle-checked",
        text,
    )
    if n1 != 1 or n2 != 1:
        raise RuntimeError(
            f"README count anchors missing or duplicated (layout={n1}, verify={n2})"
        )
    return text


def main() -> int:
    readme = REPO_ROOT / "README.md"
    old = readme.read_text()
    new = render_readme(old)
    if new != old:
        readme.write_text(new)
        print("README.md counts updated")
    else:
        print("README.md counts already current")
    return 0


if __name__ == "__main__":
    sys.exit(main())
