"""Dump normalized .explain("formatted") plans for NAMED queries into a
directory — the per-round before/after plan-evidence helper (optimization
guide §1: capture the plan for every query you touch).

    python tools/dump_plan_subset.py OUTDIR SUFFIX name [name ...]

Writes OUTDIR/<name>_<SUFFIX>.txt using the same volatile-token
normalization as tools/dump_explains.py, so a before/after pair diffs
cleanly. Run once from the pre-change tree (SUFFIX=before) and once from
the post-change tree (SUFFIX=after).
"""

from __future__ import annotations

import io
import sys
import warnings
from contextlib import redirect_stdout
from pathlib import Path

warnings.filterwarnings("ignore")
_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

from tools.dump_explains import normalize_plan  # noqa: E402

from wafer_defect_data_pipeline_spark.plans.registry import all_queries  # noqa: E402
from wafer_defect_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix = Path(sys.argv[1]), sys.argv[2]
    names = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.01"
    outdir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="dump-plan-subset")
    registry = all_queries()
    for name in names:
        try:
            df = registry[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = normalize_plan(buf.getvalue())
        except Exception as exc:  # noqa: BLE001
            plan = f"<failed to plan: {type(exc).__name__}: {exc}>\n"
        (outdir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
