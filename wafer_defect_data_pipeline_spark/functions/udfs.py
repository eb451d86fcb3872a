"""Arrow-vectorized Python UDF/UDTF surface (SURVEY.md §2.8).

The engine's rule is JVM expressions first (everything in functions/text.py
and functions/arrays.py is pure Column algebra); these exist to cover the
escape-hatch API families with the right shapes when Python is genuinely
needed — scalar ``pandas_udf`` (Arrow batches, numpy math, ~10-100× faster
than row-at-a-time UDFs) and Python UDTF (one row in, many rows out,
lateral-join composable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf("double")
def l2_norm_arrow(v: pd.Series) -> pd.Series:
    """Vectorized L2 norm of an array column — numpy per Arrow batch."""
    return v.map(lambda a: float(np.linalg.norm(np.asarray(a, dtype=np.float64))))


@udtf(returnType="sent_idx int, sentence string")
class SplitSentences:
    """UDTF: explode text into trimmed sentences (split on . ! ?).

    Emits nothing for empty/blank input — the UDTF contract's zero-row
    case, which a scalar UDF cannot express.
    """

    def eval(self, text: str):  # noqa: D102
        if not text:
            return
        import re

        parts = [p.strip() for p in re.split(r"[.!?]+", text)]
        for i, p in enumerate(p for p in parts if p):
            yield (i, p)


@pandas_udf("double")
def geo_mean_arrow(x: pd.Series) -> float:
    """Grouped-aggregate pandas UDF (Arrow UDAF): geometric mean.

    The third escape-hatch shape alongside scalar pandas_udf and UDTF: the
    whole group's column arrives as one Arrow batch, one float returns.
    Spark runs it as a full aggregate (no partial/combine step — unlike JVM
    aggregates it ships every group value to one task), which is exactly why
    the engine keeps UDAFs for statistics JVM expressions can't compose, and
    never in the wide-shuffle hot path.
    """
    return float(np.exp(np.log(x.to_numpy(dtype=np.float64)).mean()))
