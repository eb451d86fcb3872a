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


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy byte-pair encoding of one word against a fixed merge table.

    Standard BPE inference (Sennrich et al., ACL'16 — public literature):
    start from characters, repeatedly merge the adjacent pair with the
    LOWEST merge rank until no listed pair remains. Pure-Python by nature
    (data-dependent iteration), so it runs only inside Arrow-batched
    ``mapInPandas`` — never as a per-row JVM-crossing UDF.
    """
    toks = list(word)
    while len(toks) > 1:
        best_i, best_rank = -1, None
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_i, best_rank = i, r
        if best_rank is None:
            break
        toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return toks


def bpe_token_stats(df, id_col: str, text_col: str, merges: list[tuple[str, str]]):
    """Per-document BPE token count + mean token length for a fixed merge
    list. The merge table (a pretrained tokenizer's artifact in production)
    is tiny and closure-captured into the Arrow workers; each batch
    tokenizes locally, so the corpus never shuffles and the Python cost is
    amortized per Arrow batch, not per row.
    """
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode(batches):
        # the word encoder is INLINED (not a call to the module-level
        # bpe_encode_word): a closure referencing this module would make
        # the Arrow worker import it, and the module-import-time
        # @pandas_udf decorators need a live session the worker lacks.
        # The pytest fixture asserts this copy agrees with bpe_encode_word.
        def enc(word):
            toks = list(word)
            while len(toks) > 1:
                best_i, best_rank = -1, None
                for i in range(len(toks) - 1):
                    r = ranks.get((toks[i], toks[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_i, best_rank = i, r
                if best_rank is None:
                    break
                toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]
            return toks

        for pdf in batches:
            if not len(pdf):
                continue
            counts, lens = [], []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in (text or "").lower().split():
                    toks.extend(enc(w))
                counts.append(len(toks))
                lens.append(
                    round(sum(len(t) for t in toks) / len(toks), 6) if toks else 0.0
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "n_bpe_tokens": counts, "mean_token_len": lens}
            )

    from ..functions.partitioning import fan_out

    src = fan_out(df.select(id_col, text_col))
    return src.mapInPandas(
        encode, schema=f"{id_col} long, n_bpe_tokens long, mean_token_len double"
    )
