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


def bpe_learn_merges(df, text_col: str, n_merges: int = 8):
    """Learn a BPE merge table from the corpus (Sennrich et al., ACL'16):
    repeatedly merge the globally most frequent adjacent symbol pair.

    Distributed-iterative shape, same driver-loop pattern as connected
    components / PageRank: state is the (word, count, symbols) table —
    one row per DISTINCT word (BPE trains on word frequencies, so the
    corpus collapses to its vocabulary first; the explode+groupBy combines
    map-side). Each round costs

    - one adjacent-bigram expansion (``arrays_zip`` of two slices — pure
      projection),
    - one map-side-combinable weighted count + a 1-row TakeOrdered readout
      (the argmax pair; ties broken lexicographically for determinism),
    - one Arrow-batched merge application over the vocabulary table
      (data-dependent list rewrite — inherently imperative, so it runs in
      mapInPandas, amortized per batch),

    with a ``localCheckpoint`` per round so the plan stays flat. Returns
    the merge list ``[(left, right, pair_count), ...]`` in learned order.
    """
    import pandas as pd

    from pyspark.sql import functions as F

    from ..functions.text import tokens

    spark = df.sparkSession
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.col("c"), F.expr("transform(split(w, ''), x -> x)").alias("syms"))
        .localCheckpoint(eager=False)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        n = F.size("syms")
        pairs = (
            words.filter(n >= 2)
            .select(
                "c",
                F.explode(
                    F.arrays_zip(
                        F.slice("syms", 1, n - 1).alias("l"),
                        F.slice("syms", 2, n - 1).alias("r"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("c").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), "l", "r").limit(1).collect()
        if not top:
            break
        l, r, cnt = top[0].l, top[0].r, top[0].cnt
        merges.append((l, r, cnt))

        def apply_merge(batches, _l=l, _r=r):
            for pdf in batches:
                if not len(pdf):
                    continue
                out = []
                for syms in pdf["syms"]:
                    s = list(syms)
                    i, res = 0, []
                    while i < len(s):
                        if i + 1 < len(s) and s[i] == _l and s[i + 1] == _r:
                            res.append(_l + _r)
                            i += 2
                        else:
                            res.append(s[i])
                            i += 1
                    out.append(res)
                yield pd.DataFrame({"c": pdf["c"], "syms": out})

        words = words.mapInPandas(
            apply_merge, schema="c long, syms array<string>"
        ).localCheckpoint(eager=False)
    return merges
