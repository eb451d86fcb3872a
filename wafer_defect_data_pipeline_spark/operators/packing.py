"""Sequence packing — concat-and-chunk token budgeting (extension surface).

LLM pretraining consumes fixed-length sequences; the standard high-throughput
layout is *concat-and-chunk*: concatenate documents in a deterministic order
and cut every ``seq_len`` tokens. :func:`pack_concat_chunks` assigns each
document the chunk index its first token lands in — a pure window expression
(prefix-sum), no stateful scan — so the assignment is exact, reproducible,
and DuckDB-oracle-expressible.

Scale shape: one shuffle on ``part_col`` plus a per-partition sort on
``order_col``. Partitions (e.g. source shards) pack independently, so a
1000-executor run packs all shards in parallel and no global order is
needed. All arithmetic is integer (bigint prefix sums, integer division) —
no double rounding even when a shard's cumulative token count passes 2^53.

The alternative "greedy reset" packing (start a new pack when a doc would
overflow, never splitting docs) needs a sequential scan with carried state —
that variant belongs in ``applyInPandasWithState``/``mapInPandas`` and trades
determinism of the chunk boundary for no-doc-splitting; concat-and-chunk is
what large pretraining pipelines actually run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_concat_chunks(
    df: DataFrame,
    part_col: str,
    order_col: str,
    size_col: str,
    seq_len: int,
    pack_col: str = "pack_id",
) -> DataFrame:
    """Attach the chunk index of each document's first token.

    ``pack_id = (tokens before this doc, in part/order) div seq_len`` —
    integer division on bigint prefix sums.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0)).cast("bigint")
    return (
        df.withColumn("__cum_before", cum_before)
        # SQL `div` = exact bigint division; a double `/`+floor would round
        # once a shard's cumulative token count passes 2^53
        .withColumn(pack_col, F.expr(f"__cum_before div {int(seq_len)}"))
        .drop("__cum_before")
    )
