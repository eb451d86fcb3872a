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


def pack_greedy_nosplit(
    df: DataFrame,
    part_col: str,
    order_col: str,
    size_col: str,
    seq_len: int,
    pack_col: str = "pack_id",
) -> DataFrame:
    """Greedy first-fit-in-order packing WITHOUT splitting documents — the
    stateful variant the module docstring defers to ``applyInPandas``.

    Scanning each shard in ``order_col`` order: a document joins the
    current pack if it fits (``fill + size <= seq_len``), else it opens a
    new pack. Documents larger than ``seq_len`` occupy a pack alone (they
    can never fit with a neighbor). Unlike :func:`pack_concat_chunks`, no
    document straddles a pack boundary — the layout sacrifices perfect
    fill for sample integrity, the trade instruction-tuning pipelines
    usually make.

    Scale shape: the per-shard scan is inherently sequential — that is
    the honest cost of the no-split guarantee — but shards pack
    independently, so ``applyInPandas`` over ``part_col`` runs one
    Arrow-batched linear pass per shard in parallel across executors.
    The scan carries two integers of state and is deterministic given the
    (total) ``order_col`` order within each shard, so the result is
    partition-invariant and the DuckDB oracle replays it with a
    per-shard recursive CTE. A shard must fit in one task's Arrow frame
    (same contract as every grouped-pandas op here); shard by source /
    date so it does.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(list(df.schema.fields) + [StructField(pack_col, LongType())])
    seq = int(seq_len)

    def _pack(pdf):
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        ids = []
        fill, pid = None, 0
        for n in pdf[size_col]:
            n = int(n)
            if fill is None:
                fill = n
            elif fill + n <= seq:
                fill += n
            else:
                pid += 1
                fill = n
            ids.append(pid)
        pdf[pack_col] = ids
        return pdf

    return df.groupBy(part_col).applyInPandas(_pack, schema=out_schema)
