"""As-of (nearest-prior) join — an operator Spark's API lacks natively.

Composed from existing DataFrame ops per the engine's custom-operator policy
(SURVEY.md §2.9): tag both sides, union, and carry the most recent right-side
row forward with ``last(ignorenulls)`` over a single key-partitioned,
time-ordered window. One shuffle on the join key, no per-row range scan, no
candidate-pair explosion — at 100 TB this is a plain sort shape, unlike the
naive ``left.join(right, ts_r <= ts_l)`` + row_number formulation whose range
join fans out |left| × |matching right| intermediates.

The whole right row travels as ONE struct, so a null inside a payload column
can never splice values from different right rows.

Semantics match DuckDB's ``ASOF LEFT JOIN`` (``l.ts >= r.ts``, backward): each
left row picks the right row with the greatest ``right_ts <= left_ts`` for its
key; unmatched left rows keep nulls. Right-side ties on (key, ts) are broken
by union order (nondeterministic) — pre-deduplicate the right side per
(key, ts) if ties are possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_SIDE = "__asof_side"  # 0 = right (sorts first at equal ts → inclusive <=), 1 = left
_TS = "__asof_ts"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_prefix: str = "asof_",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """pandas ``merge_asof``-style join, one shuffle, no range fan-out.

    ``direction="backward"`` (default): latest right row with
    right_ts <= left_ts. ``direction="forward"``: earliest right row with
    right_ts >= left_ts. ``tolerance``: maximum |right_ts - left_ts| for a
    match, measured after casting the ts columns to double (seconds for
    timestamps, raw units for numerics) — matches outside it become null.

    Right payload columns (everything except ``on`` + ``right_ts``) come back
    as ``{payload_prefix}{col}``, plus ``{payload_prefix}ts`` for the matched
    right timestamp; all null when no matching right row exists.
    """
    payload = [c for c in right.columns if c not in set(on) | {right_ts}]

    payload_struct = F.struct(F.col(right_ts).alias("ts"), *[F.col(c) for c in payload])
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        payload_struct.alias(_PAYLOAD),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in set(on)],
    )
    l_tagged = left.select(
        *left.columns,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(r_tagged.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )

    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))
    if direction == "backward":
        # right (0) sorts before left (1) at equal ts -> inclusive <=
        w = (
            W.partitionBy(*on)
            .orderBy(F.col(_TS).asc(), F.col(_SIDE).asc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        matched = F.last(_PAYLOAD, ignorenulls=True).over(w)
    elif direction == "forward":
        # left sorts before right at equal ts -> inclusive >=
        w = (
            W.partitionBy(*on)
            .orderBy(F.col(_TS).asc(), F.col(_SIDE).desc())
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        matched = F.first(_PAYLOAD, ignorenulls=True).over(w)
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    out = unioned.withColumn(_PAYLOAD, matched).filter(F.col(_SIDE) == 1)
    if tolerance is not None:
        gap = F.abs(
            F.col(f"{_PAYLOAD}.ts").cast("double") - F.col(_TS).cast("double")
        )
        out = out.withColumn(
            _PAYLOAD, F.when(gap <= F.lit(float(tolerance)), F.col(_PAYLOAD))
        )

    return (
        out
        .select(
            *left.columns,
            F.col(f"{_PAYLOAD}.ts").alias(f"{payload_prefix}ts"),
            *[F.col(f"{_PAYLOAD}.{c}").alias(f"{payload_prefix}{c}") for c in payload],
        )
    )
