"""Custom stateful streaming operator via ``applyInPandasWithState``.

The escape hatch for streaming semantics the built-in windowed aggregations
can't express (SURVEY.md §2.9): user-defined per-key state updated per
micro-batch with Arrow-batched pandas, with GroupState handling
checkpointable persistence and timeouts. Here: a running per-user profile
(event count, value total, last event type) maintained across batches —
the minimal shape of fraud scoring / session enrichment operators.

State size is bounded by |keys|, not |events|; at 100 TB of stream history
the state store holds one small row per user, and RocksDB-backed state
(``spark.sql.streaming.stateStore.providerClass``) keeps it off-heap.
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .events import read_events_stream

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_type", T.StringType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("last_type", T.StringType()),
    ]
)


def _update_user(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, last_type = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
        if len(pdf):
            last = pdf.sort_values(["ts", "event_id"]).iloc[-1]
            last_type = str(last["event_type"])
    state.update((n, total, last_type))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)], "last_type": [last_type]}
    )


def user_running_profile(events: DataFrame) -> DataFrame:
    """Per-user running (count, value total, last event type) across batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_profile_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the stateful operator over the events parquet to completion.

    With update-mode output the memory sink accumulates one row per user per
    batch; the final state per user is the max-n_events row, selected here so
    the result is batch-count-invariant (equal to the batch groupBy profile).
    """
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    events = read_events_stream(spark, sf_dir)
    name = f"stateful_{uuid.uuid4().hex[:12]}"
    q = (
        user_running_profile(events)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        spark.table(name)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .orderBy("user_id")
    )
