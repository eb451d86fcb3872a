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


# --- transformWithStateInPandas (Spark 4 stateful API) ----------------------
# The successor to applyInPandasWithState: typed named state slots
# (Value/List/Map) with per-slot TTL, event-time timers, and RocksDB-backed
# changelog checkpointing. ENVIRONMENT GATE: the Python side of
# transformWithState speaks protobuf to the JVM state server, and this
# sandbox has no google.protobuf — so the operator is implemented and
# unit-importable but cannot EXECUTE here (pytest skips it; it is not
# registered as a driver query). The exact-cents accumulation design runs
# under applyInPandasWithState instead (below), which needs no protobuf:
# accumulating value as integer CENTS (events.value is 2-decimal) makes
# cross-batch totals exact integer arithmetic, hash-identical to the
# batch/DuckDB decimal aggregate — upgrading the stateful streaming family
# from rows-only to a full oracle check.

HAS_PROTOBUF = True
try:  # pragma: no cover - environment probe
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401
except ImportError:
    HAS_PROTOBUF = False

TWS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_type", T.StringType()),
    ]
)

_TWS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("last_event_id", T.LongType()),
        T.StructField("last_type", T.StringType()),
    ]
)


from pyspark.sql.streaming.stateful_processor import StatefulProcessor  # noqa: E402


def _fold_profile(acc: tuple, pdf: pd.DataFrame) -> tuple:
    """Fold one pandas batch into the (n, cents, last_us, last_id, last_type)
    profile tuple — shared by both stateful APIs so their semantics cannot
    drift apart."""
    n, cents, last_us, last_id, last_type = acc
    if not len(pdf):
        return acc
    n += len(pdf)
    # exact: 2-decimal doubles -> integer cents, no float drift. Cents are
    # computed per row THEN summed (rounding a float batch-sum could tip on
    # a half-cent boundary; per-row 2-decimal doubles cannot).
    cents += int(pdf["value"].fillna(0.0).map(lambda v: int(round(v * 100))).sum())
    last = pdf.sort_values(["ts", "event_id"]).iloc[-1]
    us = int(pd.Timestamp(last["ts"]).value // 1000)
    if (us, int(last["event_id"])) > (last_us, last_id):
        last_us, last_id, last_type = us, int(last["event_id"]), str(last["event_type"])
    return (n, cents, last_us, last_id, last_type)


def _profile_row(key: tuple, acc: tuple) -> pd.DataFrame:
    n, cents, _us, _id, last_type = acc
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [cents / 100.0],
            "last_type": [last_type],
        }
    )


class UserProfileProcessor(StatefulProcessor):
    """StatefulProcessor: running per-user (count, exact value total, last
    event type). Executable only where protobuf exists (see module gate)."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("profile", _TWS_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        acc = tuple(self._state.get()) if self._state.exists() else (0, 0, -1, -1, None)
        for pdf in rows:
            acc = _fold_profile(acc, pdf)
        self._state.update(acc)
        yield _profile_row(key, acc)

    def close(self) -> None:
        pass


def user_running_profile_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of :func:`user_running_profile_exact`.

    Raises at execution (not import) when protobuf is unavailable.
    """
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def _update_user_exact(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    acc = tuple(state.get) if state.exists else (0, 0, -1, -1, None)
    for pdf in pdfs:
        acc = _fold_profile(acc, pdf)
    state.update(acc)
    yield _profile_row(key, acc)


def user_running_profile_exact(events: DataFrame) -> DataFrame:
    """applyInPandasWithState profile with exact integer-cents accumulation."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_exact,
        outputStructType=TWS_OUTPUT_SCHEMA,
        stateStructType=_TWS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _run_profile_to_final(profile: DataFrame, name: str) -> DataFrame:
    """Drive an update-mode profile stream to completion and keep each
    user's final state row (max n_events — monotone across batches)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    spark = profile.sparkSession
    q = profile.writeStream.outputMode("update").format("memory").queryName(name).start()
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
        .select("user_id", "n_events", F.round("total_value", 2).alias("total_value"), "last_type")
        .orderBy("user_id")
    )


def run_exact_profile_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-shot: exact-cents stateful profile over the events parquet —
    carries a full value-hash oracle (plans/queries_events.py)."""
    events = read_events_stream(spark, sf_dir)
    return _run_profile_to_final(user_running_profile_exact(events), f"exact_{uuid.uuid4().hex[:12]}")


def run_tws_profile_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-shot twin via transformWithStateInPandas (needs protobuf)."""
    events = read_events_stream(spark, sf_dir)
    return _run_profile_to_final(user_running_profile_tws(events), f"tws_{uuid.uuid4().hex[:12]}")
