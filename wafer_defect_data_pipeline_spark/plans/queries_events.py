"""Event-time analytics over ``events`` (extension surface §2.9).

Batch window aggregations (tumbling/sliding), lag/lead deltas, and
gap-based sessionization — the batch twins of the Structured Streaming
operators in streaming/events.py. Time arithmetic is done in integer
microseconds (``unix_micros`` / ``epoch_us``) on both engines so no
sub-second truncation can diverge.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources import read_table
from .registry import register


def _epoch_us(col):
    """Whole-microseconds-since-epoch for a timestamp column, NTZ-safe.

    Since the testdata regeneration, ``events.ts`` is parquet timestamp[us],
    which Spark reads as TIMESTAMP_NTZ — and ``unix_micros`` only accepts
    TIMESTAMP. Cast inside the expression only: the session tz is pinned UTC
    (session.engine_conf), so the instant equals the wall-clock value, and the
    ``ts`` column itself (what the oracle hashes) stays NTZ. A no-op when the
    column is already TIMESTAMP.
    """
    return F.unix_micros(col.cast("timestamp"))


# --- tumbling window -------------------------------------------------------
def _tumbling(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
        .orderBy("window_start", "event_type")
    )


register(
    "events_tumbling_window",
    _tumbling,
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           count(*) AS n, round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
)


# --- sliding window (1h size, 30min slide) ---------------------------------
def _sliding(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        # sum, not avg: an avg can land exactly on a round-half boundary,
        # where a last-ulp summation-order difference flips the hash
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
        .orderBy("window_start")
    )


register(
    "events_sliding_window",
    _sliding,
    """
    WITH grid AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '1 hour', ts, INTERVAL '30 minutes') AS window_start, value
      FROM events
    )
    SELECT window_start, count(*) AS n, round(sum(value), 4) AS total_value
    FROM grid GROUP BY 1 ORDER BY window_start
    """,
)


# --- lag/lead deltas -------------------------------------------------------
def _lag_lead(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            "event_id",
            # whole microseconds (bigint): exact in every engine, unlike a
            # rounded double of seconds which can land on a half boundary
            (_epoch_us(F.col("ts")) - _epoch_us(F.lag("ts").over(w))).alias("gap_us"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .orderBy("user_id", "event_id")
    )


register(
    "events_lag_lead",
    _lag_lead,
    """
    SELECT user_id, event_id,
           epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us,
           lead(event_type) OVER w AS next_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, event_id
    """,
)


# --- gap sessionization (30 min) -------------------------------------------
def _sessionize(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = _epoch_us(F.col("ts")) - _epoch_us(F.lag("ts").over(w))
    new_sess = F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0)
    with_sess = (
        e.withColumn("is_new", new_sess)
        .withColumn("session_id", F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0)))
    )
    return (
        with_sess.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .orderBy("user_id", "session_id")
    )


register(
    "events_sessionization",
    _sessionize,
    """
    WITH o AS (
      SELECT user_id, event_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    ), m AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 30 * 60 * 1000000
                     THEN 1 ELSE 0 END AS is_new
      FROM o
    ), s AS (
      SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM m
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           round(sum(value), 4) AS total_value
    FROM s GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)


# --- per-user event-type share (conditional agg over groups) ---------------
def _user_profile(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event_type") == "purchase").cast("long")).alias("n_purchases"),
            F.sum((F.col("event_type") == "error").cast("long")).alias("n_errors"),
            F.round(F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)), 4).alias("purchase_value"),
        )
        .orderBy("user_id")
    )


register(
    "events_user_profile",
    _user_profile,
    """
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
           round(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 4) AS purchase_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)


# --- Structured Streaming tumbling agg (EXACT oracle: complete mode drains
# all window state, so the memory sink equals the batch aggregate) -----------
def _streaming_tumbling(spark, sf_dir):
    from ..streaming.events import run_tumbling_stream_batch

    return run_tumbling_stream_batch(spark, sf_dir)


register(
    "events_streaming_tumbling",
    _streaming_tumbling,
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           count(*) AS n, round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
)


# --- Structured Streaming session windows (EXACT oracle: complete mode; same
# gap-merge SQL replay as events_session_window_native) ----------------------
def _streaming_sessions(spark, sf_dir):
    from ..streaming.events import run_session_stream_batch

    return run_session_stream_batch(spark, sf_dir)


register(
    "events_streaming_sessions",
    _streaming_sessions,
    """
    WITH o AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM o
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM s GROUP BY user_id, session_id ORDER BY user_id, session_start
    """,
)


# --- as-of join: each click matched to the user's latest prior purchase ----
def _asof_click_purchase(spark, sf_dir):
    from ..operators.asof import asof_join

    e = read_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    # dedupe purchases per (user, ts) so as-of tie-break is deterministic
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    out = asof_join(clicks, purchases, on=["user_id"], left_ts="ts", right_ts="ts")
    return out.select(
        "user_id",
        "event_id",
        "ts",
        F.col("asof_ts").alias("purchase_ts"),
        F.round("asof_purchase_value", 4).alias("purchase_value"),
    ).orderBy("user_id", "event_id")


register(
    "events_asof_join",
    _asof_click_purchase,
    """
    WITH clicks AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id, ts, max(value) AS purchase_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.user_id, c.event_id, c.ts,
           p.ts AS purchase_ts, round(p.purchase_value, 4) AS purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    ORDER BY c.user_id, c.event_id
    """,
)


# --- range join: errors within 5 minutes after each click ------------------
def _range_join(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("error_ts")
    )
    # equi-join on user_id with a range predicate: Catalyst plans the equi
    # part as the shuffle key, the range as a post-join filter — no cross join
    joined = clicks.join(
        errors,
        (clicks.user_id == errors.user_id)
        & (F.col("error_ts") > F.col("click_ts"))
        & (F.col("error_ts") <= F.col("click_ts") + F.expr("INTERVAL 5 MINUTES")),
        "left",
    )
    return (
        joined.groupBy(clicks.user_id.alias("user_id"), "click_id", "click_ts")
        .agg(F.count("error_ts").alias("n_errors_5m"))
        .orderBy("user_id", "click_id")
    )


register(
    "events_range_join",
    _range_join,
    """
    WITH clicks AS (
      SELECT user_id, event_id AS click_id, ts AS click_ts FROM events WHERE event_type = 'click'
    ), errors AS (
      SELECT user_id, ts AS error_ts FROM events WHERE event_type = 'error'
    )
    SELECT c.user_id, c.click_id, c.click_ts, count(e.error_ts) AS n_errors_5m
    FROM clicks c LEFT JOIN errors e
      ON c.user_id = e.user_id
     AND e.error_ts > c.click_ts
     AND e.error_ts <= c.click_ts + INTERVAL 5 MINUTE
    GROUP BY c.user_id, c.click_id, c.click_ts
    ORDER BY c.user_id, c.click_id
    """,
)


# --- custom stateful streaming operator (applyInPandasWithState; rows-only) -
def _stateful_profile(spark, sf_dir):
    from ..streaming.stateful import run_stateful_profile_batch

    return run_stateful_profile_batch(spark, sf_dir)


register("events_stateful_profile", _stateful_profile, None, exact_twin="events_stateful_profile_exact")


# --- exact-cents stateful profile (full oracle) -----------------------------
def _stateful_profile_exact(spark, sf_dir):
    """Running per-user profile with integer-cents value accumulation: the
    cross-batch total is exact integer arithmetic, so — unlike the float
    twin above (rows-only) — this streaming operator carries a full
    value-hash oracle. A transformWithStateInPandas twin exists
    (streaming/stateful.py) but can't execute in this sandbox (no
    protobuf); both APIs share the same fold so semantics are identical."""
    from ..streaming.stateful import run_exact_profile_batch

    return run_exact_profile_batch(spark, sf_dir)


register(
    "events_stateful_profile_exact",
    _stateful_profile_exact,
    """
    WITH agg AS (
      SELECT user_id,
             count(*) AS n_events,
             round(CAST(sum(CAST(coalesce(value, 0.0) AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_value
      FROM events GROUP BY user_id
    ), last AS (
      SELECT user_id, event_type AS last_type
      FROM (SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1
    )
    SELECT user_id, n_events, total_value, last_type
    FROM agg JOIN last USING (user_id) ORDER BY user_id
    """,
)


# --- streaming exact dedup (dropDuplicatesWithinWatermark; EXACT oracle:
# both duplicate copies carry the same event time, so dedup-within-watermark
# is guaranteed and the kept set equals the batch distinct) ------------------
def _streaming_dedup(spark, sf_dir):
    from ..streaming.events import run_dedup_stream_batch

    return run_dedup_stream_batch(spark, sf_dir)


register(
    "events_streaming_dedup",
    _streaming_dedup,
    """
    SELECT event_type, count(DISTINCT event_id) AS n
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)


# --- funnel: view -> click -> purchase conversion ---------------------------
def _funnel(spark, sf_dir):
    """Ordered-funnel conversion: first view, first click after that view,
    first purchase after that click, per user; then stage counts. Three
    conditional-min passes over one shuffled-by-user frame — no self-join
    explosion, the idiomatic funnel shape at scale."""
    e = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = e.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("view_ts"))
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n")).withColumn("stage", F.lit("1_view"))
        .unionByName(c.agg(F.count(F.lit(1)).alias("n")).withColumn("stage", F.lit("2_click")))
        .unionByName(p.agg(F.count(F.lit(1)).alias("n")).withColumn("stage", F.lit("3_purchase")))
        .select("stage", "n")
        .orderBy("stage")
    )


register(
    "events_funnel",
    _funnel,
    """
    WITH v AS (
      SELECT user_id, min(ts) AS view_ts FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS click_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts >= v.view_ts GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS purchase_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts GROUP BY e.user_id
    )
    SELECT stage, n FROM (
      SELECT '1_view' AS stage, count(*) AS n FROM v
      UNION ALL SELECT '2_click', count(*) FROM c
      UNION ALL SELECT '3_purchase', count(*) FROM p
    ) t ORDER BY stage
    """,
)


# --- Structured Streaming stream-stream interval join (EXACT oracle: inner
# joins emit matched rows eagerly — nothing is watermark-withheld — and both
# single-file sides land in the first micro-batch, before any watermark) -----
def _streaming_interval_join(spark, sf_dir):
    from ..streaming.events import run_interval_join_stream_batch

    return run_interval_join_stream_batch(spark, sf_dir)


register(
    "events_streaming_join",
    _streaming_interval_join,
    """
    WITH v AS (
      SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'
    ), c AS (
      SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
    )
    SELECT c.user_id, count(*) AS n_pairs
    FROM c JOIN v
      ON c.user_id = v.user_id
     AND v.view_ts <= c.click_ts
     AND c.click_ts <= v.view_ts + INTERVAL 10 MINUTE
    GROUP BY c.user_id ORDER BY c.user_id
    """,
)


# --- cohort retention (first-seen week x week offset, distinct users) -------
def _cohort_retention(spark, sf_dir):
    ev = read_table(spark, sf_dir, "events")
    # (user, week) distinct first: the count-distinct downstream then shuffles
    # one short row per user-week, not one per event
    act = ev.select(
        "user_id", F.date_trunc("WEEK", F.col("ts")).alias("week")
    ).distinct()
    first = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        act.join(first, on="user_id")
        .groupBy(
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


register(
    "events_cohort_retention",
    _cohort_retention,
    """
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
    ), first AS (
      SELECT user_id, min(week) AS cohort_week FROM act GROUP BY user_id
    )
    SELECT cohort_week,
           CAST(date_diff('day', cohort_week, week) / 7 AS INT) AS week_offset,
           count(DISTINCT act.user_id) AS n_users
    FROM act JOIN first ON act.user_id = first.user_id
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
)


# --- streaming foreachBatch keyed upsert (oracle-checked: the merged state
# must equal the batch aggregate exactly) ------------------------------------
def _streaming_foreachbatch(spark, sf_dir):
    from ..streaming.events import run_foreachbatch_upsert_batch

    return run_foreachbatch_upsert_batch(spark, sf_dir)


register(
    "events_streaming_foreachbatch_upsert",
    _streaming_foreachbatch,
    """
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)


# --- native batch session_window (gap-merge built-in) -----------------------
def _session_window_native(spark, sf_dir):
    """The built-in ``session_window`` in BATCH mode — the declarative twin
    of the lag+cumsum sessionization above. Catalyst plans the gap-merge as
    a single aggregate over dynamic windows (no self-window pass), and the
    same expression is what the streaming session query uses, so batch and
    stream share semantics by construction. Boundary note: session_window
    starts a new session when the gap is >= the timeout (window intervals
    are half-open), while the lag formulation above breaks on strictly
    greater — the oracle mirrors the >= rule. session_end is
    last_event + gap (the window's close), not the last event time.
    """
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window(F.col("ts").cast("timestamp"), "30 minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


register(
    "events_session_window_native",
    _session_window_native,
    """
    WITH o AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, value,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM o
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM s GROUP BY user_id, session_id ORDER BY user_id, session_start
    """,
)


# --- incremental materialized-view maintenance (full oracle) ----------------
def _streaming_mv_q1(spark, sf_dir):
    """Pricing-summary MV maintained incrementally by a foreachBatch MERGE
    over a multi-file lineitem stream (streaming/mv.py). Algebraic
    aggregates merged as exact decimals are batch-count-invariant, so the
    maintained view hash-equals the from-scratch SQL aggregate."""
    from ..streaming.mv import maintain_q1_mv

    return maintain_q1_mv(spark, sf_dir)


register(
    "events_streaming_mv_q1",
    _streaming_mv_q1,
    """
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE), 2) AS sum_disc_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)


# --- Arrow-native grouped map (applyInArrow) --------------------------------
def _user_topk_arrow(spark, sf_dir):
    """Per-user top-3 events by value via ``applyInArrow`` — the grouped-map
    path with ZERO pandas materialization: batches stay pyarrow end to end
    (sort+slice on Arrow tables), which skips the Arrow→pandas→Arrow copy
    ``applyInPandas`` pays. Right for per-group kernels that pyarrow.compute
    expresses directly. Deterministic tie-break (value desc, event_id asc);
    oracle is the equivalent row_number window SQL."""
    import pyarrow as pa
    import pyarrow.compute as pc

    e = read_table(spark, sf_dir, "events").select("user_id", "event_id", "value")

    def topk(key, tbl):
        # non-generator form: Spark hands the whole group as one pa.Table
        # and expects a pa.Table back
        idx = pc.sort_indices(
            tbl, sort_keys=[("value", "descending"), ("event_id", "ascending")]
        )[:3]
        return tbl.take(idx)

    return (
        e.groupBy("user_id")
        .applyInArrow(topk, "user_id long, event_id long, value double")
        .orderBy("user_id", F.desc("value"), "event_id")
    )


register(
    "events_user_topk_arrow",
    _user_topk_arrow,
    """
    SELECT user_id, event_id, value
    FROM (
      SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rn
      FROM events
    )
    WHERE rn <= 3
    ORDER BY user_id, value DESC, event_id
    """,
)


# --- streaming LEFT OUTER interval join (EXACT oracle via sentinel flush) ----
def _streaming_left_join(spark, sf_dir):
    """Stream-stream left-outer interval join, drained to batch equality.

    A plain bounded replay withholds unmatched clicks younger than the final
    watermark (the prefix-of-batch contract still demonstrated by
    run_interval_left_join_stream_batch + its pytest); this registered
    variant appends far-future sentinel punctuation files so the watermark
    passes every real click's horizon before stop — all null-padded rows
    emit and the result hash-equals the batch LEFT JOIN."""
    from ..streaming.events import run_interval_left_join_flushed_batch

    return run_interval_left_join_flushed_batch(spark, sf_dir)


register(
    "events_streaming_left_join",
    _streaming_left_join,
    """
    WITH v AS (
      SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'
    ), c AS (
      SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
    )
    SELECT c.user_id, count(*) AS n_rows,
           CAST(sum(CASE WHEN v.view_ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
    FROM c LEFT JOIN v
      ON c.user_id = v.user_id
     AND v.view_ts <= c.click_ts
     AND c.click_ts <= v.view_ts + INTERVAL 10 MINUTE
    GROUP BY c.user_id ORDER BY c.user_id
    """,
)


# --- stream-static broadcast enrichment (EXACT oracle) ----------------------
def _streaming_static_enrich(spark, sf_dir):
    from ..streaming.events import run_stream_static_enrich_batch

    return run_stream_static_enrich_batch(spark, sf_dir)


register(
    "events_streaming_static_enrich",
    _streaming_static_enrich,
    """
    SELECT CASE WHEN user_id % 3 = 0 THEN 'free'
                WHEN user_id % 3 = 1 THEN 'pro'
                ELSE 'enterprise' END AS tier,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2 ORDER BY tier, event_type
    """,
)


# --- Trigger.AvailableNow incremental run (EXACT oracle) --------------------
def _streaming_available_now(spark, sf_dir):
    from ..streaming.events import run_available_now_batch

    return run_available_now_batch(spark, sf_dir)


register(
    "events_streaming_available_now",
    _streaming_available_now,
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
           count(*) AS n, round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
)


# --- stream-static LEFT OUTER enrichment (EXACT oracle) ---------------------
def _streaming_static_left_enrich(spark, sf_dir):
    from ..streaming.events import run_stream_static_left_enrich_batch

    return run_stream_static_left_enrich_batch(spark, sf_dir)


register(
    "events_streaming_static_left_enrich",
    _streaming_static_left_enrich,
    """
    SELECT CASE WHEN user_id % 2 <> 0 THEN 'unknown'
                WHEN user_id % 4 = 0 THEN 'gold'
                ELSE 'silver' END AS tier,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1 ORDER BY tier
    """,
)
