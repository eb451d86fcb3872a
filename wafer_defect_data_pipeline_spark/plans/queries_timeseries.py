r"""Time-series / temporal-table queries: calendar gap-fill with forward
fill, MAD-based robust anomaly detection, SCD2 history compaction.

Round-2 additions on the ``events`` / ``orders`` tables:

- **gap-fill + ffill**: telemetry rollups need a dense time axis — missing
  hours materialized from a per-key ``sequence`` explode (rows appear only
  for each key's own [min, max] span, not a global calendar), values carried
  forward with ``last(..., ignorenulls)``. The per-key calendar is generated
  FROM the tiny per-key span table, so the dense axis costs |keys|·|hours|
  narrow rows and the event table is aggregated exactly once.
- **MAD anomaly flags**: median / median-absolute-deviation per event type —
  the robust outlier rule (|x - med| > 3·1.4826·MAD ≈ 3σ for normal data)
  that survives the heavy tails that break z-scores. Two grouped exact
  percentiles with broadcast joins back; same shape as the flagship IQR
  cascade (`operators/outliers.py`), different statistic.
- **SCD2 compaction**: orders → per-customer priority history as
  [valid_from, valid_to) intervals, consecutive duplicate states collapsed
  via lag-compare — the standard warehouse temporal-table build, two window
  functions over one (custkey)-partitioned sort.

Float-parity conventions as repo-wide: per-bucket SUMs rounded to 4 (not
avg — a mean can land on a round-half boundary), medians rounded to 6
before they feed comparisons, identical expressions on both engines.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources import read_table
from .registry import register


# --- calendar gap-fill + forward fill ---------------------------------------
def _gapfill(spark, sf_dir):
    e = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    hourly = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.round(F.sum("value"), 4).alias("hour_value"))
    span = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    cal = span.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    w = W.partitionBy("user_id").orderBy("hour").rowsBetween(W.unboundedPreceding, 0)
    return (
        cal.join(hourly, on=["user_id", "hour"], how="left")
        .select(
            "user_id",
            "hour",
            "hour_value",
            F.last("hour_value", ignorenulls=True).over(w).alias("ffill_value"),
            F.col("hour_value").isNull().alias("was_gap"),
        )
        .orderBy("user_id", "hour")
    )


register(
    "events_gapfill_ffill",
    _gapfill,
    """
    WITH e AS (
      SELECT * FROM events WHERE user_id < 10
    ), hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour, round(sum(value), 4) AS hour_value
      FROM e GROUP BY 1, 2
    ), span AS (
      SELECT user_id, date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
      FROM e GROUP BY 1
    ), cal AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM span
    )
    SELECT cal.user_id, cal.hour, hourly.hour_value,
           last_value(hourly.hour_value IGNORE NULLS) OVER (
             PARTITION BY cal.user_id ORDER BY cal.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_value,
           hourly.hour_value IS NULL AS was_gap
    FROM cal LEFT JOIN hourly ON cal.user_id = hourly.user_id AND cal.hour = hourly.hour
    ORDER BY cal.user_id, cal.hour
    """,
)


# --- MAD-based robust anomaly counts ----------------------------------------
def _mad_anomalies(spark, sf_dir):
    """Per event type: median, MAD, and how many events are >3 robust σ out.

    Two grouped exact percentiles (map-side-combinable agg state), each
    broadcast back onto the events — the event table itself never shuffles,
    mirroring the IQR-cascade join shape. Medians are rounded to 6 decimals
    BEFORE deviations are computed so both engines threshold identical
    doubles. At 100 TB switch the exact percentile for the
    ``percentile_approx`` sketch exactly as ``operators/outliers.py`` does.
    """
    e = read_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = e.join(F.broadcast(med), on="event_type").withColumn(
        "absdev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(absdev, 0.5)"), 6).alias("mad"),
        F.count(F.lit(1)).alias("n_events"),
        F.min("med").alias("med"),  # constant per group; carried for the output
    )
    flagged = (
        dev.join(F.broadcast(mad.select("event_type", "mad")), on="event_type")
        .filter(F.col("absdev") > 3.0 * 1.4826 * F.col("mad"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_anomalies"))
    )
    return (
        mad.join(flagged, on="event_type", how="left")
        .select(
            "event_type",
            "n_events",
            "med",
            "mad",
            F.coalesce("n_anomalies", F.lit(0)).alias("n_anomalies"),
        )
        .orderBy("event_type")
    )


register(
    "events_anomaly_mad",
    _mad_anomalies,
    """
    WITH med AS (
      SELECT event_type, round(quantile_cont(value, 0.5), 6) AS med,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY event_type
    ), dev AS (
      SELECT e.event_type, abs(e.value - med.med) AS absdev
      FROM events e JOIN med ON e.event_type = med.event_type
    ), mad AS (
      SELECT event_type, round(quantile_cont(absdev, 0.5), 6) AS mad
      FROM dev GROUP BY event_type
    ), flagged AS (
      SELECT dev.event_type, CAST(count(*) AS BIGINT) AS n_anomalies
      FROM dev JOIN mad ON dev.event_type = mad.event_type
      WHERE dev.absdev > 3.0 * 1.4826 * mad.mad
      GROUP BY dev.event_type
    )
    SELECT med.event_type, med.n_events, med.med, mad.mad,
           CAST(coalesce(flagged.n_anomalies, 0) AS BIGINT) AS n_anomalies
    FROM med
    JOIN mad ON med.event_type = mad.event_type
    LEFT JOIN flagged ON med.event_type = flagged.event_type
    ORDER BY med.event_type
    """,
)


# --- SCD2 temporal-table compaction ------------------------------------------
def _scd2(spark, sf_dir):
    """Per-customer order-priority history as SCD2 validity intervals.

    Consecutive orders with the same priority collapse into one interval
    (lag-compare keeps only state changes); ``valid_to`` is the next change's
    start (null = current state). One shuffle on ``o_custkey``; both windows
    share the same partitioning so Catalyst plans a single sort+exchange.
    """
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 300)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        o.select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority")
        .withColumn("prev_prio", F.lag("o_orderpriority").over(w))
        .filter(F.col("prev_prio").isNull() | (F.col("prev_prio") != F.col("o_orderpriority")))
    )
    w2 = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return changes.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    ).orderBy("custkey", "version")


register(
    "scd2_priority_history",
    _scd2,
    """
    WITH o AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority
      FROM orders WHERE o_custkey <= 300
    ), changes AS (
      SELECT *
      FROM (
        SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
               lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey) AS prev_prio
        FROM o
      ) t
      WHERE prev_prio IS NULL OR prev_prio <> o_orderpriority
    )
    SELECT o_custkey AS custkey,
           o_orderpriority AS priority,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS valid_to,
           CAST(row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS version
    FROM changes
    ORDER BY custkey, version
    """,
)


# --- mergeable HLL distinct-user rollup (EXACT oracle on the error bound) ----
def _hll_rollup(spark, sf_dir):
    """Daily HLL user sketches unioned into weekly distinct estimates.

    THE scale pattern for distinct counting: exact distinct needs a shuffle
    of every key; Datasketches HLL state is a few KB per group and merges
    associatively, so daily sketches roll up to weekly (or monthly) without
    touching the events again. ``hll_sketch_agg`` / ``hll_union_agg`` are
    JVM-side; estimates are deterministic for fixed input (no RNG). The
    sketch estimate itself is engine-specific (DuckDB's HLL differs), so the
    hashed output carries the EXACT weekly distinct plus a Spark-computed
    ``within_tol`` asserting the rolled-up estimate lands within 5% of it —
    the error contract is what the driver verifies, row by row.
    """
    e = read_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.weekofyear("ts").alias("week"), F.dayofyear("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"), F.count(F.lit(1)).alias("n_events"))
    est = (
        daily.groupBy("week")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).cast("long").alias("__est"),
            F.sum("n_events").alias("n_events"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )
    exact = e.groupBy(F.weekofyear("ts").alias("week")).agg(
        F.count_distinct("user_id").alias("exact_users")
    )
    tol = F.greatest(F.lit(1.0), F.col("exact_users") * F.lit(0.05))
    return (
        est.join(exact, "week")
        .select(
            "week",
            "exact_users",
            "n_events",
            "n_days",
            (F.abs(F.col("__est") - F.col("exact_users")) <= tol).alias("within_tol"),
        )
        .orderBy("week")
    )


register(
    "events_hll_weekly_users",
    _hll_rollup,
    """
    SELECT weekofyear(ts) AS week,
           count(DISTINCT user_id) AS exact_users,
           count(*) AS n_events,
           count(DISTINCT dayofyear(ts)) AS n_days,
           TRUE AS within_tol
    FROM events GROUP BY 1 ORDER BY week
    """,
)


# --- moving median (windowed exact percentile) -------------------------------
def _moving_median(spark, sf_dir):
    """5-row moving median of each user's event values — robust smoothing.

    ``percentile`` as a *window* aggregate: one shuffle on user_id, one
    intra-partition sort shared by the window; the 5-row frame bounds the
    per-row buffer so cost is O(frame) per row regardless of history length
    (contrast a grouped percentile, which buffers the whole group).
    """
    e = read_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    return (
        e.select(
            "event_id",
            "user_id",
            F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias("mov_med"),
        )
        .orderBy("event_id")
    )


register(
    "events_moving_median",
    _moving_median,
    """
    SELECT event_id, user_id,
           round(median(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS mov_med
    FROM events WHERE user_id < 5
    ORDER BY event_id
    """,
)


# --- PageRank over the customer-supplier graph -------------------------------
def _pagerank_suppliers(spark, sf_dir):
    """Top-20 supplier nodes by PageRank in the bipartite trade graph.

    Iterative-algorithm family member #3 (alongside connected components and
    KMeans), and the only one with an exact oracle: fixed 8-iteration
    PageRank is reproducible by a recursive-CTE mirror. Edges are made
    bidirectional so no node is dangling (see ``operators/graph.pagerank``).
    Ordering uses the ROUNDED rank so an ulp-level summation-order
    difference between engines can never flip the top-20 cut between
    structurally-identical nodes.
    """
    from ..operators.graph import pagerank

    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    base = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = base.unionByName(base.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank(edges, damping=0.85, n_iter=8)
    return (
        ranks.filter(F.col("node").startswith("s"))
        .select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.desc("rank"), "node")
        .limit(20)
    )


register(
    "graph_pagerank_suppliers",
    _pagerank_suppliers,
    """
    WITH RECURSIVE base_edges AS (
      SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), edges AS (
      SELECT src, dst FROM base_edges
      UNION
      SELECT dst, src FROM base_edges
    ), deg AS (
      SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src
    ), nodes AS (
      SELECT DISTINCT src AS node FROM edges
    ), r(i, node, rank) AS (
      SELECT 0, node, 1.0 / (SELECT count(*) FROM nodes) FROM nodes
      UNION ALL
      SELECT i + 1, e.dst,
             (1.0 - 0.85) / (SELECT count(*) FROM nodes)
               + 0.85 * sum(r.rank / d.deg)
      FROM r
      JOIN edges e ON r.node = e.src
      JOIN deg d ON r.node = d.src
      WHERE i < 8
      GROUP BY i, e.dst
    )
    SELECT node, round(rank, 6) AS rank
    FROM r WHERE i = 8 AND node LIKE 's%'
    ORDER BY round(rank, 6) DESC, node
    LIMIT 20
    """,
)


# --- triangle count over the co-supply graph ---------------------------------
def _triangle_count(spark, sf_dir):
    """Exact triangles among suppliers co-supplying high-quantity lines of
    the same order (degree-oriented wedge counting — see
    operators/graph.triangle_count). The oracle is the naive 3-way
    self-join over the a<b edge list; equality IS the orientation
    theorem's test."""
    from ..operators.graph import triangle_count

    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sb"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("sa") < F.col("sb"))
        .select(F.col("sa").alias("id_a"), F.col("sb").alias("id_b"))
        .distinct()
    )
    return triangle_count(edges)


register(
    "graph_triangle_count",
    _triangle_count,
    """
    WITH hi AS (
      SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_quantity > 45
    ),
    e0 AS (
      SELECT DISTINCT a.l_suppkey AS a, b.l_suppkey AS b
      FROM hi a JOIN hi b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM e0 ab JOIN e0 bc ON ab.b = bc.a JOIN e0 ac ON ac.a = ab.a AND ac.b = bc.b
    """,
)


# --- per-window quantile monitoring ------------------------------------------
def _windowed_quantiles(spark, sf_dir):
    """Hourly p50/p95/p99 of the event value — the latency-dashboard /
    drift-monitor aggregate. Exact interpolated percentiles per tumbling
    window: one map-side-combinable agg keyed on the (coarse) hour bucket;
    at 100 TB swap mode to percentile_approx for mergeable bounded-memory
    sketches (same query shape, see operators/outliers mode='approx')."""
    e = read_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("window_start")
    pct = F.percentile("value", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)))
    return (
        e.groupBy(hour)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(pct.getItem(0), 6).alias("p50"),
            F.round(pct.getItem(1), 6).alias("p95"),
            F.round(pct.getItem(2), 6).alias("p99"),
        )
        .orderBy("window_start")
    )


register(
    "events_windowed_quantiles",
    _windowed_quantiles,
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           CAST(count(*) AS BIGINT) AS n,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY 1 ORDER BY window_start
    """,
)


# --- distribution drift: population stability index -------------------------
def _drift_psi(spark, sf_dir):
    """Week-over-period drift monitor: PSI of the event-value distribution
    per event type, first half of the month (baseline) vs second half
    (current). PSI = sum over bins of (q - p) * ln(q / p) with
    add-one smoothing over the fixed 10-bin grid (industry-standard
    credit-scoring drift metric — public literature; >0.2 conventionally
    flags a shift). One pass builds both histograms (conditional sums on
    the half-month flag); the 10-bin grid cross join is constant-size.
    Per-bin contributions are rounded to 6 decimals and summed as
    DECIMAL(18,6) — the same fold-order-proof determinism contract as
    text_bm25_topk — so the oracle hash-matches exactly."""
    e = read_table(spark, sf_dir, "events")
    half = F.col("ts").cast("timestamp") >= F.lit("2024-01-16").cast("timestamp")
    binned = e.select(
        "event_type",
        F.least(F.floor(F.col("value") / 50.0), F.lit(9)).cast("int").alias("bin"),
        half.cast("int").alias("cur"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum(1 - F.col("cur")).alias("base_n"),
        F.sum("cur").alias("cur_n"),
    )
    types = binned.select("event_type").distinct()
    grid = types.crossJoin(spark.range(10).select(F.col("id").cast("int").alias("bin")))
    filled = grid.join(counts, ["event_type", "bin"], "left").fillna(
        0, subset=["base_n", "cur_n"]
    )
    totals = filled.groupBy("event_type").agg(
        F.sum("base_n").alias("base_tot"), F.sum("cur_n").alias("cur_tot")
    )
    p = (F.col("base_n") + 1.0) / (F.col("base_tot") + 10.0)
    q = (F.col("cur_n") + 1.0) / (F.col("cur_tot") + 10.0)
    contrib = F.round((q - p) * F.log(q / p), 6).cast("decimal(18,6)")
    return (
        filled.join(F.broadcast(totals), "event_type")
        .select("event_type", contrib.alias("c"))
        .groupBy("event_type")
        .agg(F.round(F.sum("c").cast("double"), 6).alias("psi"))
        .orderBy("event_type")
    )


register(
    "events_drift_psi",
    _drift_psi,
    """
    WITH binned AS (
      SELECT event_type,
             CAST(least(floor("value" / 50.0), 9) AS INT) AS bin,
             CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS cur
      FROM events
    ), counts AS (
      SELECT event_type, bin,
             sum(1 - cur) AS base_n, sum(cur) AS cur_n
      FROM binned GROUP BY 1, 2
    ), grid AS (
      SELECT t.event_type, CAST(g.range AS INT) AS bin
      FROM (SELECT DISTINCT event_type FROM binned) t, range(10) g
    ), filled AS (
      SELECT grid.event_type, grid.bin,
             coalesce(counts.base_n, 0) AS base_n,
             coalesce(counts.cur_n, 0) AS cur_n
      FROM grid LEFT JOIN counts
        ON grid.event_type = counts.event_type AND grid.bin = counts.bin
    ), totals AS (
      SELECT event_type, sum(base_n) AS base_tot, sum(cur_n) AS cur_tot
      FROM filled GROUP BY 1
    ), contribs AS (
      SELECT f.event_type,
             CAST(round(((f.cur_n + 1.0) / (t.cur_tot + 10.0)
                         - (f.base_n + 1.0) / (t.base_tot + 10.0))
                        * ln(((f.cur_n + 1.0) / (t.cur_tot + 10.0))
                             / ((f.base_n + 1.0) / (t.base_tot + 10.0))),
                        6) AS DECIMAL(18,6)) AS c
      FROM filled f JOIN totals t ON f.event_type = t.event_type
    )
    SELECT event_type, round(CAST(sum(c) AS DOUBLE), 6) AS psi
    FROM contribs GROUP BY event_type ORDER BY event_type
    """,
)


# --- seasonal-naive backtest: train weeks 1-3, evaluate week 4 --------------
def _seasonal_backtest(spark, sf_dir):
    """Forecast backtesting shape: per (event_type, day-of-week) mean
    value learned on weeks 1-3 is the seasonal-naive forecast for week 4;
    report per-type MAE. The train aggregate is one map-side-combinable
    groupBy over a DECIMAL(18,2) cast (event values carry 2dp, so train
    sums are exact and the mean is a single exact-over-count division);
    forecasts broadcast back onto the eval week. Per-row absolute errors
    round to 6 decimals and sum as DECIMAL(18,6) — the fold-order-proof
    contract — so the whole train/forecast/eval loop hash-checks against
    the oracle."""
    e = read_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    base = e.select(
        "event_type",
        F.dayofweek(ts).alias("dow"),
        F.col("value").cast("decimal(18,2)").alias("v"),
        (ts >= F.lit("2024-01-22").cast("timestamp")).alias("is_eval"),
    ).filter(ts < F.lit("2024-01-29").cast("timestamp"))
    train = (
        base.filter(~F.col("is_eval"))
        .groupBy("event_type", "dow")
        .agg((F.sum("v").cast("double") / F.count(F.lit(1))).alias("forecast"))
    )
    evald = base.filter(F.col("is_eval")).join(F.broadcast(train), ["event_type", "dow"])
    err = F.round(F.abs(F.col("v").cast("double") - F.col("forecast")), 6).cast(
        "decimal(18,6)"
    )
    return (
        evald.select("event_type", err.alias("e"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.round(F.sum("e").cast("double") / F.count(F.lit(1)), 6).alias("mae"),
        )
        .orderBy("event_type")
    )


register(
    "events_seasonal_backtest",
    _seasonal_backtest,
    """
    WITH base AS (
      SELECT event_type, dayofweek(ts) + 1 AS dow,
             CAST("value" AS DECIMAL(18,2)) AS v,
             ts >= TIMESTAMP '2024-01-22' AS is_eval
      FROM events WHERE ts < TIMESTAMP '2024-01-29'
    ), train AS (
      SELECT event_type, dow,
             CAST(sum(v) AS DOUBLE) / count(*) AS forecast
      FROM base WHERE NOT is_eval GROUP BY 1, 2
    ), evald AS (
      SELECT base.event_type,
             CAST(round(abs(CAST(v AS DOUBLE) - train.forecast), 6) AS DECIMAL(18,6)) AS e
      FROM base JOIN train ON base.event_type = train.event_type AND base.dow = train.dow
      WHERE base.is_eval
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval,
           round(CAST(sum(e) AS DOUBLE) / count(*), 6) AS mae
    FROM evald GROUP BY event_type ORDER BY event_type
    """,
)


# --- k-core of the co-supply graph (unrolled-peeling exact oracle) ----------
def _graph_kcore(spark, sf_dir):
    """3-core survivors of the high-quantity co-supply graph (same edge
    shape as graph_triangle_count, thinned to quantity > 48 so the peel
    actually iterates: 1/4/9 rounds at sf0.001/0.01/0.1): the dense
    seller communities. The k-core fixpoint is unique and
    order-independent, so a DuckDB oracle that unrolls MORE peel rounds
    than the data needs reproduces it exactly — once converged, further
    rounds delete nothing. The oracle unrolls 24 chained CTE rounds
    (margin over the 9 observed at sf0.1) and guards its own sufficiency:
    if the last two rounds still differ (data needing >23 rounds — which
    Spark's max_iter=50 would peel fine, so the mismatch would otherwise
    be silently misattributed to the engine) the oracle emits a sentinel
    ``(-1, -1)`` row, forcing a loud rows-mismatch that points at the
    unroll margin instead. pytest additionally pins exact outputs on
    known graphs (clique + pendant chain)."""
    from ..operators.graph import k_core

    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 48)
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sb"))
    edges = (
        a.join(b, "ok")
        .filter(F.col("sa") < F.col("sb"))
        .select(F.col("sa").alias("id_a"), F.col("sb").alias("id_b"))
        .distinct()
    )
    return k_core(edges, k=3).orderBy("id")


def _kcore_oracle(k: int = 3, rounds: int = 24) -> str:
    """Unrolled peeling: round i computes degrees of e{i} and keeps only
    edges whose BOTH endpoints have degree >= k. Extra rounds past the
    fixpoint are no-ops, so a fixed unroll with margin is exact — and the
    sentinel UNION ALL branch makes an insufficient margin self-reporting
    (extra row => rows mismatch) instead of a silent wrong answer."""
    parts = [
        """WITH e0 AS MATERIALIZED (
      SELECT DISTINCT a.l_suppkey AS a, b.l_suppkey AS b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      WHERE a.l_quantity > 48 AND b.l_quantity > 48
    )"""
    ]
    for i in range(rounds):
        parts.append(
            f""", d{i} AS MATERIALIZED (
      SELECT v, count(*) AS d FROM (
        SELECT a AS v FROM e{i} UNION ALL SELECT b AS v FROM e{i}
      ) GROUP BY v
    ), e{i + 1} AS MATERIALIZED (
      SELECT e.a, e.b FROM e{i} e
      JOIN d{i} da ON da.v = e.a AND da.d >= {k}
      JOIN d{i} db ON db.v = e.b AND db.d >= {k}
    )"""
        )
    parts.append(
        f"""
    SELECT v AS id, d AS core_degree FROM (
      SELECT v, count(*) AS d FROM (
        SELECT a AS v FROM e{rounds} UNION ALL SELECT b AS v FROM e{rounds}
      ) GROUP BY v
    ) WHERE d >= {k}
    UNION ALL
    SELECT CAST(-1 AS BIGINT) AS id, CAST(-1 AS BIGINT) AS core_degree
    WHERE (SELECT count(*) FROM e{rounds}) <> (SELECT count(*) FROM e{rounds - 1})
    ORDER BY id"""
    )
    return "".join(parts)


register("graph_kcore_suppliers", _graph_kcore, _kcore_oracle())


# --- label-propagation communities over the trade graph ----------------------
def _graph_lpa(spark, sf_dir):
    """Top-15 communities after 3 synchronous LPA rounds on the bipartite
    customer-supplier graph (bidirectional edges, like the PageRank
    query). Iterative-family member #4: fixed rounds + the deterministic
    (count DESC, label ASC) tie-break make the result replayable by THREE
    unrolled MATERIALIZED rounds in SQL — the k-core unroll pattern, but
    with an argmax per node instead of a peel. Scale: each round shuffles
    (node, label, count) triples only; the argmax is a lexicographic
    min(struct) — a partial-aggregating groupBy, no window."""
    from ..operators.graph import label_propagation

    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    base = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    edges = base.unionByName(
        base.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = label_propagation(edges, n_rounds=3)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.desc("n_members"), "community")
        .limit(15)
    )


def _lpa_round(prev: str, out: str) -> str:
    return f"""{out}_c AS MATERIALIZED (
      SELECT e.src AS node, {prev}.label AS nl, count(*) AS c
      FROM edges e JOIN {prev} ON e.dst = {prev}.node
      GROUP BY 1, 2
    ), {out} AS MATERIALIZED (
      SELECT node, nl AS label FROM (
        SELECT node, nl,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, nl ASC) AS rn
        FROM {out}_c) t WHERE rn = 1
    )"""


register(
    "graph_lpa_communities",
    _graph_lpa,
    f"""
    WITH base_edges AS (
      SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), edges AS MATERIALIZED (
      SELECT src, dst FROM base_edges
      UNION
      SELECT dst, src FROM base_edges
    ), l0 AS MATERIALIZED (
      SELECT node, node AS label FROM (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges) n
    ), {_lpa_round('l0', 'l1')}, {_lpa_round('l1', 'l2')}, {_lpa_round('l2', 'l3')}
    SELECT label AS community, CAST(count(*) AS BIGINT) AS n_members
    FROM l3 GROUP BY label
    ORDER BY n_members DESC, community
    LIMIT 15
    """,
)
