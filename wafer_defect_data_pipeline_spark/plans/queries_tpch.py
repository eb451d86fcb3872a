"""TPC-H-style relational query pack (SURVEY.md §2.4/§2.9).

The reference has no joins/windows/SQL; this pack is the extension surface's
relational core, the bulk of the DuckDB-oracle matrix. Every query is pure
DataFrame API (Catalyst plans it; small dims broadcast; AQE handles skew).
Sort keys always include a unique tiebreaker so top-k/limit results are
deterministic for hash comparison.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources import read_table
from .registry import register


# --- TPC-H Q1: pricing summary --------------------------------------------
def _q1(spark, sf_dir):
    # Exact aggregation WITHOUT per-row decimal arithmetic: double sums depend
    # on summation order (partition count must not flip a round() at a half
    # boundary), but decimal multiply chains are ~2× slower than long math in
    # codegen. All four inputs carry exactly 2 decimals, so scale them to
    # integers (round(x·100) recovers the exact cents), multiply in LONG
    # (charge ≤ 1e7·100·100 = 1e11 per row — no overflow), and sum:
    #   qty/price as plain long sums (≤ ~6e16 at sf1000, within bigint);
    #   the e4/e6-scaled products as decimal(38,0) sums (their totals pass
    #   bigint range at the 100 TB design point).
    # The final rescale divides by a power of 10 in DECIMAL (quotient has ≤6
    # fractional digits → exact), so the cast to double is the same
    # nearest-double the all-decimal formulation produces, bit for bit.
    li = read_table(spark, sf_dir, "lineitem")
    q2 = F.round(F.col("l_quantity") * 100).cast("long")
    p2 = F.round(F.col("l_extendedprice") * 100).cast("long")
    d2 = F.round(F.col("l_discount") * 100).cast("long")
    t2 = F.round(F.col("l_tax") * 100).cast("long")
    disc_e4 = (p2 * (F.lit(100) - d2)).cast("decimal(38,0)")
    charge_e6 = (p2 * (F.lit(100) - d2) * (F.lit(100) + t2)).cast("decimal(38,0)")

    def descale(sum_col, pow10: int, digits: int):
        return (
            sum_col.cast("decimal(38,0)") / F.lit(pow10).cast(f"decimal({digits},0)")
        ).cast("double")

    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            descale(F.sum(q2), 100, 3).alias("sum_qty"),
            descale(F.sum(p2), 100, 3).alias("sum_base_price"),
            descale(F.sum(disc_e4), 10_000, 5).alias("sum_disc_price"),
            descale(F.sum(charge_e6), 1_000_000, 7).alias("sum_charge"),
            F.round(descale(F.sum(q2), 100, 3) / n, 4).alias("avg_qty"),
            F.round(descale(F.sum(p2), 100, 3) / n, 4).alias("avg_price"),
            F.round(descale(F.sum(d2), 100, 3) / n, 4).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


register(
    "tpch_q1_pricing_summary",
    _q1,
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                    * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)


# --- 3-way join + agg + top-k (Q3 shape) -----------------------------------
def _q3(spark, sf_dir):
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


register(
    "tpch_q3_top_orders",
    _q3,
    """
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)


# --- 6-way star join (Q5 shape): regional revenue --------------------------
def _q5(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy("r_name", F.desc("revenue"), "n_name")
    )


register(
    "tpch_q5_regional_revenue",
    _q5,
    """
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE c_nationkey = s_nationkey
    GROUP BY r_name, n_name
    ORDER BY r_name, revenue DESC, n_name
    """,
)


# --- semi join: orders that have at least one big lineitem -----------------
def _semi_join(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    big = li.filter(F.col("l_quantity") >= 48)
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderstatus")
    )


register(
    "join_semi",
    _semi_join,
    """
    SELECT o_orderstatus, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)


# --- anti join: customers with no orders -----------------------------------
def _anti_join(spark, sf_dir):
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


register(
    "join_anti",
    _anti_join,
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)


# --- left outer join + conditional agg -------------------------------------
def _outer_join(spark, sf_dir):
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


register(
    "join_left_outer",
    _outer_join,
    """
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           round(coalesce(sum(o_totalprice), 0.0), 4) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey ORDER BY c_custkey
    """,
)


# --- window: top-3 per group by row_number ---------------------------------
def _window_topk(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy(
        F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_returnflag", "rn", "l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy("l_returnflag", "rn")
    )


register(
    "window_topk_per_group",
    _window_topk,
    """
    SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice
    FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rn
      FROM lineitem
    ) t WHERE rn <= 3
    ORDER BY l_returnflag, rn
    """,
)


# --- window: running sum + rank --------------------------------------------
def _window_running(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 4).alias("running_total"),
            F.rank().over(w).alias("order_rank"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


register(
    "window_running_sum",
    _window_running,
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_total,
           rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_rank
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)


# --- window: orders above their customer's average (decorrelated) ----------
def _above_avg(spark, sf_dir):
    # exact decimal sum/count instead of double avg(): double summation order
    # differs between engines (and between runs under AQE), flipping rows that
    # sit within one ulp of their group mean. Decimal arithmetic is
    # order-independent, so the filter and the emitted average are stable.
    orders = read_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    tot = F.sum(dec).over(w)
    cnt = F.count(F.lit(1)).over(w)
    return (
        orders.withColumn("__tot", tot)
        .withColumn("__cnt", cnt)
        .filter(dec * F.col("__cnt") > F.col("__tot"))
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            (F.col("__tot").cast("double") / F.col("__cnt")).alias("cust_avg"),
        )
        .orderBy("o_orderkey")
    )


register(
    "window_above_customer_avg",
    _above_avg,
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(tot AS DOUBLE) / cnt AS cust_avg
    FROM (
      SELECT *,
             CAST(o_totalprice AS DECIMAL(18,2)) AS d,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey) AS tot,
             count(*) OVER (PARTITION BY o_custkey) AS cnt
      FROM orders
    ) t WHERE d * cnt > tot
    ORDER BY o_orderkey
    """,
)


# --- rollup ----------------------------------------------------------------
def _rollup(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


register(
    "rollup_counts",
    _rollup,
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
    """,
)


# --- cube ------------------------------------------------------------------
def _cube(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority"))
    )


register(
    "cube_counts",
    _cube,
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """,
)


# --- distinct aggregates ---------------------------------------------------
def _distinct_agg(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
        .orderBy("l_returnflag")
    )


register(
    "distinct_aggregates",
    _distinct_agg,
    """
    SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS n_orders,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)


# --- global top-k with deterministic tiebreaker ----------------------------
def _global_topk(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


register(
    "global_topk",
    _global_topk,
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
    """,
)


# --- string functions ------------------------------------------------------
def _string_funcs(spark, sf_dir):
    p = read_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.length("p_type").alias("type_len"),
            F.concat_ws("::", "p_brand", "p_type").alias("brand_type"),
            F.col("p_name").like("%steel%").alias("has_steel"),
            F.regexp_extract("p_type", r"^(\w+)", 1).alias("type_first_word"),
        )
        .orderBy("p_partkey")
    )


register(
    "string_functions",
    _string_funcs,
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substring(p_name, 1, 8) AS name_prefix,
           length(p_type) AS type_len,
           concat_ws('::', p_brand, p_type) AS brand_type,
           p_name LIKE '%steel%' AS has_steel,
           coalesce(regexp_extract(p_type, '^(\\w+)', 1), '') AS type_first_word
    FROM part ORDER BY p_partkey
    """,
)


# --- date/time functions ---------------------------------------------------
def _date_funcs(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofmonth("o_orderdate").alias("order_day"),
            F.date_trunc("month", "o_orderdate").alias("month_start"),
            F.datediff(F.lit("1999-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_1999"),
        )
        .orderBy("o_orderkey")
    )


register(
    "date_functions",
    _date_funcs,
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(day(o_orderdate) AS INTEGER) AS order_day,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INTEGER) AS days_to_1999
    FROM orders ORDER BY o_orderkey
    """,
)


# --- JSON extraction (events.props) ----------------------------------------
def _json_extract(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .orderBy("event_id")
    )


register(
    "json_extract",
    _json_extract,
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events ORDER BY event_id
    """,
)


# --- VARIANT semi-structured path (Spark 4) --------------------------------
def _json_variant_agg(spark, sf_dir):
    """Aggregate over VARIANT-extracted fields — the modern semi-structured
    path. ``parse_json`` decodes each JSON string ONCE into Spark 4's binary
    Variant encoding; ``variant_get`` then reads fields without re-parsing,
    and at 100 TB Variant columns stored in parquet get shredded into typed
    sub-columns that support pruning/pushdown — none of which a raw JSON
    string column can do. Semantics are identical to get_json_object (the
    oracle is plain json_extract SQL); the win is plan shape and storage.
    """
    e = read_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        e.select((k % 10).alias("k_bucket"), k.alias("k"), "value")
        .groupBy("k_bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("sum_value"),
        )
        .orderBy("k_bucket")
    )


register(
    "json_variant_agg",
    _json_variant_agg,
    """
    WITH x AS (
      SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, value
      FROM events
    )
    SELECT k % 10 AS k_bucket, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS sum_value
    FROM x GROUP BY k_bucket ORDER BY k_bucket
    """,
)


# --- grouped string agg (collect + sort for determinism) -------------------
def _grouped_collect(spark, sf_dir):
    n = read_table(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"))
        .orderBy("n_regionkey")
    )


register(
    "grouped_string_agg",
    _grouped_collect,
    """
    SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)


# --- set operations: intersect / except ------------------------------------
def _set_ops(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 200000).select("o_custkey")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    both = big.intersect(urgent).withColumn("bucket", F.lit("big_and_urgent"))
    only_big = big.exceptAll(urgent).distinct().withColumn("bucket", F.lit("big_not_urgent"))
    return both.unionByName(only_big).orderBy("bucket", "o_custkey")


register(
    "set_ops_customers",
    _set_ops,
    """
    WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000),
         urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    SELECT o_custkey, 'big_and_urgent' AS bucket FROM (
      SELECT o_custkey FROM big INTERSECT SELECT o_custkey FROM urgent)
    UNION ALL
    SELECT DISTINCT o_custkey, 'big_not_urgent' AS bucket FROM (
      SELECT o_custkey FROM big EXCEPT ALL SELECT o_custkey FROM urgent)
    ORDER BY bucket, o_custkey
    """,
)


# --- approximate aggregates (EXACT oracle on the error bounds: the HLL/KLL
# sketch values are engine-specific and can't hash-match DuckDB, so the
# hashed output carries the EXACT values plus Spark-computed booleans
# asserting each sketch landed inside its documented tolerance) --------------
def _approx_aggs(spark, sf_dir):
    """approx_count_distinct (HLL++, rsd=0.01) and percentile_approx
    (KLL-ish Greenwald-Khanna, accuracy=10000) vs their exact twins in ONE
    aggregation pass. Tolerances: 5% relative for the distinct count (5x the
    configured rsd), 1% relative for each quantile (rank error 1e-4 at
    these group sizes translates to far less). The oracle replays the exact
    side and the TRUE literals — a sketch drifting out of tolerance flips a
    hashed boolean and fails the driver gate."""
    li = read_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("__ap"),
        F.percentile_approx("l_extendedprice", [0.25, 0.5, 0.75], 10_000).alias("__aq"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").alias("__eq"),
    )

    return agg.select(
        "l_returnflag",
        "exact_parts",
        F.round(F.col("__eq")[1], 4).alias("exact_median_price"),
        F.round(F.col("__eq")[0], 4).alias("exact_q1"),
        F.round(F.col("__eq")[2], 4).alias("exact_q3"),
        (F.abs(F.col("__ap") - F.col("exact_parts")) <= F.col("exact_parts") * 0.05).alias("parts_within_tol"),
        (F.abs(F.col("__aq")[1] - F.col("__eq")[1]) <= F.abs(F.col("__eq")[1]) * 0.01).alias("median_within_tol"),
        (F.abs(F.col("__aq")[0] - F.col("__eq")[0]) <= F.abs(F.col("__eq")[0]) * 0.01).alias("q1_within_tol"),
        (F.abs(F.col("__aq")[2] - F.col("__eq")[2]) <= F.abs(F.col("__eq")[2]) * 0.01).alias("q3_within_tol"),
    ).orderBy("l_returnflag")


register(
    "approx_aggregates",
    _approx_aggs,
    """
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS exact_median_price,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS exact_q1,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS exact_q3,
           TRUE AS parts_within_tol,
           TRUE AS median_within_tol,
           TRUE AS q1_within_tol,
           TRUE AS q3_within_tol
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)


# --- skew tools: salted join + two-phase agg (identical result to plain
# join+agg — that's the point; the oracle proves it) --------------------------
def _salted_skew(spark, sf_dir):
    from ..operators.skew import salted_join, two_phase_agg

    # decimal revenue: exact, summation-order-independent, so the salted
    # two-phase sum hashes identically to the oracle's single-phase sum
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)"))
        ).alias("rev"),
    )
    supp = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    joined = salted_join(li, supp, on=["l_suppkey"], how="inner", n_salts=8)
    return two_phase_agg(
        joined,
        ["s_nationkey"],
        [F.sum("rev").alias("__p_rev"), F.count(F.lit(1)).alias("__p_n")],
        [
            F.sum("__p_rev").cast("double").alias("revenue"),
            F.sum("__p_n").alias("n_items"),
        ],
    ).orderBy("s_nationkey")


register(
    "join_salted_skew",
    _salted_skew,
    """
    SELECT s_nationkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """,
)


# --- Q17 shape: correlated scalar subquery (decorrelated to join) -----------
def _small_quantity_revenue(spark, sf_dir):
    """Avg yearly revenue loss from small orders — the reference TPC-H Q17
    shape. The correlated 'l_quantity < 0.2 * avg(quantity) per part'
    subquery is expressed as an explicit pre-aggregation + broadcast join,
    which is exactly what Catalyst's decorrelation would produce."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    # exact decimal threshold: order-independent across engines
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("__sq"),
        F.count("l_quantity").alias("__nq"),
    )
    brass = part.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    joined = (
        li.join(F.broadcast(brass), li.l_partkey == F.col("p_partkey"))
        .join(per_part, on="l_partkey")
        .filter(
            F.col("l_quantity").cast("decimal(18,2)") * F.lit(5) * F.col("__nq")
            < F.col("__sq")  # qty < 0.2 * avg  ==  5 * qty * n < sum
        )
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_small"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
    )


register(
    "tpch_q17_small_quantity",
    _small_quantity_revenue,
    """
    WITH per_part AS (
      SELECT l_partkey,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
             count(l_quantity) AS nq
      FROM lineitem GROUP BY l_partkey
    )
    SELECT count(*) AS n_small,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#1'
    JOIN per_part USING (l_partkey)
    WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * nq < sq
    """,
)


# --- Q13 shape: left-join count histogram -----------------------------------
def _order_count_distribution(spark, sf_dir):
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            cust.c_custkey == orders.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


register(
    "tpch_q13_order_counts",
    _order_count_distribution,
    """
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) t GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)


# --- Q22 shape: scalar avg subquery + anti join ------------------------------
def _idle_rich_customers(spark, sf_dir):
    cust = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    # scalar subquery: avg acctbal of positive-balance customers, computed in
    # exact decimal then collected as the one number it is. The predicate
    # 'acctbal > avg/2' is evaluated as exact 'acctbal * 2n > sum' — no
    # division, no float, identical row set in every engine.
    avg_row = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    rich = cust.filter(
        F.col("c_acctbal").cast("decimal(18,2)") * F.lit(2 * int(avg_row["n"]))
        > F.lit(str(avg_row["s"])).cast("decimal(28,2)")
    )
    idle = rich.join(
        orders.filter(F.col("o_orderpriority") == "1-URGENT"),
        cust.c_custkey == orders.o_custkey,
        "left_anti",
    )
    return (
        idle.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


register(
    "tpch_q22_idle_balance",
    _idle_rich_customers,
    """
    WITH stats AS (
      SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) AS s, count(*) AS n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey, count(*) AS n_cust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer, stats
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * 2 * n > s
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)


# --- Q6 shape: predicate-only revenue agg ------------------------------------
def _q6(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(4,2)")
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


register(
    "tpch_q6_forecast_revenue",
    _q6,
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)


# --- Q10 shape: returned-item revenue per customer, top 20 -------------------
def _q10(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)"))
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev.cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


register(
    "tpch_q10_returned_items",
    _q10,
    """
    SELECT c_custkey, c_name, n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)


# --- Q14 shape: promo revenue share ------------------------------------------
def _q14(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(22,4)")))
        .cast("double")
        .alias("promo_revenue"),
        F.sum(rev).cast("double").alias("total_revenue"),
    )


register(
    "tpch_q14_promo_share",
    _q14,
    """
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                   ELSE CAST(0 AS DECIMAL(22,4)) END) AS DOUBLE) AS promo_revenue,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)


# --- Q19 shape: disjunctive multi-predicate join -----------------------------
def _q19(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15)) & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 21))
        | ((F.col("p_brand") == "Brand#7") & (F.col("p_size").between(1, 25)) & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30))
        | ((F.col("p_brand") == "Brand#20") & (F.col("p_size").between(1, 35)) & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40))
    )
    return joined.filter(cond).agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)"))
        ).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


register(
    "tpch_q19_disjunctive",
    _q19,
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
    """,
)


# --- numeric histogram (fixed-width binning) ---------------------------------
def _price_histogram(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50_000).cast("int")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .withColumn("lo", F.col("bucket") * 50_000)
        .select("bucket", "lo", "n_orders")
        .orderBy("bucket")
    )


register(
    "histogram_order_price",
    _price_histogram,
    """
    SELECT CAST(floor(o_totalprice / 50000) AS INT) AS bucket,
           CAST(floor(o_totalprice / 50000) AS INT) * 50000 AS lo,
           count(*) AS n_orders
    FROM orders GROUP BY 1, 2 ORDER BY bucket
    """,
)


# --- null-safe join (<=>) ----------------------------------------------------
def _null_safe_join(spark, sf_dir):
    """Join on a nullable derived key with null-safe equality: null keys
    match each other under <=>, unlike plain = where null = null is null
    and the rows silently drop."""
    orders = read_table(spark, sf_dir, "orders")
    a = orders.select(
        F.col("o_orderkey"),
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio_key"),
    )
    dim = (
        a.select("prio_key").distinct()
        .withColumn("prio_label", F.coalesce(F.col("prio_key"), F.lit("URGENT-REDACTED")))
    )
    return (
        a.join(dim, a.prio_key.eqNullSafe(dim.prio_key), "inner")
        .groupBy("prio_label")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("prio_label")
    )


register(
    "join_null_safe",
    _null_safe_join,
    """
    WITH a AS (
      SELECT o_orderkey, nullif(o_orderpriority, '1-URGENT') AS prio_key FROM orders
    ), dim AS (
      SELECT DISTINCT prio_key, coalesce(prio_key, 'URGENT-REDACTED') AS prio_label FROM a
    )
    SELECT dim.prio_label, count(*) AS n_orders
    FROM a JOIN dim ON a.prio_key IS NOT DISTINCT FROM dim.prio_key
    GROUP BY dim.prio_label ORDER BY dim.prio_label
    """,
)


# --- time-series: monthly revenue with month-over-month growth ---------------
def _monthly_growth(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    monthly = (
        orders.groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("month"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w = W.orderBy("month")
    return (
        monthly.withColumn("prev", F.lag("rev").over(w))
        .select(
            "month",
            F.col("rev").cast("double").alias("revenue"),
            # growth in exact basis points: (rev - prev) * 10000 / prev as
            # decimal division would still be engine-identical on identical
            # decimals; emit prev too for full determinism
            F.col("prev").cast("double").alias("prev_revenue"),
        )
        .orderBy("month")
    )


register(
    "timeseries_monthly_growth",
    _monthly_growth,
    """
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    )
    SELECT month, CAST(rev AS DOUBLE) AS revenue,
           CAST(lag(rev) OVER (ORDER BY month) AS DOUBLE) AS prev_revenue
    FROM m ORDER BY month
    """,
)


# --- DataFrame.transpose (Spark 4): metrics wide-form ------------------------
def _transpose_metrics(spark, sf_dir):
    """Per-returnflag metrics transposed to wide form (metrics as rows,
    flags as columns) — ``DataFrame.transpose`` (Spark 4), the idiomatic
    "summary table" shape. Runs on an already-aggregated 3-row frame, so
    the transpose itself is trivially driver-sized; the distributed work is
    the upstream agg. Oracle builds the same wide rows with conditional
    aggregation (returnflag domain A/N/R is fixed in TPC-H)."""
    li = read_table(spark, sf_dir, "lineitem")
    agg = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
        .orderBy("l_returnflag")
    )
    return (
        agg.transpose()
        .select("key", F.col("A").cast("double"), F.col("N").cast("double"), F.col("R").cast("double"))
        .orderBy("key")
    )


register(
    "transpose_metrics",
    _transpose_metrics,
    """
    WITH m AS (
      SELECT 'n_rows' AS key,
             CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS DOUBLE) AS A,
             CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS DOUBLE) AS N,
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE) AS R
      FROM lineitem
      UNION ALL
      SELECT 'sum_qty',
             CAST(sum(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE),
             CAST(sum(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE),
             CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE)
      FROM lineitem
    )
    SELECT key, A, N, R FROM m ORDER BY key
    """,
)


# --- equi-width histogram (width_bucket) -------------------------------------
def _price_histogram(spark, sf_dir):
    """10-bucket equi-width histogram of l_extendedprice — the profiling
    primitive behind optimizer NDV/selectivity estimates and data-drift
    monitors. width_bucket is a pure projection; the histogram is one
    map-side-combinable groupBy on a 12-value key (buckets 0/11 catch
    underflow/overflow rows)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.width_bucket(F.col("l_extendedprice"), F.lit(0.0), F.lit(110000.0), F.lit(10)).alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


register(
    "price_histogram",
    _price_histogram,
    """
    SELECT CAST(CASE WHEN l_extendedprice < 0.0 THEN 0
                     WHEN l_extendedprice >= 110000.0 THEN 11
                     ELSE CAST(floor(l_extendedprice / 11000.0) AS BIGINT) + 1
                END AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY 1 ORDER BY bucket
    """,
)


# --- pairwise correlation matrix ---------------------------------------------
def _numeric_correlations(spark, sf_dir):
    """Pearson correlations of the four lineitem measures in ONE aggregate
    job (6 corr pairs as parallel agg expressions over one scan) — the
    relational sibling of the embedding covariance matrix
    (operators/decomposition.py)."""
    li = read_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(F.round(F.corr(a, b), 6).alias(f"corr_{a}_{b}"))
    row = li.agg(*aggs)
    pairs = ", ".join(f"'{c}', {c}" for c in row.columns)
    return row.selectExpr(f"stack({len(row.columns)}, {pairs}) as (pair, corr)").orderBy(
        "pair"
    )


register(
    "numeric_correlations",
    _numeric_correlations,
    """
    SELECT pair, corr FROM (
      SELECT 'corr_l_quantity_l_extendedprice' AS pair, round(corr(l_quantity, l_extendedprice), 6) AS corr FROM lineitem
      UNION ALL
      SELECT 'corr_l_quantity_l_discount', round(corr(l_quantity, l_discount), 6) FROM lineitem
      UNION ALL
      SELECT 'corr_l_quantity_l_tax', round(corr(l_quantity, l_tax), 6) FROM lineitem
      UNION ALL
      SELECT 'corr_l_extendedprice_l_discount', round(corr(l_extendedprice, l_discount), 6) FROM lineitem
      UNION ALL
      SELECT 'corr_l_extendedprice_l_tax', round(corr(l_extendedprice, l_tax), 6) FROM lineitem
      UNION ALL
      SELECT 'corr_l_discount_l_tax', round(corr(l_discount, l_tax), 6) FROM lineitem
    ) t ORDER BY pair
    """,
)
