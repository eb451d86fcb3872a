"""TPC-H completion pack: the 12 query shapes missing from queries_tpch.py.

The driver testdata is TPC-H-ish but reduced — no ``partsupp`` table, no
``l_commitdate``/``l_receiptdate``/``l_shipmode`` columns — so the classic
queries that need them (Q2, Q4, Q9, Q11, Q12, Q16, Q20, Q21) are adapted to
preserve the SHAPE (correlated EXISTS / NOT EXISTS, scalar-subquery
thresholds, view+max, IN-with-HAVING, min-per-group pick) on the columns that
exist. Shapes covered here and nowhere else in the repo:

- Q2: min-per-group supplier pick via window over a derived part-supplier
  relation (``SELECT DISTINCT`` from lineitem stands in for partsupp)
- Q4: EXISTS -> left-semi join
- Q7/Q8/Q9: multi-way join + year rollup / market-share case-sum division
- Q11: scalar-subquery threshold (val*cnt > 2*total keeps the comparison in
  exact integer-decimal arithmetic; dividing first would reintroduce floats)
- Q12: two-branch conditional counts
- Q15: view + join-on-max (decimal-exact equality, order-independent)
- Q16: NOT IN -> broadcast left-anti + count-distinct
- Q18: IN (GROUP BY ... HAVING) -> inner join on the aggregated key set
- Q20: nested IN subquery -> left-semi over a HAVING-filtered agg
- Q21: double-correlated EXISTS/NOT EXISTS -> one per-order stats agg
  (n_suppliers, n_flagged_suppliers) joined back — ONE shuffle instead of two
  correlated self-joins; at 100 TB the stats frame is one short row per order

All money sums run in decimal then cast to double (partition-count-invariant
hashes; see BASELINE.md protocol). Small dims (part 0.02% of lineitem rows,
supplier, nation, region) are broadcast; the lineitem fact table is never
shuffled except by its own groupBy keys.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources import read_table
from .registry import register

_DEC_PRICE = "decimal(18,2)"
_DEC_PCT = "decimal(4,2)"


def _disc_price():
    """Exact l_extendedprice * (1 - l_discount) in decimal."""
    one = F.lit(1).cast(_DEC_PCT)
    return F.col("l_extendedprice").cast(_DEC_PRICE) * (one - F.col("l_discount").cast(_DEC_PCT))


# --- Q2 shape: cheapest shipper per part (min-per-group pick) ---------------
def _q2(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    # derived part-supplier relation; distinct is map-side combinable and the
    # rows are two longs, so the shuffle ships ~|partsupp| tiny rows
    ps = li.select(F.col("l_partkey").alias("p_partkey"), F.col("l_suppkey").alias("s_suppkey")).distinct()
    pf = part.filter(F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE"))
    sn = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name") == "AMERICA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    w = W.partitionBy("p_partkey").orderBy(F.asc("s_acctbal"), F.asc("s_suppkey"))
    return (
        ps.join(F.broadcast(pf), "p_partkey")
        .join(F.broadcast(sn), "s_suppkey")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(F.desc("s_acctbal"), F.asc("p_partkey"))
    )


register(
    "tpch_q2_min_cost_supplier",
    _q2,
    """
    WITH ps AS (SELECT DISTINCT l_partkey AS p_partkey, l_suppkey AS s_suppkey FROM lineitem),
    r AS (
      SELECT s_acctbal, s_name, n_name, part.p_partkey AS p_partkey, p_brand,
             row_number() OVER (PARTITION BY part.p_partkey ORDER BY s_acctbal, supplier.s_suppkey) AS rn
      FROM ps
      JOIN part ON ps.p_partkey = part.p_partkey
      JOIN supplier ON ps.s_suppkey = supplier.s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE' AND r_name = 'AMERICA'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
    FROM r WHERE rn = 1
    ORDER BY s_acctbal DESC, p_partkey
    """,
)


# --- Q4 shape: EXISTS as left-semi join -------------------------------------
def _q4(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    flagged = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.join(flagged, o.o_orderkey == flagged.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


register(
    "tpch_q4_order_priority",
    _q4,
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)


# --- Q7 shape: bidirectional region-pair shipping volume by year ------------
def _q7(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    sgeo = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"), F.col("r_name").alias("supp_region"))
    )
    cgeo = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"), F.col("r_name").alias("cust_region"))
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(sgeo), li.l_suppkey == sgeo.s_suppkey)
        .join(orders, li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cgeo), F.col("o_custkey") == cgeo.c_custkey)
        .filter(
            ((F.col("supp_region") == "ASIA") & (F.col("cust_region") == "EUROPE"))
            | ((F.col("supp_region") == "EUROPE") & (F.col("cust_region") == "ASIA"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_disc_price()).cast("double"), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


register(
    "tpch_q7_region_volume",
    _q7,
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 4) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE') OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)


# --- Q8 shape: market share (conditional sum / total sum per year) ----------
def _q8(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    sn = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cr = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    vol = _disc_price()
    nation_vol = F.sum(F.when(F.col("supp_nation") == "NATION_8", vol).otherwise(F.lit(0).cast(_DEC_PRICE)))
    return (
        li.join(F.broadcast(part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ).select("o_orderkey", "o_custkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(cr), F.col("o_custkey") == cr.c_custkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.round(nation_vol.cast("double") / F.sum(vol).cast("double"), 6).alias("mkt_share"))
        .orderBy("o_year")
    )


register(
    "tpch_q8_market_share",
    _q8,
    """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           round(CAST(sum(CASE WHEN n1.n_name = 'NATION_8'
                          THEN CAST(l_extendedprice AS DECIMAL(18,2))
                               * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE), 6) AS mkt_share
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    JOIN region ON n2.n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY o_year
    ORDER BY o_year
    """,
)


# --- Q9 shape: profit by supplier nation and year ---------------------------
def _q9(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    nation = read_table(spark, sf_dir, "nation")
    # no partsupp/ps_supplycost in the testdata: 0.5 * p_retailprice stands in
    # as unit cost. Operand widths chosen so every decimal product stays under
    # precision 38 in BOTH engines (Spark would silently round above it).
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast(_DEC_PCT)
    retail = F.col("p_retailprice").cast("decimal(12,2)")
    qty = F.col("l_quantity").cast("decimal(9,2)")
    half = F.lit("0.5").cast("decimal(2,1)")
    amount = price * (F.lit(1).cast(_DEC_PCT) - disc) - (half * retail) * qty
    sn = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    return (
        li.join(F.broadcast(part.filter(F.col("p_name").like("%red%")).select("p_partkey", "p_retailprice")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount).cast("double"), 4).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


register(
    "tpch_q9_profit_by_nation",
    _q9,
    """
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                          - (CAST(0.5 AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(12,2)))
                            * CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE), 4) AS sum_profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year
    ORDER BY n_name, o_year DESC
    """,
)


# --- Q11 shape: scalar-subquery threshold over grouped values ---------------
def _q11(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region")
    asia_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    v = (
        li.join(F.broadcast(asia_supp), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_disc_price()).alias("val"))
    )
    # threshold kept in exact arithmetic: val > 2*avg(val)  <=>  val*cnt > 2*total
    stats = v.agg(F.count(F.lit(1)).alias("cnt"), F.sum("val").alias("total"))
    return (
        v.crossJoin(F.broadcast(stats))
        .filter(F.col("val") * F.col("cnt") > 2 * F.col("total"))
        .select(F.col("l_partkey").alias("p_partkey"), F.round(F.col("val").cast("double"), 4).alias("part_value"))
        .orderBy(F.desc("part_value"), F.asc("p_partkey"))
    )


register(
    "tpch_q11_important_parts",
    _q11,
    """
    WITH v AS (
      SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS val
      FROM lineitem
      WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA')
      GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, round(CAST(val AS DOUBLE), 4) AS part_value
    FROM v
    WHERE val * (SELECT count(*) FROM v) > 2 * (SELECT sum(val) FROM v)
    ORDER BY part_value DESC, p_partkey
    """,
)


# --- Q12 shape: two-branch conditional counts -------------------------------
def _q12(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders.select("o_orderkey", "o_orderpriority"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


register(
    "tpch_q12_priority_lines",
    _q12,
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)


# --- Q15 shape: revenue view + join on its max ------------------------------
def _q15(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_disc_price()).alias("rev"))
    )
    # decimal max + decimal equality: exact in both engines, so the winner set
    # cannot flip on summation order the way double sums could
    top = rev.agg(F.max("rev").alias("maxrev"))
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("rev") == F.col("maxrev"))
        .join(F.broadcast(supp.select("s_suppkey", "s_name")), rev.l_suppkey == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.round(F.col("rev").cast("double"), 4).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


register(
    "tpch_q15_top_supplier",
    _q15,
    """
    WITH rev AS (
      SELECT l_suppkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(CAST(rev AS DOUBLE), 4) AS total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE rev = (SELECT max(rev) FROM rev)
    ORDER BY s_suppkey
    """,
)


# --- Q16 shape: NOT IN -> broadcast anti join + count-distinct --------------
def _q16(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    pf = part.filter(
        (F.col("p_brand") != "Brand#45")
        & (~F.col("p_type").like("MEDIUM%"))
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(pf), li.l_partkey == pf.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


register(
    "tpch_q16_supplier_counts",
    _q16,
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#45' AND p_type NOT LIKE 'MEDIUM%'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)


# --- Q18 shape: IN (GROUP BY ... HAVING) large-volume orders ----------------
def _q18(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC_PRICE)).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust.select("c_custkey", "c_name"), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


register(
    "tpch_q18_large_orders",
    _q18,
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum_qty_dec AS DOUBLE) AS sum_qty
    FROM (
      SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty_dec
      FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250
    ) big
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)


# --- Q20 shape: nested IN subquery -> semi join over HAVING agg -------------
def _q20(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    supp = read_table(spark, sf_dir, "supplier")
    eligible = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(part.filter(F.col("p_name").like("small%")).select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC_PRICE)).alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return (
        supp.join(eligible, supp.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


register(
    "tpch_q20_promotion_suppliers",
    _q20,
    """
    SELECT s_name, s_acctbal
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 100
    )
    ORDER BY s_name
    """,
)


# --- Q21 shape: double-correlated EXISTS / NOT EXISTS -----------------------
def _q21(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    orders = read_table(spark, sf_dir, "orders")
    # the two correlated sub-queries (EXISTS another supplier / NOT EXISTS
    # another flagged supplier) collapse into ONE per-order aggregate: an
    # order qualifies for flagged supplier s iff it has >=2 distinct suppliers
    # and exactly one distinct flagged supplier (which must then be s).
    stats = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))).alias("n_flagged"),
    )
    sn = (
        supp.join(
            F.broadcast(nation.filter(F.col("n_name").isin("NATION_3", "NATION_4"))),
            supp.s_nationkey == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    l1 = li.filter(F.col("l_returnflag") == "R").join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
    return (
        l1.join(orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"), l1.l_orderkey == F.col("o_orderkey"))
        .join(stats, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_flagged") == 1))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


register(
    "tpch_q21_waiting_suppliers",
    _q21,
    """
    SELECT s_name, count(*) AS numwait
    FROM lineitem l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l1.l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND n_name IN ('NATION_3', 'NATION_4')
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 100
    """,
)


# --- unpivot / melt (wide measures -> long) ---------------------------------
def _unpivot_measures(spark, sf_dir):
    """Melt the four lineitem measures into (measure, value) rows, then
    aggregate per (returnflag, measure).

    ``DataFrame.unpivot`` is a Generate-style projection (no shuffle of its
    own) — the only exchange is the groupBy, whose key space is
    |returnflag|×4. Sums are exact: the 2-decimal measures accumulate as
    DECIMAL(18,2), so partition order cannot move the total (repo-wide
    decimal-sum convention).
    """
    li = read_table(spark, sf_dir, "lineitem")
    long = li.select("l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_tax").unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return (
        long.groupBy("l_returnflag", "measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .orderBy("l_returnflag", "measure")
    )


register(
    "unpivot_measures",
    _unpivot_measures,
    """
    SELECT l_returnflag, measure, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM (SELECT l_returnflag, l_quantity, l_extendedprice, l_discount, l_tax FROM lineitem)
         UNPIVOT (value FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax))
    GROUP BY l_returnflag, measure
    ORDER BY l_returnflag, measure
    """,
)


# --- market-basket association: part-pair support / confidence / lift -------
def _basket_pairs_lift(spark, sf_dir):
    """Association-rule mining over order baskets (Agrawal & Srikant's
    frequent-itemset framing, VLDB'94 — public literature): for part
    pairs co-occurring in the same order, support, and lift
    = P(a,b) / (P(a) P(b)). The pair join is WITHIN-ORDER only (baskets
    cap at ~13 lines here, and basket size bounds the quadratic term at
    any scale — the pair explosion is per-basket, never corpus-wide),
    distinct parts per basket first so multi-line repeats don't inflate
    counts. Lift stays a single ratio of exact bigint products — one
    double division, deterministic on both engines."""
    li = read_table(spark, sf_dir, "lineitem")
    basket = (
        li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=False)  # feeds totals, item counts, both pair sides
    )
    n_orders = basket.agg(F.countDistinct("ok").alias("n_orders"))
    item = basket.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    a = basket.select("ok", F.col("p").alias("pa"))
    b = basket.select("ok", F.col("p").alias("pb"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 3)
    )
    return (
        pairs.join(F.broadcast(item.select(F.col("p").alias("pa"), F.col("n").alias("n_a"))), "pa")
        .join(F.broadcast(item.select(F.col("p").alias("pb"), F.col("n").alias("n_b"))), "pb")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa", "pb", "n_ab",
            F.round(F.col("n_ab") / F.col("n_orders").cast("double"), 6).alias("support"),
            F.round(
                (F.col("n_ab") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "pa", "pb")
        .limit(10)
    )


register(
    "basket_part_pairs_lift",
    _basket_pairs_lift,
    """
    WITH basket AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
    ), n_orders AS (
      SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM basket
    ), item AS (
      SELECT p, CAST(count(*) AS BIGINT) AS n FROM basket GROUP BY p
    ), pairs AS (
      SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS n_ab
      FROM basket a JOIN basket b ON a.ok = b.ok AND a.p < b.p
      GROUP BY 1, 2 HAVING count(*) >= 3
    )
    SELECT pa, pb, n_ab,
           round(CAST(n_ab AS DOUBLE) / n_orders.n, 6) AS support,
           round(CAST(n_ab * n_orders.n AS DOUBLE) / (ia.n * ib.n), 6) AS lift
    FROM pairs
    JOIN item ia ON pairs.pa = ia.p
    JOIN item ib ON pairs.pb = ib.p
    CROSS JOIN n_orders
    ORDER BY lift DESC, pa, pb
    LIMIT 10
    """,
)


# --- key-skew diagnosis: the report that decides salting --------------------
def _skew_key_diagnosis(spark, sf_dir):
    """Per-join-key skew report over lineitem: key cardinality, heaviest
    key's row share, top-10 share, and the Gini coefficient of the
    per-key count distribution — the numbers that decide whether a join
    needs salting or AQE skew handling BEFORE running it. All ranking
    and windowing happens on the per-key COUNT SUMMARY (bounded by key
    cardinality, not row count), the corpus itself is touched by one
    map-side-combinable groupBy per column. Gini uses the exact rank
    formula 2*sum(i*c_i)/(n*sum(c)) - (n+1)/n on integer sums — one
    double expression at the end, hash-exact in the oracle."""
    from pyspark.sql import Window as W

    li = read_table(spark, sf_dir, "lineitem")
    reports = []
    for col in ["l_orderkey", "l_partkey", "l_suppkey"]:
        counts = li.groupBy(F.col(col).alias("key")).agg(
            F.count(F.lit(1)).alias("c")
        )
        ranked = counts.select(
            "key", "c",
            F.row_number().over(W.orderBy(F.asc("c"), F.asc("key"))).alias("i"),
            F.row_number().over(W.orderBy(F.desc("c"), F.asc("key"))).alias("ri"),
        )
        reports.append(
            ranked.agg(
                F.lit(col).alias("key_col"),
                F.count(F.lit(1)).alias("n_keys"),
                F.sum("c").alias("total_rows"),
                F.round(F.max("c") / F.sum("c"), 6).alias("top1_share"),
                F.round(
                    F.sum(F.when(F.col("ri") <= 10, F.col("c")).otherwise(0)) / F.sum("c"), 6
                ).alias("top10_share"),
                F.round(
                    2.0 * F.sum(F.col("i") * F.col("c"))
                    / (F.count(F.lit(1)) * F.sum("c"))
                    - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
                    6,
                ).alias("gini"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.orderBy("key_col")


_SKEW_COL_SQL = """
      SELECT '{col}' AS key_col,
             CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(c) AS BIGINT) AS total_rows,
             round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top1_share,
             round(CAST(sum(CASE WHEN ri <= 10 THEN c ELSE 0 END) AS DOUBLE) / sum(c), 6) AS top10_share,
             round(2.0 * sum(i * c) / (count(*) * CAST(sum(c) AS DOUBLE))
                   - (count(*) + 1.0) / count(*), 6) AS gini
      FROM (
        SELECT key, c,
               row_number() OVER (ORDER BY c ASC, key ASC) AS i,
               row_number() OVER (ORDER BY c DESC, key ASC) AS ri
        FROM (SELECT {col} AS key, count(*) AS c FROM lineitem GROUP BY 1) t
      ) r
"""

register(
    "skew_key_diagnosis",
    _skew_key_diagnosis,
    "\nUNION ALL\n".join(
        _SKEW_COL_SQL.format(col=c) for c in ["l_orderkey", "l_partkey", "l_suppkey"]
    )
    + "\nORDER BY key_col",
)
