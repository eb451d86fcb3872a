"""Spark 4 SQL-surface features: native recursive CTEs and SQL scripting.

Two capabilities that used to force driver-side Python loops (the iterative
operators in ``operators/graph.py`` pre-date native recursion) now run
entirely inside the SQL engine:

- ``WITH RECURSIVE`` (Spark 4.0+): set-based iteration planned by Catalyst —
  each step is a distributed join/union, state is a DataFrame, no
  driver-side loop or localCheckpoint bookkeeping. The oracle runs the
  IDENTICAL query text in DuckDB, which is the strongest parity statement
  in the registry: same SQL, two engines, hash-equal output.
- SQL scripting (Spark 4.0+, ``spark.sql.scripting.enabled``): BEGIN/END
  blocks with DECLARE/WHILE/SET — procedural control flow executed on the
  driver but with every statement a full distributed query. The scale story
  is unchanged: the loop below iterates O(log n) times over 1-row state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources import read_table
from .registry import register

# Binary-tree hierarchy derived from the 25-row nation table:
# parent(n) = (n-1)/2, root 0 — small by construction (recursion depth ~5),
# but the recursive-CTE plan shape (anchor ∪ step-join per level) is exactly
# what a 100 TB hierarchy walk (BOM explosion, org rollup) compiles to.
_RECURSIVE_SQL = """
WITH RECURSIVE paths (n_nationkey, n_name, depth, path) AS (
  SELECT n_nationkey, n_name, 0 AS depth, CAST(n_name AS STRING) AS path
  FROM {nation} WHERE n_nationkey = 0
  UNION ALL
  SELECT c.n_nationkey, c.n_name, p.depth + 1,
         p.path || '>' || c.n_name
  FROM {nation} c JOIN paths p ON CAST(floor((c.n_nationkey - 1) / 2) AS INT) = p.n_nationkey
  WHERE c.n_nationkey > 0
)
SELECT n_nationkey, n_name, depth, path
FROM paths ORDER BY n_nationkey
"""


def _recursive_cte_hierarchy(spark, sf_dir):
    """Native WITH RECURSIVE tree walk — no driver-side iteration at all."""
    read_table(spark, sf_dir, "nation").createOrReplaceTempView("__nation_rec")
    # "/" is float division in BOTH engines (Spark and DuckDB), so the
    # parent rule wraps it in floor+cast — identical text, identical tree
    return spark.sql(_RECURSIVE_SQL.format(nation="__nation_rec"))


register(
    "recursive_cte_hierarchy",
    _recursive_cte_hierarchy,
    _RECURSIVE_SQL.format(nation="nation"),
)


def _sql_scripting_doubling(spark, sf_dir):
    """SQL-scripting WHILE loop: count the doublings of 1 cent needed to
    exceed the max order price. The loop state is scalar; every iteration's
    comparison value comes from one distributed agg computed once up front.
    The oracle replays the identical loop as a recursive CTE — same exact
    integer arithmetic, so the result hashes equal."""
    spark.conf.set("spark.sql.scripting.enabled", "true")
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("__orders_scr")
    return spark.sql(
        """
        BEGIN
          DECLARE max_cents BIGINT;
          DECLARE v BIGINT DEFAULT 1;
          DECLARE n INT DEFAULT 0;
          SET max_cents = (SELECT CAST(round(max(o_totalprice) * 100) AS BIGINT) FROM __orders_scr);
          WHILE v <= max_cents DO
            SET v = v * 2;
            SET n = n + 1;
          END WHILE;
          SELECT n AS n_doublings, v AS final_cents, max_cents;
        END
        """
    )


register(
    "sql_scripting_doubling",
    _sql_scripting_doubling,
    """
    WITH RECURSIVE mx AS (
      SELECT CAST(round(max(o_totalprice) * 100) AS BIGINT) AS max_cents FROM orders
    ), loop (v, n) AS (
      SELECT CAST(1 AS BIGINT), 0
      UNION ALL
      SELECT v * 2, n + 1 FROM loop, mx WHERE v <= max_cents
    )
    SELECT CAST(max(n) AS INTEGER) AS n_doublings,
           CAST(max(v) AS BIGINT) AS final_cents,
           (SELECT max_cents FROM mx) AS max_cents
    FROM loop
    """,
)


# --- runtime Bloom-filter semi-join reduction -------------------------------
def _bloom_filtered_join(spark, sf_dir):
    """Selective dim filter -> Catalyst injects might_contain(l_orderkey)
    into the fact scan, shrinking the shuffle to join survivors (see
    operators/skew.bloom_runtime_filtered_join; plan-shape pytest asserts
    the injection). Result is route-invariant, so the oracle is the plain
    join."""
    from ..operators.skew import bloom_runtime_filtered_join

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    j = bloom_runtime_filtered_join(spark, li, orders, "l_orderkey", "o_orderkey")
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)"))
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


register(
    "bloom_runtime_filter_join",
    _bloom_filtered_join,
    """
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT' AND o_orderdate < TIMESTAMP '1996-01-01'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
