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
