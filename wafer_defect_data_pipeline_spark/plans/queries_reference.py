"""Reference operator surface (SURVEY.md §2.1-2.5) as oracle-checked queries.

Every projection/filter/aggregation op the reference performs, recast onto
the driver's TPC-H-ish tables so the DuckDB oracle can verify semantics.
Each query names which reference op(s) it exercises.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.derived import non_finite_to_null, ratio
from ..operators.outliers import remove_outliers_by_group
from ..sources import read_table
from .flagship import FLAGSHIP_ORACLE_SQL, flagship
from .registry import register


register("flagship_iqr_summary", flagship, FLAGSHIP_ORACLE_SQL)


# --- P1/P3/P4: equality filter + conjunction + projection ------------------
def _filter_project(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 25))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    )


register(
    "filter_project",
    _filter_project,
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 25
    ORDER BY l_orderkey, l_linenumber
    """,
)


# --- P2: range filter (per-group threshold shape) --------------------------
def _range_filter(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_totalprice") <= 100000.0)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


register(
    "range_filter",
    _range_filter,
    "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice <= 100000.0 ORDER BY o_orderkey",
)


# --- P5: drop-nulls --------------------------------------------------------
def _drop_nulls(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    return (
        d.na.drop("any", subset=["text", "lang"])
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


register(
    "drop_nulls",
    _drop_nulls,
    """
    SELECT doc_id, lang, n_chars FROM documents
    WHERE text IS NOT NULL AND lang IS NOT NULL ORDER BY doc_id
    """,
)


# --- P6/P7: derived ratio with epsilon + inf/NaN->null ---------------------
def _derived_ratio(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.withColumn("price_per_qty", non_finite_to_null(ratio("l_extendedprice", "l_quantity")))
        .select("l_orderkey", "l_linenumber", F.round("price_per_qty", 6).alias("price_per_qty"))
        .orderBy("l_orderkey", "l_linenumber")
    )


register(
    "derived_ratio",
    _derived_ratio,
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / (l_quantity + 1e-6), 6) AS price_per_qty
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)


# --- P8/P9/P11: conditional column init/update + negation ------------------
def _conditional_label(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    is_priority = F.when(
        (F.col("o_orderstatus") == "O") & (F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")),
        F.lit(True),
    ).otherwise(F.lit(False))
    return (
        o.withColumn("is_priority", is_priority)
        .withColumn("is_regular", ~F.col("is_priority"))
        .select("o_orderkey", "is_priority", "is_regular")
        .orderBy("o_orderkey")
    )


register(
    "conditional_label",
    _conditional_label,
    """
    SELECT o_orderkey,
           (o_orderstatus = 'O' AND o_orderpriority IN ('1-URGENT','2-HIGH')) AS is_priority,
           NOT (o_orderstatus = 'O' AND o_orderpriority IN ('1-URGENT','2-HIGH')) AS is_regular
    FROM orders ORDER BY o_orderkey
    """,
)


# --- P10: cast -------------------------------------------------------------
def _cast_cols(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("int").alias("qty_int"),
            F.col("l_linenumber").cast("string").alias("line_str"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


register(
    "cast_columns",
    _cast_cols,
    """
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS INTEGER) AS qty_int,
           CAST(l_linenumber AS VARCHAR) AS line_str
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)


# --- A1: grouped exact quantiles ------------------------------------------
def _grouped_quantiles(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("q1"),
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median"),
            F.round(F.expr("percentile(l_extendedprice, 0.75)"), 4).alias("q3"),
        )
        .orderBy("l_returnflag")
    )


register(
    "grouped_quantiles",
    _grouped_quantiles,
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS q1,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS median,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS q3
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)


# --- A2 (single round, directly observable bounds) -------------------------
def _iqr_bounds_single(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    from ..operators.outliers import iqr_upper_bounds

    b = iqr_upper_bounds(li, "l_returnflag", "l_extendedprice")
    return b.select("l_returnflag", F.round("__ub", 4).alias("upper_bound")).orderBy("l_returnflag")


register(
    "iqr_bounds",
    _iqr_bounds_single,
    """
    SELECT l_returnflag,
           CASE WHEN count(l_extendedprice) < 2
                  OR quantile_cont(l_extendedprice, 0.75) = quantile_cont(l_extendedprice, 0.25)
                THEN NULL
                ELSE round(quantile_cont(l_extendedprice, 0.75)
                     + 1.5 * (quantile_cont(l_extendedprice, 0.75) - quantile_cont(l_extendedprice, 0.25)), 4)
           END AS upper_bound
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)


# --- A3/A4: null counting --------------------------------------------------
def _null_counts(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    per_col = [F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}") for c in d.columns]
    return d.select(*per_col)


register(
    "null_counts",
    _null_counts,
    """
    SELECT CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_doc_id,
           CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_text,
           CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_lang,
           CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_source,
           CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_n_chars
    FROM documents
    """,
)


# --- A5/A6: row count + distinct-sort --------------------------------------
def _distinct_groups(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag").distinct().orderBy("l_returnflag")


register(
    "distinct_sorted",
    _distinct_groups,
    "SELECT DISTINCT l_returnflag FROM lineitem ORDER BY l_returnflag",
)


# --- A7: value_counts (count per value, desc, nulls kept) ------------------
def _value_counts(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc_nulls_first("event_type"))
    )


register(
    "value_counts",
    _value_counts,
    """
    SELECT event_type, count(*) AS cnt FROM events
    GROUP BY event_type ORDER BY cnt DESC, event_type ASC NULLS FIRST
    """,
)


# --- A8: boolean sum -------------------------------------------------------
def _boolean_sum(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("n_finished"),
        F.count(F.lit(1)).alias("n_total"),
    )


register(
    "boolean_sum",
    _boolean_sum,
    """
    SELECT CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
           count(*) AS n_total
    FROM orders
    """,
)


# --- A9: crosstab pivot ----------------------------------------------------
def _crosstab(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .count()
        .na.fill(0, ["F", "O"])
        .orderBy("l_returnflag")
    )


register(
    "crosstab_pivot",
    _crosstab,
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
           CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O"
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)


# --- U1: union -------------------------------------------------------------
def _union_by_name(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    hi = li.filter(F.col("l_quantity") > 45).select("l_orderkey", "l_linenumber", "l_quantity")
    lo = li.filter(F.col("l_quantity") < 5).select("l_quantity", "l_orderkey", "l_linenumber")
    return hi.unionByName(lo).orderBy("l_orderkey", "l_linenumber")


register(
    "union_by_name",
    _union_by_name,
    """
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 45
    UNION ALL
    SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity < 5
    ORDER BY l_orderkey, l_linenumber
    """,
)


# --- full reference pipeline on lineitem (cascade + ratio, row level) ------
def _iqr_cascade_rows(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    out = remove_outliers_by_group(li, "l_returnflag", ["l_extendedprice", "l_quantity"])
    return out.select("l_orderkey", "l_linenumber").orderBy("l_orderkey", "l_linenumber")


register(
    "iqr_cascade_rows",
    _iqr_cascade_rows,
    """
    WITH b1 AS (
      SELECT l_returnflag AS g,
             quantile_cont(l_extendedprice, 0.25) AS q1,
             quantile_cont(l_extendedprice, 0.75) AS q3,
             count(l_extendedprice) AS cnt
      FROM lineitem GROUP BY 1
    ),
    r1 AS (
      SELECT l.* FROM lineitem l JOIN b1 ON l.l_returnflag = b1.g
      WHERE (b1.cnt < 2 OR (b1.q3 - b1.q1) = 0)
         OR l.l_extendedprice <= b1.q3 + 1.5 * (b1.q3 - b1.q1)
    ),
    b2 AS (
      SELECT l_returnflag AS g,
             quantile_cont(l_quantity, 0.25) AS q1,
             quantile_cont(l_quantity, 0.75) AS q3,
             count(l_quantity) AS cnt
      FROM r1 GROUP BY 1
    ),
    r2 AS (
      SELECT r1.* FROM r1 JOIN b2 ON r1.l_returnflag = b2.g
      WHERE (b2.cnt < 2 OR (b2.q3 - b2.q1) = 0)
         OR r1.l_quantity <= b2.q3 + 1.5 * (b2.q3 - b2.q1)
    )
    SELECT l_orderkey, l_linenumber FROM r2 ORDER BY l_orderkey, l_linenumber
    """,
)


# --- M4 relational form: labeling via broadcast mapping join ---------------
def _label_by_join(spark, sf_dir):
    """Same labeling semantics as `conditional_label`, expressed as a
    broadcast join against a mapping dimension (the idiomatic relational
    form of the reference's killer-cluster dict, SURVEY.md §2.6 M4)."""
    o = read_table(spark, sf_dir, "orders")
    mapping = spark.createDataFrame(
        [("1-URGENT",), ("2-HIGH",)], "o_orderpriority string"
    ).withColumn("__hit", F.lit(True))
    out = o.join(F.broadcast(mapping), on="o_orderpriority", how="left")
    flag = (F.col("o_orderstatus") == "O") & F.coalesce(F.col("__hit"), F.lit(False))
    return (
        out.withColumn("is_priority", flag)
        .select("o_orderkey", "is_priority")
        .orderBy("o_orderkey")
    )


register(
    "conditional_label_join",
    _label_by_join,
    """
    SELECT o_orderkey,
           (o_orderstatus = 'O' AND o_orderpriority IN ('1-URGENT','2-HIGH')) AS is_priority
    FROM orders ORDER BY o_orderkey
    """,
)


# --- A2 at scale: approx-percentile IQR cascade (EXACT oracle on the error
# bound: the sketch survivor-count must land within 2% of the exact cascade's,
# and that boolean — computed in Spark — is hash-checked, so the driver sees
# the sketch's accuracy contract, not just that it ran) ----------------------
def _iqr_cascade_approx(spark, sf_dir):
    """Approx-mode cascade vs exact-mode cascade, per group.

    ``percentile_approx`` bounds aggregation-buffer memory (the 100 TB mode
    for A2); its engine-specific sketch values can't hash-match DuckDB, so
    the registered output is ``(group, exact_n_rows, within_tol)`` where
    ``within_tol`` asserts |approx_n - exact_n| <= max(1, 2% of exact_n).
    The oracle replays the exact cascade and the literal TRUE."""
    from ..operators.outliers import remove_outliers_by_group

    li = read_table(spark, sf_dir, "lineitem")
    cols = ["l_extendedprice", "l_quantity"]
    exact_n = (
        remove_outliers_by_group(li, "l_returnflag", cols, mode="exact")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_n_rows"))
    )
    approx_n = (
        remove_outliers_by_group(li, "l_returnflag", cols, mode="approx")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("__approx_n"))
    )
    tol = F.greatest(F.lit(1.0), F.col("exact_n_rows") * F.lit(0.02))
    return (
        exact_n.join(approx_n, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_n_rows",
            (F.abs(F.col("__approx_n") - F.col("exact_n_rows")) <= tol).alias("within_tol"),
        )
        .orderBy("l_returnflag")
    )


register(
    "iqr_cascade_approx",
    _iqr_cascade_approx,
    """
    WITH b1 AS (
      SELECT l_returnflag AS g,
             quantile_cont(l_extendedprice, 0.25) AS q1,
             quantile_cont(l_extendedprice, 0.75) AS q3,
             count(l_extendedprice) AS cnt
      FROM lineitem GROUP BY 1
    ),
    r1 AS (
      SELECT l.* FROM lineitem l JOIN b1 ON l.l_returnflag = b1.g
      WHERE (b1.cnt < 2 OR (b1.q3 - b1.q1) = 0)
         OR l.l_extendedprice <= b1.q3 + 1.5 * (b1.q3 - b1.q1)
    ),
    b2 AS (
      SELECT l_returnflag AS g,
             quantile_cont(l_quantity, 0.25) AS q1,
             quantile_cont(l_quantity, 0.75) AS q3,
             count(l_quantity) AS cnt
      FROM r1 GROUP BY 1
    ),
    r2 AS (
      SELECT r1.* FROM r1 JOIN b2 ON r1.l_returnflag = b2.g
      WHERE (b2.cnt < 2 OR (b2.q3 - b2.q1) = 0)
         OR r1.l_quantity <= b2.q3 + 1.5 * (b2.q3 - b2.q1)
    )
    SELECT l_returnflag, count(*) AS exact_n_rows, TRUE AS within_tol
    FROM r2 GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)


# --- Observation API: metrics from the pass itself --------------------------
def _observed_scan_metrics(spark, sf_dir):
    """Data-quality metrics collected DURING a transformation pass via
    ``df.observe`` — zero extra scan. The reference computes its quality
    report (row count, null count — README.md:115-118) as separate passes
    over the frame; ``observe`` attaches the metrics to the one job that
    does the real work, which at 100 TB is the difference between N scans
    and 1. The observed values are returned as the query result and
    oracle-checked against plain SQL aggregates of the same input.
    """
    from pyspark.sql import Observation

    li = read_table(spark, sf_dir, "lineitem")
    obs = Observation("scan_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("null_qty"),
        F.sum(F.col("l_discount").cast("decimal(18,2)")).alias("sum_discount"),
    )
    # the "real work": a filter+projection written to the noop sink — the
    # metrics piggyback on this single pass
    observed.filter(F.col("l_quantity") > 0).select("l_orderkey", "l_quantity").write.format(
        "noop"
    ).mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["null_qty"], float(m["sum_discount"]))],
        "n_rows bigint, null_qty bigint, sum_discount double",
    ).withColumn("sum_discount", F.round("sum_discount", 2))


register(
    "observed_scan_metrics",
    _observed_scan_metrics,
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_qty,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_discount
    FROM lineitem
    """,
)
