"""Sketch queries: KMV distinct-count and Count-Min frequency estimates
(extension surface §2.9 — see operators/sketches.py for the scale design).

Both sketches are md5-deterministic and relational, so the DRIVER ORACLE
CHECKS THE ESTIMATES THEMSELVES — not just row counts — by replaying the
identical hash arithmetic in SQL. Accuracy against exact counts is covered
in pytest (the estimate/exact comparison is a property, not a fixed value).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.partitioning import fan_out
from ..operators.sketches import cms_build, cms_point_estimate, kmv_distinct_estimate
from ..sources import read_table
from .registry import register

_POW60 = "1152921504606846976.0"  # 2^60 — the hash normalization constant


# --- KMV distinct-count estimate -------------------------------------------
def _kmv(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    return (
        kmv_distinct_estimate(li, "l_returnflag", "l_partkey", k=64)
        .select("l_returnflag", F.round("est_distinct", 6).alias("est_distinct"))
        .orderBy("l_returnflag")
    )


register(
    "sketch_kmv_distinct",
    _kmv,
    f"""
    WITH h AS (
      SELECT DISTINCT l_returnflag,
             CAST(concat('0x', substring(md5('kmv:' || CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
      FROM lineitem
    ), ranked AS (
      SELECT l_returnflag, hv,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY hv) AS r,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM h
    )
    SELECT l_returnflag,
           round(CASE WHEN n < 64 THEN CAST(n AS DOUBLE)
                 ELSE 63.0 / (CAST(hv AS DOUBLE) / {_POW60}) END, 6) AS est_distinct
    FROM ranked WHERE r = least(64, n)
    ORDER BY l_returnflag
    """,
)


# --- Count-Min point estimates ---------------------------------------------
_PROBE_TERMS = ["join", "hash", "scan", "filter", "data", "the", "zzz_unseen_token"]


def _cms(spark, sf_dir):
    # fan_out: tokenize + depth x md5 per token is a CPU-bound expansion
    # that otherwise runs at the (single-file) scan's parallelism — same
    # guard as minhash_signatures / _gram_positions (r15, guide §2.5)
    d = fan_out(
        read_table(spark, sf_dir, "documents")
        .filter(F.trim("text") != "")
        .select("text")
    )
    tok = d.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("t")
    )
    sketch = cms_build(tok, "t", depth=4, width=256)
    probes = spark.createDataFrame([(t,) for t in _PROBE_TERMS], "probe string")
    return cms_point_estimate(sketch, probes, "probe", depth=4, width=256).orderBy("probe")


register(
    "sketch_cms_frequency",
    _cms,
    """
    WITH tok AS (
      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t
      FROM documents WHERE trim(text) <> ''
    ),
    cells AS (
      SELECT rr.r,
             CAST(concat('0x', substring(md5('cms' || CAST(rr.r AS VARCHAR) || ':' || t), 1, 15)) AS BIGINT) % 256 AS b,
             CAST(count(*) AS BIGINT) AS cnt
      FROM tok CROSSJOINPLACEHOLDER
      GROUP BY 1, 2
    ),
    probes AS (
      SELECT unnest(['join', 'hash', 'scan', 'filter', 'data', 'the', 'zzz_unseen_token']) AS probe
    ),
    pb AS (
      SELECT probe, rr.r,
             CAST(concat('0x', substring(md5('cms' || CAST(rr.r AS VARCHAR) || ':' || probe), 1, 15)) AS BIGINT) % 256 AS b
      FROM probes CROSSJOINPLACEHOLDER
    )
    SELECT pb.probe, CAST(min(coalesce(cells.cnt, 0)) AS BIGINT) AS est_count
    FROM pb LEFT JOIN cells ON pb.r = cells.r AND pb.b = cells.b
    GROUP BY pb.probe ORDER BY pb.probe
    """.replace("CROSSJOINPLACEHOLDER", "CROSS JOIN (SELECT unnest(range(4)) AS r) rr"),
)


# --- CMS inner product: price a join without running it ---------------------
def _cms_join_size(spark, sf_dir):
    """Estimate |lineitem JOIN orders| from two key sketches, next to
    the exact answer. Width 2^18: the inner-product estimate carries
    ADDITIVE error ~n1*n2/width, so the width must scale with the
    PRODUCT of stream sizes (unlike point queries) for a usable estimate
    — still a constant-size sketch, just a wider constant — the one-sided overestimate and its tightness are
    what the driver checks (both sides replay identical arithmetic)."""
    from ..operators.sketches import cms_build, cms_inner_product

    li = read_table(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    o = read_table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k"))
    sk_li = cms_build(li, "k", depth=4, width=262144)
    sk_o = cms_build(o, "k", depth=4, width=262144)
    est = cms_inner_product(sk_li, sk_o)
    exact = (
        li.join(o, "k").agg(F.count(F.lit(1)).alias("exact_join_size"))
    )
    return est.crossJoin(exact).select(
        F.col("est_join_size").cast("bigint").alias("est_join_size"),
        F.col("exact_join_size").cast("bigint").alias("exact_join_size"),
    )


register(
    "sketch_cms_join_size",
    _cms_join_size,
    """
    WITH rr AS (SELECT unnest(range(4)) AS r),
    c1 AS (
      SELECT rr.r,
             CAST(concat('0x', substring(md5('cms' || CAST(rr.r AS VARCHAR) || ':' || CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) % 262144 AS b,
             CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem CROSS JOIN rr GROUP BY 1, 2
    ),
    c2 AS (
      SELECT rr.r,
             CAST(concat('0x', substring(md5('cms' || CAST(rr.r AS VARCHAR) || ':' || CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) % 262144 AS b,
             CAST(count(*) AS BIGINT) AS cnt
      FROM orders CROSS JOIN rr GROUP BY 1, 2
    ),
    ip AS (
      SELECT c1.r, sum(c1.cnt * c2.cnt) AS ip
      FROM c1 JOIN c2 ON c1.r = c2.r AND c1.b = c2.b
      GROUP BY c1.r
    ),
    est AS (SELECT CAST(min(ip) AS BIGINT) AS est_join_size FROM ip),
    ex AS (
      SELECT CAST(count(*) AS BIGINT) AS exact_join_size
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    )
    SELECT est.est_join_size, ex.exact_join_size FROM est CROSS JOIN ex
    """,
)


# --- KMV threshold pruning: sketch-gate the expensive exact phase -----------
def _kmv_threshold_prune(spark, sf_dir):
    """Two-phase hot-key profiling (VERDICT r4 optional-surface item):
    phase 1 estimates distinct orders per part with the KMV sketch
    (k=32 longs of state per group, never a raw count-distinct shuffle
    for the cold 96% of keys); phase 2 builds the full exact profile
    (exact distinct + line count) ONLY for parts whose estimate clears
    ``T / 1.5`` — a 1.5x safety margin over KMV's ~1/sqrt(k) relative
    error — then filters on the exact count. At 100 TB this is the
    sketch-gate-then-materialize pattern: the expensive pass touches the
    ~4% survivor keys via a broadcast semi-join. Approximate-by-
    construction in the gate only (pytest asserts zero false pruning vs
    the direct computation at test scale); the oracle replays the exact
    same two-phase arithmetic, so the driver hash-checks estimates AND
    exact profiles."""
    T = 40
    li = read_table(spark, sf_dir, "lineitem")
    est = kmv_distinct_estimate(li, "l_partkey", "l_orderkey", k=32)
    survivors = est.filter(F.col("est_distinct") >= T / 1.5)
    hot = li.join(F.broadcast(survivors), "l_partkey")
    return (
        hot.groupBy("l_partkey", "est_distinct")
        .agg(
            F.countDistinct("l_orderkey").alias("distinct_orders"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .filter(F.col("distinct_orders") >= T)
        .select(
            "l_partkey",
            F.round("est_distinct", 6).alias("est_distinct"),
            "distinct_orders",
            "n_lines",
        )
        .orderBy("l_partkey")
    )


register(
    "sketch_kmv_threshold_prune",
    _kmv_threshold_prune,
    f"""
    WITH h AS (
      SELECT DISTINCT l_partkey,
             CAST(concat('0x', substring(md5('kmv:' || CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
      FROM lineitem
    ), ranked AS (
      SELECT l_partkey, hv,
             row_number() OVER (PARTITION BY l_partkey ORDER BY hv) AS r,
             count(*) OVER (PARTITION BY l_partkey) AS n
      FROM h
    ), est AS (
      SELECT l_partkey,
             CASE WHEN n < 32 THEN CAST(n AS DOUBLE)
                  ELSE 31.0 / (CAST(hv AS DOUBLE) / {_POW60}) END AS est_distinct
      FROM ranked WHERE r = least(32, n)
    ), surv AS (SELECT * FROM est WHERE est_distinct >= 40 / 1.5),
    agg AS (
      SELECT li.l_partkey, surv.est_distinct,
             count(DISTINCT li.l_orderkey) AS distinct_orders,
             count(*) AS n_lines
      FROM lineitem li JOIN surv ON li.l_partkey = surv.l_partkey
      GROUP BY 1, 2
    )
    SELECT l_partkey, round(est_distinct, 6) AS est_distinct,
           CAST(distinct_orders AS BIGINT) AS distinct_orders,
           CAST(n_lines AS BIGINT) AS n_lines
    FROM agg WHERE distinct_orders >= 40
    ORDER BY l_partkey
    """,
)


# --- Misra-Gries heavy hitters ---------------------------------------------
def _mg_heavy_hitters(spark, sf_dir):
    """Deterministic two-level Misra-Gries over document terms (k=20,
    8 segments keyed by doc_id hash). The oracle replays the identical
    md5 segmentation + threshold-subtract arithmetic, so the driver checks
    the sketch VALUES; the under-count bound vs exact frequencies is the
    pytest property."""
    from ..operators.sketches import misra_gries_summary

    d = fan_out(read_table(spark, sf_dir, "documents").select("doc_id", "text"))
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
    )
    return (
        misra_gries_summary(tok, "term", "doc_id", k=20, n_groups=8)
        .select(
            "term",
            F.col("mg_estimate").cast("bigint").alias("mg_estimate"),
            F.col("max_deficit").cast("bigint").alias("max_deficit"),
        )
        .orderBy(F.desc("mg_estimate"), F.asc("term"))
    )


register(
    "sketch_mg_heavy_hitters",
    _mg_heavy_hitters,
    r"""
    WITH tok AS (
      SELECT CAST(concat('0x', substring(md5('mg:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 8 AS g,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents
    ),
    counts AS (SELECT g, term, count(*) AS c FROM tok GROUP BY g, term),
    ranked AS (
      SELECT g, term, c,
             row_number() OVER (PARTITION BY g ORDER BY c DESC, term) AS r
      FROM counts
    ),
    thetas AS (SELECT g, c AS theta FROM ranked WHERE r = 21),
    level1 AS (
      SELECT ranked.term, ranked.c - coalesce(thetas.theta, 0) AS res
      FROM ranked LEFT JOIN thetas USING (g)
      WHERE ranked.c > coalesce(thetas.theta, 0)
    ),
    merged AS (SELECT term, sum(res) AS s FROM level1 GROUP BY term),
    mranked AS (
      SELECT term, s, row_number() OVER (ORDER BY s DESC, term) AS r FROM merged
    ),
    mtheta AS (SELECT coalesce(max(CASE WHEN r = 21 THEN s END), 0) AS mt FROM mranked),
    dsum AS (SELECT coalesce(sum(theta), 0) AS d FROM thetas)
    SELECT term, CAST(s - mt AS BIGINT) AS mg_estimate,
           CAST(d + mt AS BIGINT) AS max_deficit
    FROM mranked, mtheta, dsum
    WHERE s > mt
    ORDER BY mg_estimate DESC, term
    """,
)
