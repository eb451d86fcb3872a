"""Sketch queries: KMV distinct-count and Count-Min frequency estimates
(extension surface §2.9 — see operators/sketches.py for the scale design).

Both sketches are md5-deterministic and relational, so the DRIVER ORACLE
CHECKS THE ESTIMATES THEMSELVES — not just row counts — by replaying the
identical hash arithmetic in SQL. Accuracy against exact counts is covered
in pytest (the estimate/exact comparison is a property, not a fixed value).
"""

from __future__ import annotations

from pyspark.sql import functions as F

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
    d = read_table(spark, sf_dir, "documents").filter(F.trim("text") != "")
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
