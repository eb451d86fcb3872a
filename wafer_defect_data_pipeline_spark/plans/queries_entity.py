r"""Entity-resolution queries over ``customer`` (extension surface §2.9).

Record linkage is the row-identity half of curation the document-dedup
family doesn't cover: same real-world entity, different spellings. Three
queries exercise the classical block → verify → transitively-close pipeline
(operators/entity.py) end to end with exact DuckDB oracles:

- ``entity_matches_blocked``: standard blocking (stable-substring key +
  nation) self-join, Levenshtein ≤ 2 verify.
- ``entity_matches_sorted``: one sorted-neighborhood pass (window sort +
  ``lead()`` comparisons, zero self-join) over the same planted corpus —
  same matches through a different physical shape, so the two queries
  cross-check each other.
- ``entity_clusters``: connected components over the verified pairs →
  per-entity membership summary (recursive-CTE oracle, the
  dedup_cluster_assignment pattern).

Planted fixtures: every 20th customer gains a copy with one corrupted
NAME character (position 11 → 'X'), every 40th a second copy corrupted at
position 10 → 'Z'. Base~v1 and base~v2 are Levenshtein 1, v1~v2 is 2, so
clusters of size 3 exercise transitivity; the blocking key
(nation, last-6-chars-of-name) and the SNM sort key (same substring) are
untouched by both corruptions — the key-design discipline blocking lives
on. Levenshtein is integer-exact, so these oracles have no float tolerance
at all.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.entity import (
    blocking_pairs,
    multipass_sorted_neighborhood_pairs,
    resolve_entities,
    sorted_neighborhood_pairs,
)
from ..sources import read_table
from .registry import register


def _planted_corpus(spark, sf_dir):
    """customer ∪ one-typo copies (pos 11→'X' each 20th, pos 10→'Z' each 40th)."""
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nk"),
    )
    v1 = c.filter(F.col("id") % 20 == 0).select(
        (F.col("id") + F.lit(1_000_000)).alias("id"),
        F.concat(
            F.substring("name", 1, 10), F.lit("X"), F.expr("substring(name, 12)")
        ).alias("name"),
        "nk",
    )
    v2 = c.filter(F.col("id") % 40 == 0).select(
        (F.col("id") + F.lit(2_000_000)).alias("id"),
        F.concat(
            F.substring("name", 1, 9), F.lit("Z"), F.expr("substring(name, 11)")
        ).alias("name"),
        "nk",
    )
    return c.unionByName(v1).unionByName(v2)


_CORPUS_SQL = """
      SELECT c_custkey AS id, c_name AS name, c_nationkey AS nk FROM customer
      UNION ALL
      SELECT c_custkey + 1000000,
             substring(c_name, 1, 10) || 'X' || substring(c_name, 12),
             c_nationkey
      FROM customer WHERE c_custkey % 20 = 0
      UNION ALL
      SELECT c_custkey + 2000000,
             substring(c_name, 1, 9) || 'Z' || substring(c_name, 11),
             c_nationkey
      FROM customer WHERE c_custkey % 40 = 0
"""

_PAIRS_SQL = f"""
    WITH corpus AS ({_CORPUS_SQL}
    ), keyed AS (
      SELECT id, name, nk, substring(name, 13, 6) AS bk FROM corpus
    ), pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             CAST(levenshtein(a.name, b.name) AS INT) AS lev_dist
      FROM keyed a JOIN keyed b
        ON a.nk = b.nk AND a.bk = b.bk AND a.id < b.id
      WHERE levenshtein(a.name, b.name) <= 2
    )
"""


def _matches_blocked(spark, sf_dir):
    """Blocked + verified match pairs.

    Blocking key = (nation, name[13:19)) — the name's tail, which neither
    planted corruption touches. One shuffle on the key; the Levenshtein
    verify runs inside the joined filter so only matches leave the join.
    """
    corpus = _planted_corpus(spark, sf_dir)
    pairs = blocking_pairs(
        corpus,
        "id",
        "name",
        block_cols=[F.col("nk"), F.substring("name", 13, 6)],
        max_distance=2,
    )
    return pairs.orderBy("id_a", "id_b")


register(
    "entity_matches_blocked",
    _matches_blocked,
    _PAIRS_SQL + "    SELECT id_a, id_b, lev_dist FROM pairs ORDER BY id_a, id_b",
)


def _matches_sorted(spark, sf_dir):
    """One sorted-neighborhood pass (w=2) over the same planted corpus.

    Sort key = the same stable name tail the blocking query keys on; the
    window partitions on nation so the sort never serializes. Each record
    compares against its next two neighbours via ``lead()`` — a pure window
    projection, no self-join, which is the SNM trade: linear comparisons
    for a recall bound of (cluster must be adjacent in sort order). The
    planted triples ARE adjacent (identical sort key, distinct names), so
    this pass finds exactly the blocked query's pairs here — the two
    queries cross-check each other's physical strategies.
    """
    corpus = _planted_corpus(spark, sf_dir)
    pairs = sorted_neighborhood_pairs(
        corpus,
        "id",
        "name",
        partition_col="nk",
        sort_col=F.substring("name", 13, 6),
        window=2,
        max_distance=2,
    )
    return pairs.orderBy("id_a", "id_b")


register(
    "entity_matches_sorted",
    _matches_sorted,
    f"""
    WITH corpus AS ({_CORPUS_SQL}
    ), keyed AS (
      SELECT id, name, nk, substring(name, 13, 6) AS sk FROM corpus
    ), led AS (
      SELECT nk, id, name,
             lead(id, 1) OVER w AS id1, lead(name, 1) OVER w AS name1,
             lead(id, 2) OVER w AS id2, lead(name, 2) OVER w AS name2
      FROM keyed WINDOW w AS (PARTITION BY nk ORDER BY sk, name, id)
    ), cand AS (
      SELECT id, name, id1 AS idj, name1 AS namej FROM led WHERE id1 IS NOT NULL
      UNION ALL
      SELECT id, name, id2, name2 FROM led WHERE id2 IS NOT NULL
    )
    SELECT DISTINCT least(id, idj) AS id_a, greatest(id, idj) AS id_b,
           CAST(levenshtein(name, namej) AS INT) AS lev_dist
    FROM cand WHERE levenshtein(name, namej) <= 2
    ORDER BY id_a, id_b
    """,
)


def _matches_multipass(spark, sf_dir):
    """Multi-pass SNM: union of a raw-name pass and a stable-tail pass.

    The corpus adds a FRONT-corrupted plant (every 50th customer gains a
    copy whose first character becomes 'X') on top of the standard planted
    typos: the raw-name sort teleports those copies away from their twins
    (the documented single-pass SNM failure mode — pytest
    test_entity_snm_misses_front_typo_without_stable_sort_key), while the
    tail-key pass recovers them because the corruption never touches
    name[13:19). Union + one narrow distinct over the verified pairs —
    multi-pass SNM exactly as Hernandez & Stolfo describe it.
    """
    corpus = _planted_corpus(spark, sf_dir)
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nk"),
    )
    front = c.filter(F.col("id") % 50 == 0).select(
        (F.col("id") + F.lit(3_000_000)).alias("id"),
        F.concat(F.lit("X"), F.expr("substring(name, 2)")).alias("name"),
        "nk",
    )
    pairs = multipass_sorted_neighborhood_pairs(
        corpus.unionByName(front),
        "id",
        "name",
        partition_col="nk",
        sort_cols=[F.col("name"), F.substring("name", 13, 6)],
        window=2,
        max_distance=2,
    )
    return pairs.orderBy("id_a", "id_b")


register(
    "entity_matches_multipass",
    _matches_multipass,
    f"""
    WITH corpus AS ({_CORPUS_SQL}
      UNION ALL
      SELECT c_custkey + 3000000, 'X' || substring(c_name, 2), c_nationkey
      FROM customer WHERE c_custkey % 50 = 0
    ), keyed AS (
      SELECT id, name, nk, substring(name, 13, 6) AS sk FROM corpus
    ), ledA AS (
      SELECT nk, id, name,
             lead(id, 1) OVER w AS id1, lead(name, 1) OVER w AS name1,
             lead(id, 2) OVER w AS id2, lead(name, 2) OVER w AS name2
      FROM keyed WINDOW w AS (PARTITION BY nk ORDER BY name, id)
    ), ledB AS (
      SELECT nk, id, name,
             lead(id, 1) OVER w AS id1, lead(name, 1) OVER w AS name1,
             lead(id, 2) OVER w AS id2, lead(name, 2) OVER w AS name2
      FROM keyed WINDOW w AS (PARTITION BY nk ORDER BY sk, name, id)
    ), cand AS (
      SELECT id, name, id1 AS idj, name1 AS namej FROM ledA WHERE id1 IS NOT NULL
      UNION ALL
      SELECT id, name, id2, name2 FROM ledA WHERE id2 IS NOT NULL
      UNION ALL
      SELECT id, name, id1, name1 FROM ledB WHERE id1 IS NOT NULL
      UNION ALL
      SELECT id, name, id2, name2 FROM ledB WHERE id2 IS NOT NULL
    )
    SELECT DISTINCT least(id, idj) AS id_a, greatest(id, idj) AS id_b,
           CAST(levenshtein(name, namej) AS INT) AS lev_dist
    FROM cand WHERE levenshtein(name, namej) <= 2
    ORDER BY id_a, id_b
    """,
)



def _entity_clusters(spark, sf_dir):
    """Per-entity membership summary after transitive closure.

    Match edges (blocked pairs) → connected components (min-label
    propagation, narrow (id,id) rows) → one agg. Only multi-member
    entities are reported: the interesting output of a linkage run is the
    merge list, not the identity mapping of every singleton.
    """
    corpus = _planted_corpus(spark, sf_dir)
    pairs = blocking_pairs(
        corpus,
        "id",
        "name",
        block_cols=[F.col("nk"), F.substring("name", 13, 6)],
        max_distance=2,
    )
    assigned = resolve_entities(corpus, "id", pairs)
    return (
        assigned.groupBy("entity_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max("id").alias("max_member_id"),
        )
        .filter(F.col("n_members") >= 2)
        .orderBy("entity_id")
    )


register(
    "entity_clusters",
    _entity_clusters,
    f"""
    WITH RECURSIVE corpus AS ({_CORPUS_SQL}
    ), keyed AS (
      SELECT id, name, nk, substring(name, 13, 6) AS bk FROM corpus
    ), pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM keyed a JOIN keyed b
        ON a.nk = b.nk AND a.bk = b.bk AND a.id < b.id
      WHERE levenshtein(a.name, b.name) <= 2
    ), edges AS (
      SELECT id_a AS v, id_b AS w FROM pairs UNION SELECT id_b, id_a FROM pairs
    ), reach(v, r) AS (
      SELECT v, v FROM edges
      UNION
      SELECT e.w, reach.r FROM reach JOIN edges e ON e.v = reach.v
    ), comp AS (
      SELECT v AS id, min(r) AS entity_id FROM reach GROUP BY v
    )
    SELECT entity_id,
           CAST(count(*) AS BIGINT) AS n_members,
           max(id) AS max_member_id
    FROM comp
    GROUP BY entity_id HAVING count(*) >= 2
    ORDER BY entity_id
    """,
)


def _golden_records(spark, sf_dir):
    """Survivorship: one canonical record per multi-member entity.

    The merge step after linkage — each entity keeps the min-id member's
    name (master-record rule), the best (max) account balance across
    members, and the merge count. ``min_by`` makes the survivorship rule a
    plain aggregate over the (id, entity_id) assignment joined back to the
    narrow attribute projection — no window, one shuffle on entity_id.
    Planted variants perturb the balance (+10/+20) so the max genuinely
    crosses records, not just duplicates the base value.
    """
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nk"),
        F.col("c_acctbal").alias("bal"),
    )
    v1 = c.filter(F.col("id") % 20 == 0).select(
        (F.col("id") + F.lit(1_000_000)).alias("id"),
        F.concat(
            F.substring("name", 1, 10), F.lit("X"), F.expr("substring(name, 12)")
        ).alias("name"),
        "nk",
        (F.col("bal") + F.lit(10.0)).alias("bal"),
    )
    v2 = c.filter(F.col("id") % 40 == 0).select(
        (F.col("id") + F.lit(2_000_000)).alias("id"),
        F.concat(
            F.substring("name", 1, 9), F.lit("Z"), F.expr("substring(name, 11)")
        ).alias("name"),
        "nk",
        (F.col("bal") + F.lit(20.0)).alias("bal"),
    )
    corpus = c.unionByName(v1).unionByName(v2)
    pairs = blocking_pairs(
        corpus,
        "id",
        "name",
        block_cols=[F.col("nk"), F.substring("name", 13, 6)],
        max_distance=2,
    )
    assigned = resolve_entities(corpus, "id", pairs)
    merged = corpus.join(assigned, on="id")
    return (
        merged.groupBy("entity_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.expr("min_by(name, id)").alias("canonical_name"),
            F.round(F.max("bal"), 2).alias("best_acctbal"),
        )
        .filter(F.col("n_members") >= 2)
        .orderBy("entity_id")
    )


register(
    "entity_golden_records",
    _golden_records,
    """
    WITH RECURSIVE corpus AS (
      SELECT c_custkey AS id, c_name AS name, c_nationkey AS nk, c_acctbal AS bal
      FROM customer
      UNION ALL
      SELECT c_custkey + 1000000,
             substring(c_name, 1, 10) || 'X' || substring(c_name, 12),
             c_nationkey, c_acctbal + 10.0
      FROM customer WHERE c_custkey % 20 = 0
      UNION ALL
      SELECT c_custkey + 2000000,
             substring(c_name, 1, 9) || 'Z' || substring(c_name, 11),
             c_nationkey, c_acctbal + 20.0
      FROM customer WHERE c_custkey % 40 = 0
    ), keyed AS (
      SELECT id, name, nk, substring(name, 13, 6) AS bk FROM corpus
    ), pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM keyed a JOIN keyed b
        ON a.nk = b.nk AND a.bk = b.bk AND a.id < b.id
      WHERE levenshtein(a.name, b.name) <= 2
    ), edges AS (
      SELECT id_a AS v, id_b AS w FROM pairs UNION SELECT id_b, id_a FROM pairs
    ), reach(v, r) AS (
      SELECT v, v FROM edges
      UNION
      SELECT e.w, reach.r FROM reach JOIN edges e ON e.v = reach.v
    ), comp AS (
      SELECT v AS id, min(r) AS entity_id FROM reach GROUP BY v
    )
    SELECT comp.entity_id,
           CAST(count(*) AS BIGINT) AS n_members,
           min_by(corpus.name, corpus.id) AS canonical_name,
           round(max(corpus.bal), 2) AS best_acctbal
    FROM corpus JOIN comp ON corpus.id = comp.id
    GROUP BY comp.entity_id HAVING count(*) >= 2
    ORDER BY comp.entity_id
    """,
)


def _streaming_linkage(spark, sf_dir):
    """Streaming admit-loop linkage; see streaming/dedup.py
    ``run_streaming_entity_linkage``. Day-2 matches exist only through
    day-1's admission into the master-entity snapshot."""
    from ..streaming.dedup import run_streaming_entity_linkage

    return run_streaming_entity_linkage(spark, sf_dir)


def _streaming_linkage_delta(spark, sf_dir):
    """The DELTA-APPEND state-discipline twin
    (streaming/dedup.run_streaming_entity_linkage_delta): same staged days,
    but admitting a batch writes ONLY its own records (O(batch)); the probe
    blocking-joins base ∪ earlier deltas. Records are independent rows, so
    the union IS the master table and the output is identical to the
    rewrite twin — the SAME staged oracle hash-checks both."""
    from ..streaming.dedup import run_streaming_entity_linkage_delta

    return run_streaming_entity_linkage_delta(spark, sf_dir)


# One oracle, two state disciplines (the span/minhash-loop pattern).
_STREAMING_LINKAGE_ORACLE = """
    WITH hist AS (
      SELECT c_custkey AS id, c_name AS name, c_nationkey AS nk FROM customer
    ), b1 AS (
      SELECT c_custkey + 1000000 AS id,
             substring(c_name, 1, 10) || 'X' || substring(c_name, 12) AS name,
             c_nationkey AS nk
      FROM customer WHERE c_custkey % 20 = 0
      UNION ALL
      SELECT c_custkey + 3000000,
             'Customer#' || lpad(CAST(c_custkey + 500000 AS VARCHAR), 9, '0'),
             c_nationkey
      FROM customer WHERE c_custkey % 20 = 10
    ), b2 AS (
      SELECT c_custkey + 4000000 AS id,
             'Customer#Z' || substring(lpad(CAST(c_custkey + 500000 AS VARCHAR), 9, '0'), 2, 8) AS name,
             c_nationkey AS nk
      FROM customer WHERE c_custkey % 20 = 10
      UNION ALL
      SELECT c_custkey + 5000000,
             'Customer#' || lpad(CAST(c_custkey + 600000 AS VARCHAR), 9, '0'),
             c_nationkey
      FROM customer WHERE c_custkey % 20 = 5
    ), idx2 AS (
      SELECT * FROM hist UNION ALL SELECT * FROM b1
    ), p1 AS (
      SELECT b.id AS new_id, i.id AS index_id,
             CAST(levenshtein(b.name, i.name) AS INT) AS lev_dist
      FROM b1 b JOIN hist i
        ON b.nk = i.nk AND substring(b.name, 13, 6) = substring(i.name, 13, 6)
      WHERE levenshtein(b.name, i.name) <= 2
    ), p2 AS (
      SELECT b.id AS new_id, i.id AS index_id,
             CAST(levenshtein(b.name, i.name) AS INT) AS lev_dist
      FROM b2 b JOIN idx2 i
        ON b.nk = i.nk AND substring(b.name, 13, 6) = substring(i.name, 13, 6)
      WHERE levenshtein(b.name, i.name) <= 2
    )
    SELECT * FROM (SELECT * FROM p1 UNION ALL SELECT * FROM p2) t
    ORDER BY new_id, index_id
    """

register(
    "entity_streaming_linkage",
    _streaming_linkage,
    _STREAMING_LINKAGE_ORACLE,
)

register(
    "entity_streaming_linkage_delta",
    _streaming_linkage_delta,
    _STREAMING_LINKAGE_ORACLE,
)


def _streaming_linkage_restart(spark, sf_dir):
    """The RESTART drill for the entity-linkage admit loop
    (streaming/dedup.run_streaming_entity_linkage_delta_restart): same
    staged days and per-batch body as the delta twin, but each day runs in
    its own query lifetime — the DeltaManifest is rebuilt from its durable
    transaction log between days and Spark's checkpointLocation skips the
    processed file. Output is bit-equal; the SAME staged oracle hash-checks
    the recovery path."""
    from ..streaming.dedup import run_streaming_entity_linkage_delta_restart

    return run_streaming_entity_linkage_delta_restart(spark, sf_dir)


register(
    "entity_streaming_linkage_restart",
    _streaming_linkage_restart,
    _STREAMING_LINKAGE_ORACLE,
)


def _incremental_clusters(spark, sf_dir):
    """Day-2 entity maintenance WITHOUT re-clustering history: day 1
    resolves base+v1 (blocking + CC), day 2's v2 records arrive and only
    PROBE the admitted index (blocking_probe); merge_components folds the
    probe edges into the standing assignment via graph contraction — CC
    re-runs over one node per touched component, never over history. The
    oracle is the FULL RECOMPUTE over the complete corpus (the same
    recursive CTE as entity_clusters): hash-equality proves incremental
    maintenance reproduces from-scratch clustering exactly, min-id names
    included.
    """
    from ..operators.entity import blocking_probe
    from ..operators.graph import merge_components

    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nk"),
    )
    v1 = c.filter(F.col("id") % 20 == 0).select(
        (F.col("id") + F.lit(1_000_000)).alias("id"),
        F.concat(
            F.substring("name", 1, 10), F.lit("X"), F.expr("substring(name, 12)")
        ).alias("name"),
        "nk",
    )
    v2 = c.filter(F.col("id") % 40 == 0).select(
        (F.col("id") + F.lit(2_000_000)).alias("id"),
        F.concat(
            F.substring("name", 1, 9), F.lit("Z"), F.expr("substring(name, 11)")
        ).alias("name"),
        "nk",
    )
    day1 = c.unionByName(v1)
    pairs1 = blocking_pairs(
        day1,
        "id",
        "name",
        block_cols=[F.col("nk"), F.substring("name", 13, 6)],
        max_distance=2,
    )
    assign1 = resolve_entities(day1, "id", pairs1)

    def block_cols(df):
        return [df["nk"], F.substring(df["name"], 13, 6)]

    probe = blocking_probe(v2, day1, "id", "name", block_cols, max_distance=2)
    merged = merge_components(
        assign1.select("id", F.col("entity_id").alias("component")),
        probe.select(F.col("new_id").alias("id_a"), F.col("index_id").alias("id_b")),
    )
    return (
        merged.groupBy(F.col("component").alias("entity_id"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max("id").alias("max_member_id"),
        )
        .filter(F.col("n_members") >= 2)
        .orderBy("entity_id")
    )


# the oracle is the from-scratch recompute over the FULL corpus — literally
# entity_clusters' registered SQL (same planted corpus, same summary shape)
register(
    "entity_incremental_clusters",
    _incremental_clusters,
    f"""
    WITH RECURSIVE corpus AS ({_CORPUS_SQL}
    ), keyed AS (
      SELECT id, name, nk, substring(name, 13, 6) AS bk FROM corpus
    ), pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM keyed a JOIN keyed b
        ON a.nk = b.nk AND a.bk = b.bk AND a.id < b.id
      WHERE levenshtein(a.name, b.name) <= 2
    ), edges AS (
      SELECT id_a AS v, id_b AS w FROM pairs UNION SELECT id_b, id_a FROM pairs
    ), reach(v, r) AS (
      SELECT v, v FROM edges
      UNION
      SELECT e.w, reach.r FROM reach JOIN edges e ON e.v = reach.v
    ), comp AS (
      SELECT v AS id, min(r) AS entity_id FROM reach GROUP BY v
    )
    SELECT entity_id,
           CAST(count(*) AS BIGINT) AS n_members,
           max(id) AS max_member_id
    FROM comp
    GROUP BY entity_id HAVING count(*) >= 2
    ORDER BY entity_id
    """,
)


def _fs_pattern_and_params(spark, sf_dir):
    """Shared FS estimation dataflow: (pattern table with responsibilities,
    one-row learned-parameter frame) — see ``entity_match_weights`` for the
    full design notes. Split out so the scoring query reuses the exact
    same learned parameters the weights query reports."""
    from ..operators.sampling import _hash_frac

    corpus = _planted_corpus(spark, sf_dir)
    cnt = corpus.agg(F.count(F.lit(1)).alias("__n"))
    sampled = (
        corpus.crossJoin(F.broadcast(cnt))
        .filter(
            _hash_frac(F.col("id"), "fs:")
            < F.least(F.lit(1.0), F.lit(4000.0) / F.col("__n"))
        )
        .select("id", "name", "nk")
    )
    a = sampled.select(F.col("nk"), F.col("id").alias("id_a"), F.col("name").alias("na"))
    b = sampled.select(F.col("nk"), F.col("id").alias("id_b"), F.col("name").alias("nb"))
    pats = (
        a.join(b, on="nk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            (F.levenshtein("na", "nb") <= 2).cast("int").alias("g_name"),
            (F.substring("na", 13, 6) == F.substring("nb", 13, 6))
            .cast("int")
            .alias("g_tail"),
        )
        .groupBy("g_name", "g_tail")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    p0, m0, u0 = 0.05, 0.9, 0.1

    def lik(g, m):
        return F.when(F.col(g) == 1, F.lit(m)).otherwise(F.lit(1.0 - m))

    r = (F.lit(p0) * lik("g_name", m0) * lik("g_tail", m0)) / (
        F.lit(p0) * lik("g_name", m0) * lik("g_tail", m0)
        + F.lit(1.0 - p0) * lik("g_name", u0) * lik("g_tail", u0)
    )
    e = pats.withColumn("r", r)
    m_step = e.agg(
        (F.sum(F.col("n_pairs") * F.col("r")) / F.sum("n_pairs")).alias("p1"),
        (
            F.sum(F.col("n_pairs") * F.col("r") * F.col("g_name"))
            / F.sum(F.col("n_pairs") * F.col("r"))
        ).alias("m_name"),
        (
            F.sum(F.col("n_pairs") * F.col("r") * F.col("g_tail"))
            / F.sum(F.col("n_pairs") * F.col("r"))
        ).alias("m_tail"),
        (
            F.sum(F.col("n_pairs") * (1 - F.col("r")) * F.col("g_name"))
            / F.sum(F.col("n_pairs") * (1 - F.col("r")))
        ).alias("u_name"),
        (
            F.sum(F.col("n_pairs") * (1 - F.col("r")) * F.col("g_tail"))
            / F.sum(F.col("n_pairs") * (1 - F.col("r")))
        ).alias("u_tail"),
    )
    return e, m_step


def _fs_term(g, m, u):
    return F.when(F.col(g) == 1, F.log(F.col(m) / F.col(u))).otherwise(
        F.log((1 - F.col(m)) / (1 - F.col(u)))
    )


def _match_weights(spark, sf_dir):
    """Fellegi-Sunter probabilistic linkage: agreement-pattern weights
    after ONE EM step — the Splink-style scoring layer on top of the
    deterministic blocking the rest of the family uses.

    Candidates block on nation ALONE (a deliberately loose key, so the
    pattern table sees real non-matches, not just the planted pairs);
    each pair reduces to a 2-field agreement vector — names within
    Levenshtein 2, and name-tail equality. The E-step's responsibility is
    a closed-form function of the pattern under fixed priors
    (p=0.05, m=0.9, u=0.1), the M-step re-estimates (p, m_j, u_j) as
    count-weighted averages (one agg over FOUR pattern rows), and the
    reported pattern weight is the post-update log-likelihood ratio.
    Everything after the blocked join is arithmetic over a 4-row table,
    so the oracle replays it exactly (6dp rounds at the read-out only —
    inputs are integer counts and literal priors, deterministic in both
    engines). Scale: weight ESTIMATION runs on a deterministic md5
    sample with a fixed ~4000-row budget — the loose block is quadratic
    in block size, so the corpus-size-independent sample is what makes
    this query a constant-cost estimation step at ANY scale (the
    production pattern: learn (m, u, p) on a sample, score everything
    with the learned weights). The sample rate is derived in-plan from
    one broadcast count — no driver readout — and the oracle derives the
    same rate from the same count.
    """
    e, m_step = _fs_pattern_and_params(spark, sf_dir)
    return (
        e.crossJoin(F.broadcast(m_step))
        .select(
            "g_name",
            "g_tail",
            "n_pairs",
            (F.round("r", 6) + F.lit(0.0)).alias("resp"),
            (
                F.round(
                    _fs_term("g_name", "m_name", "u_name")
                    + _fs_term("g_tail", "m_tail", "u_tail"),
                    6,
                )
                + F.lit(0.0)
            ).alias("match_weight"),
            (F.round("p1", 6) + F.lit(0.0)).alias("p_match"),
        )
        .orderBy("g_name", "g_tail")
    )


# the shared learn-on-sample chain (corpus -> sample -> patterns ->
# E-step -> M-step), reused by the weights and scoring oracles
_FS_LEARN_SQL = f"""corpus AS ({_CORPUS_SQL}
    ), sampled AS MATERIALIZED (
      SELECT id, name, nk FROM corpus
      WHERE CAST(concat('0x', substring(md5(concat('fs:', CAST(id AS VARCHAR))), 1, 8)) AS BIGINT)
            / 4294967296.0
            < least(1.0, 4000.0 / (SELECT count(*) FROM corpus))
    ), pats AS MATERIALIZED (
      SELECT CASE WHEN levenshtein(a.name, b.name) <= 2 THEN 1 ELSE 0 END AS g_name,
             CASE WHEN substring(a.name, 13, 6) = substring(b.name, 13, 6) THEN 1 ELSE 0 END AS g_tail,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM sampled a JOIN sampled b ON a.nk = b.nk AND a.id < b.id
      GROUP BY 1, 2
    ), e AS MATERIALIZED (
      SELECT *,
             (0.05 * (CASE WHEN g_name = 1 THEN 0.9 ELSE 0.1 END)
                   * (CASE WHEN g_tail = 1 THEN 0.9 ELSE 0.1 END))
             / (0.05 * (CASE WHEN g_name = 1 THEN 0.9 ELSE 0.1 END)
                     * (CASE WHEN g_tail = 1 THEN 0.9 ELSE 0.1 END)
                + 0.95 * (CASE WHEN g_name = 1 THEN 0.1 ELSE 0.9 END)
                       * (CASE WHEN g_tail = 1 THEN 0.1 ELSE 0.9 END)) AS r
      FROM pats
    ), m AS MATERIALIZED (
      SELECT sum(n_pairs * r) / sum(n_pairs) AS p1,
             sum(n_pairs * r * g_name) / sum(n_pairs * r) AS m_name,
             sum(n_pairs * r * g_tail) / sum(n_pairs * r) AS m_tail,
             sum(n_pairs * (1 - r) * g_name) / sum(n_pairs * (1 - r)) AS u_name,
             sum(n_pairs * (1 - r) * g_tail) / sum(n_pairs * (1 - r)) AS u_tail
      FROM e
    )"""

register(
    "entity_match_weights",
    _match_weights,
    f"""
    WITH {_FS_LEARN_SQL}
    SELECT CAST(g_name AS INT) AS g_name, CAST(g_tail AS INT) AS g_tail, n_pairs,
           round(r, 6) + 0.0 AS resp,
           round(CASE WHEN g_name = 1 THEN ln(m_name / u_name)
                      ELSE ln((1 - m_name) / (1 - u_name)) END
               + CASE WHEN g_tail = 1 THEN ln(m_tail / u_tail)
                      ELSE ln((1 - m_tail) / (1 - u_tail)) END, 6) + 0.0 AS match_weight,
           round(p1, 6) + 0.0 AS p_match
    FROM e CROSS JOIN m
    ORDER BY g_name, g_tail
    """,
)


def _match_scores(spark, sf_dir):
    """The score-everything half of learn-on-sample FS linkage: the learned
    (p, m_j, u_j) broadcast onto every TIGHT-blocked candidate pair, each
    scored with its agreement pattern's log-likelihood-ratio weight and
    the Bayes posterior (prior odds from the learned p, times the
    field-ratio product). The tight block (nation + name tail) keeps the
    scored pair set linear while estimation already amortized the loose
    exploration — exactly how a production linkage run splits the two
    costs. The oracle replays learn + score end to end; the parameters
    are unrounded in-plan (deterministic doubles from identical integer
    counts), rounds happen only at the read-out.
    """
    _e, m_step = _fs_pattern_and_params(spark, sf_dir)
    corpus = _planted_corpus(spark, sf_dir)
    a = corpus.select(
        F.col("nk"),
        F.substring("name", 13, 6).alias("bk"),
        F.col("id").alias("id_a"),
        F.col("name").alias("na"),
    )
    b = corpus.select(
        F.col("nk"),
        F.substring("name", 13, 6).alias("bk"),
        F.col("id").alias("id_b"),
        F.col("name").alias("nb"),
    )
    pairs = (
        a.join(b, on=["nk", "bk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (F.levenshtein("na", "nb") <= 2).cast("int").alias("g_name"),
            (F.substring("na", 13, 6) == F.substring("nb", 13, 6))
            .cast("int")
            .alias("g_tail"),
        )
    )
    w = _fs_term("g_name", "m_name", "u_name") + _fs_term("g_tail", "m_tail", "u_tail")
    log_odds = F.log(F.col("p1") / (1 - F.col("p1"))) + w
    posterior = F.lit(1.0) / (F.lit(1.0) + F.exp(-log_odds))
    return (
        pairs.crossJoin(F.broadcast(m_step))
        .select(
            "id_a",
            "id_b",
            "g_name",
            (F.round(w, 6) + F.lit(0.0)).alias("match_weight"),
            (F.round(posterior, 6) + F.lit(0.0)).alias("posterior"),
        )
        .orderBy("id_a", "id_b")
    )


register(
    "entity_match_scores",
    _match_scores,
    f"""
    WITH {_FS_LEARN_SQL}, scored AS (
      SELECT a.id AS id_a, b.id AS id_b,
             CASE WHEN levenshtein(a.name, b.name) <= 2 THEN 1 ELSE 0 END AS g_name,
             CASE WHEN substring(a.name, 13, 6) = substring(b.name, 13, 6) THEN 1 ELSE 0 END AS g_tail
      FROM corpus a JOIN corpus b
        ON a.nk = b.nk AND substring(a.name, 13, 6) = substring(b.name, 13, 6)
       AND a.id < b.id
    ), weighted AS (
      SELECT id_a, id_b, g_name,
             (CASE WHEN g_name = 1 THEN ln(m_name / u_name)
                   ELSE ln((1 - m_name) / (1 - u_name)) END
              + CASE WHEN g_tail = 1 THEN ln(m_tail / u_tail)
                     ELSE ln((1 - m_tail) / (1 - u_tail)) END) AS w,
             ln(p1 / (1 - p1)) AS prior
      FROM scored CROSS JOIN m
    )
    SELECT id_a, id_b, CAST(g_name AS INT) AS g_name,
           round(w, 6) + 0.0 AS match_weight,
           round(1.0 / (1.0 + exp(-(prior + w))), 6) + 0.0 AS posterior
    FROM weighted ORDER BY id_a, id_b
    """,
)
