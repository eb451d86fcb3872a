r"""Search-index queries: inverted index build and BM25 ranking.

A curation platform that stores a corpus usually also serves it: the two
classic retrieval structures are an inverted index (term → postings) and a
BM25 ranker over it. Both are pure relational algebra here:

- the posting lists come from one explode + two map-side-combinable aggs
  (term-doc tf, then term totals) — the token rows shuffle once on
  ``(term, doc_id)``, already the smallest shuffle that can count tfs;
- BM25 needs only tiny side tables (per-term document frequencies for the
  query terms, one global (N, avgdl) row) which broadcast onto the per-doc
  tf rows, so the corpus is scanned once and never shuffled whole.

Determinism: per-term score contributions are rounded to 6 decimals and
summed as DECIMAL(18,6), so the Spark and DuckDB totals agree bit-for-bit
regardless of addend order (the repo-wide decimal-sum convention).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import token_count, tokens
from ..sources import read_table
from .registry import register

_TOP_TERMS = 10
_QUERY_TERMS = ["join", "hash", "filter"]
_K1 = 1.2
_B = 0.75


# --- inverted index ---------------------------------------------------------
def _inverted_index(spark, sf_dir):
    """Posting rows (term, df, doc_id, tf) for the top-N terms by corpus tf.

    explode → groupBy(term, doc_id) → groupBy(term): both aggs combine
    map-side. The top-N term table is tiny and broadcasts back onto the
    posting rows — the full posting relation never re-shuffles.
    """
    d = read_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens("text")).alias("term"))
    per = tok.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    tot = per.groupBy("term").agg(
        F.sum("tf").cast("bigint").alias("total_tf"), F.count(F.lit(1)).alias("df")
    )
    top = tot.orderBy(F.desc("total_tf"), "term").limit(_TOP_TERMS)
    return (
        per.join(F.broadcast(top), on="term")
        .select("term", "df", "doc_id", "tf")
        .orderBy("term", "doc_id")
    )


register(
    "text_inverted_index",
    _inverted_index,
    rf"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents
    ), per AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY term, doc_id
    ), tot AS (
      SELECT term, CAST(sum(tf) AS BIGINT) AS total_tf, CAST(count(*) AS BIGINT) AS df
      FROM per GROUP BY term
    ), top AS (
      SELECT term, df FROM tot ORDER BY total_tf DESC, term LIMIT {_TOP_TERMS}
    )
    SELECT per.term, top.df, per.doc_id, per.tf
    FROM per JOIN top ON per.term = top.term
    ORDER BY per.term, per.doc_id
    """,
)


# --- BM25 ranking -----------------------------------------------------------
def _bm25_topk(spark, sf_dir):
    """Top-10 documents by BM25 for a fixed 3-term query.

    Okapi BM25 with k1=1.2, b=0.75 and the +1-smoothed idf
    ``ln((N - df + 0.5) / (df + 0.5) + 1)``. Corpus stats (N, avgdl) and the
    query-term dfs are one-row / |query|-row frames — broadcast joins; the
    only shuffle is the (doc, term) tf aggregation over tokens matching the
    query terms (filtered BEFORE the shuffle, so at 100 TB the exchanged
    rows are proportional to query-term hits, not corpus size).
    """
    d = read_table(spark, sf_dir, "documents")
    lens = d.select("doc_id", token_count("text").cast("double").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    tok = d.select("doc_id", F.explode(tokens("text")).alias("term")).filter(
        F.col("term").isin(_QUERY_TERMS)
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).cast("double").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    contrib = idf * (
        F.col("tf") * (_K1 + 1.0)
        / (F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(df_), on="term")
        .join(F.broadcast(lens), on="doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(contrib, 6).cast("decimal(18,6)").alias("c"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.sum("c").cast("double").alias("bm25"), F.count(F.lit(1)).alias("n_terms_hit"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(10)
    )


register(
    "text_bm25_topk",
    _bm25_topk,
    rf"""
    WITH lens AS (
      SELECT doc_id,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END AS DOUBLE) AS dl
      FROM documents
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_docs, sum(dl) / count(*) AS avgdl FROM lens
    ), tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
      FROM tok WHERE term IN ('join', 'hash', 'filter') GROUP BY doc_id, term
    ), dfs AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc_id,
             CAST(round(ln((stats.n_docs - dfs.df + 0.5) / (dfs.df + 0.5) + 1.0)
                        * tf.tf * ({_K1} + 1.0)
                        / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * lens.dl / stats.avgdl)),
                        6) AS DECIMAL(18,6)) AS c
      FROM tf JOIN dfs ON tf.term = dfs.term
      JOIN lens ON tf.doc_id = lens.doc_id
      CROSS JOIN stats
    )
    SELECT doc_id, CAST(sum(c) AS DOUBLE) AS bm25, CAST(count(*) AS BIGINT) AS n_terms_hit
    FROM scored GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT 10
    """,
)


# --- edit-distance near-dup verify ------------------------------------------
def _editdist_pairs(spark, sf_dir):
    """Blocked Levenshtein near-dup pairs (planted one-char-append copies).

    The character-level complement to token-shingle Jaccard: catches
    near-dups that tokenization hides (punctuation edits, casing noise).
    Blocking on (source, lang) bounds the quadratic verify per block —
    the join is an equi-join on the block key, never a cross join; distance
    runs on a 60-char prefix so per-pair cost is O(60²) regardless of
    document length. Both engines compute the identical native levenshtein.
    """
    d = read_table(spark, sf_dir, "documents")
    copies = (
        d.filter(F.col("doc_id") % 30 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        .withColumn("text", F.concat(F.col("text"), F.lit("!")))
    )
    corpus = d.unionByName(copies).select(
        "source", "lang", "doc_id", F.substring("text", 1, 60).alias("prefix")
    )
    a = corpus.select("source", "lang", F.col("doc_id").alias("id_a"), F.col("prefix").alias("pa"))
    b = corpus.select("source", "lang", F.col("doc_id").alias("id_b"), F.col("prefix").alias("pb"))
    return (
        a.join(b, on=["source", "lang"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("pa", "pb"))
        .filter(F.col("dist") <= 2)
        .select("id_a", "id_b", "dist")
        .orderBy("id_a", "id_b")
    )


register(
    "text_editdist_pairs",
    _editdist_pairs,
    """
    WITH corpus AS (
      SELECT source, lang, doc_id, substring(text, 1, 60) AS prefix FROM documents
      UNION ALL
      SELECT source, lang, doc_id + 1000000, substring(text || '!', 1, 60)
      FROM documents WHERE doc_id % 30 = 0
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.prefix, b.prefix) AS INT) AS dist
    FROM corpus a
    JOIN corpus b ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE levenshtein(a.prefix, b.prefix) <= 2
    ORDER BY id_a, id_b
    """,
)


# --- RAG chunk retrieval: chunk -> BM25 over chunks -> top-k ----------------
_RAG_CHUNK = 32


def _rag_chunk_retrieval(spark, sf_dir):
    """End-to-end retrieval composition: disjoint 32-token chunks scored by
    BM25 against a fixed query, top-5 chunks returned with provenance
    (doc_id, chunk_idx) — the retrieval half of a RAG pipeline.

    Entirely relational: chunk membership is ``token_pos div 32`` off one
    posexplode (no arrays shipped, no slices re-evaluated), chunk stats and
    query-term dfs are tiny broadcast frames, and the only corpus-sized
    shuffle is the (chunk, term) tf agg over rows already filtered to the
    query terms. Same decimal-sum determinism contract as text_bm25_topk.
    """
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "term")
    ).select(
        "doc_id", (F.col("pos") / _RAG_CHUNK).cast("int").alias("chunk_idx"), "term"
    )
    lens = tok.groupBy("doc_id", "chunk_idx").agg(
        F.count(F.lit(1)).cast("double").alias("dl")
    )
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_chunks"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("term").isin(_QUERY_TERMS))
        .groupBy("doc_id", "chunk_idx", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log((F.col("n_chunks") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    contrib = idf * (
        F.col("tf") * (_K1 + 1.0)
        / (F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(df_), on="term")
        .join(lens, on=["doc_id", "chunk_idx"])
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "chunk_idx", F.round(contrib, 6).cast("decimal(18,6)").alias("c"))
    )
    from pyspark.sql import Window as W

    ranked = (
        scored.groupBy("doc_id", "chunk_idx")
        .agg(F.sum("c").cast("double").alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id", "chunk_idx")
        .limit(5)
    )
    return ranked.select(
        F.row_number()
        .over(W.orderBy(F.desc("bm25"), "doc_id", "chunk_idx"))
        .alias("rank"),
        "doc_id",
        "chunk_idx",
        "bm25",
    )


register(
    "rag_chunk_retrieval",
    _rag_chunk_retrieval,
    rf"""
    WITH tok AS (
      SELECT doc_id,
             CAST((u.pos - 1) // {_RAG_CHUNK} AS INT) AS chunk_idx,
             u.term
      FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
            FROM documents) t,
           LATERAL (SELECT unnest(toks) AS term, generate_subscripts(toks, 1) AS pos) u
    ), lens AS (
      SELECT doc_id, chunk_idx, CAST(count(*) AS DOUBLE) AS dl
      FROM tok GROUP BY doc_id, chunk_idx
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_chunks, sum(dl) / count(*) AS avgdl FROM lens
    ), tf AS (
      SELECT doc_id, chunk_idx, term, CAST(count(*) AS DOUBLE) AS tf
      FROM tok WHERE term IN ('join', 'hash', 'filter')
      GROUP BY doc_id, chunk_idx, term
    ), dfs AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc_id, tf.chunk_idx,
             CAST(round(ln((stats.n_chunks - dfs.df + 0.5) / (dfs.df + 0.5) + 1.0)
                        * tf.tf * ({_K1} + 1.0)
                        / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * lens.dl / stats.avgdl)),
                        6) AS DECIMAL(18,6)) AS c
      FROM tf JOIN dfs ON tf.term = dfs.term
      JOIN lens ON tf.doc_id = lens.doc_id AND tf.chunk_idx = lens.chunk_idx
      CROSS JOIN stats
    ), ranked AS (
      SELECT doc_id, chunk_idx, CAST(sum(c) AS DOUBLE) AS bm25
      FROM scored GROUP BY doc_id, chunk_idx
      ORDER BY bm25 DESC, doc_id, chunk_idx LIMIT 5
    )
    SELECT CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id, chunk_idx) AS INT) AS rank,
           doc_id, chunk_idx, bm25
    FROM ranked ORDER BY rank
    """,
)


# --- MMR rerank: relevance-diversity tradeoff on the candidate pool ---------
def _rag_rerank_mmr(spark, sf_dir):
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein, SIGIR'98
    — public literature) of the BM25 candidate pool: greedily pick the
    chunk maximizing ``0.7 * bm25 - 0.3 * max_sim_to_selected``, where
    chunk-chunk similarity is token-set Jaccard. Kills the
    near-duplicate-chunks problem in RAG context assembly: the top-k by
    relevance alone is often k copies of the same boilerplate.

    Scale shape: the corpus-sized work is the SAME BM25 scoring pass as
    rag_chunk_retrieval; everything after operates on the top-10 pool
    (bounded by contract), so the greedy loop's joins are broadcast-tiny
    and the k=3 unrolled steps add constant work. All similarity
    arithmetic is int/int division rounded to 6 — replayed exactly by
    the oracle's unrolled selection CTEs.
    """
    from pyspark.sql import Window as W

    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.posexplode(tokens("text")).alias("pos", "term")
    ).select(
        "doc_id", (F.col("pos") / _RAG_CHUNK).cast("int").alias("chunk_idx"), "term"
    )
    lens = tok.groupBy("doc_id", "chunk_idx").agg(
        F.count(F.lit(1)).cast("double").alias("dl")
    )
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_chunks"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        tok.filter(F.col("term").isin(_QUERY_TERMS))
        .groupBy("doc_id", "chunk_idx", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log((F.col("n_chunks") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    contrib = idf * (
        F.col("tf") * (_K1 + 1.0)
        / (F.col("tf") + _K1 * (1.0 - _B + _B * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(df_), on="term")
        .join(lens, on=["doc_id", "chunk_idx"])
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "chunk_idx", F.round(contrib, 6).cast("decimal(18,6)").alias("c"))
    )
    cand = (
        scored.groupBy("doc_id", "chunk_idx")
        .agg(F.sum("c").cast("double").alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id", "chunk_idx")
        .limit(10)
        .localCheckpoint(eager=False)  # feeds terms join + every greedy step
    )
    cterms = (
        tok.join(cand.select("doc_id", "chunk_idx"), ["doc_id", "chunk_idx"])
        .select("doc_id", "chunk_idx", "term")
        .distinct()
        .localCheckpoint(eager=False)  # feeds sizes + both sides of the pair join
    )
    csz = cterms.groupBy("doc_id", "chunk_idx").agg(F.count(F.lit(1)).alias("sz"))
    a = cterms.select(
        F.col("doc_id").alias("da"), F.col("chunk_idx").alias("ca"), "term"
    )
    b = cterms.select(
        F.col("doc_id").alias("db"), F.col("chunk_idx").alias("cb"), "term"
    )
    inter = (
        a.join(b, "term")
        .filter((F.col("da") != F.col("db")) | (F.col("ca") != F.col("cb")))
        .groupBy("da", "ca", "db", "cb")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sims = (
        inter.join(
            csz.select(F.col("doc_id").alias("da"), F.col("chunk_idx").alias("ca"), F.col("sz").alias("sa")),
            ["da", "ca"],
        )
        .join(
            csz.select(F.col("doc_id").alias("db"), F.col("chunk_idx").alias("cb"), F.col("sz").alias("sb")),
            ["db", "cb"],
        )
        .select(
            "da", "ca", "db", "cb",
            F.round(F.col("i").cast("double") / (F.col("sa") + F.col("sb") - F.col("i")), 6).alias("sim"),
        )
        .localCheckpoint(eager=False)  # reused by every greedy step
    )
    selected = (
        cand.orderBy(F.desc("bm25"), "doc_id", "chunk_idx")
        .limit(1)
        .select(
            F.lit(1).alias("sel_rank"), "doc_id", "chunk_idx", "bm25",
            F.round(F.lit(0.7) * F.col("bm25"), 6).alias("mmr_score"),
        )
    )
    for step in (2, 3):
        sel_keys = selected.select("doc_id", "chunk_idx")
        remaining = cand.join(sel_keys, ["doc_id", "chunk_idx"], "left_anti")
        msim = (
            sims.join(
                sel_keys.select(F.col("doc_id").alias("db"), F.col("chunk_idx").alias("cb")),
                ["db", "cb"],
            )
            .groupBy(F.col("da").alias("doc_id"), F.col("ca").alias("chunk_idx"))
            .agg(F.max("sim").alias("msim"))
        )
        pick = (
            remaining.join(msim, ["doc_id", "chunk_idx"], "left")
            .select(
                "doc_id", "chunk_idx", "bm25",
                F.round(
                    F.lit(0.7) * F.col("bm25")
                    - F.lit(0.3) * F.coalesce("msim", F.lit(0.0)),
                    6,
                ).alias("mmr_score"),
            )
            .orderBy(F.desc("mmr_score"), "doc_id", "chunk_idx")
            .limit(1)
            .select(F.lit(step).alias("sel_rank"), "doc_id", "chunk_idx", "bm25", "mmr_score")
        )
        selected = selected.unionByName(pick)
    return selected.orderBy("sel_rank")


register(
    "rag_rerank_mmr",
    _rag_rerank_mmr,
    rf"""
    WITH tok AS (
      SELECT doc_id,
             CAST((u.pos - 1) // {_RAG_CHUNK} AS INT) AS chunk_idx,
             u.term
      FROM (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
            FROM documents) t,
           LATERAL (SELECT unnest(toks) AS term, generate_subscripts(toks, 1) AS pos) u
    ), lens AS (
      SELECT doc_id, chunk_idx, CAST(count(*) AS DOUBLE) AS dl
      FROM tok GROUP BY doc_id, chunk_idx
    ), stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n_chunks, sum(dl) / count(*) AS avgdl FROM lens
    ), tf AS (
      SELECT doc_id, chunk_idx, term, CAST(count(*) AS DOUBLE) AS tf
      FROM tok WHERE term IN ('join', 'hash', 'filter')
      GROUP BY doc_id, chunk_idx, term
    ), dfs AS (
      SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term
    ), bscored AS (
      SELECT tf.doc_id, tf.chunk_idx,
             CAST(round(ln((stats.n_chunks - dfs.df + 0.5) / (dfs.df + 0.5) + 1.0)
                        * tf.tf * ({_K1} + 1.0)
                        / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * lens.dl / stats.avgdl)),
                        6) AS DECIMAL(18,6)) AS c
      FROM tf JOIN dfs ON tf.term = dfs.term
      JOIN lens ON tf.doc_id = lens.doc_id AND tf.chunk_idx = lens.chunk_idx
      CROSS JOIN stats
    ), cand AS (
      SELECT doc_id, chunk_idx, CAST(sum(c) AS DOUBLE) AS bm25
      FROM bscored GROUP BY doc_id, chunk_idx
      ORDER BY bm25 DESC, doc_id, chunk_idx LIMIT 10
    ), cterms AS (
      SELECT DISTINCT tok.doc_id, tok.chunk_idx, tok.term
      FROM tok JOIN cand ON tok.doc_id = cand.doc_id AND tok.chunk_idx = cand.chunk_idx
    ), csz AS (
      SELECT doc_id, chunk_idx, count(*) AS sz FROM cterms GROUP BY 1, 2
    ), inter AS (
      SELECT a.doc_id AS da, a.chunk_idx AS ca, b.doc_id AS db, b.chunk_idx AS cb,
             count(*) AS i
      FROM cterms a JOIN cterms b ON a.term = b.term
       AND (a.doc_id <> b.doc_id OR a.chunk_idx <> b.chunk_idx)
      GROUP BY 1, 2, 3, 4
    ), sims AS (
      SELECT da, ca, db, cb,
             round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS sim
      FROM inter
      JOIN csz sa ON sa.doc_id = da AND sa.chunk_idx = ca
      JOIN csz sb ON sb.doc_id = db AND sb.chunk_idx = cb
    ), s1 AS (
      SELECT 1 AS sel_rank, doc_id, chunk_idx, bm25,
             round(0.7 * bm25, 6) AS mmr_score
      FROM cand ORDER BY bm25 DESC, doc_id, chunk_idx LIMIT 1
    ), s2 AS (
      SELECT 2 AS sel_rank, doc_id, chunk_idx, bm25, mmr_score FROM (
        SELECT c.doc_id, c.chunk_idx, c.bm25,
               round(0.7 * c.bm25 - 0.3 * coalesce(m.msim, 0.0), 6) AS mmr_score
        FROM cand c
        LEFT JOIN (SELECT s.da, s.ca, max(s.sim) AS msim
                   FROM sims s JOIN s1 ON s.db = s1.doc_id AND s.cb = s1.chunk_idx
                   GROUP BY 1, 2) m
          ON m.da = c.doc_id AND m.ca = c.chunk_idx
        WHERE NOT EXISTS (SELECT 1 FROM s1
                          WHERE s1.doc_id = c.doc_id AND s1.chunk_idx = c.chunk_idx)
      ) r ORDER BY mmr_score DESC, doc_id, chunk_idx LIMIT 1
    ), sel2 AS (
      SELECT doc_id, chunk_idx FROM s1 UNION ALL SELECT doc_id, chunk_idx FROM s2
    ), s3 AS (
      SELECT 3 AS sel_rank, doc_id, chunk_idx, bm25, mmr_score FROM (
        SELECT c.doc_id, c.chunk_idx, c.bm25,
               round(0.7 * c.bm25 - 0.3 * coalesce(m.msim, 0.0), 6) AS mmr_score
        FROM cand c
        LEFT JOIN (SELECT s.da, s.ca, max(s.sim) AS msim
                   FROM sims s JOIN sel2 ON s.db = sel2.doc_id AND s.cb = sel2.chunk_idx
                   GROUP BY 1, 2) m
          ON m.da = c.doc_id AND m.ca = c.chunk_idx
        WHERE NOT EXISTS (SELECT 1 FROM sel2
                          WHERE sel2.doc_id = c.doc_id AND sel2.chunk_idx = c.chunk_idx)
      ) r ORDER BY mmr_score DESC, doc_id, chunk_idx LIMIT 1
    )
    SELECT CAST(sel_rank AS INT) AS sel_rank, doc_id, chunk_idx, bm25, mmr_score
    FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3) u
    ORDER BY sel_rank
    """,
)


# --- streaming index maintenance: standing BM25 query over a growing corpus -
def _bm25_standing(spark, sf_dir):
    """Streaming inverted-index maintenance (streaming/search.py): two
    staged crawl days are admitted as O(batch) posting/doclen/stats deltas
    and a standing 3-term BM25 query is re-scored after each admit —
    day-2 rankings shift both because new docs compete and because the
    corpus stats (N, avgdl, df) moved. The oracle replays each day's FULL
    corpus from scratch, so hash-equality proves incremental maintenance
    reproduces batch recomputation exactly (the search-family analogue of
    entity_incremental_clusters' contract)."""
    from ..streaming.search import run_streaming_bm25_standing

    return run_streaming_bm25_standing(spark, sf_dir, k=10)


_BM25_STANDING_ORACLE = rf"""
    WITH b1 AS (
      SELECT doc_id + 3000000 AS doc_id, text || ' day one refresh' AS text
      FROM documents WHERE doc_id % 20 = 10
    ), b2 AS (
      SELECT doc_id + 5000000 AS doc_id, text || ' day two refresh' AS text
      FROM documents WHERE doc_id % 20 = 5
      UNION ALL
      SELECT 9000000, 'join hash filter join hash filter join hash filter'
    ), corpus AS (
      SELECT 1 AS day, doc_id, text FROM documents
      UNION ALL SELECT 1, doc_id, text FROM b1
      UNION ALL SELECT 2, doc_id, text FROM documents
      UNION ALL SELECT 2, doc_id, text FROM b1
      UNION ALL SELECT 2, doc_id, text FROM b2
    ), lens AS (
      SELECT day, doc_id,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END AS DOUBLE) AS dl
      FROM corpus
    ), stats AS (
      SELECT day, CAST(count(*) AS DOUBLE) AS n_docs, sum(dl) / count(*) AS avgdl
      FROM lens GROUP BY day
    ), tok AS (
      SELECT day, doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM corpus
    ), tf AS (
      SELECT day, doc_id, term, CAST(count(*) AS DOUBLE) AS tf
      FROM tok WHERE term IN ('join', 'hash', 'filter') GROUP BY day, doc_id, term
    ), dfs AS (
      SELECT day, term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY day, term
    ), scored AS (
      SELECT tf.day, tf.doc_id,
             CAST(round(ln((stats.n_docs - dfs.df + 0.5) / (dfs.df + 0.5) + 1.0)
                        * tf.tf * ({_K1} + 1.0)
                        / (tf.tf + {_K1} * (1.0 - {_B} + {_B} * lens.dl / stats.avgdl)),
                        6) AS DECIMAL(18,6)) AS c
      FROM tf
      JOIN dfs ON tf.day = dfs.day AND tf.term = dfs.term
      JOIN lens ON tf.day = lens.day AND tf.doc_id = lens.doc_id
      JOIN stats ON tf.day = stats.day
    ), totals AS (
      SELECT day, doc_id, CAST(sum(c) AS DOUBLE) AS bm25
      FROM scored GROUP BY day, doc_id
    ), ranked AS (
      SELECT CAST(day AS INT) AS day,
             CAST(row_number() OVER (PARTITION BY day ORDER BY bm25 DESC, doc_id) AS INT) AS rank,
             doc_id, bm25
      FROM totals
    )
    SELECT day, rank, doc_id, bm25 FROM ranked WHERE rank <= 10
    ORDER BY day, rank
    """

register(
    "text_bm25_standing_query",
    _bm25_standing,
    _BM25_STANDING_ORACLE,
)


def _bm25_standing_restart(spark, sf_dir):
    """The RESTART drill for the standing-query loop
    (streaming/search.run_streaming_bm25_standing_restart): same staged
    days and per-batch body as the single-run twin, but each day runs in
    its own query lifetime — the DeltaManifest is rebuilt from its durable
    transaction log between days and Spark's checkpointLocation skips the
    processed file. Output is bit-equal; the SAME staged oracle (full
    per-day corpus recompute) hash-checks the recovery path."""
    from ..streaming.search import run_streaming_bm25_standing_restart

    return run_streaming_bm25_standing_restart(spark, sf_dir, k=10)


register(
    "text_bm25_standing_restart",
    _bm25_standing_restart,
    _BM25_STANDING_ORACLE,
)
