r"""Training-data governance queries (round 2): semantic dedup, split-leakage
audit, document chunking, corpus datacard.

These close the loop a 100 TB pretraining-data pipeline runs *around* the
dedup/similarity/text primitives:

- **semantic dedup** (SemDeDup-shaped): near-identical embeddings collapse to
  one kept representative — the greedy "drop any vector that has a
  smaller-id neighbor above the cosine threshold" rule, which needs no
  iterative clustering and is one anti-join over the pair list.
- **split-leakage audit**: after a deterministic train/val/test hash split,
  count near-dup pairs that straddle split boundaries — the eval-set
  contamination check every training run needs before trusting its val loss.
- **document chunking**: overlapping fixed-size token windows (size 32,
  stride 16) — the map from curated documents to training sequences. Pure
  projection + generator; chunk identity is an md5 so the wide text never
  reaches the output.
- **corpus datacard**: per-(source, lang) rollup of document/token/length
  stats with grand totals — the summary table a data card publishes.

Every query is DuckDB-oracle-checked; planted fixtures (perturbed embedding
copies, appended-token document copies) are generated identically in the
Spark plan and the oracle SQL so the checks exercise real positives.

Scale notes are inline per query; the common theme: pair generation is LSH
(banded equi-join, operators/dedup.py) or broadcast-bounded, labels/splits
are pure projections, and the corpus is never shuffled whole.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.arrays import as_double
from ..functions.text import token_count, tokens
from ..operators.dedup import lsh_verified_pairs
from ..operators.sampling import hash_split
from ..operators.similarity import cosine_lsh_pairs_relational
from ..sources import read_table
from .registry import register


# --- semantic dedup over embeddings (SemDeDup-shaped greedy keep) -----------
def _semantic_dedup(spark, sf_dir):
    """Per-label keep/drop counts after greedy min-id semantic dedup.

    Pair generation is md5-hyperplane LSH banding + exact-cosine verify
    (``operators/similarity.cosine_lsh_pairs_relational``) — the corpus-scale
    shape: signatures from a broadcast hyperplane join with map-side-combined
    partial sums, candidates from a banded equi-join (never O(n²)), exact
    cosine only on candidates. The deterministic md5 hyperplanes make the
    *candidate generation itself* oracle-SQL-expressible, so this query is
    hash-checked end to end (the earlier all-pairs formulation was 11.7 s at
    sf0.1 — interpreted HOF dot products over 14.6M pairs; this one does
    ~1k exact dots). The keep rule is one distinct + one left join on narrow
    (id) rows: a vector is dropped iff some smaller-id vector sits within
    the cosine threshold — no iterative clustering, deterministic output.
    """
    e = read_table(spark, sf_dir, "embeddings")
    planted = (
        e.filter(F.col("vec_id") % 40 == 0)
        .withColumn("vec_id", F.col("vec_id") + 1_000_000)
        .withColumn(
            "embedding",
            F.transform(as_double("embedding"), lambda x, i: F.when(i == 0, x + F.lit(0.05)).otherwise(x)),
        )
    )
    both = e.select("vec_id", "label", as_double("embedding").alias("embedding")).unionByName(
        planted.select("vec_id", "label", "embedding")
    )
    # dim passed explicitly (testdata embeddings are 64-d at every SF): the
    # hyperplane table is built at plan time, no driver-side row probe
    pairs = cosine_lsh_pairs_relational(both, n_bits=64, n_bands=4, threshold=0.9, dim=64)
    dropped = pairs.select(F.col("id_b").alias("vec_id")).distinct().withColumn("__drop", F.lit(1))
    return (
        both.join(dropped, on="vec_id", how="left")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.coalesce("__drop", F.lit(0))).alias("n_dropped"),
            (F.count(F.lit(1)) - F.sum(F.coalesce("__drop", F.lit(0)))).alias("n_kept"),
        )
        .orderBy("label")
    )


register(
    "semantic_dedup_keep",
    _semantic_dedup,
    """
    WITH base AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, label,
             list_transform(list_zip(CAST(embedding AS DOUBLE[]),
                                     range(0, len(embedding))),
                            p -> CASE WHEN p[2] = 0 THEN p[1] + 0.05 ELSE p[1] END)
      FROM embeddings WHERE vec_id % 40 = 0
    ), hyper AS (
      SELECT b.range AS bit, p.range AS pos,
             CAST(concat('0x', substring(md5(b.range || ':' || p.range), 1, 8)) AS BIGINT)
               / 4294967296.0 - 0.5 AS c
      FROM range(64) b, range(64) p
    ), ex AS (
      SELECT vec_id, u.pos - 1 AS pos, u.val
      FROM base,
           LATERAL (SELECT unnest(v) AS val, generate_subscripts(v, 1) AS pos) u
    ), proj AS (
      SELECT vec_id, bit, sum(val * c) AS s
      FROM ex JOIN hyper USING (pos)
      GROUP BY vec_id, bit
    ), sig AS (
      SELECT vec_id, string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY bit) AS sig
      FROM proj GROUP BY vec_id
    ), bands AS (
      SELECT vec_id, tt.b, substring(sig, CAST(tt.b AS INT) * 16 + 1, 16) AS key
      FROM sig, range(4) tt(b)
    ), cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.vec_id < b.vec_id
    ), pairs AS (
      SELECT id_a, id_b
      FROM cand
      JOIN base ba ON cand.id_a = ba.vec_id
      JOIN base bb ON cand.id_b = bb.vec_id
      WHERE round(list_sum(list_transform(list_zip(ba.v, bb.v), p -> p[1] * p[2]))
                  / (sqrt(list_sum(list_transform(ba.v, x -> x * x)))
                     * sqrt(list_sum(list_transform(bb.v, x -> x * x)))), 6) >= 0.9
    ), dropped AS (
      SELECT DISTINCT id_b AS vec_id FROM pairs
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(dropped.vec_id) AS BIGINT) AS n_dropped,
           CAST(count(*) - count(dropped.vec_id) AS BIGINT) AS n_kept
    FROM base LEFT JOIN dropped ON base.vec_id = dropped.vec_id
    GROUP BY label ORDER BY label
    """,
)


# --- split-leakage audit ----------------------------------------------------
_SH3 = (
    "CASE WHEN len(toks) >= 3 THEN list_distinct(list_transform(range(0, len(toks) - 2), "
    "i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3]))) "
    "ELSE [concat_ws(' ', toks)] END"
)
_MINS16 = ",\n             ".join(
    f"list_min(list_transform(shingles, s -> substring(md5('{j}:' || s), {1 + 8 * i}, 8)))"
    for j in range(4)
    for i in range(4)
)
_SPLIT = (
    "CASE WHEN CAST(concat('0x', substring(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train' "
    "WHEN CAST(concat('0x', substring(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val' "
    "ELSE 'test' END"
)


def _split_leakage(spark, sf_dir):
    """Near-dup pairs per (split, split) bucket — the contamination matrix.

    The hash split is a pure projection (no shuffle); pair generation is the
    two-stage LSH-candidates → exact-Jaccard verify (banded equi-join, never
    all-pairs); the audit itself joins the narrow (id_a, id_b) pair list to
    the (doc_id, split) projection twice and aggregates — every shuffled row
    is two ids or two short strings. Planted copies (doc_id+1e6 hashes into
    an independent split) guarantee cross-split positives.
    """
    d = read_table(spark, sf_dir, "documents")
    copies = (
        d.filter(F.col("doc_id") % 25 == 0)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" tail")))
    )
    corpus = d.unionByName(copies)
    splits = hash_split(corpus, "doc_id").select("doc_id", "split")
    pairs = lsh_verified_pairs(corpus, "doc_id", "text", n_hashes=16, n_bands=4, shingle_k=3, threshold=0.6)
    labeled = (
        pairs.join(splits.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")), on="id_a")
        .join(splits.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")), on="id_b")
        .select(
            F.least("sa", "sb").alias("split_lo"),
            F.greatest("sa", "sb").alias("split_hi"),
        )
    )
    return (
        labeled.groupBy("split_lo", "split_hi")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn("crosses_split", (F.col("split_lo") != F.col("split_hi")).cast("boolean"))
        .orderBy("split_lo", "split_hi")
    )


register(
    "split_leakage_audit",
    _split_leakage,
    rf"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text || ' tail' FROM documents WHERE doc_id % 25 = 0
    ), splits AS (
      SELECT doc_id, {_SPLIT} AS split FROM corpus
    ), t AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM corpus
    ), sh AS (
      SELECT doc_id, {_SH3} AS shingles FROM t
    ), sig AS (
      SELECT doc_id, [{_MINS16}] AS sig FROM sh
    ), bands AS (
      SELECT doc_id, b,
             concat_ws('|', sig[b*4+1], sig[b*4+2], sig[b*4+3], sig[b*4+4]) AS key
      FROM sig, range(4) tt(b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id
    ), pairs AS (
      SELECT id_a, id_b
      FROM cand
      JOIN sh sa ON cand.id_a = sa.doc_id
      JOIN sh sb ON cand.id_b = sb.doc_id
      WHERE round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                  / greatest(len(list_distinct(list_concat(sa.shingles, sb.shingles))), 1), 6) >= 0.6
    ), labeled AS (
      SELECT least(pa.split, pb.split) AS split_lo, greatest(pa.split, pb.split) AS split_hi
      FROM pairs
      JOIN splits pa ON pairs.id_a = pa.doc_id
      JOIN splits pb ON pairs.id_b = pb.doc_id
    )
    SELECT split_lo, split_hi, CAST(count(*) AS BIGINT) AS n_pairs,
           split_lo <> split_hi AS crosses_split
    FROM labeled GROUP BY split_lo, split_hi
    ORDER BY split_lo, split_hi
    """,
)


def _split_span_contamination(spark, sf_dir):
    """Span-level cross-split contamination audit — the substring-precise
    companion to split_leakage_audit (which counts DOC-level near-dup
    pairs): how many characters of each held-out split's documents appear
    VERBATIM (at 20-gram resolution) somewhere in the train split, the
    honest leakage figure for memorization studies. Train grams are
    distinct-hashed once (gram_index) and the held-out side semi-joins
    them — NOT contaminated_spans' broadcast, because train is 80 % of
    the corpus, the opposite of the tiny-benchmark case; at 100 TB the
    semi-join shuffles only (id, pos, hash) triples and the narrow index.
    Planted suffix copies (doc_id + 1e6 hashes into an independent split)
    guarantee cross-split verbatim content at every SF."""
    from ..operators.dedup import gram_index, incremental_duplicated_spans
    from ..operators.sampling import hash_split

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = d.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"),
        F.expr("substring(text, 21)").alias("text"),
    )
    corpus = d.unionByName(copies)
    splits = hash_split(corpus, "doc_id")
    train = splits.filter(F.col("split") == "train").select("doc_id", "text")
    held = splits.filter(F.col("split") != "train").select(
        "doc_id", "split", "text"
    )
    idx = gram_index(train, "doc_id", "text", k=20)
    spans = incremental_duplicated_spans(
        held.select("doc_id", "text"), idx, "doc_id", "text", k=20, min_span=40
    )
    per_doc = spans.groupBy("doc_id").agg(F.sum("span_len").alias("__tc"))
    base = held.select("doc_id", "split", F.length("text").alias("n_chars"))
    joined = base.join(per_doc, "doc_id", "left").select(
        "split", "n_chars", F.coalesce("__tc", F.lit(0)).alias("tc")
    )
    return (
        joined.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("tc") > 0).cast("long")).alias("docs_tainted"),
            F.sum("tc").alias("tainted_chars"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.sum("tc") / F.sum("n_chars"), 6).alias("taint_ratio"),
        )
        .orderBy("split")
    )


_SPLIT_C = (
    "CASE WHEN CAST(concat('0x', substring(md5(concat('split:', CAST(c.doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 < 80 THEN 'train' "
    "WHEN CAST(concat('0x', substring(md5(concat('split:', CAST(c.doc_id AS VARCHAR))), 1, 8)) AS BIGINT) % 100 < 90 THEN 'val' "
    "ELSE 'test' END"
)

register(
    "text_split_contamination_stats",
    _split_span_contamination,
    rf"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, substring(text, 21) FROM documents WHERE doc_id % 25 = 0
    ), tagged AS (
      SELECT c.doc_id, c.text, {_SPLIT_C} AS split FROM corpus c
    ), train AS (
      SELECT doc_id, text FROM tagged WHERE split = 'train'
    ), held AS (
      SELECT doc_id, split, text FROM tagged WHERE split <> 'train'
    ), idx AS (
      SELECT DISTINCT substring(c.text, CAST(t.p AS INTEGER) + 1, 20) AS gh
      FROM train c, unnest(range(0, CAST(length(c.text) AS BIGINT) - 19)) AS t(p)
      WHERE length(c.text) >= 20
    ), pos AS (
      SELECT c.doc_id, CAST(t.p AS BIGINT) AS pos,
             substring(c.text, CAST(t.p AS INTEGER) + 1, 20) AS gh
      FROM held c, unnest(range(0, CAST(length(c.text) AS BIGINT) - 19)) AS t(p)
      WHERE length(c.text) >= 20
    ), cov AS (
      SELECT doc_id, pos FROM pos WHERE gh IN (SELECT gh FROM idx)
    ), brks AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL
                    OR pos > lag(pos) OVER w + 20 THEN 1 ELSE 0 END AS brk
      FROM cov WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), isl AS (
      SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM brks
    ), spans AS (
      SELECT doc_id, max(pos) + 20 - min(pos) AS span_len
      FROM isl GROUP BY doc_id, island
      HAVING max(pos) + 20 - min(pos) >= 40
    ), per_doc AS (
      SELECT doc_id, sum(span_len) AS tc FROM spans GROUP BY doc_id
    ), base AS (
      SELECT h.split, length(h.text) AS n_chars, COALESCE(p.tc, 0) AS tc
      FROM held h LEFT JOIN per_doc p ON h.doc_id = p.doc_id
    )
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN tc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_tainted,
           CAST(sum(tc) AS BIGINT) AS tainted_chars,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(CAST(sum(tc) AS DOUBLE) / sum(n_chars), 6) AS taint_ratio
    FROM base GROUP BY split ORDER BY split
    """,
)


# --- document chunking (overlapping token windows) ---------------------------
_CHUNK = 32
_STRIDE = 16


def _doc_chunking(spark, sf_dir):
    """One row per training chunk: size-32 token windows at stride 16.

    Generator shape: tokenize once per document (scalar split, codegen'd),
    explode a ``sequence`` of chunk starts, ``slice`` the carried token
    array per chunk. Pure projection + Generate — no shuffle, pipelines
    behind the scan; the output carries an md5 chunk fingerprint instead of
    the chunk text so downstream exact-dedup-of-chunks joins on 32 bytes.
    """
    d = read_table(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens("text").alias("toks"))
    n_chunks = F.greatest(F.ceil(F.size("toks") / F.lit(float(_STRIDE))).cast("int"), F.lit(1))
    per_chunk = t.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    chunk = F.slice("toks", F.col("chunk_idx") * _STRIDE + 1, _CHUNK)
    return (
        per_chunk.select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.size(chunk).cast("int").alias("n_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
        )
        .localCheckpoint(eager=False)  # pin before sort: orderBy's range
        # sampling re-executes an un-shuffled child (see text_html_strip)
        .orderBy("doc_id", "chunk_idx")
    )


register(
    "doc_chunking",
    _doc_chunking,
    rf"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM documents
    ), idx AS (
      SELECT doc_id, toks,
             unnest(range(0, greatest(CAST(ceil(len(toks) / {_STRIDE}.0) AS BIGINT), 1))) AS chunk_idx
      FROM t
    ), c AS (
      SELECT doc_id, chunk_idx,
             list_slice(toks, chunk_idx*{_STRIDE}+1, chunk_idx*{_STRIDE}+{_CHUNK}) AS chunk
      FROM idx
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(len(chunk) AS INT) AS n_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_hash
    FROM c ORDER BY doc_id, chunk_idx
    """,
)


# --- corpus datacard (rollup stats) ------------------------------------------
def _datacard(spark, sf_dir):
    """Per-(source, lang) + per-source + grand-total corpus statistics.

    ``rollup`` computes all three grouping levels in ONE shuffle with
    map-side partial aggregation (Spark expands grouping sets before the
    exchange); the token count is a scalar projection, so the whole datacard
    is one pass over the corpus. ``grouping()`` distinguishes the rollup's
    ALL level from a hypothetical null group value.
    """
    d = read_table(spark, sf_dir, "documents")
    base = d.select("source", "lang", token_count("text").alias("n_toks"), "n_chars")
    return (
        base.rollup("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.max("n_chars").alias("max_chars"),
            F.grouping("source").alias("g_source"),
            F.grouping("lang").alias("g_lang"),
        )
        .select(
            F.when(F.col("g_source") == 1, "ALL").otherwise(F.col("source")).alias("source"),
            F.when(F.col("g_lang") == 1, "ALL").otherwise(F.col("lang")).alias("lang"),
            "n_docs",
            "n_tokens",
            "avg_chars",
            "max_chars",
        )
        .orderBy("source", "lang")
    )


register(
    "corpus_datacard",
    _datacard,
    r"""
    SELECT CASE WHEN GROUPING(source) = 1 THEN 'ALL' ELSE source END AS source,
           CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE lang END AS lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END) AS BIGINT) AS n_tokens,
           round(avg(n_chars), 4) AS avg_chars,
           max(n_chars) AS max_chars
    FROM documents
    GROUP BY ROLLUP(source, lang)
    ORDER BY source, lang
    """,
)


# --- quality-classifier training (full-batch logistic regression) -----------
def _lr_quality_train(spark, sf_dir):
    """Three full-batch GD steps of a document-quality logistic classifier.

    The CCNet/fastText-style curation step: learn "does this doc look like
    the target corpus" (label: lang == 'en') from cheap per-doc scalars
    (length score, stopword ratio, punctuation ratio — the same primitives
    text_quality_scores checks). Each step is ONE map-side-combinable avg
    aggregate with the current weights inlined as literals and a one-row
    driver readout (operators/logreg.py) — the gradient is computed where
    the corpus lives and only O(features) bytes ever reach the driver, the
    same shape MLlib's LogisticRegression uses per iteration. Features and
    per-step weights are 6dp-rounded on both engines, so the unrolled-CTE
    oracle is exact: drift would have to appear inside a single avg() and
    survive the round.
    """
    from ..functions import text as X
    from ..operators.logreg import logreg_train

    d = read_table(spark, sf_dir, "documents")
    feats = d.select(
        F.round(F.least(F.length("text") / F.lit(400.0), F.lit(1.0)), 6).alias(
            "len_score"
        ),
        F.round(X.stopword_ratio("text", X.LANG_STOPWORDS["en"]), 6).alias(
            "stop_ratio"
        ),
        F.round(X.punct_ratio("text"), 6).alias("punct_ratio"),
        (F.col("lang") == "en").cast("double").alias("y"),
    )
    recs = logreg_train(
        feats, ["len_score", "stop_ratio", "punct_ratio"], "y", lr=0.5, steps=3
    )
    return spark.createDataFrame(
        recs,
        "step int, loss_before double, w_bias double, w_len_score double,"
        " w_stop_ratio double, w_punct_ratio double",
    ).orderBy("step")


# the unrolled 3-step training chain, shared by the train/score/resample
# oracles (doc_id and lang ride along for the application-side queries;
# the training aggregates ignore them)
_LR_CTES = r"""f AS MATERIALIZED (
      SELECT doc_id, lang,
             round(least(length(text) / 400.0, 1.0), 6) AS x1,
             round(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                   x -> list_contains(['the','a','of','and','to','in','is','it'], x)))
                   / greatest(len(regexp_split_to_array(trim(lower(text)), '\s+')), 1), 6) AS x2,
             round((length(text) - length(regexp_replace(text, '[^a-zA-Z0-9_\s]', '', 'g')))
                   / greatest(length(text), 1), 6) AS x3,
             CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
      FROM documents
    ), s1 AS MATERIALIZED (
      SELECT round(0.0 - 0.5 * avg((0.5 - y) * 1.0), 6) AS wb,
             round(0.0 - 0.5 * avg((0.5 - y) * x1), 6) AS w1,
             round(0.0 - 0.5 * avg((0.5 - y) * x2), 6) AS w2,
             round(0.0 - 0.5 * avg((0.5 - y) * x3), 6) AS w3,
             round(avg(-(y * ln(0.5) + (1.0 - y) * ln(0.5))), 6) AS loss
      FROM f
    ), p2 AS MATERIALIZED (
      SELECT f.*, s1.wb AS pwb, s1.w1 AS pw1, s1.w2 AS pw2, s1.w3 AS pw3,
             1.0 / (1.0 + exp(-(s1.wb + s1.w1 * x1 + s1.w2 * x2 + s1.w3 * x3))) AS p
      FROM f CROSS JOIN s1
    ), s2 AS MATERIALIZED (
      SELECT round(max(pwb) - 0.5 * avg((p - y) * 1.0), 6) AS wb,
             round(max(pw1) - 0.5 * avg((p - y) * x1), 6) AS w1,
             round(max(pw2) - 0.5 * avg((p - y) * x2), 6) AS w2,
             round(max(pw3) - 0.5 * avg((p - y) * x3), 6) AS w3,
             round(avg(-(y * ln(p) + (1.0 - y) * ln(1.0 - p))), 6) AS loss
      FROM p2
    ), p3 AS MATERIALIZED (
      SELECT f.*, s2.wb AS pwb, s2.w1 AS pw1, s2.w2 AS pw2, s2.w3 AS pw3,
             1.0 / (1.0 + exp(-(s2.wb + s2.w1 * x1 + s2.w2 * x2 + s2.w3 * x3))) AS p
      FROM f CROSS JOIN s2
    ), s3 AS MATERIALIZED (
      SELECT round(max(pwb) - 0.5 * avg((p - y) * 1.0), 6) AS wb,
             round(max(pw1) - 0.5 * avg((p - y) * x1), 6) AS w1,
             round(max(pw2) - 0.5 * avg((p - y) * x2), 6) AS w2,
             round(max(pw3) - 0.5 * avg((p - y) * x3), 6) AS w3,
             round(avg(-(y * ln(p) + (1.0 - y) * ln(1.0 - p))), 6) AS loss
      FROM p3
    )"""

register(
    "training_lr_quality",
    _lr_quality_train,
    f"""
    WITH {_LR_CTES}
    SELECT CAST(1 AS INT) AS step, loss + 0.0 AS loss_before, wb + 0.0 AS w_bias,
           w1 + 0.0 AS w_len_score, w2 + 0.0 AS w_stop_ratio, w3 + 0.0 AS w_punct_ratio
    FROM s1
    UNION ALL
    SELECT CAST(2 AS INT), loss + 0.0, wb + 0.0, w1 + 0.0, w2 + 0.0, w3 + 0.0 FROM s2
    UNION ALL
    SELECT CAST(3 AS INT), loss + 0.0, wb + 0.0, w1 + 0.0, w2 + 0.0, w3 + 0.0 FROM s3
    ORDER BY step
    """,
)


# --- classifier application: score the corpus, report calibration deciles ---
def _lr_quality_scores(spark, sf_dir):
    """Apply the 3-step-trained classifier to the whole corpus and bucket
    the predicted probabilities into deciles — the DSIR/CCNet apply step,
    where the trained head becomes a keep/resample signal over 100 TB.

    Training reuses the one-agg-per-step loop (weights arrive as Python
    floats); SCORING is a pure projection with the weights inlined as
    literals — no shuffle until the decile rollup, which is one
    map-side-combinable agg on a 10-value key. The per-decile en-rate vs
    avg predicted p is the calibration readout a filtering run checks
    before trusting the threshold.
    """
    from ..functions import text as X
    from ..operators.logreg import logreg_train

    d = read_table(spark, sf_dir, "documents")
    feats = d.select(
        "doc_id",
        F.round(F.least(F.length("text") / F.lit(400.0), F.lit(1.0)), 6).alias(
            "len_score"
        ),
        F.round(X.stopword_ratio("text", X.LANG_STOPWORDS["en"]), 6).alias(
            "stop_ratio"
        ),
        F.round(X.punct_ratio("text"), 6).alias("punct_ratio"),
        (F.col("lang") == "en").cast("double").alias("y"),
    )
    w = logreg_train(
        feats, ["len_score", "stop_ratio", "punct_ratio"], "y", lr=0.5, steps=3
    )[-1]
    z = (
        F.lit(w["w_bias"])
        + F.lit(w["w_len_score"]) * F.col("len_score")
        + F.lit(w["w_stop_ratio"]) * F.col("stop_ratio")
        + F.lit(w["w_punct_ratio"]) * F.col("punct_ratio")
    )
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    scored = feats.select(
        "y",
        p.alias("p"),
        F.least(F.floor(p * 10).cast("int"), F.lit(9)).alias("decile"),
    )
    return (
        scored.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("y").cast("bigint").alias("n_en"),
            (F.round(F.avg("p"), 6) + F.lit(0.0)).alias("avg_p"),
        )
        .orderBy("decile")
    )


register(
    "training_lr_scores",
    _lr_quality_scores,
    f"""
    WITH {_LR_CTES}, scored AS (
      SELECT f.y,
             round(1.0 / (1.0 + exp(-(s3.wb + s3.w1 * x1 + s3.w2 * x2 + s3.w3 * x3))), 6) AS p
      FROM f CROSS JOIN s3
    )
    SELECT CAST(least(floor(p * 10), 9) AS INT) AS decile,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(y) AS BIGINT) AS n_en,
           round(avg(p), 6) + 0.0 AS avg_p
    FROM scored GROUP BY 1 ORDER BY decile
    """,
)


# --- contrastive hard-negative mining ---------------------------------------
def _hard_negatives(spark, sf_dir):
    """Top-3 hardest negatives per anchor: most cosine-similar vectors with
    a DIFFERENT label — the standard contrastive-training mining step.
    Same broadcast-the-anchors shape as brute-force top-k (the corpus
    never shuffles); the label inequality rides the scoring projection."""
    from ..functions.arrays import as_double, cosine

    from pyspark.sql import Window as W

    e = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", as_double("embedding").alias("v")
    )
    anchors = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("v").alias("av"),
    )
    scored = (
        e.crossJoin(F.broadcast(anchors))
        .filter(F.col("label") != F.col("anchor_label"))
        .select(
            "anchor_id",
            F.col("vec_id").alias("negative_id"),
            F.round(cosine(F.col("av"), F.col("v")), 6).alias("cos_sim"),
        )
    )
    w = W.partitionBy("anchor_id").orderBy(F.desc("cos_sim"), F.asc("negative_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("anchor_id", "rank", "negative_id", "cos_sim")
        .orderBy("anchor_id", "rank")
    )


register(
    "training_hard_negatives",
    _hard_negatives,
    """
    WITH e AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), a AS (
      SELECT vec_id AS anchor_id, label AS anchor_label, v AS av
      FROM e WHERE vec_id % 100 = 0
    ), scored AS (
      SELECT a.anchor_id, e.vec_id AS negative_id,
             round(list_sum(list_transform(list_zip(a.av, e.v), p -> p[1] * p[2]))
                   / (sqrt(list_sum(list_transform(a.av, x -> x * x)))
                      * sqrt(list_sum(list_transform(e.v, x -> x * x)))), 6) AS cos_sim
      FROM e CROSS JOIN a WHERE e.label <> a.anchor_label
    )
    SELECT anchor_id, CAST(rank AS INT) AS rank, negative_id, cos_sim FROM (
      SELECT *, row_number() OVER (PARTITION BY anchor_id
                                   ORDER BY cos_sim DESC, negative_id ASC) AS rank
      FROM scored
    ) t WHERE rank <= 3
    ORDER BY anchor_id, rank
    """,
)


# --- classifier-gated resampling (the DSIR/CCNet keep step) ------------------
def _lr_importance_resample(spark, sf_dir):
    """Accept each document with probability = its trained quality score,
    decided by the engine-portable md5 uniform (operators/sampling
    ``_hash_frac``) — rand()-free, so which docs survive is exactly
    replayable. This is the keep step a classifier-filtered pretraining
    corpus runs at 100 TB: training amortizes over the whole corpus (3
    one-agg steps), the gate itself is a pure projection, and the rollup
    reports per-language survival plus the mean kept score.
    """
    from ..functions import text as X
    from ..operators.logreg import logreg_train
    from ..operators.sampling import _hash_frac

    d = read_table(spark, sf_dir, "documents")
    feats = d.select(
        "doc_id",
        "lang",
        F.round(F.least(F.length("text") / F.lit(400.0), F.lit(1.0)), 6).alias(
            "len_score"
        ),
        F.round(X.stopword_ratio("text", X.LANG_STOPWORDS["en"]), 6).alias(
            "stop_ratio"
        ),
        F.round(X.punct_ratio("text"), 6).alias("punct_ratio"),
        (F.col("lang") == "en").cast("double").alias("y"),
    )
    w = logreg_train(
        feats, ["len_score", "stop_ratio", "punct_ratio"], "y", lr=0.5, steps=3
    )[-1]
    z = (
        F.lit(w["w_bias"])
        + F.lit(w["w_len_score"]) * F.col("len_score")
        + F.lit(w["w_stop_ratio"]) * F.col("stop_ratio")
        + F.lit(w["w_punct_ratio"]) * F.col("punct_ratio")
    )
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    gated = feats.select(
        "lang",
        p.alias("p"),
        (_hash_frac(F.col("doc_id"), "keep:") < p).alias("kept"),
    )
    return (
        gated.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            (F.round(F.avg(F.when(F.col("kept"), F.col("p"))), 6) + F.lit(0.0)).alias(
                "avg_p_kept"
            ),
        )
        .orderBy("lang")
    )


register(
    "training_importance_resample",
    _lr_importance_resample,
    f"""
    WITH {_LR_CTES}, gated AS (
      SELECT f.lang,
             round(1.0 / (1.0 + exp(-(s3.wb + s3.w1 * x1 + s3.w2 * x2 + s3.w3 * x3))), 6) AS p,
             CAST(concat('0x', substring(md5('keep:' || CAST(f.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               / 4294967296.0 AS u
      FROM f CROSS JOIN s3
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN u < p THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(avg(CASE WHEN u < p THEN p END), 6) + 0.0 AS avg_p_kept
    FROM gated GROUP BY lang ORDER BY lang
    """,
)
