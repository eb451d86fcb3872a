"""Text-analysis queries over ``documents`` (extension surface §2.9).

Each operator from functions/text.py registered with a DuckDB oracle that
re-derives the same value in SQL — the heuristics are deliberately built
from SQL-expressible primitives so the driver can hash-verify them.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import text as X
from ..sources import read_table
from .registry import register


# --- token counting --------------------------------------------------------
def _token_stats(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            X.token_count("text").alias("n_tokens"),
            X.bpe_ish_token_count("text").alias("n_bpe_tokens"),
            F.length("text").alias("n_chars_actual"),
        )
        .localCheckpoint(eager=False)  # pin before sort: orderBy's range
        # sampling re-executes an un-shuffled child (see text_html_strip)
        .orderBy("doc_id")
    )


register(
    "text_token_stats",
    _token_stats,
    r"""
    SELECT doc_id,
           CAST(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(lower(text)), '\s+')) END AS INTEGER) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INTEGER) AS n_bpe_tokens,
           CAST(length(text) AS INTEGER) AS n_chars_actual
    FROM documents ORDER BY doc_id
    """,
)


# --- quality scoring -------------------------------------------------------
def _quality(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.round(X.punct_ratio("text"), 6).alias("punct_ratio"),
            F.round(X.stopword_ratio("text", X.LANG_STOPWORDS["en"]), 6).alias("stopword_ratio"),
            F.round(X.mean_token_length("text"), 6).alias("mean_token_len"),
            X.quality_score("text").alias("quality"),
        )
        .localCheckpoint(eager=False)  # pin before sort: orderBy's range
        # sampling re-executes an un-shuffled child (see text_html_strip)
        .orderBy("doc_id")
    )


register(
    "text_quality_scores",
    _quality,
    r"""
    WITH t AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
             greatest(length(text), 1) AS n_chars_g,
             (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9_\s]', '', 'g'))) AS n_punct
      FROM documents
    ), s AS (
      SELECT doc_id, text, n_punct / n_chars_g AS pr,
             len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it'], x)))
               / greatest(len(toks), 1) AS swr,
             list_sum(list_transform(toks, x -> length(x))) / greatest(len(toks), 1) AS mtl,
             least(length(text) / 400.0, 1.0) AS len_score
      FROM t
    )
    SELECT doc_id,
           round(pr, 6) AS punct_ratio,
           round(swr, 6) AS stopword_ratio,
           round(CAST(mtl AS DOUBLE), 6) AS mean_token_len,
           round(0.4 * len_score + 0.4 * least(swr * 4.0, 1.0) + 0.2 * (1.0 - least(pr * 5.0, 1.0)), 6) AS quality
    FROM s ORDER BY doc_id
    """,
)


# --- language id -----------------------------------------------------------
def _lang_id(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    # Hit counts as UNCONDITIONAL projection columns: codegen's
    # subexpression elimination evaluates the shared tokenize once across
    # the four filters, but it skips expressions inside when() branches —
    # so the argmax chain must reference plain int columns, not the filter
    # expressions (inlined chain: 8 splits/row, 21.5 s at sf3). The pin
    # stores four ints per doc, keeps CollapseProject from re-inlining the
    # hits into the chain, and stops orderBy's range sampling re-run.
    toks = X.tokens("text")

    def _hit(sw):
        # helper closure: a 2-arg lambda would be read by F.filter as
        # (element, index) and break the stopword binding
        return F.size(F.filter(toks, lambda t: t.isin(sw)))

    hits = d.select(
        "doc_id",
        "lang",
        *[
            _hit(sw).alias(f"h_{lang}")
            for lang, sw in sorted(X.LANG_STOPWORDS.items())
        ],
    ).localCheckpoint(eager=False)
    best_lang, best_hits = F.lit("und"), F.lit(0)
    for lang in sorted(X.LANG_STOPWORDS):
        take = F.col(f"h_{lang}") > best_hits
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(take, F.col(f"h_{lang}")).otherwise(best_hits)
    return hits.select(
        "doc_id", "lang", best_lang.alias("detected_lang")
    ).orderBy("doc_id")


_LANG_CASE = r"""
    WITH t AS (
      SELECT doc_id, lang,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM documents
    ), v AS (
      SELECT doc_id, lang,
             len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein','zu','den'], x))) AS h_de,
             len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it'], x))) AS h_en,
             len(list_filter(toks, x -> list_contains(['el','la','los','y','es','un','una','que'], x))) AS h_es,
             len(list_filter(toks, x -> list_contains(['le','la','les','et','est','un','une','de'], x))) AS h_fr
      FROM t
    )
    SELECT doc_id, lang,
           CASE
             WHEN h_fr > h_es AND h_fr > h_en AND h_fr > h_de AND h_fr > 0 THEN 'fr'
             WHEN h_es > h_en AND h_es > h_de AND h_es > 0 THEN 'es'
             WHEN h_en > h_de AND h_en > 0 THEN 'en'
             WHEN h_de > 0 THEN 'de'
             ELSE 'und'
           END AS detected_lang
    FROM v ORDER BY doc_id
    """

register("text_language_id", _lang_id, _LANG_CASE)


# --- fingerprints ----------------------------------------------------------
def _fingerprints(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            X.fingerprint_md5("text").alias("doc_md5"),
            X.rolling_min_fingerprint("text", 3).alias("min_shingle_md5"),
        )
        .localCheckpoint(eager=False)  # pin before sort: orderBy's range
        # sampling re-executes an un-shuffled child (see text_html_strip)
        .orderBy("doc_id")
    )


register(
    "text_fingerprints",
    _fingerprints,
    r"""
    WITH t AS (
      SELECT doc_id,
             regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS norm,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks
      FROM documents
    ), sh AS (
      SELECT doc_id, norm, toks,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct(list_transform(range(0, len(toks) - 2),
                       i -> concat_ws(' ', toks[i+1], toks[i+2], toks[i+3])))
                  ELSE [concat_ws(' ', toks)] END AS shingles
      FROM t
    )
    SELECT doc_id, md5(norm) AS doc_md5,
           list_min(list_transform(shingles, s -> md5(s))) AS min_shingle_md5
    FROM sh ORDER BY doc_id
    """,
)


# --- per-language aggregate profile ---------------------------------------
def _lang_profile(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
            F.round(F.avg(X.token_count("text")), 4).alias("avg_tokens"),
            # quality is a 6-decimal value: sum in exact decimal so the avg is
            # the same double in every engine/partitioning before rounding
            F.round(
                F.sum(X.quality_score("text").cast("decimal(12,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_quality"),
        )
        .orderBy("lang")
    )


register(
    "text_language_profile",
    _lang_profile,
    r"""
    WITH t AS (
      SELECT lang, text,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
             greatest(length(text), 1) AS n_chars_g,
             (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9_\s]', '', 'g'))) AS n_punct
      FROM documents
    ), q AS (
      SELECT lang, text, toks,
             round(0.4 * least(length(text) / 400.0, 1.0)
                 + 0.4 * least((len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it'], x)))
                               / greatest(len(toks), 1)) * 4.0, 1.0)
                 + 0.2 * (1.0 - least((n_punct / n_chars_g) * 5.0, 1.0)), 6) AS quality
      FROM t
    )
    SELECT lang, count(*) AS n_docs,
           round(avg(length(text)), 4) AS avg_chars,
           round(avg(CASE WHEN trim(text) = '' THEN 0 ELSE len(toks) END), 4) AS avg_tokens,
           round(CAST(sum(CAST(quality AS DECIMAL(12,6))) AS DOUBLE) / count(*), 6) AS avg_quality
    FROM q GROUP BY lang ORDER BY lang
    """,
)


# --- relational TF-IDF: top-3 terms per doc --------------------------------
def _tfidf_topk(spark, sf_dir):
    """TF-IDF built from groupBy/join/window — no HashingTF hash opacity,
    fully oracle-checkable. The doc-frequency table is one row per distinct
    term; Spark auto-broadcasts it into the tf join below the 64 MB
    threshold, and AQE falls back to shuffle join above it (100 TB path)."""
    from pyspark.sql import Window as W

    from ..functions.partitioning import fan_out

    d = read_table(spark, sf_dir, "documents")
    tok = fan_out(d.select("doc_id", "text")).select("doc_id", F.explode(X.tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = float(d.count())  # scalar action: one number to the driver
    scored = tf.join(dfreq, "term").withColumn(
        "tfidf", F.round(F.col("tf") * F.log(F.lit(n_docs + 1.0) / (F.col("df") + F.lit(1.0))), 6)
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "term", "tfidf")
        .orderBy("doc_id", "rank")
    )


register(
    "text_tfidf_topk",
    _tfidf_topk,
    r"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(((SELECT count(*) FROM documents) + 1.0) / (dfreq.df + 1.0)), 6) AS tfidf
      FROM tf JOIN dfreq ON tf.term = dfreq.term
    )
    SELECT doc_id, rank, term, tfidf FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT) AS rank
      FROM scored
    ) t WHERE rank <= 3
    ORDER BY doc_id, rank
    """,
)


# --- Python UDTF: sentence explode + per-doc stats -------------------------
def _sentence_stats(spark, sf_dir):
    from ..functions.udfs import SplitSentences

    spark.udtf.register("split_sentences", SplitSentences)
    read_table(spark, sf_dir, "documents").createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id,
               count(s.sentence) AS n_sentences,
               coalesce(CAST(sum(length(s.sentence)) AS BIGINT), 0) AS total_chars
        FROM __docs_udtf d, LATERAL split_sentences(d.text) AS s
        GROUP BY d.doc_id ORDER BY d.doc_id
        """
    )


register(
    "text_sentence_stats",
    _sentence_stats,
    r"""
    WITH s AS (
      SELECT doc_id,
             list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'), x -> trim(x)),
                         x -> x <> '') AS sents
      FROM documents WHERE text IS NOT NULL AND text <> ''
    )
    SELECT doc_id, CAST(len(sents) AS BIGINT) AS n_sentences,
           CAST(coalesce(list_sum(list_transform(sents, x -> length(x))), 0) AS BIGINT) AS total_chars
    FROM s WHERE len(sents) > 0
    ORDER BY doc_id
    """,
)


# --- global token frequency top-20 -----------------------------------------
def _top_terms(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(X.tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("term"))
        .limit(20)
    )


register(
    "text_top_terms",
    _top_terms,
    r"""
    SELECT term, count(*) AS freq FROM (
      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term FROM documents
    ) t GROUP BY term ORDER BY freq DESC, term ASC LIMIT 20
    """,
)


# --- end-to-end curation pipeline: lang filter + quality gate + exact dedup -
def _curation(spark, sf_dir):
    """The LLM-training-data curation flow as one declarative plan:
    keep English docs above a quality floor, drop exact duplicates by
    normalized-text fingerprint (keep lowest doc_id), report survivors and
    kept-chars per source. Every stage is a Catalyst-visible relational op,
    so the whole pipeline is one fused job graph — filter pushdown reaches
    the scan, the dedup shuffle carries only (fingerprint, min_id)."""
    from ..operators.dedup import exact_dedup

    d = read_table(spark, sf_dir, "documents")
    gated = d.filter(F.col("lang") == "en").filter(X.quality_score("text") >= 0.5)
    deduped = exact_dedup(
        gated.withColumn("__fp", X.fingerprint_md5("text")), ["__fp"], "doc_id",
        unique_order=True,  # doc_id unique in documents — single-shuffle form
    )
    return (
        deduped.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
        )
        .orderBy("source")
    )


register(
    "curation_pipeline",
    _curation,
    r"""
    WITH t AS (
      SELECT doc_id, source, text,
             regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
             greatest(length(text), 1) AS n_chars_g,
             (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9_\s]', '', 'g'))) AS n_punct
      FROM documents WHERE lang = 'en'
    ), q AS (
      SELECT doc_id, source, text,
             round(0.4 * least(length(text) / 400.0, 1.0)
                 + 0.4 * least((len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is','it'], x)))
                               / greatest(len(toks), 1)) * 4.0, 1.0)
                 + 0.2 * (1.0 - least((n_punct / n_chars_g) * 5.0, 1.0)), 6) AS quality,
             md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp
      FROM t
    ), gated AS (
      SELECT * FROM q WHERE quality >= 0.5
    ), keep AS (
      SELECT fp, min(doc_id) AS keep_id FROM gated GROUP BY fp
    )
    SELECT g.source, count(*) AS n_docs, CAST(sum(length(g.text)) AS BIGINT) AS total_chars
    FROM gated g JOIN keep k ON g.fp = k.fp AND g.doc_id = k.keep_id
    GROUP BY g.source ORDER BY g.source
    """,
)


# --- grouped-agg Arrow UDAF (geometric mean) --------------------------------
def _geomean_chars(spark, sf_dir):
    """Per-language geometric mean of document length via a pandas UDAF.

    Demonstrates the grouped-aggregate Arrow UDF shape; the oracle is the
    closed form exp(avg(ln x)). Groups here are small (languages); a JVM
    formulation (exp(avg(log))) is preferred at scale because the UDAF has
    no partial aggregation — documented trade-off in functions/udfs.py.
    """
    from ..functions.udfs import geo_mean_arrow

    d = read_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return (
        d.groupBy("lang")
        .agg(F.round(geo_mean_arrow(F.col("n_chars").cast("double")), 6).alias("geomean_chars"))
        .orderBy("lang")
    )


register(
    "text_geomean_chars_udaf",
    _geomean_chars,
    """
    SELECT lang, round(exp(avg(ln(CAST(n_chars AS DOUBLE)))), 6) AS geomean_chars
    FROM documents WHERE n_chars > 0
    GROUP BY lang ORDER BY lang
    """,
)


# --- greedy BPE token stats (fixed merge table; EXACT oracle since r12) -----
# The oracle replays greedy BPE inference in pure SQL via a delimiter-string
# encoding: a word's tokenization is "||t1||t2||...||tn||" and applying merge
# (l, r) is replace(s, '|l||r|', '|lr|') — SQL replace() is left-to-right
# non-overlapping, and the doubled delimiters make adjacent matches share no
# characters, so one replace() per merge rank is EXACTLY one merge sweep.
# Rank-sequential sweeps equal the kernel's greedy lowest-rank loop for any
# VALID merge table (each compound's parts rank earlier): a rank-k merge can
# only create pairs whose merges rank later than k, so by the time rank k is
# swept, no earlier-rank pair can reappear. _BPE_MERGES is valid by
# construction (th<-r0 before (th,e); an<-r4 before (an,d); in<-r2 before
# (in,g)).
_BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("r", "e"), ("o", "n"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("an", "d"), ("in", "g"), ("t", "o"), ("e", "s"), ("o", "u"),
    ("s", "t"),
]


def _bpe_token_stats(spark, sf_dir):
    from ..functions.udfs import bpe_token_stats

    d = read_table(spark, sf_dir, "documents")
    return bpe_token_stats(d, "doc_id", "text", _BPE_MERGES).orderBy("doc_id")


def _bpe_token_stats_oracle() -> str:
    enc = r"'||' || regexp_replace(w, '(.)', '\1||', 'g')"
    for l, r in _BPE_MERGES:
        enc = f"replace({enc}, '|{l}||{r}|', '|{l}{r}|')"
    return rf"""
    WITH words AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                w -> w <> '')) AS w
      FROM documents
    ), enc AS (
      SELECT doc_id, {enc} AS s FROM words
    ), per_word AS (
      SELECT doc_id,
             length(s) - length(replace(s, '|', '')) AS pipes,
             length(replace(s, '|', '')) AS sumlen
      FROM enc
    ), per_doc AS (
      SELECT doc_id, SUM(pipes // 2 - 1) AS n_tok, SUM(sumlen) AS sumlen
      FROM per_word GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(p.n_tok, 0) AS BIGINT) AS n_bpe_tokens,
           CASE WHEN coalesce(p.n_tok, 0) > 0
                THEN round(p.sumlen / p.n_tok, 6) + 0.0 ELSE 0.0
           END AS mean_token_len
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    ORDER BY d.doc_id
    """


register("text_bpe_token_stats", _bpe_token_stats, _bpe_token_stats_oracle())


# --- BPE merge-table learning (EXACT oracle since r12: the 6-round argmax
# loop unrolls as chained MATERIALIZED CTEs — per round, weighted adjacent-
# pair counts over the delimiter-encoded vocabulary, ORDER BY cnt DESC, l, r
# LIMIT 1 for the deterministic argmax, then the same replace() merge sweep;
# the data-dependent winners flow between rounds as 1-row CTEs, so the
# oracle replays the learning itself, not staged literals) -------------------
def _bpe_learned_merges(spark, sf_dir):
    from ..functions.udfs import bpe_learn_merges

    d = read_table(spark, sf_dir, "documents")
    merges = bpe_learn_merges(d, "text", n_merges=6)
    rows = [(i + 1, l, r, int(c)) for i, (l, r, c) in enumerate(merges)]
    return spark.createDataFrame(rows, "rank int, left string, right string, pair_count long")


def _bpe_learned_merges_oracle(n_merges: int = 6) -> str:
    parts = [r"""
    WITH toks AS MATERIALIZED (
      SELECT unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                w -> w <> '')) AS w
      FROM documents
    ), vocab0 AS MATERIALIZED (
      SELECT count(*) AS c, '||' || regexp_replace(w, '(.)', '\1||', 'g') AS s
      FROM toks GROUP BY w
    )"""]
    for k in range(1, n_merges + 1):
        parts.append(f""", p{k} AS MATERIALIZED (
      SELECT t.l, t.r, SUM(v.c) AS cnt
      FROM vocab{k - 1} v,
           LATERAL (
             SELECT tk[i] AS l, tk[i + 1] AS r
             FROM (SELECT list_filter(string_split(v.s, '|'), x -> x <> '') AS tk) q,
                  LATERAL unnest(range(1, len(tk))) u(i)
           ) t
      GROUP BY t.l, t.r
    ), t{k} AS MATERIALIZED (
      SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1
    ), vocab{k} AS MATERIALIZED (
      SELECT v.c,
             replace(v.s, '|' || t.l || '||' || t.r || '|',
                          '|' || t.l || t.r || '|') AS s
      FROM vocab{k - 1} v, t{k} t
    )""")
    sel = "\n      UNION ALL ".join(
        f"SELECT {k} AS rank, l AS \"left\", r AS \"right\", "
        f"CAST(cnt AS BIGINT) AS pair_count FROM t{k}"
        for k in range(1, n_merges + 1)
    )
    parts.append(f"\n    SELECT * FROM (\n      {sel}\n    ) ORDER BY rank")
    return "".join(parts)


register("text_bpe_learned_merges", _bpe_learned_merges, _bpe_learned_merges_oracle())


# --- BPE fixture roundtrip (EXACT oracles) ----------------------------------
# The corpus-scale BPE queries above are rows-only by nature (the merge
# loop is not SQL-expressible). These twins close the evidence gap the way
# the multimodal codec queries do: a closed-form micro-corpus whose merge
# order is PROVABLE by hand (overlapping-pair counts, left-to-right
# non-overlapping merge application, lexicographic tie-break at count 3
# between ('ban','d') and ('d','ana')), with the expected outputs
# hard-coded in the oracle as VALUES. The corpus is deliberately
# sf-independent — the subject under test is the algorithm, not the data.
#
#   vocab: banana x4, bandana x3, ananas x2, ns/b/nd x1 (unseen-pair foil)
#   provable merges: (a,n,18) (an,a,9) (b,an,7) (ban,ana,4) (ban,d,3)
#                    (band,ana,3)
def _bpe_fixture_docs(spark):
    return spark.createDataFrame(
        [
            (1, "banana banana banana banana"),
            (2, "bandana bandana bandana"),
            (3, "ananas ananas"),
            (4, "ns b nd"),
        ],
        "doc_id long, text string",
    )


def _bpe_fixture_merges(spark, sf_dir):
    from ..functions.udfs import bpe_learn_merges

    merges = bpe_learn_merges(_bpe_fixture_docs(spark), "text", n_merges=6)
    rows = [(i + 1, l, r, int(c)) for i, (l, r, c) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "merge_rank int, merge_left string, merge_right string, pair_count long"
    )


register(
    "text_bpe_fixture_merges",
    _bpe_fixture_merges,
    """
    SELECT CAST(merge_rank AS INTEGER) AS merge_rank, merge_left, merge_right,
           CAST(pair_count AS BIGINT) AS pair_count
    FROM (VALUES (1, 'a', 'n', 18), (2, 'an', 'a', 9), (3, 'b', 'an', 7),
                 (4, 'ban', 'ana', 4), (5, 'ban', 'd', 3), (6, 'band', 'ana', 3))
         t(merge_rank, merge_left, merge_right, pair_count)
    ORDER BY merge_rank
    """,
)


def _bpe_fixture_stats(spark, sf_dir):
    """End-to-end learn -> encode: greedy inference with the merge table
    just learned from the same fixture. banana/bandana re-collapse to one
    token; ananas stops at [an, ana, s] (no (an,ana) merge exists); doc 4's
    words contain no learned pair and stay at character tokens."""
    from ..functions.udfs import bpe_learn_merges, bpe_token_stats

    docs = _bpe_fixture_docs(spark)
    merges = [(l, r) for l, r, _ in bpe_learn_merges(docs, "text", n_merges=6)]
    return bpe_token_stats(docs, "doc_id", "text", merges).orderBy("doc_id")


register(
    "text_bpe_fixture_stats",
    _bpe_fixture_stats,
    """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens,
           CAST(mean_token_len AS DOUBLE) + 0.0 AS mean_token_len
    FROM (VALUES (1, 4, 6.0), (2, 3, 7.0), (3, 6, 2.0), (4, 5, 1.0))
         t(doc_id, n_bpe_tokens, mean_token_len)
    ORDER BY doc_id
    """,
)


# --- HTML boilerplate stripping (crawl-ingest main-content extraction) ------
_HTML_POST = (
    '</p><script type="text/javascript">var x = 1 < 2;</script>'
    "<footer>&copy; 2026 example</footer></body></html>"
)


def _html_strip(spark, sf_dir):
    """Per-doc main-content extraction stats over planted HTML pages.

    The corpus is wrapped in a deterministic page skeleton (head/style/nav/
    script/footer — built with IDENTICAL string expressions in the oracle,
    so the planted chrome is real boilerplate, not empty-input vacuity) and
    ``strip_html`` recovers the content: script/style blocks die content-
    and-all, tags and entities become whitespace, whitespace collapses.
    Everything is a chained codegen'd regexp projection — zero shuffle, the
    scan dominates; retention ratio is the page-weight statistic a crawl
    datacard reports.
    """
    d = read_table(spark, sf_dir, "documents")
    page = F.concat(
        F.lit('<html><head><title>'),
        F.col("source"),
        F.lit('</title><style>p{color:red}</style></head>'
              '<body><div class="nav">Home &amp; About | Contact</div><p>'),
        F.col("text"),
        F.lit(_HTML_POST),
    )
    base = d.select("doc_id", page.alias("page"))
    clean = X.strip_html("page")
    out = base.select(
        "doc_id",
        F.length("page").alias("raw_len"),
        F.length(clean).alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
        F.round(F.length(clean) / F.length("page"), 6).alias("retention"),
    )
    # pin the NARROW result before the sort: orderBy's range-partitioner
    # SAMPLES its child, and with no shuffle between scan and sort the
    # sample pass re-executes the whole regex chain (measured 13.5 s vs
    # 4.1 s unordered at sf3; lazily checkpointed+ordered: 4.4 s)
    return out.localCheckpoint(eager=False).orderBy("doc_id")


register(
    "text_html_strip",
    _html_strip,
    r"""
    WITH pages AS (
      SELECT doc_id,
             '<html><head><title>' || source ||
             '</title><style>p{color:red}</style></head>' ||
             '<body><div class="nav">Home &amp; About | Contact</div><p>' ||
             text ||
             '</p><script type="text/javascript">var x = 1 < 2;</script>' ||
             '<footer>&copy; 2026 example</footer></body></html>' AS page
      FROM documents
    ), cleaned AS (
      SELECT doc_id, page,
             trim(regexp_replace(
               regexp_replace(
                 regexp_replace(page,
                   '(?s)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>', ' ', 'g'),
                 '<[^>]+>|&[A-Za-z]+;|&#[0-9]+;', ' ', 'g'),
               '\s+', ' ', 'g')) AS clean
      FROM pages
    )
    SELECT doc_id,
           CAST(length(page) AS INTEGER) AS raw_len,
           CAST(length(clean) AS INTEGER) AS clean_len,
           md5(clean) AS clean_md5,
           round(CAST(length(clean) AS DOUBLE) / length(page), 6) AS retention
    FROM cleaned ORDER BY doc_id
    """,
)
