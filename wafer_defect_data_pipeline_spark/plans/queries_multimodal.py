"""Multimodal binary-column queries (extension surface §2.9).

Binary payloads derived deterministically from document text so the
mapInPandas byte-pipeline is exercisable (and oracle-checkable: sha256 and
octet_length exist in both engines) without real media in the test data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.multimodal import attach_binary_payload, extract_metadata
from ..sources import read_table
from .registry import register


def _binary_metadata(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    payloads = attach_binary_payload(d)
    return extract_metadata(payloads).orderBy("doc_id")


register(
    "multimodal_binary_metadata",
    _binary_metadata,
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256,
           CASE WHEN text LIKE 'RIFF%' THEN 'audio/wav'
                WHEN text LIKE 'ID3%' THEN 'audio/mp3'
                ELSE 'application/octet-stream' END AS media_type,
           CAST(ceil(octet_length(encode(text)) / 65536.0) AS INTEGER) AS chunk_count
    FROM documents ORDER BY doc_id
    """,
)


# binary columns survive projection/filter/join like any other type: group
# payload sizes by language via a join back to the metadata table
def _binary_size_by_lang(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    meta = extract_metadata(attach_binary_payload(d))
    return (
        meta.join(d.select("doc_id", "lang"), on="doc_id")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_bytes").alias("total_bytes"))
        .orderBy("lang")
    )


register(
    "multimodal_size_by_lang",
    _binary_size_by_lang,
    """
    SELECT lang, count(*) AS n_docs,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
    FROM documents GROUP BY lang ORDER BY lang
    """,
)


# --- frame sampling: per-doc frame counts (byte-window plumbing) -----------
def _frame_counts(spark, sf_dir):
    from ..operators.multimodal import attach_binary_payload, sample_frames

    d = read_table(spark, sf_dir, "documents")
    frames = sample_frames(attach_binary_payload(d), frame_bytes=128)
    return (
        frames.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_frames"), F.sum(F.length("frame")).alias("n_bytes"))
        .orderBy("doc_id")
    )


register(
    "multimodal_frame_sample",
    _frame_counts,
    """
    SELECT doc_id,
           CAST(greatest(ceil(length(text) / 128.0), 1) AS BIGINT) AS n_frames,
           CAST(length(text) AS BIGINT) AS n_bytes
    FROM documents ORDER BY doc_id
    """,
)
