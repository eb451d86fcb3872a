"""Multimodal (image/audio/video) column plumbing (extension surface §2.9).

Media travel as opaque ``binary`` payload columns with typed metadata
structs — the Spark-native layout for multimodal training data (one row per
asset, bytes inline for small assets or a URI for large ones). Everything
that can be computed without a codec (sizes, hashes, magic-byte sniffing,
batch shapes) runs vectorized via ``mapInPandas`` over Arrow record
batches; the actual decode step is stubbed behind an import-try because no
image/audio codec library ships in this environment — the Spark-side
schema, partitioning, UDF signatures and batch handling are real and
tested, the pixel math is not (NotImplementedError, as mandated by the
build brief).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: magic-byte prefixes -> sniffed media type
MAGIC_PREFIXES: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"RIFF", "audio/wav"),
    (b"ID3", "audio/mp3"),
    (b"\x00\x00\x00", "video/mp4"),
]

METADATA_SCHEMA = (
    "doc_id long, n_bytes long, sha256 string, media_type string, chunk_count int"
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Test harness: derive a deterministic binary payload from a text column.

    Stands in for real media bytes so the binary pipeline is exercisable on
    the driver's documents table. Production reads real bytes via
    ``spark.read.format("binaryFile")`` or a parquet binary column.
    """
    return df.select(F.col(id_col), F.encode(F.col(text_col), "utf-8").alias("payload"))


def _sniff(b: bytes | None) -> str:
    if b is None:
        return "unknown"
    for prefix, mtype in MAGIC_PREFIXES:
        if b.startswith(prefix):
            return mtype
    return "application/octet-stream"


def extract_metadata(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", chunk_bytes: int = 65536) -> DataFrame:
    """Vectorized metadata pass over binary payloads via ``mapInPandas``.

    Arrow delivers each partition as pandas batches of raw bytes; one Python
    call per batch (not per row) computes size, sha256, magic-type and how
    many ``chunk_bytes`` chunks a chunked store would split the asset into.
    At scale this is the pattern for any byte-level feature extraction —
    the partition never leaves the executor, and the output is a narrow
    metadata table that can be joined/filterd without touching bytes again.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)).astype("int64"),
                    "sha256": payloads.map(lambda b: hashlib.sha256(b or b"").hexdigest()),
                    "media_type": payloads.map(_sniff),
                    "chunk_count": payloads.map(
                        lambda b: 0 if not b else (len(b) + chunk_bytes - 1) // chunk_bytes
                    ).astype("int32"),
                }
            )

    return df.mapInPandas(batches, schema=METADATA_SCHEMA)


def decode_image(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Decode image bytes -> (height, width, mode) via mapInPandas.

    STUB: requires an image codec (PIL). The environment ships none, so
    this raises unless PIL is importable; the mapInPandas plumbing is the
    real, tested part (same batch shape as extract_metadata).
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode needs a codec library (PIL/opencv); not available in this "
            "environment — plumbing is exercised via extract_metadata instead"
        ) from e

    import io

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from PIL import Image

        for pdf in it:
            sizes = pdf[payload_col].map(lambda b: Image.open(io.BytesIO(b)).size if b else (0, 0))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": sizes.map(lambda s: s[0]).astype("int32"),
                    "height": sizes.map(lambda s: s[1]).astype("int32"),
                }
            )

    return df.mapInPandas(batches, schema="doc_id long, width int, height int")


def sample_frames(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", frame_bytes: int = 1024
) -> DataFrame:
    """Frame sampling over binary payloads: one output row per fixed-size
    window (the batch shape of video frame extraction). The byte slicing is
    real; a codec would replace ``_slice`` with actual frame decode — the
    schema (id, frame_idx, frame) and the mapInPandas fan-out are what a
    100 TB video pipeline exercises.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                b = b or b""
                for j in range(0, max(len(b), 1), frame_bytes):
                    ids.append(i)
                    idxs.append(j // frame_bytes)
                    frames.append(bytes(b[j : j + frame_bytes]))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.mapInPandas(batches, schema=f"{id_col} long, frame_idx int, frame binary")


def resize_image(
    df: DataFrame, width: int, height: int, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Image resize plumbing. With a codec (PIL) present this decodes,
    resizes, and re-encodes; without one it raises NotImplementedError —
    per the build brief the Spark-side schema and batch handling are real,
    the pixel math is stubbed."""
    try:
        from PIL import Image  # noqa: F401

        have_codec = True
    except ImportError:
        have_codec = False

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not have_codec:
            raise NotImplementedError(
                "image resize requires a codec library (PIL); not available in this environment"
            )
        import io

        from PIL import Image

        for pdf in it:
            out = []
            for b in pdf[payload_col]:
                img = Image.open(io.BytesIO(b)).resize((width, height))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                out.append(buf.getvalue())
            yield pd.DataFrame({id_col: pdf[id_col], "resized": out})

    return df.mapInPandas(batches, schema=f"{id_col} long, resized binary")


def extract_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", dim: int = 8
) -> DataFrame:
    """Deterministic fake feature extractor: ``dim`` floats derived from the
    payload's sha256 (uniform in [0,1)). Stands in for an embedding model so
    the array<float> column shape, Arrow batching, and downstream similarity
    operators are exercisable end-to-end without model weights."""
    import hashlib as _hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for b in pdf[payload_col]:
                digest = _hashlib.sha256(b or b"").digest()
                feats.append(
                    [int.from_bytes(digest[4 * j : 4 * j + 4], "big") / 2**32 for j in range(dim)]
                )
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.mapInPandas(batches, schema=f"{id_col} long, features array<double>")
