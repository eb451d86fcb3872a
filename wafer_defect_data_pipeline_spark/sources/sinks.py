"""Sinks.

Parquet is the native sink (columnar, splittable, schema-carrying).
``write_csv_single`` exists only for parity with the reference's
single-file CSV output (``/root/reference/main.py:104-111``): a
``coalesce(1)`` funnels everything through one task and MUST NOT be used at
scale — the default CSV sink writes one file per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", encoding: str = "UTF-8") -> None:
    """Distributed CSV sink — one file per partition (the scale path)."""
    df.write.mode(mode).option("header", True).option("encoding", encoding).csv(path)


def write_csv_single(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    encoding: str = "UTF-8",
    bom: bool = False,
) -> None:
    """Single-file CSV, parity with the reference sink. Small outputs only.

    ``bom=True`` reproduces the reference's ``encoding="utf-8-sig"``
    (``main.py:110`` — Excel-friendly BOM prefix). The JVM has no
    "UTF-8-SIG" charset, so the BOM is prepended driver-side to the one
    part file — valid exactly because this sink is single-file by contract.
    The driver-side rewrite uses local-filesystem I/O, so ``bom=True``
    additionally requires a LOCAL path and ``mode="overwrite"`` (an
    ``append`` leaves earlier part files in the directory, making "the one
    part file" ambiguous); both are checked up front so a bad combination
    fails before any data is written, not after.
    """
    if bom:
        if "://" in path:
            scheme = path.split("://", 1)[0]
        else:
            # A bare path resolves against the Hadoop defaultFS, NOT the
            # local filesystem: on a cluster with fs.defaultFS=hdfs://...
            # the part file lands where the driver-side BOM rewrite can't
            # reach it. Ask the session's Hadoop conf instead of assuming.
            default_fs = (
                df.sparkSession.sparkContext._jsc.hadoopConfiguration().get(
                    "fs.defaultFS", "file:///"
                )
            )
            scheme = (
                default_fs.split("://", 1)[0] if "://" in default_fs else "file"
            )
        if scheme != "file":
            raise ValueError(
                f"write_csv_single(bom=True) prepends the BOM via local-file "
                f"I/O and cannot reach scheme {scheme!r} ({path!r}); write "
                "without bom and post-process, or use a local path."
            )
        if mode != "overwrite":
            raise ValueError(
                "write_csv_single(bom=True) requires mode='overwrite': with "
                f"mode={mode!r} earlier part files may remain and the single "
                "part file to prefix is ambiguous."
            )
    df.coalesce(1).write.mode(mode).option("header", True).option("encoding", encoding).csv(path)
    if bom:
        import os

        path = path.removeprefix("file://")
        [part] = [
            f for f in os.listdir(path) if f.startswith("part-") and f.endswith(".csv")
        ]
        fp = os.path.join(path, part)
        with open(fp, "rb") as fh:
            data = fh.read()
        if not data.startswith(b"\xef\xbb\xbf"):
            with open(fp, "wb") as fh:
                fh.write(b"\xef\xbb\xbf" + data)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink — one file per partition, splittable on read."""
    df.write.mode(mode).json(path)


def compact_parquet(
    spark, in_path: str, out_path: str, target_bytes: int = 128 << 20
) -> int:
    """Rewrite a parquet dataset into ~``target_bytes`` files; returns the
    output file count.

    The small-files problem is the quiet killer of 100 TB table scans: a
    million 1 MB files means a million scheduler tasks and footer reads.
    Compaction reads the dataset once and rewrites it with partition count
    sized from actual input bytes. Uses the Hadoop FS API so it sees the
    same storage Spark does (HDFS/S3A/local alike).
    """
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n = max(1, int(total // target_bytes) + (1 if total % target_bytes else 0))
    spark.read.parquet(in_path).repartition(n).write.mode("overwrite").parquet(out_path)
    out = jvm.org.apache.hadoop.fs.Path(out_path)
    return sum(
        1
        for f in fs.listStatus(out)
        if f.getPath().getName().endswith(".parquet")
    )
