"""Streaming daily-crawl span dedup: probe-then-merge per micro-batch.

The batch triad in ``operators/dedup.py`` (``gram_index`` build →
``incremental_duplicated_spans`` probe → ``merge_gram_index`` fold) is the
admit-once loop a crawl pipeline runs per day; this module runs the SAME
loop as a Structured Streaming ``foreachBatch`` job, so each arriving file
of documents is (1) probed against the index as it stood BEFORE the batch
— history is the authority, a batch never taints itself — and (2) folded
into the index for every later batch. Day-2 copies of day-1 text are
detected without any rescan of historical text, which is the whole point:
at 100 TB of accumulated corpus the per-batch cost is the batch's own
explode + two narrow (gh, n) joins.

State discipline mirrors ``run_foreachbatch_upsert_batch``
(streaming/events.py): the gram index lives as a versioned parquet
snapshot on storage, the driver holds only the current snapshot PATH, and
superseded snapshots are vacuumed — index size scales with cluster
storage, not driver memory. Snapshots are written ``repartition(gh)`` so
successive merges and probes co-locate on the same key layout.

No reference analogue (the reference is a single-table batch ETL —
``/root/reference/src/preprocessing.py``); this is extension-surface
streaming per SURVEY.md §2.9.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_streaming_span_dedup(
    spark: SparkSession,
    sf_dir: str,
    k: int = 20,
    min_span: int = 40,
) -> DataFrame:
    """Bounded replay of the two-day crawl: batch 1 (novel payloads +
    suffix copies of history) then batch 2 (verbatim copies of batch 1's
    novel text + genuinely new docs), streamed oldest-file-first with one
    file per micro-batch. Returns every detected span across both batches.

    Deterministic end to end: file order is pinned by mtime, the probe is
    presence-only (``min_index_count=1``), and the gram index is a pure
    count table — so the result is the same as running the batch triad by
    hand, and the DuckDB oracle replays it exactly (batch 1 probed against
    grams(history), batch 2 against grams(history ∪ batch 1)).
    """
    import os
    import shutil

    from ..operators.dedup import (
        gram_index,
        incremental_duplicated_spans,
        merge_gram_index,
    )
    from ..sources import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    work = f"/tmp/wdps_stream_spans_{uuid.uuid4().hex[:8]}"
    staged, out_dir, idx_dir = f"{work}/in", f"{work}/spans", f"{work}/idx"
    os.makedirs(staged)

    day1 = d.filter(F.col("doc_id") % 20 == 10).select(
        (F.col("doc_id") + F.lit(3_000_000)).alias("doc_id"),
        F.concat(
            F.lit("batchone novel payload number "),
            F.col("doc_id").cast("string"),
            F.lit(" padding alpha beta gamma delta epsilon"),
        ).alias("text"),
    )
    batch1 = day1.unionByName(
        d.filter(F.col("doc_id") % 20 == 0).select(
            (F.col("doc_id") + F.lit(6_000_000)).alias("doc_id"),
            F.expr("substring(text, 31)").alias("text"),
        )
    )
    batch2 = day1.select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id"), "text"
    ).unionByName(
        d.filter(F.col("doc_id") % 20 == 5).select(
            (F.col("doc_id") + F.lit(5_000_000)).alias("doc_id"),
            F.concat(
                F.lit("daytwo novel doc "),
                F.col("doc_id").cast("string"),
                F.lit(" qqz"),
            ).alias("text"),
        )
    )
    # one parquet FILE per day, strictly increasing mtimes: the file-stream
    # source replays oldest-first, so micro-batch order == day order
    for i, b in enumerate((batch1, batch2), start=1):
        tmp = f"{work}/day{i}"
        b.coalesce(1).write.parquet(tmp)
        [part] = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
        dst = f"{staged}/day{i}.parquet"
        shutil.move(f"{tmp}/{part}", dst)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))

    # index v0: history only (never re-scanned after this)
    gram_index(d, "doc_id", "text", k=k).repartition(8, "gh").write.parquet(
        f"{idx_dir}/v0"
    )
    cur: dict[str, str] = {"path": f"{idx_dir}/v0"}

    def probe_then_merge(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        idx = sp.read.parquet(cur["path"])
        # probe FIRST — against the index as of the previous batch
        incremental_duplicated_spans(
            batch_df, idx, "doc_id", "text", k=k, min_span=min_span
        ).write.mode("append").parquet(out_dir)
        # then admit the batch for every later one
        nxt = f"{idx_dir}/v{batch_id + 1}"
        merge_gram_index(
            idx, gram_index(batch_df, "doc_id", "text", k=k)
        ).repartition(8, "gh").write.parquet(nxt)
        old, cur["path"] = cur["path"], nxt
        shutil.rmtree(old, ignore_errors=True)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .writeStream.foreachBatch(probe_then_merge)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).orderBy("doc_id", "span_start")


def run_streaming_minhash_probe(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.4,
) -> DataFrame:
    """Near-dup daily-crawl dedup as a stream: the MinHash analogue of
    :func:`run_streaming_span_dedup`. Each micro-batch of documents is
    LSH-band-probed against the SIGNATURE index as it stood before the
    batch (``minhash_lsh_probe`` — only the batch is shingled, history
    text is never re-read), then the batch's own signatures are admitted
    into the versioned index snapshot for every later batch.

    Two staged days, oldest-mtime-first: day 1 carries near-dups of
    history (suffix ``' fresh crawl'``) plus novel payload docs; day 2
    carries near-dups OF DAY 1's novel docs (suffix ``' extra'``,
    detectable only through the admitted signatures) plus genuinely new
    docs. Every stage is md5-deterministic, so the banded candidates AND
    the overlap estimates replay exactly in SQL — including which
    near-threshold pairs happen to band-collide.

    Returns ``(new_id, index_id, est_jaccard)`` across both days.
    """
    import os
    import shutil

    from ..operators.dedup import minhash_lsh_probe, minhash_signatures
    from ..sources import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    work = f"/tmp/wdps_stream_mh_{uuid.uuid4().hex[:8]}"
    staged, out_dir, idx_dir = f"{work}/in", f"{work}/pairs", f"{work}/idx"
    os.makedirs(staged)

    novel1 = d.filter(F.col("doc_id") % 20 == 10).select(
        (F.col("doc_id") + F.lit(2_000_000)).alias("doc_id"),
        F.concat(
            F.lit("novel document "),
            (F.col("doc_id") + F.lit(2_000_000)).cast("string"),
            F.lit(" zzz unique alpha beta gamma"),
        ).alias("text"),
    )
    batch1 = d.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + F.lit(2_000_000)).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" fresh crawl")).alias("text"),
    ).unionByName(novel1)
    batch2 = d.filter(F.col("doc_id") % 20 == 10).select(
        (F.col("doc_id") + F.lit(7_000_000)).alias("doc_id"),
        F.concat(
            F.lit("novel document "),
            (F.col("doc_id") + F.lit(2_000_000)).cast("string"),
            F.lit(" zzz unique alpha beta gamma extra"),
        ).alias("text"),
    ).unionByName(
        d.filter(F.col("doc_id") % 20 == 15).select(
            (F.col("doc_id") + F.lit(7_000_000)).alias("doc_id"),
            F.concat(
                F.lit("second crawl "),
                (F.col("doc_id") + F.lit(7_000_000)).cast("string"),
                F.lit(" qqq fresh doc"),
            ).alias("text"),
        )
    )
    for i, b in enumerate((batch1, batch2), start=1):
        tmp = f"{work}/day{i}"
        b.coalesce(1).write.parquet(tmp)
        [part] = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
        dst = f"{staged}/day{i}.parquet"
        shutil.move(f"{tmp}/{part}", dst)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))

    minhash_signatures(d, "doc_id", "text", n_hashes=16).select(
        "doc_id", "sig"
    ).write.parquet(f"{idx_dir}/v0")
    cur: dict[str, str] = {"path": f"{idx_dir}/v0"}

    def probe_then_admit(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        idx = sp.read.parquet(cur["path"])
        minhash_lsh_probe(
            batch_df, idx, "doc_id", "text",
            n_hashes=16, n_bands=4, threshold=threshold,
        ).write.mode("append").parquet(out_dir)
        nxt = f"{idx_dir}/v{batch_id + 1}"
        idx.unionByName(
            minhash_signatures(batch_df, "doc_id", "text", n_hashes=16).select(
                "doc_id", "sig"
            )
        ).write.parquet(nxt)
        old, cur["path"] = cur["path"], nxt
        shutil.rmtree(old, ignore_errors=True)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .writeStream.foreachBatch(probe_then_admit)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).orderBy("new_id", "index_id")


def run_streaming_entity_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming record linkage: each micro-batch of customer records
    probes the ADMITTED master-entity snapshot (operators/entity.py
    ``blocking_probe`` — blocking-key equi-join + Levenshtein verify,
    history names never self-join), then the batch is admitted for every
    later one. The entity-resolution analogue of the span/minhash admit
    loops above: day-2 typos of day-1 novel records are linkable only
    through the admission step.

    Two staged days, oldest-mtime-first: day 1 carries one-typo variants
    of history customers (pos 11 -> 'X') plus novel records with fresh
    key ranges; day 2 carries typos OF DAY 1's novel records
    (pos 10 -> 'Z') plus genuinely new ones. Names are built from the
    same lpad arithmetic in the DuckDB oracle, and Levenshtein is
    integer-exact, so the probe output replays bit-for-bit (batch 1 vs
    history, batch 2 vs history + batch 1).

    Returns ``(new_id, index_id, lev_dist)`` across both days.
    """
    import os
    import shutil

    from ..operators.entity import blocking_probe
    from ..sources import read_table

    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nk"),
    )
    work = f"/tmp/wdps_stream_er_{uuid.uuid4().hex[:8]}"
    staged, out_dir, idx_dir = f"{work}/in", f"{work}/pairs", f"{work}/idx"
    os.makedirs(staged)

    novel_name = F.concat(
        F.lit("Customer#"), F.lpad((F.col("id") + F.lit(500_000)).cast("string"), 9, "0")
    )
    batch1 = c.filter(F.col("id") % 20 == 0).select(
        (F.col("id") + F.lit(1_000_000)).alias("id"),
        F.concat(
            F.substring("name", 1, 10), F.lit("X"), F.expr("substring(name, 12)")
        ).alias("name"),
        "nk",
    ).unionByName(
        c.filter(F.col("id") % 20 == 10).select(
            (F.col("id") + F.lit(3_000_000)).alias("id"),
            novel_name.alias("name"),
            "nk",
        )
    )
    batch2 = c.filter(F.col("id") % 20 == 10).select(
        (F.col("id") + F.lit(4_000_000)).alias("id"),
        F.concat(
            F.lit("Customer#Z"),
            F.substring(
                F.lpad((F.col("id") + F.lit(500_000)).cast("string"), 9, "0"), 2, 8
            ),
        ).alias("name"),
        "nk",
    ).unionByName(
        c.filter(F.col("id") % 20 == 5).select(
            (F.col("id") + F.lit(5_000_000)).alias("id"),
            F.concat(
                F.lit("Customer#"),
                F.lpad((F.col("id") + F.lit(600_000)).cast("string"), 9, "0"),
            ).alias("name"),
            "nk",
        )
    )
    for i, b in enumerate((batch1, batch2), start=1):
        tmp = f"{work}/day{i}"
        b.coalesce(1).write.parquet(tmp)
        [part] = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
        dst = f"{staged}/day{i}.parquet"
        shutil.move(f"{tmp}/{part}", dst)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dst, (1_000_000_000 + i, 1_000_000_000 + i))

    c.write.parquet(f"{idx_dir}/v0")
    cur: dict[str, str] = {"path": f"{idx_dir}/v0"}

    def block_cols(df: DataFrame) -> list:
        return [df["nk"], F.substring(df["name"], 13, 6)]

    def probe_then_admit(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        idx = sp.read.parquet(cur["path"])
        blocking_probe(
            batch_df, idx, "id", "name", block_cols, max_distance=2
        ).write.mode("append").parquet(out_dir)
        nxt = f"{idx_dir}/v{batch_id + 1}"
        idx.unionByName(batch_df.select("id", "name", "nk")).write.parquet(nxt)
        old, cur["path"] = cur["path"], nxt
        shutil.rmtree(old, ignore_errors=True)

    q = (
        spark.readStream.schema("id long, name string, nk int")
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .writeStream.foreachBatch(probe_then_admit)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).orderBy("new_id", "index_id")
