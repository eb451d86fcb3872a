"""Product quantization (PQ) for embedding compression + ADC search
(extension surface §2.9 — similarity-search scale path).

PQ (Jegou, Douze & Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011 — public literature; the codebook-per-subspace idea
also underlies FAISS's IVF-PQ indexes) splits a d-dim vector into ``m``
subvectors and encodes each against a per-subspace codebook of ``k``
centroids, compressing a vector to ``m`` small codes. Search uses
asymmetric distance computation (ADC): per query, a tiny ``m x k``
distance table is precomputed against the codebooks, and a corpus
vector's approximate distance is the sum of ``m`` table lookups — no
per-pair float math over raw vectors. At 100 TB this is the difference
between shuffling 64 floats and ``m`` bytes per corpus vector.

Determinism / oracle design: ALL arithmetic is integer. Vector values
quantize to ``round(v * scale)`` longs up front, the codebook is the
subvectors of the ``k`` lowest-id vectors (a deterministic sampled
codebook — exactly k-means++-free init, zero iterations — so no RNG and
no iterative refinement to replay), and every distance is an integer sum
of squared integer diffs. The DuckDB oracle therefore replays the whole
pipeline with bit-exact hashes: there is no float fold-order hazard
anywhere, the same trade the int8 recall query makes
(plans/queries_curation.py `embedding_quantization_recall`).

Scale shape:
- codebook: ``m * k * d_sub`` rows — broadcast everywhere, never shuffled;
- encode: corpus explodes to ``N * d`` rows once, broadcast-joins the
  codebook (fan-out ``k`` inside a map-side-combinable sum), and the
  argmin is a lexicographic ``min(struct(dist, code))`` per (id, s) —
  a partial-aggregating groupBy, no window over raw distances;
- ADC: the per-query distance table (``Q * m * k`` rows) broadcasts onto
  the codes table (``N * m`` rows); the per-(query, id) sum is again
  map-side combinable, and top-k uses the two-level rank (partition-local
  k first) so no single reducer ever sorts a whole query's corpus — the
  same pattern as operators/sketches.kmv_distinct_estimate.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _subvectors(
    df: DataFrame, id_col: str, vec_col: str, dsub: int, scale: int
) -> DataFrame:
    """Explode ``vec_col`` to quantized subvector components
    ``(id, s, j, iv)``: subspace ``s = pos // dsub``, within-subspace
    position ``j = pos % dsub``, value ``iv = round(v * scale)`` as a
    long. Integer from here on out — both engines round ties away from
    zero on doubles, so ``iv`` is identical on Spark and DuckDB.
    """
    ex = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
    )
    return ex.select(
        "id",
        (F.col("pos") / F.lit(dsub)).cast("int").alias("s"),
        (F.col("pos") % F.lit(dsub)).alias("j"),
        F.round(F.col("val") * F.lit(float(scale)), 0).cast("long").alias("iv"),
    )


def pq_codebook(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 8,
    k: int = 16,
    scale: int = 1000,
) -> DataFrame:
    """Deterministic sampled codebook ``(code, s, j, cv)``: centroid
    ``code`` in subspace ``s`` is the quantized subvector of the vector
    with ``id == code`` (the ``k`` lowest ids). ``m * k * dim/m`` rows —
    tiny and broadcast by every consumer."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    # The seed set is the ACTUAL k lowest ids (TakeOrderedAndProject — one
    # narrow scan), not a `id < k` predicate that silently undersizes the
    # codebook on sparse or offset id spaces.
    seed_ids = df.select(F.col(id_col).alias("__cb_id")).orderBy("__cb_id").limit(k)
    seed = df.join(
        F.broadcast(seed_ids), F.col(id_col) == F.col("__cb_id"), "inner"
    ).drop("__cb_id")
    return _subvectors(seed, id_col, vec_col, dsub, scale).select(
        F.col("id").cast("int").alias("code"), "s", "j", F.col("iv").alias("cv")
    )


def pq_encode(
    df: DataFrame,
    codebook: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 8,
    scale: int = 1000,
) -> DataFrame:
    """Assign each (id, subspace) its nearest centroid: output
    ``(id, s, code, d)`` with ``d`` the integer squared L2 distance to
    the chosen centroid. Ties break to the smallest code via the
    lexicographic ``min(struct(d, code))`` — the oracle's
    ``row_number() ORDER BY d, code`` replays it exactly."""
    dsub = dim // m
    sub = _subvectors(df, id_col, vec_col, dsub, scale)
    delta = F.col("iv") - F.col("cv")
    dists = (
        sub.join(F.broadcast(codebook), ["s", "j"])
        .groupBy("id", "s", "code")
        .agg(F.sum(delta * delta).alias("d"))
    )
    return (
        dists.groupBy("id", "s")
        .agg(F.min(F.struct(F.col("d"), F.col("code"))).alias("m"))
        .select("id", "s", F.col("m.code").alias("code"), F.col("m.d").alias("d"))
    )


def pq_lloyd_refine(
    df: DataFrame,
    codebook: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 8,
    scale: int = 1000,
) -> DataFrame:
    """One distributed Lloyd (k-means) refinement step over the PQ
    codebook: assign every (vector, subspace) to its nearest centroid,
    then move each centroid to the integer-rounded mean of its assigned
    subvectors. Centroids with no assignment keep their old value.

    This is the PQ *training* loop body expressed relationally: the
    assignment is :func:`pq_encode` (broadcast codebook, map-side
    combinable argmin) and the update is one groupBy-avg over
    ``(s, code, j)`` — bounded output (``m * k * d_sub`` rows), linear
    shuffle. Iterating it is classic Lloyd; each step provably does not
    increase total quantization error (asserted by pytest and by the
    ``embedding_pq_train_step`` oracle query). Integer rounding of the
    means keeps the whole loop bit-exact replayable in SQL: the mean is
    an exact-integer sum divided by a count (both < 2^53, so the double
    division is exact on both engines), rounded ties-away-from-zero on
    both.
    """
    dsub = dim // m
    sub = _subvectors(df, id_col, vec_col, dsub, scale)
    codes = pq_encode(df, codebook, id_col, vec_col, dim, m, scale).select(
        "id", "s", "code"
    )
    means = (
        sub.join(codes, ["id", "s"])
        .groupBy("s", "code", "j")
        .agg(F.round(F.avg("iv"), 0).cast("long").alias("nv"))
    )
    return codebook.join(F.broadcast(means), ["s", "code", "j"], "left").select(
        "code", "s", "j", F.coalesce("nv", "cv").alias("cv")
    )


def pq_distance_table(
    queries: DataFrame,
    codebook: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 8,
    scale: int = 1000,
) -> DataFrame:
    """Per-query ADC lookup table ``(query_id, s, code, d)``: integer
    squared L2 between the query's subvector ``s`` and centroid ``code``.
    ``Q * m * k`` rows — broadcast onto the codes table by the search."""
    dsub = dim // m
    qsub = _subvectors(queries, id_col, vec_col, dsub, scale).withColumnRenamed(
        "id", "query_id"
    )
    delta = F.col("iv") - F.col("cv")
    return (
        qsub.join(F.broadcast(codebook), ["s", "j"])
        .groupBy("query_id", "s", "code")
        .agg(F.sum(delta * delta).alias("d"))
    )


def pq_adc_topk(codes: DataFrame, dtable: DataFrame, k_top: int = 5) -> DataFrame:
    """ADC search: approximate distance(query, id) = sum over subspaces of
    the broadcast table entry for the id's code. Output
    ``(query_id, rank, corpus_id, adc_dist)`` — all integers. Self-hits
    (``query_id == id``) are excluded. Top-k is TWO-LEVEL (the k smallest
    of a union are among the k smallest of each part): partition-local
    rank keeps ``k_top`` per (query, physical partition), so the global
    window ranks at most ``k_top * partitions`` survivors per query
    instead of sorting the whole corpus on one reducer."""
    scored = (
        codes.select("id", "s", "code")  # drop encode residual: clashes with dtable.d
        .join(F.broadcast(dtable), ["s", "code"])
        .groupBy("query_id", "id")
        .agg(F.sum("d").alias("adc_dist"))
        .filter(F.col("query_id") != F.col("id"))
    )
    return _two_level_topk(scored, "adc_dist", k_top)


def exact_int_l2_topk(
    df: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    scale: int = 1000,
    k_top: int = 5,
) -> DataFrame:
    """Exact top-k by integer squared L2 on the SAME quantized values —
    the recall baseline for :func:`pq_adc_topk`. Queries are broadcast
    (small batch by contract, like brute_force_topk); output
    ``(query_id, rank, corpus_id, l2_dist)``. Uses the full-dim exploded
    join, ``N * d * Q`` intermediate rows in a map-side-combinable sum —
    the documented brute-force scale shape."""
    sub = _subvectors(df, id_col, vec_col, dim, scale)
    qsub = (
        _subvectors(queries, id_col, vec_col, dim, scale)
        .select(F.col("id").alias("query_id"), "j", F.col("iv").alias("qv"))
    )
    delta = F.col("iv") - F.col("qv")
    scored = (
        sub.join(F.broadcast(qsub), "j")
        .groupBy("query_id", "id")
        .agg(F.sum(delta * delta).alias("l2_dist"))
        .filter(F.col("query_id") != F.col("id"))
    )
    return _two_level_topk(scored, "l2_dist", k_top)


def score_int_l2_pairs(
    pairs: DataFrame,
    corpus_sub: DataFrame,
    query_sub: DataFrame,
    q_col: str = "query_id",
    c_col: str = "node",
    out_col: str = "dist",
) -> DataFrame:
    """THE relational integer-L2 scorer (r13 verdict item 3: four copies
    consolidated): given candidate ``(q_col, c_col)`` pairs, the corpus
    subvector frame ``(c_col, j, cv)`` and the query subvector frame
    ``(q_col, j, qv)`` (small by contract — broadcast), return the pairs
    with ``out_col = sum_j (cv - qv)^2``. The sum is map-side combinable;
    ties are NOT broken here — rankers downstream order by
    ``(out_col, id)`` explicitly (:func:`_two_level_topk`, row_number
    windows), matching :func:`int_l2_topk_block`'s lexsort."""
    delta = F.col("cv") - F.col("qv")
    return (
        pairs.join(corpus_sub, c_col)
        .join(F.broadcast(query_sub), [q_col, "j"])
        .groupBy(q_col, c_col)
        .agg(F.sum(delta * delta).alias(out_col))
    )


def int_l2_dist_arrays(cv, qv):
    """Column expression: integer squared L2 between two quantized long
    arrays — ``aggregate(zip_with(cv, qv, (x,y) -> (x-y)*(x-y)), 0L, +)``.
    The JVM-side array twin of :func:`score_int_l2_pairs`'s exploded sum
    (r15 optimization: the exploded form shuffled ``pairs x dim`` rows and
    paid a groupBy exchange per scoring call; the array form is a pure
    projection over one row per pair). All arithmetic is exact int64 —
    identical values to the exploded sum and to the SQL replay."""
    sq = F.zip_with(cv, qv, lambda x, y: (x - y) * (x - y))
    return F.aggregate(sq, F.lit(0).cast("long"), lambda acc, x: acc + x)


def score_int_l2_pairs_arrays(
    pairs: DataFrame,
    corpus_arr: DataFrame,
    query_arr: DataFrame,
    q_col: str = "query_id",
    c_col: str = "node",
    out_col: str = "dist",
    broadcast_pairs: bool = False,
) -> DataFrame:
    """Array-column integer-L2 scorer: ``pairs`` ``(q_col, c_col)`` joined
    with ``corpus_arr`` ``(c_col, cv: array<long>)`` and the (small, always
    broadcast) ``query_arr`` ``(q_col, qv: array<long>)``; returns pairs
    plus ``out_col``. Values are bit-identical to
    :func:`score_int_l2_pairs` (exact integer arithmetic both ways); the
    physical plan differs: one equi-join + one broadcast join + a
    projection — no dim-fold explode, no per-pair groupBy exchange. With
    ``broadcast_pairs=True`` (bounded frontiers: beam-search candidates,
    entry probes) the pair list is broadcast so the corpus side streams
    with zero shuffle."""
    p = F.broadcast(pairs) if broadcast_pairs else pairs
    return (
        corpus_arr.join(p, c_col)
        .join(F.broadcast(query_arr), q_col)
        .select(q_col, c_col, int_l2_dist_arrays(F.col("cv"), F.col("qv")).alias(out_col))
    )


def int_l2_topk_block(x, B, ids, k: int, exclude_id=None):
    """THE numpy integer-L2 top-k block kernel (r13 verdict item 3): the
    ``k`` nearest rows of matrix ``B`` to vector ``x`` by squared L2, with
    the EXPLICIT tie-break ``np.lexsort((ids, d))`` — ascending distance,
    then ascending id — matching every SQL replay's ``ORDER BY dist, id``
    row_number. Rows whose id equals ``exclude_id`` are skipped (the
    self-hit exclusion). Returns ``(ids_topk, dists_topk)`` with distances
    as int64 (inputs are integer-valued float64 below 2^53, so the float
    arithmetic is exact). numpy is imported at module level — this runs
    once per query row inside mapInPandas hot loops (r14 ADVICE)."""
    d = ((B - x) ** 2).sum(axis=1)
    if exclude_id is not None:
        keep = ids != exclude_id
        d, ids = d[keep], ids[keep]
    idx = np.lexsort((ids, d))[: min(k, len(ids))]
    return ids[idx], d[idx].astype(np.int64)


def int_l2_dist_matrix(A, B):
    """All-pairs integer squared-L2 distance matrix ``|A| x |B|`` via one
    BLAS matmul: ``d(a, b) = |a|^2 - 2 a.b + |b|^2``. Inputs are
    integer-valued float64 (quantized longs); every product and every
    partial sum stays far below 2^53, so each entry is the EXACT integer
    ``((B - a) ** 2).sum()`` — bit-equal to :func:`int_l2_topk_block`'s
    row kernel and to the SQL replay (asserted by pytest). r15
    optimization: the per-row ``(B - x) ** 2`` loop allocated and reduced
    a ``|B| x dim`` temp per query row — on the sf1 redecide staging that
    was 169M candidate pairs through a Python-level loop; one matmul per
    cell block replaces it."""
    a2 = (A * A).sum(axis=1)
    b2 = (B * B).sum(axis=1)
    return a2[:, None] - 2.0 * (A @ B.T) + b2[None, :]


def _two_level_topk(scored: DataFrame, dist_col: str, k_top: int) -> DataFrame:
    """Top-k per query without a whole-corpus single-reducer sort: the k
    smallest of a union are among the k smallest of each part, so a
    partition-local rank keeps ``k_top`` per (query, physical partition)
    and the global window ranks only the survivors."""
    w1 = W.partitionBy("query_id", "__pid").orderBy(dist_col, "id")
    surv = (
        scored.withColumn("__pid", F.spark_partition_id())
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k_top)
        .drop("__pid", "__r1")
    )
    w = W.partitionBy("query_id").orderBy(dist_col, "id")
    return (
        surv.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_top)
        .select("query_id", "rank", F.col("id").alias("corpus_id"), dist_col)
    )


def _coarse_probes(
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    cell_col: str,
    n_probe: int,
) -> DataFrame:
    """Route each query to its ``n_probe`` most-cosine-similar cells.

    Centroids are broadcast (one row per cell); similarity is rounded to
    6dp before ranking so near-tie cells resolve identically regardless of
    float fold order (Spark vs the DuckDB oracle)."""
    from ..functions.arrays import as_double
    from .similarity import cosine

    q = queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"))
    probe_w = W.partitionBy("query_id").orderBy(F.desc("cell_sim"), F.asc(cell_col))
    return (
        q.crossJoin(F.broadcast(centroids))
        .select(
            "query_id", cell_col,
            F.round(cosine(F.col("qv"), F.col("centroid")), 6).alias("cell_sim"),
        )
        .withColumn("__pr", F.row_number().over(probe_w))
        .filter(F.col("__pr") <= n_probe)
        .select("query_id", cell_col)
    )


def ivfpq_build_index(
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    dim: int = 64,
    m: int = 8,
    cb_k: int = 32,
    scale: int = 1000,
) -> None:
    """Train once, serve many: persist the IVF-PQ index as three parquet
    tables under ``index_dir`` — the similarity twin of the prebuilt
    MinHash-LSH index (operators/dedup.minhash_lsh_probe).

    - ``centroids``: one row per coarse cell (cell id + mean vector) —
      KBs, broadcast at probe time;
    - ``codebook``: ``m * cb_k * d_sub`` integer rows — KBs, broadcast;
    - ``codes``: the encoded corpus (``id, s, code``), written
      ``partitionBy(cell)`` so a probe's cell filter becomes PARTITION
      PRUNING at the parquet source — a 100 TB serving query reads only
      ``n_probe`` cells' files, never the full index.

    All content is deterministic (integer PQ arithmetic, mean centroids),
    so probing a loaded index is bit-equal to a fresh in-session build —
    asserted by pytest and by the ``similarity_ivfpq_probe_prebuilt``
    driver oracle.
    """
    from .similarity import array_mean

    array_mean(corpus, cell_col, vec_col).write.mode("overwrite").parquet(
        f"{index_dir}/centroids"
    )
    cb = pq_codebook(corpus, id_col, vec_col, dim, m, cb_k, scale)
    cb.write.mode("overwrite").parquet(f"{index_dir}/codebook")
    codes = pq_encode(corpus, cb, id_col, vec_col, dim, m, scale).select("id", "s", "code")
    cells = corpus.select(F.col(id_col).alias("id"), F.col(cell_col))
    (
        codes.join(cells, "id")
        .write.mode("overwrite")
        .partitionBy(cell_col)
        .parquet(f"{index_dir}/codes")
    )


def ivfpq_probe_index(
    queries: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    dim: int = 64,
    m: int = 8,
    scale: int = 1000,
    k_top: int = 5,
    n_probe: int = 3,
) -> DataFrame:
    """Probe a persisted IVF-PQ index WITHOUT retraining: load centroids +
    codebook (broadcast-size), build the per-query ADC table, and rank only
    inside probed cells. The cell membership join is against the
    cell-partitioned codes table, so Catalyst prunes unprobed cells at the
    file source. Output ``(query_id, rank, corpus_id, adc_dist)`` — same
    contract as :func:`ivfpq_topk`."""
    spark = queries.sparkSession
    centroids = spark.read.parquet(f"{index_dir}/centroids")
    cb = spark.read.parquet(f"{index_dir}/codebook")
    coded = spark.read.parquet(f"{index_dir}/codes")
    # partition-column type normalization: partitionBy writes the cell id as
    # a directory key; read-back inference must rejoin the centroid table's
    # native type
    cell_type = dict(centroids.dtypes)[cell_col]
    coded = coded.withColumn(cell_col, F.col(cell_col).cast(cell_type))
    probes = _coarse_probes(queries, centroids, id_col, vec_col, cell_col, n_probe)
    dt = pq_distance_table(queries, cb, id_col, vec_col, dim, m, scale)
    scored = (
        coded.join(F.broadcast(probes), cell_col)
        .join(F.broadcast(dt), ["query_id", "s", "code"])
        .groupBy("query_id", "id")
        .agg(F.sum("d").alias("adc_dist"))
        .filter(F.col("query_id") != F.col("id"))
    )
    return _two_level_topk(scored, "adc_dist", k_top)


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    dim: int = 64,
    m: int = 8,
    cb_k: int = 32,
    scale: int = 1000,
    k_top: int = 5,
    n_probe: int = 3,
) -> DataFrame:
    """IVF-PQ composite index — the two-level ANN layout production
    vector stores run (FAISS's IVF_PQ; Jegou et al. TPAMI'11 combine the
    coarse inverted file with product codes): a coarse quantizer routes
    each query to its ``n_probe`` nearest cells, and candidates inside
    probed cells rank by PQ ADC distance — never by raw-vector math.

    Composition of two already-verified parts: the cell probe is
    operators/similarity.ivf_topk's (cell centroids broadcast, cosine
    probe ranking) and the fine ranking is this module's ADC machinery.
    Corpus-side cost: the PQ encode pass plus one broadcast-probe join —
    probed cells gate the ADC join, so the per-query candidate set is
    ``n_probe`` cells, not the corpus. Output
    ``(query_id, rank, corpus_id, adc_dist)``, integer distances.
    """
    from .similarity import array_mean

    centroids = array_mean(corpus, cell_col, vec_col)
    probes = _coarse_probes(queries, centroids, id_col, vec_col, cell_col, n_probe)
    cb = pq_codebook(corpus, id_col, vec_col, dim, m, cb_k, scale)
    codes = pq_encode(corpus, cb, id_col, vec_col, dim, m, scale).select(
        "id", "s", "code"
    )
    cells = corpus.select(F.col(id_col).alias("id"), F.col(cell_col))
    dt = pq_distance_table(queries, cb, id_col, vec_col, dim, m, scale)
    scored = (
        codes.join(cells, "id")
        .join(F.broadcast(probes), cell_col)
        .join(F.broadcast(dt), ["query_id", "s", "code"])
        .groupBy("query_id", "id")
        .agg(F.sum("d").alias("adc_dist"))
        .filter(F.col("query_id") != F.col("id"))
    )
    return _two_level_topk(scored, "adc_dist", k_top)
