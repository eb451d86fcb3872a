"""Graph-based ANN: relational k-NN-graph build + fixed-hop beam search.

The one ANN family the engine lacked (IVF, PQ, IVF-PQ and hyperplane LSH
are in operators/similarity.py / quantization.py): navigable-small-world
style search over a proximity graph (Malkov & Yashunin, "Efficient and
robust approximate nearest neighbor search using Hierarchical Navigable
Small World graphs", TPAMI 2018 — public literature; this is the
single-layer NSW core, not the hierarchy).

Both phases are expressed as DataFrame ops with INTEGER distance
arithmetic (the PQ family's trick: quantize once to ``round(v*scale)``
longs, distances are integer sums of squared diffs), so the whole pipeline
is deterministic and bit-exactly replayable by a DuckDB oracle:

- **build** (:func:`knn_graph`): candidate pairs come from shared coarse
  cells (a seed-centroid quantizer with ``n_cells`` cells — sized ~sqrt(N)
  so candidate volume is O(N^1.5), never O(N^2)); distances rank
  candidates, each node keeps its ``k_build`` nearest, and edges are
  symmetrized. At 100 TB the cell id is the partition key, so the
  per-cell distance joins are co-located.
- **search** (:func:`nsw_search`): classic beam search unrolled to a FIXED
  ``n_hops`` rounds (fixed, not convergence-tested, for the same reason
  :func:`~wafer_defect_data_pipeline_spark.operators.graph.pagerank` is
  fixed-iteration: exact SQL replayability). Each round expands the beam
  along graph edges, re-scores candidates against the query (broadcast
  query subvectors, map-side-combinable sums), and keeps the
  ``beam_width`` best by ``(dist, id)``. The beam always contains its own
  previous members, so best-so-far never regresses. Entry points are the
  ``n_entry`` lowest corpus ids — the deterministic seed-selection trick
  :func:`~.quantization.pq_codebook` uses.

Per-hop cost is |queries| * beam_width * avg_degree scored candidates —
independent of corpus size, which is the entire point of graph ANN: at
100 TB only the (distributed, partition-pruned) edge-list joins touch big
data, and each of the fixed rounds shuffles (query, node) longs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .quantization import _two_level_topk


def _qarr_col(vec_col: str, scale: int):
    """Integer-quantized vector column: round(v * scale) as long."""
    return F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.round(x * F.lit(float(scale)), 0).cast("long"),
    )


def build_coarse_quantizer(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
    n_cells: int = 16,
    lloyd_steps: int = 2,
):
    """Lloyd-refined coarse centroid matrix (n_cells x dim numpy int-valued
    float64) — the shared quantizer behind :func:`knn_graph` and
    :func:`~.similarity.ivf_kmeans_topk`. Seeds are the ``n_cells``
    lowest-id vectors (:func:`~.quantization.pq_codebook` with ``m=1`` —
    deterministic), refined by ``lloyd_steps`` rounds of kernel assignment
    + one integer-rounded mean agg over the exploded (N x dim) frame.

    PRECONDITION (checked, n_cells-row readout): the ``n_cells`` lowest
    ids must be exactly 0..n_cells-1 (true for the testdata tables and
    the oracle replay, which shares the assumption); sparse-id corpora
    must be remapped first. The centroid readout is n_cells x dim rows —
    bounded by contract, the d^2-scale readout decomposition.py documents.
    """
    import numpy as np

    from .quantization import pq_codebook

    # Seed-precondition check FUSED into the codebook collect (r16, guide
    # §5 — one driver action instead of two): pq_codebook's codes ARE the
    # n_cells lowest ids (its TakeOrderedAndProject seeding), so the
    # collected rows carry exactly the id set the old standalone
    # orderBy/limit readout fetched. The check must run BEFORE the matrix
    # fill — out-of-range codes would index past C's n_cells rows.
    cb_rows = pq_codebook(
        corpus, id_col, vec_col, dim=dim, m=1, k=n_cells, scale=scale
    ).collect()
    seed_ids = sorted({int(r["code"]) for r in cb_rows})
    if seed_ids != list(range(n_cells)):
        raise ValueError(
            f"coarse quantizer requires the {n_cells} lowest {id_col} values "
            f"to be exactly 0..{n_cells - 1} (got {seed_ids[:5]}...); remap "
            "ids to a dense 0-based range first (e.g. row_number() - 1)."
        )
    C = np.zeros((n_cells, dim), np.float64)
    for r in cb_rows:
        C[r["code"], r["j"]] = float(r["cv"])
    # Fused Lloyd step (r15 optimization, guide §2.3 "aggregate before you
    # shuffle"): the old loop ran assign_coarse_cells, then joined the
    # N x dim exploded subvector frame against the assignment and shuffled
    # it into a groupBy — one exploded shuffle join per step. The kernel
    # below assigns each batch AND emits per-(code, j) partial sums — at
    # most n_cells x dim rows per Arrow batch — so the shuffle carries
    # bounded partials, never the exploded corpus. Exactness: the mean is
    # an exact-integer sum (int64, far below overflow at any corpus size
    # that fits a long count) divided by an exact count; ``F.avg`` over
    # longs computes the same exact-sum/count double, so the rounded
    # centroid values are bit-identical to the joined formulation.
    qarr = _qarr_col(vec_col, scale)
    for _ in range(lloyd_steps):
        Cl = C  # bind the current matrix into the kernel closure

        def partials(batches):
            import pandas as pd

            from .quantization import int_l2_dist_matrix

            codes_l = np.arange(len(Cl))
            for pdf in batches:
                if pdf.empty:
                    continue
                X = np.stack(pdf["qv"].to_numpy()).astype(np.float64)
                D = int_l2_dist_matrix(X, Cl)
                # argmin with the shared (d, code) lexsort tie-break:
                # codes ascend left-to-right, so the first minimum wins
                best = np.argmin(D, axis=1)
                out = []
                for c in codes_l:
                    rows = X[best == c]
                    if len(rows):
                        s = rows.sum(axis=0)
                        out.append(
                            pd.DataFrame(
                                {
                                    "code": int(c),
                                    "j": np.arange(X.shape[1]),
                                    "s": s.astype(np.int64),
                                    "cnt": np.int64(len(rows)),
                                }
                            )
                        )
                if out:
                    yield pd.concat(out).astype(
                        {"code": "int32", "j": "int32", "s": "int64", "cnt": "int64"}
                    )

        means = (
            corpus.select(qarr.alias("qv"))
            .mapInPandas(partials, "code int, j int, s long, cnt long")
            .groupBy("code", "j")
            .agg(
                F.round(F.sum("s") / F.sum("cnt"), 0).cast("long").alias("cv")
            )
        )
        Cn = C.copy()  # centroids with no assignment keep their value
        for r in means.collect():
            Cn[r["code"], r["j"]] = float(r["cv"])
        C = Cn
    return C


def assign_coarse_cells(
    df: DataFrame,
    C,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    n_top: int = 1,
) -> DataFrame:
    """Per-vector nearest ``n_top`` centroids by integer squared L2 —
    numpy kernel over Arrow batches with the (tiny) centroid matrix in
    the closure; no N x n_cells x dim exploded join (the earlier
    relational formulation fanned out 180M rows at sf1). Quantized values
    are integer-valued float64 far below 2^53, so results equal the
    integer SQL replay exactly; ties break (d, code) via the shared
    :func:`~.quantization.int_l2_topk_block` lexsort.
    Returns ``(id, code, rank)`` with rank 1-based."""
    import numpy as np
    import pandas as pd

    from .quantization import int_l2_dist_matrix

    n_cells = len(C)
    nt = min(n_top, n_cells)
    codes = np.arange(n_cells)

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack(pdf["qv"].to_numpy()).astype(np.float64)
            ids = pdf["id"].to_numpy()
            # whole-batch distance matrix (one BLAS matmul — r15: the
            # per-row (C - x)^2 loop was the hot path on million-row
            # corpora), then the shared (d, code) lexsort per row; codes
            # ascend, so argsort with a stable kind reproduces the
            # int_l2_topk_block tie-break exactly (pytest-pinned).
            D = int_l2_dist_matrix(X, C)
            order = np.argsort(D, axis=1, kind="stable")[:, :nt]
            out_id = np.repeat(ids, nt)
            out_code = codes[order].ravel()
            out_rank = np.tile(np.arange(1, nt + 1), len(ids))
            yield pd.DataFrame(
                {"id": out_id, "code": out_code, "rank": out_rank}
            ).astype({"id": "int64", "code": "int32", "rank": "int32"})

    return df.select(
        F.col(id_col).alias("id"), _qarr_col(vec_col, scale).alias("qv")
    ).mapInPandas(kernel, "id long, code int, rank int")


def knn_graph(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
    k_build: int = 8,
    n_probe: int = 2,
    n_cells: int = 16,
    lloyd_steps: int = 2,
) -> DataFrame:
    """Symmetrized k-NN graph ``(src, dst, dist)`` from coarse-cell-bounded
    candidates: a seed-centroid quantizer (the ``n_cells`` lowest-id
    vectors — :func:`~.quantization.pq_codebook`'s deterministic seeding
    with ``m=1`` — Lloyd-refined, assigned by integer L2 in a
    broadcast-centroid numpy kernel) buckets the corpus; each node ranks
    the members of its
    ``n_probe`` nearest cells and keeps ``k_build``; edges are mirrored
    (undirected navigability), so degree is bounded by ``2 * k_build``.

    Candidate volume is ``N * n_probe * N / n_cells`` — size ``n_cells``
    to ~sqrt(N) (the IVF convention) and the build is O(N^1.5), never
    O(N^2). The registered oracle query fixes ``n_cells=16`` (the replay
    must pin parameters); a scale run passes ``n_cells ~ sqrt(N)``."""
    import numpy as np
    import pandas as pd

    qarr_col = _qarr_col(vec_col, scale)

    # seed centroids: the n_cells lowest-id vectors (pq_codebook's
    # deterministic seeding, m=1), then Lloyd-refine — raw seeds are a poor
    # quantizer (measured recall@5 0.40 raw vs 0.60 after two steps at
    # sf0.001). Build + assignment now live in build_coarse_quantizer /
    # assign_coarse_cells (shared with the production IVF path,
    # similarity.ivf_kmeans_topk); the dense-0-based-id precondition is
    # checked there.
    C = build_coarse_quantizer(
        corpus, id_col, vec_col, dim, scale, n_cells, lloyd_steps
    )
    ranked = assign_coarse_cells(corpus, C, id_col, vec_col, scale, n_probe)
    cells = ranked.filter(F.col("rank") == 1).select(
        F.col("id").alias("cand"), F.col("code").alias("cell")
    )
    probes = ranked.filter(F.col("rank") <= n_probe).select(
        F.col("id").alias("src"), F.col("code").alias("cell")
    )
    # Distance kernel: cogroup probers vs members PER CELL and run a numpy
    # row-block kernel inside Arrow batches — the shuffle carries each
    # vector once per probed cell (N * n_probe quantized arrays), never the
    # exploded (pairs x dim) rows (an earlier exploded-join formulation
    # shuffled pairs*64 rows — 364M at sf1 — and dominated the build).
    # Exactness: quantized values are integer-valued float64 and every
    # squared-diff sum stays far below 2^53, so numpy arithmetic equals the
    # integer SQL replay bit-for-bit. Per-src results are capped at k_build
    # inside the cell (the global top-k of a union is within the per-cell
    # top-ks), so kernel output is N * n_probe * k_build rows, bounded.
    # two independent projections of the vector column (distinct aliases:
    # both sides derive from `corpus`, and a shared column name trips the
    # ambiguous-self-join analyzer check)
    probers = probes.join(
        corpus.select(F.col(id_col).alias("src"), qarr_col.alias("pqv")), "src"
    ).select("cell", "src", F.col("pqv").alias("qv"))
    members = cells.join(
        corpus.select(F.col(id_col).alias("cand"), qarr_col.alias("mqv")), "cand"
    ).select("cell", "cand", F.col("mqv").alias("qv"))

    from .quantization import int_l2_dist_matrix

    def cell_knn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame({"src": [], "cand": [], "dist": []}).astype(
                {"src": "int64", "cand": "int64", "dist": "int64"}
            )
        A = np.stack(left["qv"].to_numpy()).astype(np.float64)
        B = np.stack(right["qv"].to_numpy()).astype(np.float64)
        cand_ids = right["cand"].to_numpy()
        # whole-cell distance matrix in one BLAS matmul (r15: the per-src
        # (B - x)^2 loop was 169M pair evaluations through Python at the
        # sf1 staging — see int_l2_dist_matrix), then the shared
        # (dist, cand)-lexsort top-k with self-hit exclusion per row,
        # matching the SQL row_number ORDER BY dist, cand exactly.
        D = int_l2_dist_matrix(A, B)
        src_ids = left["src"].to_numpy()
        out_src, out_cand, out_dist = [], [], []
        for i, src in enumerate(src_ids):
            d, ids = D[i], cand_ids
            keep = ids != src
            if not keep.all():
                d, ids = d[keep], ids[keep]
            idx = np.lexsort((ids, d))[: min(k_build, len(ids))]
            out_src.append(np.full(len(idx), src, dtype=np.int64))
            out_cand.append(ids[idx])
            out_dist.append(d[idx].astype(np.int64))
        return pd.DataFrame(
            {
                "src": np.concatenate(out_src),
                "cand": np.concatenate(out_cand),
                "dist": np.concatenate(out_dist),
            }
        ).astype({"src": "int64", "cand": "int64", "dist": "int64"})

    percell = (
        probers.groupBy("cell")
        .cogroup(members.groupBy("cell"))
        .applyInPandas(lambda l, r: cell_knn(l, r), "src long, cand long, dist long")
    )
    w = W.partitionBy("src").orderBy("dist", "cand")
    directed = (
        percell.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k_build)
        .select("src", F.col("cand").alias("dst"), "dist")
    )
    return (
        directed.unionByName(
            directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "dist")
        )
        .groupBy("src", "dst")
        .agg(F.min("dist").alias("dist"))
    )


def nsw_scale_params(n_corpus: int) -> dict:
    """Deployment-rule defaults for :func:`knn_graph` + :func:`nsw_search`
    at corpus size ``n_corpus`` — the BASELINE.md round-12 decade study
    made executable. Measured anchors: 20k vectors -> k_build=16,
    n_probe=3, beam 16 reads recall@5 0.97; 200k -> k_build=32, n_probe=4,
    beam 32 reads 0.958, while the 20k config degrades to 0.68 there and
    NO search-side knob recovers past 0.81 (graph density, not search
    width, is what recall loses first).

    Rules: ``n_cells`` ~ sqrt(n) rounded to a power of two (the IVF
    convention the knn_graph docstring records); ``k_build`` doubles per
    decade from 16@20k (exponent log10(2)), clamped to [8, 64]; ``beam =
    n_entry = k_build``; ``entry_sample_mod`` ~ sqrt(n)/2 (the
    coarse-to-fine md5 sample scores ~2*sqrt(n) nodes per query)."""
    import math

    n = max(int(n_corpus), 1)
    k_build = max(8, min(64, round(16 * (n / 20_000) ** math.log10(2))))
    return {
        "k_build": k_build,
        "n_probe": 3 if k_build <= 16 else 4,
        "n_cells": max(16, 2 ** round(math.log2(math.sqrt(n)))),
        "beam_width": k_build,
        "n_entry": k_build,
        "entry_sample_mod": max(2, round(math.sqrt(n) / 2)),
    }


def nsw_search(
    graph: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
    beam_width: int = 12,
    n_hops: int = 4,
    k_top: int = 5,
    n_entry: int = 4,
    entry_sample_mod: int | None = None,
) -> DataFrame:
    """Fixed-hop beam search over ``graph`` → ``(query_id, rank,
    corpus_id, l2_dist)``. Self-hits are excluded (a query that exists in
    the corpus never reports itself), matching
    :func:`~.quantization.exact_int_l2_topk`.

    Entry points (the recall lever at scale): with the default
    ``entry_sample_mod=None`` every query starts from the same ``n_entry``
    lowest-id nodes — fine at thousands of vectors, but the k-NN graph has
    only LOCAL edges (no NSW long links), so a fixed-hop beam from fixed
    entries is reachability-limited: measured recall@5 at sf1 (20k
    vectors) is 0.14-0.25 across beam widths 4-16 (BASELINE.md round-11
    table). Setting ``entry_sample_mod=m`` switches to COARSE-TO-FINE
    entries, the role HNSW's upper layers play: each query brute-force
    scores the deterministic ``xxhash64(id) % m == 0`` node sample
    (~n/m nodes — pick m ≈ √n so the coarse pass stays ~√n per query) and
    starts the beam from its ``n_entry`` nearest sample nodes, which lands
    the beam inside the right neighborhood before any hop is spent.
    Measured at sf1 (BASELINE.md round-11): sampled entries alone lift
    recall@5 to 0.86 at beam 16 on the default k_build=8/n_probe=2 graph;
    the remaining gap is GRAPH quality, so the scale recipe pairs them
    with a denser build — k_build=16, n_probe=3, beam 16 reaches 0.973 at
    sf1, 11x faster than exact. The sampled pass is exact integer L2 over
    an md5-uniform sample, so the whole search stays deterministic and
    SQL-replayable (``similarity_nsw_scale_topk``)."""
    # Pin the graph: every hop joins against it, and an unpinned lineage
    # would re-run the whole kNN build once per hop (the star-CC lesson —
    # a lazily-checkpointed frame feeding a loop must be materialized
    # before the rounds; the lazy checkpoint materializes inside the first
    # hop's job, so no separate count() action is needed).
    graph = graph.localCheckpoint(eager=False)
    graph.count()  # materialize before the hop loop (see note above)
    # r15 physical rework (guide §2.3/§2.4 — shuffle fewer bytes, remove
    # exchanges): scoring joins quantized ARRAY columns (one row per pair,
    # JVM zip_with/aggregate integer fold — bit-equal to the exploded
    # scorer, see quantization.score_int_l2_pairs_arrays) instead of
    # exploding corpus x dim subvector rows per hop, and every frontier
    # (bounded: |queries| x beam_width x (1 + degree) rows by contract) is
    # BROADCAST onto the corpus/graph side, so the per-hop big-side work
    # is a streamed scan, never a shuffle. One explicit
    # repartition(query_id) per hop then satisfies the groupBy (clustering
    # on a superset key) AND the rank window — one small exchange per hop
    # where the exploded form paid join + agg + window exchanges.
    from .quantization import score_int_l2_pairs_arrays

    corpus_arr = corpus.select(
        F.col(id_col).alias("node"), _qarr_col(vec_col, scale).alias("cv")
    )
    query_arr = queries.select(
        F.col(id_col).alias("query_id"), _qarr_col(vec_col, scale).alias("qv")
    )

    def score(frontier: DataFrame) -> DataFrame:
        """(query_id, node) → + integer squared L2 to the query vector
        (the shared scorer, r13 verdict item 3 / r15 array form)."""
        return score_int_l2_pairs_arrays(
            frontier, corpus_arr, query_arr, "query_id", "node", "dist",
            broadcast_pairs=True,
        )

    w = W.partitionBy("query_id").orderBy("dist", "node")
    if entry_sample_mod:
        # coarse-to-fine: per-query entries from the ~n/m deterministic
        # node sample (see docstring) — the beam starts inside the right
        # neighborhood instead of hoping fixed global entries reach it.
        # Sampling hash is the repo's md5 uniform (not xxhash64) so the
        # membership replays exactly in the DuckDB oracle.
        sample = corpus.select(F.col(id_col).alias("node")).filter(
            F.conv(F.substring(F.md5(F.col("node").cast("string")), 1, 15), 16, 10)
            .cast("long") % F.lit(entry_sample_mod) == 0
        )
        beam = (
            score(
                queries.select(F.col(id_col).alias("query_id"))
                .crossJoin(F.broadcast(sample))
                .filter(F.col("query_id") != F.col("node"))
            )
            .repartition("query_id")
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= n_entry)
            .select("query_id", "node", "dist")
        )
    else:
        entries = (
            corpus.select(F.col(id_col).alias("node")).orderBy("node").limit(n_entry)
        )
        beam = score(
            queries.select(F.col(id_col).alias("query_id"))
            .crossJoin(F.broadcast(entries))
            .filter(F.col("query_id") != F.col("node"))
        ).repartition("query_id")
    beam = (
        beam.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= beam_width)
        .select("query_id", "node", "dist")
        .localCheckpoint(eager=False)
    )
    for _ in range(n_hops):
        b = F.broadcast(beam.select("query_id", "node"))
        nbrs = (
            graph.join(b, b["node"] == graph["src"])
            .select("query_id", F.col("dst").alias("node"))
            .filter(F.col("query_id") != F.col("node"))
        )
        # duplicates in beam ∪ nbrs score identically, so the dedupe the
        # old .distinct() exchange paid is fused into the groupBy-min on
        # the already-repartitioned rows — same (query_id, node, dist)
        # set, one exchange instead of three
        candset = beam.select("query_id", "node").unionByName(nbrs)
        beam = (
            score(candset)
            .repartition("query_id")
            .groupBy("query_id", "node")
            .agg(F.min("dist").alias("dist"))
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= beam_width)
            .select("query_id", "node", "dist")
            .localCheckpoint(eager=False)
        )
    scored = beam.select(
        "query_id", F.col("node").alias("id"), F.col("dist").alias("l2_dist")
    )
    return _two_level_topk(scored, "l2_dist", k_top)
