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

- **build** (:func:`knn_graph`): candidate pairs come from shared IVF
  cells (each node probes its ``n_probe`` nearest cell centroids — the
  already-verified coarse quantizer), distances rank candidates, each node
  keeps its ``k_build`` nearest, and edges are symmetrized. Candidate
  generation is cell-bounded — O(N * cell_size * n_probe) pairs, never
  O(N^2); at 100 TB the cells are the same partition key the IVF index
  already maintains.
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

from .quantization import _coarse_probes, _subvectors, _two_level_topk


def knn_graph(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    dim: int = 64,
    scale: int = 1000,
    k_build: int = 8,
    n_probe: int = 2,
) -> DataFrame:
    """Symmetrized k-NN graph ``(src, dst, dist)`` from IVF-bounded
    candidates: each node ranks the members of its ``n_probe`` nearest
    cells by integer squared L2 and keeps ``k_build``; edges are then
    mirrored (undirected navigability), so degree is bounded by
    ``2 * k_build``."""
    from .similarity import array_mean

    centroids = array_mean(corpus, cell_col, vec_col)
    probes = _coarse_probes(corpus, centroids, id_col, vec_col, cell_col, n_probe)
    cells = corpus.select(F.col(id_col).alias("cand"), F.col(cell_col))
    cand = (
        probes.join(cells, cell_col)
        .select(F.col("query_id").alias("src"), "cand")
        .filter(F.col("src") != F.col("cand"))
    )
    sub = _subvectors(corpus, id_col, vec_col, dim, scale).select("id", "j", "iv")
    a = sub.select(F.col("id").alias("src"), "j", F.col("iv").alias("av"))
    b = sub.select(F.col("id").alias("cand"), "j", F.col("iv").alias("bv"))
    delta = F.col("av") - F.col("bv")
    dists = (
        cand.join(a, "src")
        .join(b, ["cand", "j"])
        .groupBy("src", "cand")
        .agg(F.sum(delta * delta).alias("dist"))
    )
    w = W.partitionBy("src").orderBy("dist", "cand")
    directed = (
        dists.withColumn("__r", F.row_number().over(w))
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


def nsw_search(
    graph: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
    beam_width: int = 8,
    n_hops: int = 3,
    k_top: int = 5,
    n_entry: int = 4,
) -> DataFrame:
    """Fixed-hop beam search over ``graph`` → ``(query_id, rank,
    corpus_id, l2_dist)``. Self-hits are excluded (a query that exists in
    the corpus never reports itself), matching
    :func:`~.quantization.exact_int_l2_topk`."""
    sub = _subvectors(corpus, id_col, vec_col, dim, scale).select(
        F.col("id").alias("node"), "j", F.col("iv").alias("cv")
    )
    qsub = _subvectors(queries, id_col, vec_col, dim, scale).select(
        F.col("id").alias("query_id"), "j", F.col("iv").alias("qv")
    )

    def score(frontier: DataFrame) -> DataFrame:
        """(query_id, node) → + integer squared L2 to the query vector."""
        delta = F.col("cv") - F.col("qv")
        return (
            frontier.join(sub, "node")
            .join(F.broadcast(qsub), ["query_id", "j"])
            .groupBy("query_id", "node")
            .agg(F.sum(delta * delta).alias("dist"))
        )

    entries = (
        corpus.select(F.col(id_col).alias("node")).orderBy("node").limit(n_entry)
    )
    beam = (
        queries.select(F.col(id_col).alias("query_id"))
        .crossJoin(F.broadcast(entries))
        .filter(F.col("query_id") != F.col("node"))
    )
    beam = score(beam)
    w = W.partitionBy("query_id").orderBy("dist", "node")
    beam = (
        beam.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= beam_width)
        .select("query_id", "node", "dist")
        .localCheckpoint(eager=False)
    )
    for _ in range(n_hops):
        nbrs = (
            beam.join(graph, beam["node"] == graph["src"])
            .select("query_id", F.col("dst").alias("node"))
            .filter(F.col("query_id") != F.col("node"))
        )
        candset = beam.select("query_id", "node").unionByName(nbrs).distinct()
        beam = (
            score(candset)
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= beam_width)
            .select("query_id", "node", "dist")
            .localCheckpoint(eager=False)
        )
    scored = beam.select(
        "query_id", F.col("node").alias("id"), F.col("dist").alias("l2_dist")
    )
    return _two_level_topk(scored, "l2_dist", k_top)
