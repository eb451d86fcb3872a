"""Distributed second-moment statistics and PCA over embedding columns
(extension surface §2.9 — training-data pipeline analytics).

The reference pipeline's only matrix-ish operation is per-feature z-score
scaling (reference ``src/preprocessing.py:184-215`` scales CLUSTER_FEATURES
before KMeans); a 100 TB embedding corpus additionally needs *cross*-feature
statistics — a covariance/Gram matrix for whitening, PCA dimensionality
reduction before ANN indexing, and drift monitoring. Both are classic
"aggregate a tiny d×d matrix from an enormous n×d corpus" problems, so the
scale discipline is:

- **Never explode to n·d² rows.** A relational posexplode×posexplode
  formulation shuffles ``n·d(d+1)/2`` rows (at n=1e9, d=1024 that is
  ~5e14 rows — dead on arrival). Instead each Arrow batch computes its
  local outer-product sum with one BLAS ``X.T @ X``, and only the
  ``d(d+1)/2`` partial sums per *partition* are shuffled — the classic
  map-side combine, but for a matrix.
- **The final reduce is tiny.** groupBy(i, j) over ≤ partitions·d²/2 rows;
  the result (d²/2 doubles) is bounded and driver-collectable, which is
  exactly what the PCA eigendecomposition needs (LAPACK ``eigh`` on a d×d
  symmetric matrix is microseconds for d ≤ 4096).
- **Projection is a pure column expression.** The top-k eigenvectors are
  broadcast as literal arrays; projecting a vector is k JVM-side fold
  expressions (``zip_with``/``aggregate``), no Python in the per-row path.

Determinism: eigenvectors are sign-ambiguous (±v are both eigenvectors), so
``pca_components`` fixes the sign by making the largest-magnitude entry of
each component positive — the same convention scikit-learn's ``svd_flip``
uses — making projections reproducible across runs and platforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.arrays import as_double


def gram_partials(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Per-partition partial sums for the second-moment (Gram) matrix.

    Output rows (1-based ``i <= j`` upper triangle):

    - ``(i,  j, s)``  — partial ``sum(v[i] * v[j])``
    - ``(i,  0, s)``  — partial ``sum(v[i])`` (first-moment sums)
    - ``(0,  0, n)``  — partial row count

    One Arrow batch → one ``X.T @ X`` BLAS call → ``d(d+1)/2 + d + 1``
    rows, regardless of batch size. Vectors shorter than ``dim`` or null
    are skipped (counted out of ``n``).
    """
    import numpy as np
    import pandas as pd

    iu, ju = np.triu_indices(dim)

    def partials(batches):
        s_mat = np.zeros((dim, dim))
        s_vec = np.zeros(dim)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            vs = [v for v in pdf[vec_col] if v is not None and len(v) == dim]
            if not vs:
                continue
            x = np.asarray(vs, dtype=np.float64)
            s_mat += x.T @ x
            s_vec += x.sum(axis=0)
            n += len(x)
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "i": np.concatenate([iu + 1, np.arange(1, dim + 1), [0]]),
                "j": np.concatenate([ju + 1, np.zeros(dim, dtype=np.int64), [0]]),
                "s": np.concatenate([s_mat[iu, ju], s_vec, [float(n)]]),
            }
        )

    src = df.select(as_double(vec_col).alias(vec_col))
    return src.mapInPandas(partials, schema="i int, j int, s double")


def covariance_matrix(df: DataFrame, vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """Population covariance matrix as ``(i, j, cov)`` rows, 1-based upper
    triangle (``i <= j``): ``cov = E[v_i v_j] - E[v_i] E[v_j]``.

    The partial-sum reduce shuffles at most ``partitions · (d(d+1)/2+d+1)``
    rows; the mean join is a broadcast of d rows. Corpus rows never shuffle.
    """
    agg = gram_partials(df, vec_col, dim).groupBy("i", "j").agg(F.sum("s").alias("s"))
    cnt = agg.filter((F.col("i") == 0) & (F.col("j") == 0)).select(F.col("s").alias("n"))
    means = agg.filter((F.col("i") > 0) & (F.col("j") == 0)).select(
        F.col("i").alias("mi"), F.col("s").alias("ms")
    )
    gram = agg.filter(F.col("j") > 0)
    return (
        gram.crossJoin(F.broadcast(cnt))
        .join(F.broadcast(means).withColumnRenamed("mi", "i").withColumnRenamed("ms", "sa"), "i")
        .join(F.broadcast(means).withColumnRenamed("mi", "j").withColumnRenamed("ms", "sb"), "j")
        .select(
            "i",
            "j",
            (F.col("s") / F.col("n") - (F.col("sa") / F.col("n")) * (F.col("sb") / F.col("n"))).alias(
                "cov"
            ),
        )
    )


def pca_components(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64, k: int = 4
) -> tuple[list[float], list[list[float]], list[float]]:
    """Top-``k`` principal axes from the distributed covariance matrix.

    Returns ``(mean, components, eigenvalues)`` — ``components`` is k rows
    of length ``dim``, eigenvalue-descending, sign-fixed (largest-|entry|
    positive). The only driver materialization is the d×d covariance
    (``d(d+1)/2 + d + 1`` rows — bounded, independent of corpus size).
    """
    import numpy as np

    # One corpus scan: collect the bounded (d²/2 + d + 1)-row partial-sum
    # aggregate and assemble mean + covariance driver-side.
    agg = gram_partials(df, vec_col, dim).groupBy("i", "j").agg(F.sum("s").alias("s"))
    rows = agg.collect()
    if not rows:
        raise ValueError(
            f"pca_components: no rows with a length-{dim} {vec_col!r} vector — "
            "cannot fit principal axes on an empty corpus"
        )
    n = next(r.s for r in rows if r.i == 0 and r.j == 0)
    mean = np.zeros(dim)
    gram = np.zeros((dim, dim))
    for r in rows:
        if r.j == 0:
            if r.i > 0:
                mean[r.i - 1] = r.s / n
        else:
            gram[r.i - 1, r.j - 1] = r.s
            gram[r.j - 1, r.i - 1] = r.s
    cov = gram / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    eigs = []
    for idx in order:
        v = vecs[:, idx]
        pivot = np.argmax(np.abs(v))
        if v[pivot] < 0:  # svd_flip-style sign convention
            v = -v
        comps.append([float(x) for x in v])
        eigs.append(float(vals[idx]))
    return [float(x) for x in mean], comps, eigs


def pca_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 4,
    precomputed: tuple[list[float], list[list[float]]] | None = None,
) -> DataFrame:
    """Project each vector onto the top-``k`` principal axes.

    Output ``(id_col, pc1..pck)``. Each component score is a JVM-side fold
    ``dot(v, comp) - dot(mean, comp)`` — the mean-centering collapses to a
    per-component scalar, so the per-row work is k codegen'd dot products
    and the corpus never shuffles and never crosses into Python.

    ``precomputed=(mean, components)`` skips the internal
    :func:`pca_components` fit — pass it when the caller already holds the
    axes (evidence queries, serving a persisted model) so the corpus is
    scanned once, not twice.
    """
    if precomputed is not None:
        mean, comps = precomputed[0], precomputed[1][:k]
    else:
        mean, comps, _ = pca_components(df, vec_col, dim, k)
    v = as_double(vec_col)
    cols = []
    for c_idx, comp in enumerate(comps, start=1):
        offset = sum(m * c for m, c in zip(mean, comp))
        lit = F.array(*[F.lit(float(x)) for x in comp])
        score = F.aggregate(
            F.zip_with(v, lit, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        ) - F.lit(offset)
        cols.append(F.round(score, 6).alias(f"pc{c_idx}"))
    return df.select(F.col(id_col), *cols)


def zca_whiten(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    eps: float = 1e-6,
) -> DataFrame:
    """ZCA-whitened vectors: ``W = U diag(1/sqrt(l+eps)) U^T`` applied to the
    centered vector — unit variance along every principal axis while staying
    maximally close to the original basis (the standard preprocessing before
    cosine-sensitive similarity search on anisotropic embeddings).

    W is a dim×dim broadcastable literal built from the same bounded
    covariance readout as :func:`pca_components`; application is one
    mapInPandas BLAS ``(X - mean) @ W`` per Arrow batch — no shuffle, no
    per-row Python.
    """
    import numpy as np
    import pandas as pd

    mean, comps, eigs = pca_components(df, vec_col, dim, k=dim)
    u = np.asarray(comps).T  # (dim, k=dim) eigenvector columns
    w = u @ np.diag(1.0 / np.sqrt(np.asarray(eigs) + eps)) @ u.T
    mu = np.asarray(mean)
    bc = df.sparkSession.sparkContext.broadcast((mu, w))

    def apply(batches):
        m, wm = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)
            y = (x - m) @ wm
            yield pd.DataFrame({id_col: pdf[id_col], "white": list(y)})

    out = df.select(id_col, vec_col).mapInPandas(
        apply, schema=f"{id_col} long, white array<double>"
    )
    return out
