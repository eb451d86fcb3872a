"""Differentially-private release operators (extension surface §2.9,
curation/governance family).

Discrete Laplace noise via the two-sided-geometric construction
(Ghosh/Roughgarden/Sundararajan, "Universally Utility-Maximizing Privacy
Mechanisms", STOC'09 — public literature): ``noise = K1 - K2`` with K1, K2
iid Geometric(1 - e^-eps). Sampling is integer inverse-CDF against
PRECOMPUTED thresholds ``T[k] = ceil((1 - p^(k+1)) * 2^60)``, with the
uniform drawn as a 60-bit md5 integer — so the whole mechanism is
integer-exact and engine-portable (no ln/exp at query time; the one float
step is baked into the threshold literals).

Two randomness modes (r12 verdict item 6):

- ``noise="deterministic"`` — the uniform is a hash of the GROUP KEY
  alone. Bit-exactly replayable by a SQL oracle (the correctness-gate
  mode), but a PRIVACY BUG if deployed: anyone who knows the group key can
  reconstruct the noise and recover the true count. Kept only as the
  oracle path.
- ``noise="seeded"`` — the uniform is a hash of ``(nonce, group key)``
  where the nonce is caller-supplied ``seed`` (reproducible runs) or drawn
  fresh from ``os.urandom`` per release (production). The mechanism,
  sensitivity-1 count shape, and post-processing are identical; only the
  randomness source changes, which is exactly the deployment contract.

Scale shape: one groupBy (the only shuffle); the noise is a pure
projection over the (small) per-group counts — free at any corpus size.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: clamp for the geometric magnitude; tail mass p^40 ~ 4e-18 at eps=1
_MAX_MAG = 40


def geometric_thresholds(eps: float = 1.0, max_mag: int = _MAX_MAG) -> list[int]:
    """Inverse-CDF thresholds for Geometric(1 - e^-eps) on a 60-bit
    uniform: ``K = #{k : T[k] <= u}``. Shared as the SAME literals by the
    Spark expression and any SQL oracle replay."""
    p = math.exp(-eps)
    return [math.ceil((1.0 - p ** (k + 1)) * 2**60) for k in range(max_mag)]


def _uniform60(prefix: str, key: Column) -> Column:
    """Deterministic 60-bit uniform from md5(prefix || key) — the repo's
    standard engine-portable hash-uniform (15 hex chars = 60 bits).

    NULL keys are hashed as the sentinel ``__NULL__``, NOT propagated:
    concat(NULL) would null the uniform, the inverse-CDF would count zero
    thresholds, and the NULL group's count would be released with ZERO
    noise — exact disclosure in both modes. SQL oracles must mirror with
    ``coalesce(key, '__NULL__')`` (a no-op on null-free group columns)."""
    safe = F.coalesce(key.cast("string"), F.lit("__NULL__"))
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(prefix), safe)), 1, 15), 16, 10)
        .cast("long")
    )


def dp_group_counts(
    df: DataFrame,
    group_col: str,
    eps: float = 1.0,
    noise: str = "deterministic",
    seed: int | None = None,
    out_col: str = "dp_count",
) -> DataFrame:
    """eps-DP release of per-group row counts: one groupBy (sensitivity 1
    under add/remove-one-row adjacency), then discrete Laplace noise added
    as a pure projection. Returns ``(group_col, out_col)``.

    ``noise="deterministic"`` replays bit-exactly in SQL (oracle mode;
    see module docstring for why it must never ship). ``noise="seeded"``
    salts the hash stream with ``seed`` (or a fresh ``os.urandom`` nonce
    when ``seed is None``) — same mechanism, secret randomness.
    """
    if noise not in ("deterministic", "seeded"):
        raise ValueError(f"noise must be 'deterministic' or 'seeded', got {noise!r}")
    if noise == "deterministic":
        p1, p2 = "dp1:", "dp2:"
    else:
        nonce = seed if seed is not None else int.from_bytes(os.urandom(8), "big")
        p1, p2 = f"dp1:{nonce}:", f"dp2:{nonce}:"
    thresholds = F.array(*[F.lit(t) for t in geometric_thresholds(eps)])
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))
    with_u = counts.select(
        group_col,
        "n",
        _uniform60(p1, F.col(group_col)).alias("u1"),
        _uniform60(p2, F.col(group_col)).alias("u2"),
    )
    # K = #{k : T[k] <= u} is the geometric inverse-CDF pick (T ascending);
    # u1/u2 are plain input columns here so the HOF lambdas can't hit the
    # lateral-alias trap
    k1 = F.size(F.filter(thresholds, lambda t: t <= F.col("u1")))
    k2 = F.size(F.filter(thresholds, lambda t: t <= F.col("u2")))
    return with_u.select(
        group_col,
        (F.col("n") + k1.cast("long") - k2.cast("long")).alias(out_col),
    )
