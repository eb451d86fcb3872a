"""Distributed logistic-regression training by full-batch gradient descent.

The quality-classifier training loop every curation pipeline runs (CCNet /
fastText-style "does this document look like the reference corpus"
filters): features are cheap per-document scalars, the model is a tiny
linear head, but the TRAINING DATA is the whole corpus — so the expensive
part, the gradient, must be computed where the data lives.

The relational shape: one full-batch GD step is ONE aggregate —

    grad_j = avg((sigmoid(w . x) - y) * x_j)

a map-side-combinable mean over (features, label) rows with the current
weights inlined as literals. Per step, exactly one job, one shuffle of
partial sums (num_features + 1 doubles per partition), one driver row
collected (the house bounded-readout pattern: same as the CC convergence
probe and the jaccard pricing agg). Weights live on the driver between
steps — they are O(features), not O(data); this is precisely how MLlib's
own LogisticRegression treedAggregates its gradient, minus the
quasi-Newton bells.

Determinism contract (what makes the unrolled-SQL oracle exact): features
are rounded to 6 dp BEFORE training, and the weights are re-rounded to
6 dp after EVERY step, so cross-engine float drift cannot compound across
steps — any divergence would have to appear within a single avg() and
survive the 6 dp round (the standard house tolerance argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def logreg_train(
    features: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 0.5,
    steps: int = 3,
) -> list[dict]:
    """Run ``steps`` full-batch GD steps; return one dict per step.

    ``features`` must already contain 6dp-rounded feature columns (an
    implicit bias term is prepended — do NOT include a constant column).
    Each dict carries the step number, the log-loss evaluated with the
    step's STARTING weights, and the post-update weights ``w_bias``,
    ``w_<feature>``.
    """
    cols = ["__bias"] + list(feature_cols)
    # The narrow (features, label) projection feeds EVERY step's aggregate:
    # pin it (house loop rule) so the feature extraction upstream — often a
    # full-corpus tokenize — runs once, not once per step. Step 1's agg
    # materializes the lazy checkpoint; steps 2+ read ~(k+1) doubles/row.
    base = features.select(
        F.lit(1.0).alias("__bias"),
        *[F.col(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("__y"),
    ).localCheckpoint(eager=False)
    w = {c: 0.0 for c in cols}
    out: list[dict] = []
    for step in range(1, steps + 1):
        z = sum((F.col(c) * F.lit(w[c]) for c in cols), F.lit(0.0))
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        aggs = [F.avg((p - F.col("__y")) * F.col(c)).alias(f"g_{c}") for c in cols]
        # loss-term clamp: a saturated sigmoid (|z| ≳ 37 in float64) makes
        # p hit exactly 0.0/1.0 and F.log return -inf, poisoning the avg
        # with NaN. The gradient uses the RAW p (its limit is finite), so
        # only the log args are clamped — standard cross-entropy hygiene,
        # a no-op whenever p is unsaturated.
        pc = F.least(F.greatest(p, F.lit(1e-12)), F.lit(1.0 - 1e-12))
        aggs.append(
            F.avg(
                -(
                    F.col("__y") * F.log(pc)
                    + (F.lit(1.0) - F.col("__y")) * F.log(F.lit(1.0) - pc)
                )
            ).alias("loss")
        )
        row = base.agg(*aggs).collect()[0]
        # + 0.0 normalizes IEEE -0.0 (the house cross-engine parity trick)
        w = {c: round(w[c] - lr * row[f"g_{c}"], 6) + 0.0 for c in cols}
        rec = {"step": step, "loss_before": round(row["loss"], 6) + 0.0}
        for c in cols:
            rec["w_bias" if c == "__bias" else f"w_{c}"] = w[c]
        out.append(rec)
    return out
