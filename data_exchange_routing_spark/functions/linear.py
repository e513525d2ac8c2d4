"""Distributed full-batch logistic-regression training (data-parallel GD).

A curation pipeline's learned quality/language classifier (the fastText-style
filter in CCNet/Gopher-class pipelines) trains by data-parallel gradient
descent: the MODEL is tiny (a handful of weights, driver-held) while each
gradient step is one pass over the full corpus. That is exactly Spark's
aggregation shape — per-partition partial gradients combine map-side and one
scalar row reaches the driver per step, so a 100 TB corpus trains with
`steps` scans and ZERO wide shuffles (every agg is a global combine to one
row; no groupBy key, no exchange by key, no per-row Python).

Reference parity: the reference pipeline routes on static configs
(fns-routing/src/main/kotlin/RouteIngestedFile.kt) — a learned router/filter
is the training-data-pipeline extension of its content-type dispatch (F7).

Determinism: weights start at zero, the step count and learning rate are
fixed, and every reduction is a plain mean — so the run is reproducible and
expressible as an unrolled-SQL oracle (plans/queries.py:doc_lr_quality).
Float sum-order differences across engines sit ~1e-15 relative, far below
the 6-decimal rounding the registry query applies.

Scale notes:
- ``features`` is persisted for the duration of training (``steps + 1``
  passes); at 100 TB that's MEMORY_AND_DISK on the projected 5-column frame,
  a tiny fraction of corpus width.
- Each step collects ONE row of D+1 doubles — driver traffic is O(D) per
  step, independent of corpus size (the classic parameter-server-less
  data-parallel GD layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def doc_features(docs: DataFrame, text_col: str = "text", label_expr: str = "lang = 'en'") -> DataFrame:
    """Per-doc numeric features for the quality/language classifier.

    Pure built-in string expressions (codegen'd, no UDF): log-length, space
    ratio (word density) and digit ratio — the cheap surface statistics the
    public CCNet/Gopher filters start from.
    """
    n = F.greatest(F.length(F.col(text_col)), F.lit(1)).cast("double")
    return docs.select(
        "doc_id",
        F.when(F.expr(label_expr), F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
        (F.log(F.lit(1.0) + n) / F.lit(10.0)).alias("x1"),
        (
            (n - F.length(F.regexp_replace(F.col(text_col), " ", ""))) / n
        ).alias("x2"),
        (F.length(F.regexp_replace(F.col(text_col), "[^0-9]", "")) / n).alias("x3"),
    )


def logreg_train(
    features: DataFrame,
    feature_cols: tuple[str, ...] = ("x1", "x2", "x3"),
    label_col: str = "y",
    steps: int = 3,
    lr: float = 1.0,
) -> list[float]:
    """Full-batch GD: returns [w0(bias), w1..wD] after ``steps`` steps.

    Each step is ONE distributed aggregation (map-side-combined averages of
    the per-row gradient components); the driver holds only the D+1 weights.
    """
    feats = features.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        w = [0.0] * (1 + len(feature_cols))
        for _ in range(steps):
            z = F.lit(w[0])
            for j, c in enumerate(feature_cols):
                z = z + F.lit(w[j + 1]) * F.col(c)
            resid = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col(label_col)
            aggs = [F.avg(resid).alias("g0")] + [
                F.avg(resid * F.col(c)).alias(f"g{j + 1}")
                for j, c in enumerate(feature_cols)
            ]
            g = feats.agg(*aggs).first()
            w = [w[j] - lr * g[j] for j in range(len(w))]
        return w
    finally:
        feats.unpersist()


def logreg_score(
    features: DataFrame,
    weights: list[float],
    feature_cols: tuple[str, ...] = ("x1", "x2", "x3"),
    out_col: str = "p",
) -> DataFrame:
    """Append the fitted probability — a narrow map, no shuffle."""
    z = F.lit(weights[0])
    for j, c in enumerate(feature_cols):
        z = z + F.lit(weights[j + 1]) * F.col(c)
    return features.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def logreg_train_numpy(x, y, steps: int = 3, lr: float = 1.0):
    """Exact single-process twin (tests): same math, numpy arrays."""
    import numpy as np

    xb = np.hstack([np.ones((x.shape[0], 1)), x])
    w = np.zeros(xb.shape[1])
    for _ in range(steps):
        p = 1.0 / (1.0 + np.exp(-(xb @ w)))
        w = w - lr * ((p - y) @ xb) / xb.shape[0]
    return w


__all__ = ["doc_features", "logreg_train", "logreg_score", "logreg_train_numpy"]
