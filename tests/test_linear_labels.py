"""Distributed logistic-regression training + bounded-round label propagation.

The LR trainer's distributed gradient averages must match the single-process
numpy twin exactly (same math, same step count); min_label_rounds must match
a brute-force adjacency-walk twin on an arbitrary graph.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_exchange_routing_spark.functions.linear import (
    doc_features,
    logreg_score,
    logreg_train,
    logreg_train_numpy,
)
from data_exchange_routing_spark.functions.graph import min_label_rounds

SF_DIR = "/root/testdata/sf0.001"


def test_logreg_matches_numpy_twin(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    feats = doc_features(docs)
    w = logreg_train(feats, steps=3, lr=1.0)

    pdf = feats.orderBy("doc_id").toPandas()
    x = pdf[["x1", "x2", "x3"]].to_numpy(dtype=float)
    y = pdf["y"].to_numpy(dtype=float)
    w_np = logreg_train_numpy(x, y, steps=3, lr=1.0)
    assert np.allclose(np.array(w), w_np, rtol=0, atol=1e-12)

    scored = logreg_score(feats, w).orderBy("doc_id").toPandas()
    p_np = 1.0 / (1.0 + np.exp(-(np.hstack([np.ones((len(y), 1)), x]) @ w_np)))
    assert np.allclose(scored["p"].to_numpy(), p_np, atol=1e-12)


def test_logreg_loss_decreases(spark):
    """3 full-batch steps at lr=1.0 on the scaled features must descend —
    guards against reintroducing the unscaled-feature oscillation."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pdf = doc_features(docs).toPandas()
    x = pdf[["x1", "x2", "x3"]].to_numpy(dtype=float)
    y = pdf["y"].to_numpy(dtype=float)
    xb = np.hstack([np.ones((len(y), 1)), x])
    w = np.zeros(4)
    losses = []
    for _ in range(4):
        p = 1.0 / (1.0 + np.exp(-(xb @ w)))
        losses.append(float(np.mean(-(y * np.log(p + 1e-12) + (1 - y) * np.log(1 - p + 1e-12)))))
        w = w - 1.0 * ((p - y) @ xb) / len(y)
    assert all(b < a for a, b in zip(losses, losses[1:])), losses


def _twin_min_labels(edges: list[tuple[str, str]], rounds: int) -> dict[str, str]:
    adj: dict[str, set[str]] = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    lbl = {n: n for n in adj}
    for _ in range(rounds):
        lbl = {n: min([lbl[n]] + [lbl[m] for m in adj[n]]) for n in adj}
    return lbl


@pytest.mark.parametrize("rounds", [1, 2, 3])
def test_min_label_rounds_matches_twin(spark, rounds):
    edges = [
        ("b", "a"), ("b", "c"), ("c", "d"),   # chain a-b-c-d
        ("x", "y"),                            # pair
        ("p", "q"), ("q", "r"), ("r", "p"),   # triangle
        ("a", "a"),                            # self-loop dropped
        ("c", "b"),                            # reverse duplicate
    ]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["community"]
        for r in min_label_rounds(df, "src", "dst", rounds=rounds).collect()
    }
    assert got == _twin_min_labels(edges, rounds)


def test_min_label_rounds_hop_bound(spark):
    """After r rounds a node sees exactly its r-hop min — round 1 of the
    chain a-b-c-d must NOT give d label 'a'."""
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    one = {r["node"]: r["community"] for r in min_label_rounds(df, rounds=1).collect()}
    assert one == {"a": "a", "b": "a", "c": "b", "d": "c"}
    two = {r["node"]: r["community"] for r in min_label_rounds(df, rounds=2).collect()}
    assert two == {"a": "a", "b": "a", "c": "a", "d": "b"}
    three = {r["node"]: r["community"] for r in min_label_rounds(df, rounds=3).collect()}
    assert three == {"a": "a", "b": "a", "c": "a", "d": "a"}
