"""Full-corpus distributed k-means: numpy Lloyd twin + invariants."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_exchange_routing_spark.functions.similarity import kmeans_fit

SF_DIR = "/root/testdata/sf0.001"


def test_kmeans_matches_numpy_lloyd(spark):
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    k, n_iter = 6, 5
    cents, assigned = kmeans_fit(df, k=k, n_iter=n_iter)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}

    rows = df.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    X = np.array([[float(x) for x in r["embedding"]] for r in rows], dtype=np.float64)
    # identical init: k smallest (xxhash64(id), id) — fetch via Spark to use
    # the same hash function
    init_ids = [
        r["vec_id"]
        for r in df.select("vec_id")
        .withColumn("h", F.xxhash64("vec_id"))
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    ]
    idx = {v: i for i, v in enumerate(ids)}
    C = X[[idx[v] for v in init_ids]].copy()
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    for _ in range(n_iter):
        sim = Xn @ (C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)).T
        # ties to the smaller centroid id == first argmax
        assign = sim.argmax(axis=1)
        newC = C.copy()
        for j in range(k):
            members = X[assign == j]
            if len(members):
                s = members.sum(axis=0)
                n = np.linalg.norm(s)
                if n > 1e-12:
                    newC[j] = s / n
        C = newC
    sim = Xn @ C.T
    want_assign = sim.argmax(axis=1)
    want = {v: int(want_assign[idx[v]]) for v in ids}

    got_c = np.array(cents)
    assert np.abs(got_c - C).max() < 1e-9
    mismatches = [v for v in ids if got[v] != want[v]]
    assert not mismatches, mismatches[:5]
    # every vector assigned, clusters within range
    assert len(got) == len(ids) and set(got.values()) <= set(range(k))


def test_kmeans_clusters_separable_data(spark):
    # two orthogonal bundles must split cleanly in k=2
    rows = []
    for i in range(40):
        v = [0.0] * 8
        v[i % 2] = 1.0
        v[2 + (i % 3)] = 0.01 * (i % 5)  # slight jitter, same dominant axis
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    _, assigned = kmeans_fit(df, k=2, n_iter=6)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    evens = {got[i] for i in range(0, 40, 2)}
    odds = {got[i] for i in range(1, 40, 2)}
    assert len(evens) == 1 and len(odds) == 1 and evens != odds
