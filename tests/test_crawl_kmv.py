"""Hard gates for the round-2-continued additions: KMV/theta sketch error
bounds + algebra, crawl politeness (robots rules, frontier waves), HITS
numpy twin, containment pairs."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_exchange_routing_spark.functions.crawl import frontier_schedule, robots_filter
from data_exchange_routing_spark.functions.graph import hits
from data_exchange_routing_spark.functions.sketch import (
    KMV_SPACE,
    kmv_estimate,
    kmv_hash,
    kmv_intersect_estimate,
    kmv_merge,
    kmv_sketch,
)


# ---------------------------------------------------------------- KMV


def test_kmv_exact_below_k_and_bounded_error_above(spark):
    small = spark.range(40).select(F.col("id").alias("k"))
    est = kmv_estimate(kmv_sketch(small, "k", k=64), k=64).collect()[0]
    assert est["n_kept"] == 40 and est["est"] == 40.0  # exact when not full

    big = spark.range(20000).select(F.col("id").alias("k"))
    est = kmv_estimate(kmv_sketch(big, "k", k=256), k=256).collect()[0]
    # KMV relative std error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(est["est"] - 20000) / 20000 < 0.25

    # duplicate-insensitive: distinct count, not row count
    dup = big.unionByName(big).unionByName(big)
    est2 = kmv_estimate(kmv_sketch(dup, "k", k=256), k=256).collect()[0]
    assert est2["est"] == est["est"]


def test_kmv_merge_equals_sketch_of_union_and_is_commutative(spark):
    a = spark.range(0, 5000).select(F.col("id").alias("k"))
    b = spark.range(3000, 9000).select(F.col("id").alias("k"))
    k = 128
    ka, kb = kmv_sketch(a, "k", k), kmv_sketch(b, "k", k)
    direct = kmv_sketch(a.unionByName(b), "k", k).collect()
    merged = kmv_merge(ka, kb, k).collect()
    merged_rev = kmv_merge(kb, ka, k).collect()
    assert sorted(r["h"] for r in merged) == sorted(r["h"] for r in direct)
    assert sorted(r["h"] for r in merged) == sorted(r["h"] for r in merged_rev)


def test_kmv_intersection_estimate_and_exact_when_not_full(spark):
    a = spark.range(0, 5000).select(F.col("id").alias("k"))
    b = spark.range(3000, 9000).select(F.col("id").alias("k"))
    k = 256
    est = kmv_intersect_estimate(kmv_sketch(a, "k", k), kmv_sketch(b, "k", k), k).collect()[0]
    assert abs(est["est"] - 2000) / 2000 < 0.5  # theta intersection is noisier

    # both sketches below k => theta = full space => exact intersection
    sa = kmv_sketch(spark.range(0, 100).select(F.col("id").alias("k")), "k", k)
    sb = kmv_sketch(spark.range(60, 200).select(F.col("id").alias("k")), "k", k)
    est = kmv_intersect_estimate(sa, sb, k).collect()[0]
    assert est["n_common"] == 40 and est["est"] == 40.0


def test_kmv_hash_matches_duckdb(spark):
    import duckdb

    vals = spark.createDataFrame([("x",), ("42",), ("",)], "v string")
    got = {r["v"]: r["h"] for r in vals.select("v", kmv_hash(F.col("v")).alias("h")).collect()}
    for v, h in got.items():
        (exp,) = duckdb.sql(
            f"SELECT ('0x' || substr(md5('{v}'), 1, 15))::BIGINT"
        ).fetchone()
        assert h == exp, v


# ------------------------------------------------------------- crawl


def test_robots_longest_match_allow_ties_and_default(spark):
    urls = spark.createDataFrame(
        [
            (1, "h.com", "/a/1"),    # allow /a/1 (longest)
            (2, "h.com", "/a/2"),    # disallow /a/
            (3, "h.com", "/b"),      # no match -> allowed
            (4, "h.com", "/t"),      # equal-length allow+disallow -> allow wins
            (5, "other", "/a/1"),    # rule-free host -> allowed
        ],
        "id long, host string, path string",
    )
    rules = spark.createDataFrame(
        [
            ("h.com", "disallow", "/a/"),
            ("h.com", "allow", "/a/1"),
            ("h.com", "allow", "/t"),
            ("h.com", "disallow", "/t"),
        ],
        "host string, rule string, prefix string",
    )
    got = {r["id"]: (r["allowed"], r["matched_prefix"]) for r in robots_filter(urls, rules).collect()}
    assert got == {
        1: (True, "/a/1"),
        2: (False, "/a/"),
        3: (True, None),
        4: (True, "/t"),
        5: (True, None),
    }


def test_frontier_waves_respect_concurrency(spark):
    urls = spark.createDataFrame(
        [(f"u{i}", "h1") for i in range(5)] + [("v0", "h2")],
        "url string, host string",
    )
    out = frontier_schedule(urls, host_col="host", concurrency=2).collect()
    per_host_wave = {}
    for r in out:
        per_host_wave.setdefault((r["host"], r["wave"]), []).append(r["slot"])
    for (_h, _w), slots in per_host_wave.items():
        assert len(slots) <= 2 and sorted(slots) == list(range(len(slots)))
    # deterministic: url order within host drives rank
    h1 = sorted((r["url"], r["wave"], r["slot"]) for r in out if r["host"] == "h1")
    assert h1 == [("u0", 0, 0), ("u1", 0, 1), ("u2", 1, 0), ("u3", 1, 1), ("u4", 2, 0)]


# -------------------------------------------------------------- HITS


def test_hits_matches_numpy_power_iteration(spark):
    edges = [
        ("a", "b", 1.0), ("a", "c", 2.0), ("b", "c", 1.0),
        ("d", "c", 1.0), ("d", "b", 3.0), ("c", "a", 1.0),
    ]
    df = spark.createDataFrame(edges, "s string, t string, w double")
    got = {r["node"]: (r["hub"], r["authority"]) for r in hits(df, "s", "t", "w", n_iter=7).collect()}

    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    W = np.zeros((len(nodes), len(nodes)))
    for s, t, w in edges:
        W[idx[s], idx[t]] = w
    h = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(7):
        a = W.T @ h
        a = a / a.sum()
        h = W @ a
        h = h / h.sum()
    for v in nodes:
        assert math.isclose(got[v][0], h[idx[v]], abs_tol=1e-9), v
        assert math.isclose(got[v][1], a[idx[v]], abs_tol=1e-9), v


def test_hits_empty_and_nonpositive_edges(spark):
    df = spark.createDataFrame([("a", "b", 0.0)], "s string, t string, w double")
    assert hits(df, "s", "t", "w").count() == 0


# -------------------------------------------------------- containment


def test_containment_catches_quote_inclusion_jaccard_misses(spark):
    from data_exchange_routing_spark.functions.dedup_text import containment_pairs, jaccard_pairs

    short = "alpha beta gamma delta epsilon"
    filler = " ".join(f"word{i}" for i in range(60))
    rows = [(1, short), (2, filler + " " + short + " " + filler)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cp = containment_pairs(df, threshold=0.9).collect()
    assert len(cp) == 1 and cp[0]["cont_ab"] == 1.0  # A fully inside B
    assert cp[0]["cont_ba"] < 0.1
    assert jaccard_pairs(df, threshold=0.5).count() == 0  # jaccard blind to it
