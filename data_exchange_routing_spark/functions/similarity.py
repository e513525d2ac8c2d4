"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k. The query side is broadcast, so the
  physical plan is a map-side nested loop over the big side — no shuffle of
  the corpus; scales linearly with corpus size x queries.
- lsh_ann_topk: random-hyperplane LSH bucketing (sign bits), candidates
  restricted to same-bucket (multi-probe: exact bucket only here), then exact
  cosine within bucket — the sub-linear scale path. Hyperplanes are
  deterministic (md5-derived), so results are reproducible everywhere.

Arithmetic contract for the DuckDB oracle: embeddings cast to double BEFORE
any product, sums run in list order — both engines then produce identical
doubles; results additionally rounded to 6 decimals.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dvec(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def brute_force_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query id (self-match excluded)."""
    base = df.select(F.col(id_col).alias("nn_id"), _dvec(F.col(vec_col)).alias("nn_vec"))
    queries = (
        df.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), _dvec(F.col(vec_col)).alias("q_vec"))
    )
    scored = base.join(F.broadcast(queries), F.col("nn_id") != F.col("query_id")).withColumn(
        "sim", F.round(cosine(F.col("q_vec"), F.col("nn_vec")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("nn_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "nn_id", "sim", F.col("rk").cast("int").alias("rk"))
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1] from md5 — no RNG
    state, reproducible across engines and runs."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[:8], 16)
            row.append((h % 2001 - 1000) / 1000.0)
        planes.append(row)
    return planes


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Sign-bit bucket string for a vector column."""
    bits = []
    for row in planes:
        plane = F.array(*[F.lit(x) for x in row])
        dot = F.aggregate(F.zip_with(vec_col, plane, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def ivf_assign(df: DataFrame, n_centroids: int = 16, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF coarse quantizer: centroids are the first n_centroids vectors
    (deterministic; a k-means refinement would slot in here), assignment is
    argmax cosine against the BROADCAST centroid set — map-side only, no
    shuffle of the corpus."""
    cents = (
        df.filter(F.col(id_col) < n_centroids)
        .select(F.col(id_col).alias("centroid_id"), _dvec(F.col(vec_col)).alias("c_vec"))
    )
    v = df.select(F.col(id_col).alias("vid"), _dvec(F.col(vec_col)).alias("vec"))
    scored = v.join(F.broadcast(cents)).withColumn("c_sim", cosine(F.col("vec"), F.col("c_vec")))
    w = Window.partitionBy("vid").orderBy(F.desc("c_sim"), F.asc("centroid_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vid", "vec", "centroid_id")
    )


def ivf_ann_topk(
    df: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: exact cosine only within each vector's inverted list
    (same-centroid candidates). At 10^9 vectors the candidate join touches
    ~N/n_centroids rows per query instead of N; recall tunes via n_centroids
    (and an n_probe>1 extension probing the next-nearest lists)."""
    assigned = ivf_assign(df, n_centroids, id_col, vec_col)
    a, b = assigned.alias("a"), assigned.alias("b")
    cand = a.join(
        b, (F.col("a.centroid_id") == F.col("b.centroid_id")) & (F.col("a.vid") != F.col("b.vid"))
    ).select(
        F.col("a.vid").alias("query_id"),
        F.col("b.vid").alias("nn_id"),
        F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("nn_id"))
    return cand.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")


def lsh_ann_topk(
    df: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k per vector among same-bucket candidates. At 10^9
    vectors the bucket join replaces the full cross product; recall is tuned
    by n_planes (fewer planes -> bigger buckets -> higher recall & cost)."""
    planes = _hyperplanes(dim, n_planes)
    v = df.select(F.col(id_col).alias("vid"), _dvec(F.col(vec_col)).alias("vec")).withColumn(
        "bucket", lsh_bucket(F.col("vec"), planes)
    )
    a, b = v.alias("a"), v.alias("b")
    cand = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vid") != F.col("b.vid"))
    ).select(
        F.col("a.vid").alias("query_id"),
        F.col("b.vid").alias("nn_id"),
        F.round(cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("nn_id"))
    return cand.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k).drop("rk")
