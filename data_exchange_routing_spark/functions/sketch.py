"""Mergeable frequency sketches: count-min heavy hitters.

At 10^10 events the per-key exact count table is itself huge (10^8-10^9
distinct urls/users); a count-min sketch (Cormode & Muthukrishnan 2005,
public) compresses frequencies into a d x w counter grid that answers point
queries with est >= true and error <= N/w at confidence 1-(1/2)^d. The
aggregation is the whole trick: every task pre-combines its events into at
most d*w counters MAP-SIDE, so the shuffle carries O(tasks * d * w) rows —
independent of key cardinality — and sketches from different partitions /
epochs / tables merge by plain addition (the same mergeability argument as
the HLL rollup aggregates in the lake views).

Determinism contract: row hashes are md5 of "<j>:<key>" — no RNG state, so
the estimates themselves are deterministic and carry an exact cross-engine
oracle (DuckDB computes the identical grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_exchange_routing_spark.functions.textstats import md5_int32


def _cms_bucket(key_col, j: int, w: int):
    return md5_int32(F.concat(F.lit(f"{j}:"), key_col.cast("string"))) % w


def cms_sketch(df: DataFrame, key_col: str, d: int = 4, w: int = 64) -> DataFrame:
    """(j, bucket, c) counter grid — d*w rows total. One aggregation; the
    explode to d rows happens map-side and pre-combines before the shuffle."""
    pairs = df.select(
        F.posexplode(
            F.array(*[_cms_bucket(F.col(key_col), j, w) for j in range(d)])
        ).alias("j", "bucket")
    )
    return pairs.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("c"))


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 64,
) -> DataFrame:
    """Point-query the sketch for each key: est = min_j grid[j][bucket_j(key)].
    The d*w-row grid is broadcast, so estimation is a map-side join + one
    per-key min — no shuffle of the key set beyond its own aggregation."""
    probes = keys.select(
        key_col,
        F.posexplode(
            F.array(*[_cms_bucket(F.col(key_col), j, w) for j in range(d)])
        ).alias("j", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy(key_col)
        .agg(F.min("c").alias("est"))
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 20,
    d: int = 4,
    w: int = 64,
) -> DataFrame:
    """Top-k keys by count-min estimate, with the exact count alongside
    (demo/verification shape — production queries the sketch alone). The
    est >= exact guarantee is asserted in tests."""
    sketch = cms_sketch(df, key_col, d, w)
    est = cms_estimate(df.select(key_col).distinct(), sketch, key_col, d, w)
    exact = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact"))
    return (
        est.join(exact, key_col)
        .orderBy(F.desc("est"), F.asc(key_col))
        .limit(k)
    )


# ---------------------------------------------------------------- histogram
# Fixed-bin histogram: the third mergeable sketch (CMS = frequencies,
# HLL = distincts, histogram = the value DISTRIBUTION / quantiles). Bin
# counts are plain longs, so partials from partitions / epochs / tables
# merge by elementwise addition — the property that lets a rollup view
# maintain an incrementally-updatable quantile estimate where Spark's
# percentile_approx exposes no partial state. Bin edges are fixed by config
# ([lo, hi) split into k equal bins + underflow/overflow), so the grid is
# deterministic and carries an exact cross-engine oracle (DuckDB
# width_bucket computes the identical bins).


def histogram_bin(col, lo: float, hi: float, k: int):
    """Bin ordinal expression: 0 = underflow (< lo), 1..k = in-range,
    k+1 = overflow (>= hi). NULLs yield NULL (dropped by the count agg)."""
    span = (hi - lo) or 1.0
    raw = F.floor((col.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(k)).cast("long")
    return (
        F.when(col.isNull(), F.lit(None).cast("long"))
        .when(col.cast("double") < lo, F.lit(0))
        .when(col.cast("double") >= hi, F.lit(k + 1))
        .otherwise(raw + 1)
    )


def histogram_sketch(
    df: DataFrame,
    col: str,
    lo: float,
    hi: float,
    k: int = 32,
    by: list[str] | None = None,
) -> DataFrame:
    """(group cols..., bin, c) — at most k+2 rows per group, map-side
    pre-combined before the shuffle (cardinality-independent, like CMS)."""
    keys = list(by or [])
    binned = df.select(*keys, histogram_bin(F.col(col), lo, hi, k).alias("bin"))
    return (
        binned.filter(F.col("bin").isNotNull())
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def histogram_quantile(rows: list, q: float, lo: float, hi: float, k: int) -> float:
    """Quantile estimate from (bin, c) rows: linear interpolation within the
    containing bin (error bounded by the bin width). Underflow/overflow
    clamp to lo/hi. Driver-side — the histogram is k+2 rows."""
    counts = {int(r["bin"]): int(r["c"]) for r in rows}
    total = sum(counts.values())
    if total == 0:
        raise ValueError("empty histogram")
    target = q * total
    span = (hi - lo) or 1.0
    run = 0
    for b in range(0, k + 2):
        c = counts.get(b, 0)
        if c == 0:
            continue
        if run + c >= target:
            if b == 0:
                return lo
            if b == k + 1:
                return hi
            frac = (target - run) / c
            left = lo + (b - 1) * span / k
            return left + frac * span / k
        run += c
    return hi


# ---------------------------------------------------------------------------
# KMV / theta sketch: mergeable DISTINCT-count estimation with set algebra
# ---------------------------------------------------------------------------
#
# CMS answers frequency point queries and the histogram sketch answers
# quantiles; the third member of the mergeable-sketch family a 100 TB engine
# needs is distinct counting WITH set operations — "how many distinct users
# did A and B share?" is not answerable from two HLLs without the full sets.
# KMV / bottom-k (Bar-Yossef et al. 2002; Beyer et al. 2007, SIGMOD — the
# construction behind the DataSketches theta sketch) keeps the k smallest
# distinct hash values of a key set. The k-th smallest hash U_(k), viewed as
# a fraction of the hash space, estimates density: D ≈ (k-1)/U_(k); unions
# merge by taking the k smallest of the combined sketches; intersections use
# the theta trick (count surviving common hashes below min(theta_a, theta_b),
# divide by theta).
#
# Determinism contract (same as CMS): the "uniform" hash is the first 60 bits
# of md5, so sketches — and therefore the estimates — are bit-identical
# across engines and cluster sizes; DuckDB computes the same sketch with
# ('0x' || substr(md5(x), 1, 15))::BIGINT and carries an EXACT oracle.
#
# Physical shape: distinct-of-hashes is one map-side-combinable aggregation;
# the k-smallest cut is TakeOrdered (per-partition top-k heaps merged on the
# driver) — never a global sort. The sketch itself (≤ k longs) is
# control-plane sized from then on: estimates and set ops are driver-trivial
# or broadcast joins.

KMV_SPACE = float(1 << 60)  # hash values are uniform in [0, 2^60)


def kmv_hash(col) -> "F.Column":
    """First 60 bits of md5 as a long — uniform, deterministic, and exactly
    reproducible in DuckDB (15 hex digits fit BIGINT)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def kmv_sketch(df: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """The k smallest distinct key hashes: one column ``h``, ≤ k rows."""
    return (
        df.select(kmv_hash(F.col(key_col)).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """Union sketch: k smallest of the combined hash sets. Associative and
    commutative — partial sketches from partitions/epochs/tables fold the
    same way."""
    return a.unionByName(b).distinct().orderBy("h").limit(k)


def kmv_estimate(sketch: DataFrame, k: int = 64) -> DataFrame:
    """One row (n_kept, est): exact count when the set never filled the
    sketch (n < k ⇒ every distinct hash is present), else (k-1)/U_(k)."""
    return sketch.agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("_max_h")
    ).select(
        "n_kept",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(KMV_SPACE) / F.col("_max_h").cast("double"))
        .alias("est"),
    )


def kmv_intersect_estimate(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """One row (n_common, est): theta-sketch intersection. theta_x is the
    sketch's k-th smallest hash when full, else the whole hash space; common
    hashes below min(theta_a, theta_b) are an unbiased sample of the true
    intersection at sampling rate theta/space."""

    def _theta(s: DataFrame) -> DataFrame:
        return s.agg(
            F.when(F.count(F.lit(1)) < k, F.lit(KMV_SPACE))
            .otherwise(F.max("h").cast("double"))
            .alias("theta")
        )

    theta = (
        _theta(a).crossJoin(_theta(b).withColumnRenamed("theta", "_tb"))
        .select(F.least("theta", "_tb").alias("theta"))
    )
    common = a.join(b, "h", "inner").crossJoin(theta).filter(F.col("h") < F.col("theta"))
    return common.agg(
        F.count(F.lit(1)).alias("n_common"),
        F.round(F.count(F.lit(1)) * F.lit(KMV_SPACE) / F.first("theta"), 4).alias("est"),
    ).select(
        "n_common", F.coalesce("est", F.lit(0.0)).alias("est")
    )
