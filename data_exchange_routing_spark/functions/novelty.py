"""Bloom-prefiltered novelty detection (new-content discovery).

The standard crawl-frontier / incremental-ingest primitive: given a huge
"already seen" key set (url or content hash) and a stream of candidate keys,
emit exactly the novel ones. The exact answer is an anti-join, but at
10^9-10^10 seen keys the anti-join shuffles every probe row; a Bloom filter
built once over the seen side and broadcast to executors rejects the vast
majority of already-seen probes MAP-SIDE (no shuffle), and only the Bloom
POSITIVES — a tiny slice sized by the true-hit rate + fpp — pay the exact
anti-join confirm. Bloom filters have no false negatives, so

    union(bloom-negatives, anti_join(bloom-positives, seen)) == anti_join(probe, seen)

bit-for-bit — the approximation never changes the answer, only the cost.
(Same public design as Spark's own InjectRuntimeFilter bloom pushdown and
the classic Mercator crawler's seen-URL test.)

Determinism contract: hashing is md5-based double hashing (Kirsch-Mitzenmacher,
public), identical in the Spark-native build expressions and the Python probe
path; no RNG state anywhere.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_N_BITS = 1 << 20  # 128 KiB bitmap — broadcast-trivial
DEFAULT_N_HASHES = 5


def _h1h2_cols(key_col):
    """(h1, h2) double-hash base columns from md5(key) — native expressions,
    whole-stage-codegen'd; h2 forced odd so stride cycles the full table."""
    hexd = F.md5(key_col.cast("string"))
    h1 = F.conv(F.substring(hexd, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(hexd, 17, 15), 16, 10).cast("long").bitwiseOR(F.lit(1))
    return h1, h2


def _h1h2_py(key: str) -> tuple[int, int]:
    """Python twin of _h1h2_cols — byte-identical md5-hex slicing."""
    hexd = hashlib.md5(str(key).encode("utf-8")).hexdigest()
    return int(hexd[0:15], 16), int(hexd[16:31], 16) | 1


def bloom_positions(key_col, n_bits: int = DEFAULT_N_BITS, n_hashes: int = DEFAULT_N_HASHES):
    """Array column of the key's n_hashes bit positions (build side)."""
    h1, h2 = _h1h2_cols(key_col)
    return F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(n_hashes)])


def build_bloom(
    seen: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> np.ndarray:
    """Distributed bitmap build: positions are computed map-side by native
    expressions, the shuffle carries only DISTINCT bit positions (<= n_bits
    values total regardless of seen-set size), and the driver materializes a
    packed uint8 bitmap of n_bits/8 bytes — control-plane-sized even when
    `seen` is 10^10 rows."""
    pos = (
        seen.select(F.explode(bloom_positions(F.col(key_col), n_bits, n_hashes)).alias("p"))
        .distinct()
        .collect()
    )
    bits = np.zeros(n_bits, dtype=bool)
    bits[[r["p"] for r in pos]] = True
    return np.packbits(bits)


def might_contain_udf(spark, packed: np.ndarray, n_bits: int, n_hashes: int):
    """Arrow-batched membership test against a broadcast bitmap. The bitmap
    rides an explicit SparkContext broadcast (shipped once per executor, not
    per task); each batch is one vectorized numpy gather."""
    bc = spark.sparkContext.broadcast(packed)

    @F.pandas_udf(T.BooleanType())
    def might_contain(key: pd.Series) -> pd.Series:
        pk = bc.value
        out = np.ones(len(key), dtype=bool)
        base = key.map(_h1h2_py)
        h1 = np.fromiter((t[0] for t in base), dtype=np.int64, count=len(key))
        h2 = np.fromiter((t[1] for t in base), dtype=np.int64, count=len(key))
        for i in range(n_hashes):
            p = (h1 + i * h2) % n_bits
            out &= (pk[p // 8] >> (7 - (p % 8)) & 1).astype(bool)
        return pd.Series(out)

    return might_contain


def novel_keys(
    seen: DataFrame,
    probe: DataFrame,
    key_col: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> DataFrame:
    """Exactly the probe rows whose key_col does not appear in seen[key_col].

    NULL-key semantics follow Spark's left_anti (a NULL key matches nothing,
    so NULL-keyed probe rows come back as novel); SQL NOT IN would drop them —
    callers with nullable keys should filter or coalesce first.

    Plan shape: probe rows are tagged map-side by the broadcast Bloom test;
    `_bloom_hit == false` rows are emitted directly (zero shuffle — at scale
    this is ~all of a mostly-novel crawl batch), and only the hits are
    confirmed by a distinct-key anti-join. Result is exact (no false
    negatives), so this carries a full value-hash oracle.
    """
    mc = might_contain_udf(probe.sparkSession, build_bloom(seen, key_col, n_bits, n_hashes), n_bits, n_hashes)
    tagged = probe.withColumn("_bloom_hit", mc(F.col(key_col).cast("string")))
    sure_novel = tagged.filter(~F.col("_bloom_hit")).drop("_bloom_hit")
    candidates = tagged.filter(F.col("_bloom_hit")).drop("_bloom_hit")
    seen_keys = seen.select(F.col(key_col)).distinct()
    confirmed = candidates.join(seen_keys, on=key_col, how="left_anti")
    return sure_novel.unionByName(confirmed)
