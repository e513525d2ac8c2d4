"""Per-key last-writer-wins CDC dedup (SURVEY.md §2.6 A-dedup).

Ordering key is (warc_ts, lsn) — event time, ties broken by log sequence —
mirroring the reference's ordered chunk commit (RouteIngestedFile.kt:543-545)
and the HL7 `sequencer` field (HL7Message.kt:25). At-least-once delivery means
exact duplicates (same lsn) and out-of-order arrivals are expected
(RouteIngestedFile.kt:100-103; CHANGELOG 0.0.41).

Two interchangeable physical strategies (tests assert identical results):

- "agg" (default): groupBy(url).agg(max_by(row, (warc_ts, lsn))). Catalyst
  plans this as partial hash aggregation, so every map task pre-reduces its
  own slice of a hot url to ONE row before the shuffle — Zipf-skewed keys
  never concentrate on a single reducer. This is the built-in equivalent of
  hand-salting and the preferred plan at 10^10 events.

- "window_salted": explicit two-phase salted reduction + window row_number —
  the classical formulation; kept for parity with engines without map-side
  combine on max_by and as an explicit skew-handling demonstration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDER_COLS = ("warc_ts", "lsn")


def dedup_last_writer(
    df: DataFrame,
    key: str | list[str] = "url",
    strategy: str = "agg",
    n_salts: int = 32,
) -> DataFrame:
    keys = [key] if isinstance(key, str) else list(key)
    if strategy == "agg":
        return _dedup_agg(df, keys)
    if strategy == "window_salted":
        return _dedup_window_salted(df, keys, n_salts)
    raise ValueError(f"unknown dedup strategy: {strategy}")


def _ord(df: DataFrame):
    return F.struct(*[F.col(c) for c in ORDER_COLS])


def _dedup_agg(df: DataFrame, keys: list[str]) -> DataFrame:
    cols = df.columns
    row = F.struct(*[F.col(c) for c in cols])
    out = df.groupBy(*keys).agg(F.max_by(row, _ord(df)).alias("_row"))
    return out.select(*[F.col(f"_row.{c}").alias(c) for c in cols])


def _dedup_window_salted(df: DataFrame, keys: list[str], n_salts: int) -> DataFrame:
    """Phase 1: reduce per (key, salt) — hot keys split across n_salts reducers;
    phase 2: reduce the <=n_salts survivors per key; final row_number window
    runs on at most n_salts rows per key."""
    cols = df.columns
    row = F.struct(*[F.col(c) for c in cols])
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col("lsn"), F.lit(7)), F.lit(n_salts)))
    phase1 = salted.groupBy(*keys, "_salt").agg(F.max_by(row, _ord(df)).alias("_row"))
    w = Window.partitionBy(*keys).orderBy(
        F.desc(F.col(f"_row.{ORDER_COLS[0]}")), F.desc(F.col(f"_row.{ORDER_COLS[1]}"))
    )
    final = phase1.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return final.select(*[F.col(f"_row.{c}").alias(c) for c in cols])
