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


def fused_local_dedup_extract(
    staged_input: DataFrame,
    n_buckets: int,
    dest_col: str = "destination_table",
    bucket_col: str = "_b",
    no_dedup_dest: str = "dead_letter",
):
    """Third physical strategy ("local"): ONE shuffle for the whole epoch.

    The agg strategy shuffles the full ~KB rows twice — once keyed (dest, url)
    for the dedup aggregation, once keyed (dest, bucket) for the staged write.
    But bucket = hash(url) % n determines url's partition, so a single
    (dest, bucket) shuffle co-locates every revision of a url; after a
    partition-local sort (dest, bucket, url, warc_ts DESC, lsn DESC),
    last-writer-wins dedup is adjacency filtering — C-level vector compare in
    the SAME Arrow pass that text extraction already pays. Net: half the
    shuffle bytes per epoch and one fewer Arrow round trip.

    Rows with dest == ``no_dedup_dest`` (dead letters) are never deduplicated
    (at-least-once dead-lettering, like the reference) and keep their meta
    map; delta rows get meta nulled (parity with the agg path, which drops
    meta before staging).

    Returns a DataFrame shaped like ``staged_input`` + a ``text`` column
    after ``html``, physically partitioned by (dest, bucket) and url-sorted —
    ready for a direct partitionBy write (pass pre_partitioned=True to
    stage_multicast_delta).
    """
    import numpy as np
    import pandas as pd  # noqa: F401
    from pyspark.sql import types as T

    from data_exchange_routing_spark.functions.extract import extract_text_py

    bucketed = staged_input.withColumn(
        bucket_col, F.pmod(F.xxhash64(F.col("url")), F.lit(n_buckets)).cast("int")
    )
    arranged = bucketed.repartition(F.col(dest_col), F.col(bucket_col)).sortWithinPartitions(
        F.col(dest_col),
        F.col(bucket_col),
        F.col("url"),
        F.desc(ORDER_COLS[0]),
        F.desc("_lsn"),
    )

    fields = []
    for f in arranged.schema.fields:
        fields.append(f)
        if f.name == "html":
            fields.append(T.StructField("text", T.StringType(), True))
    out_schema = T.StructType(fields)
    out_names = [f.name for f in out_schema.fields]

    def op(batches):
        last_key = None  # (dest \x00 url) of the previous batch's final row
        for pdf in batches:
            if len(pdf) == 0:
                continue
            dests = pdf[dest_col].to_numpy()
            keys = np.char.add(
                np.char.add(dests.astype(str), "\x00"), pdf["url"].to_numpy().astype(str)
            )
            keep = np.ones(len(pdf), dtype=bool)
            keep[1:] = keys[1:] != keys[:-1]
            if last_key is not None and keys[0] == last_key:
                keep[0] = False
            # dead letters are exempt from dedup: at-least-once, keep all
            keep |= dests == no_dedup_dest
            last_key = keys[-1]
            surv = pdf.loc[keep].copy()
            surv["text"] = surv["html"].map(extract_text_py)
            if "meta" in surv.columns:
                is_dl = surv[dest_col] == no_dedup_dest
                surv["meta"] = surv["meta"].where(is_dl, None)
            yield surv[out_names]

    return arranged.mapInPandas(op, out_schema)
