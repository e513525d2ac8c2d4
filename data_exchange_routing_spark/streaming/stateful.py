"""Custom stateful streaming operators (SURVEY.md §2.9 T4-T6).

The reference keeps only a config cache as state (Common.kt:20-41) and relies
on idempotent sinks for duplicate suppression; at 10^10-event scale a
cross-batch *state-filtered* dedup cuts sink work: a change event older than
the per-url high-water mark (warc_ts, lsn) can be dropped before it ever
reaches the merge. Implemented with applyInPandasWithState (Arrow-batched
grouped state, watermark-driven GC).

Also here: the watermarked tumbling-window aggregation (T5) — absent from the
reference (its ASA spike has no windows) but table stakes for a streaming
engine; used for per-window ingest-rate metrics.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# state: per-url high-water mark of the CDC ordering (warc_ts epoch-us, lsn)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("max_ts_us", T.LongType(), True),
        T.StructField("max_lsn", T.LongType(), True),
    ]
)

DEDUP_OUTPUT = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("lsn", T.LongType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("op", T.StringType(), True),
    ]
)


def _make_dedup_fn(ttl_ms: int | None):
    def _dedup_fn(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        """Emit only events strictly newer (warc_ts, lsn) than everything seen
        for this url across ALL prior micro-batches; advance the high-water
        mark. With a TTL, idle urls' state is dropped on timeout — dropping
        the mark only weakens dedup to at-least-once for that url, and the
        idempotent MERGE sink already absorbs that (SURVEY.md T1/T2)."""
        (url,) = key
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            max_ts_us, max_lsn = state.get
        else:
            max_ts_us, max_lsn = -1, -1
        out = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["warc_ts", "lsn"])
            for row in pdf.itertuples(index=False):
                ts_us = int(row.warc_ts.value // 1_000) if row.warc_ts is not None else -1
                if (ts_us, int(row.lsn)) > (max_ts_us, max_lsn):
                    max_ts_us, max_lsn = ts_us, int(row.lsn)
                    out.append((url, int(row.lsn), row.warc_ts, row.op))
        state.update((max_ts_us, max_lsn))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if out:
            yield pd.DataFrame(out, columns=["url", "lsn", "warc_ts", "op"])

    return _dedup_fn


def stateful_dedup(events: DataFrame, state_ttl_ms: int | None = None) -> DataFrame:
    """Cross-batch last-writer-aware dedup over a STREAMING events DataFrame.
    Each url's state is one (ts, lsn) pair — O(#urls) store, partitioned by
    the grouping key across executors. ``state_ttl_ms`` bounds the store at
    10^10-url scale: urls idle longer than the TTL drop their high-water mark
    (processing-time timeout); correctness degrades only to at-least-once for
    those urls, which the idempotent sink absorbs."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("url", "lsn", "warc_ts", "op")
        .groupBy("url")
        .applyInPandasWithState(
            _make_dedup_fn(state_ttl_ms),
            outputStructType=DEDUP_OUTPUT,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )


def native_dedup_within_watermark(
    events: DataFrame, watermark: str = "2 hours", keys: tuple[str, ...] = ("url", "lsn")
) -> DataFrame:
    """Redelivery suppression with Spark's NATIVE state operator.

    ``dropDuplicatesWithinWatermark`` keeps the dedup state JVM-side (no
    Python round-trip, RocksDB-backed state store at scale, watermark-driven
    GC built in) — the preferred plan when the requirement is plain
    exactly-once redelivery suppression on an event id. The custom
    ``stateful_dedup`` above remains the path when semantics exceed what the
    native operator expresses (ORDERING-aware high-water-mark drops: an
    event older than the url's seen (warc_ts, lsn) is suppressed even
    though its id was never seen before).

    Contract (test_stateful_streaming.py): with all data inside the
    watermark, the drained output is exactly the batch
    ``dropDuplicates(keys)`` result — same rows, no cross-batch leaks.
    """
    return events.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(list(keys))


def windowed_ingest_rate(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """T5: watermarked tumbling-window per-content-type event counts; late
    events beyond the watermark are dropped, window state is GC'd."""
    return (
        events.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("content_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("lsn").alias("max_lsn"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "content_type",
            "n_events",
            "max_lsn",
        )
    )
