"""Watermarked stream-stream join (SURVEY.md §2.9 extension).

The reference joins streams only against static config (J1); a training-data
ingest pipeline also needs event-to-event correlation under lateness bounds —
e.g. attribute each purchase to the user's views in the preceding hour while
both sides are still flowing. Structured Streaming's stream-stream inner join
with watermarks is the canonical shape: each side declares its lateness bound
(`withWatermark`), the join condition bounds the event-time range, and Spark
sizes/GCs the join state from exactly those two facts — state is
O(events inside watermark+range), never O(stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    suffix: str = "_r",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``on`` where ``right_ts`` falls in
    [left_ts - lookback, left_ts]. Works identically on batch DataFrames
    (the tests cross-check streaming vs batch results).

    ``how`` supports "inner", "left_outer" and "full_outer"; for the
    streaming outer joins Spark emits the null-padded rows only once the
    watermark passes the row's join range. availableNow drains do NOT
    force-close state still inside the watermark at end-of-input (observed
    Spark semantics), so production streams should carry punctuation/
    heartbeat events to flush tail rows — the full-outer test models this
    with far-future sentinels. Full-outer right-side rows null-pad the LEFT
    columns; consumers key on coalesce of both sides.
    """
    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError(f"unsupported join type: {how}")
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    # suffix the join columns AND any right column sharing a name with a left
    # column — otherwise the output carries ambiguous duplicate columns
    clash = set(left.columns) | {on, right_ts}
    r = rw.select(
        *[F.col(c).alias(f"{c}{suffix}" if c in clash else c) for c in rw.columns]
    )
    cond = (
        (F.col(on) == F.col(f"{on}{suffix}"))
        & (F.col(f"{right_ts}{suffix}") >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
        & (F.col(f"{right_ts}{suffix}") <= F.col(left_ts))
    )
    return lw.join(r, cond, how)
