"""As-of (nearest-event) join — a beyond-reference operator the training-data
pipeline needs (align each record with the latest prior observation per key).

The reference has no as-of join (SURVEY.md §2.5: "No sort-merge, range,
as-of ... joins exist"); this is the standard lakehouse composition of
existing DataFrame ops rather than a range join:

    union(left, right) -> window over (key) ordered by (ts, side)
    -> last(payload, ignorenulls) carried forward -> keep left rows

Physical shape: ONE hash shuffle on the key plus a per-partition sort —
O((|L|+|R|) log) — versus the naive `L join R on key and r.ts <= l.ts` +
max_by, whose intermediate is O(|L| x matching |R|) and explodes on hot keys.
Skewed keys degrade to a big sort partition, not a cross product; AQE skew
handling still applies to the single exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_is_right"
_PAYLOAD = "_asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: for each left row, attach ``payload_cols`` from the
    right row with the greatest ``right_ts`` <= ``left_ts`` (direction
    "backward"; "forward" = smallest right_ts >= left_ts) sharing ``on`` keys.
    Unmatched left rows keep null payloads. Payload columns are emitted with
    ``suffix`` appended (and the right timestamp as ``{right_ts}{suffix}``).

    At-or-before semantics: a right row with right_ts == left_ts IS eligible
    (matches DuckDB/pandas ASOF defaults).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction}")

    pay = list(dict.fromkeys([right_ts, *payload_cols]))
    l_tag = left.withColumn(_SIDE, F.lit(0)).withColumn(
        _PAYLOAD, F.lit(None).cast(right.select(F.struct(*pay).alias("s")).schema["s"].dataType)
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(1).alias(_SIDE),
        F.struct(*pay).alias(_PAYLOAD),
    )
    l_cols = left.columns
    l_norm = l_tag.select(
        *l_cols, F.col(left_ts).alias("_asof_ts"), F.col(_SIDE), F.col(_PAYLOAD)
    )
    r_norm = r_tag.select(
        *[F.col(c) if c in on else F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
        "_asof_ts",
        _SIDE,
        _PAYLOAD,
    )
    unioned = l_norm.unionByName(r_norm)

    # at equal ts the right row must sort BEFORE the left row so `last`
    # includes it (at-or-before); backward scans ascending, forward descending
    ts_order = F.col("_asof_ts").asc() if direction == "backward" else F.col("_asof_ts").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col(_SIDE).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
    out = carried.filter(F.col(_SIDE) == 0).select(
        *l_cols,
        *[F.col(f"{_PAYLOAD}.{c}").alias(f"{c}{suffix}") for c in pay],
    )
    return out
