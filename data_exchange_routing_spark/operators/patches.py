"""Sparse-update (patch) CDC resolution — Debezium-style partial-column
change events folded to final row state in ONE aggregation.

The reference's change events always carry the whole payload (the router
re-uploads the full blob per event: fns-routing/.../RouteIngestedFile.kt
copyBlobStream path), so its last-writer-wins dedup can pick one whole row
per key. Real binlog/WAL tails are sparser: an UPDATE image often carries
only the columns that changed (MySQL binlog_row_image=MINIMAL, Debezium
column filters). Resolving such a stream is no longer "pick the last row" —
it is per-COLUMN last-non-null-patch layered over the last full-row reset.

Semantics (documented contract, mirrored verbatim by the DuckDB oracle of
the `cdc_patch_resolve` registry query):

- events are ordered per key by ``(ts, seq)`` — event time, then log
  sequence, exactly the engine-wide CDC ordering (SURVEY.md §2.6 A-dedup).
- ``op = 'I'`` is a full-row reset: every patch column is taken literally,
  NULL means *the column is NULL*.
- ``op = 'U'`` is a sparse patch: NULL means *unchanged*; non-NULL
  overwrites. A 'U' on an absent or deleted key creates/revives the row
  (upsert semantics — the columns never patched stay NULL).
- ``op = 'D'`` is a tombstone reset: the row is gone unless a later 'U'
  revives it.
- Final state per key: the row exists iff the last reset is an 'I', or any
  'U' orders after the last reset, or there is no reset and at least one
  'U'. Column ``c`` = the last non-NULL 'U' patch of ``c`` after the last
  reset if one exists, else the last reset's value when that reset is an
  'I', else NULL.

Physical plan: ONE ``groupBy(key)`` whose aggregates are all
``max``/``max_by`` under FILTER clauses — every one map-side combinable, so
hot keys (at-least-once redelivery storms, skewed urls) pre-reduce inside
each task before the single exchange. No window, no sort, no second pass.
Duplicate redeliveries tie on the ordering key with identical values, so
``max_by`` ties are value-stable. At 100 TB this is the same shuffle shape
as the engine's LWW dedup (operators/dedup.py): bytes ∝ distinct keys ×
columns, not events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

__all__ = ["resolve_patch_state", "apply_patch_batch"]


def resolve_patch_state(
    df: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    seq_col: str = "lsn",
    op_col: str = "op",
    patch_cols: tuple[str, ...] = ("title", "lang", "score"),
) -> DataFrame:
    """Fold a sparse-update change stream into final per-key state.

    Returns one row per live key with columns ``key, *patch_cols``. The
    ordering key is encoded as a fixed-width sortable string
    ``%020d|%020d`` over (unix microseconds, sequence) so that plain
    ``max`` aggregates order identically in any engine (both fields must
    be non-negative; this engine's event time is CE-era and sequences are
    log positions, so that holds by construction).
    """
    d = df.withColumn(
        "_ord",
        F.format_string(
            # events land as TIMESTAMP_NTZ; the engine pins
            # spark.sql.session.timeZone=UTC (session.py), so the cast is a
            # pure reinterpretation and unix_micros matches DuckDB epoch_us
            "%020d|%020d",
            F.unix_micros(F.col(ts_col).cast("timestamp")),
            F.col(seq_col)
        ),
    )
    return _fold_ordered(d, key, op_col, patch_cols)


def apply_patch_batch(
    state: DataFrame,
    patches: DataFrame,
    key: str = "url",
    ts_col: str = "warc_ts",
    seq_col: str = "lsn",
    op_col: str = "op",
    patch_cols: tuple[str, ...] = ("title", "lang", "score"),
) -> DataFrame:
    """Incremental fold: advance a RESOLVED state by one batch of sparse
    patches, returning the new resolved state.

    The resolved state per key is equivalent to a synthetic full-row 'I'
    event ordered BELOW everything in the batch (an 'I' is exactly "all
    columns literal"), so the fold is resolve_patch_state over
    state-as-inserts ∪ batch. Folding epoch by epoch therefore equals the
    one-shot resolve over the concatenated log — the property
    tests/test_patches.py gates — provided batches arrive in log order
    (every ord in batch N+1 > every ord in batch N, the contract a
    binlog-segment replay guarantees).

    Scale shape: per epoch this shuffles O(live keys + batch) — the same
    cost class as the engine's LakeTable MERGE path; at 100 TB you would
    bucket `state` by key (lake/table.py does) so the union's exchange is
    one-sided. The floor ordinal pins state rows below any CE-era event.
    """
    floor_ord = F.lit("00000000000000000000|00000000000000000000")
    as_inserts = state.select(
        F.col(key),
        F.lit("I").alias(op_col),
        *[F.col(c) for c in patch_cols],
        F.lit(None).cast("timestamp").alias(ts_col),
        F.lit(None).cast("long").alias(seq_col),
    ).withColumn("_ord_override", floor_ord)
    batch = patches.select(
        key, op_col, *patch_cols, ts_col, seq_col
    ).withColumn("_ord_override", F.lit(None).cast("string"))
    both = as_inserts.unionByName(batch)
    # same algebra as resolve_patch_state, but _ord honors the override so
    # state rows sort below every real event without fake timestamps
    d = both.withColumn(
        "_ord",
        F.coalesce(
            F.col("_ord_override"),
            F.format_string(
                "%020d|%020d",
                F.unix_micros(F.col(ts_col).cast("timestamp")),
                F.col(seq_col),
            ),
        ),
    ).drop("_ord_override")
    return _fold_ordered(d, key, op_col, patch_cols)


def _fold_ordered(
    d: DataFrame, key: str, op_col: str, patch_cols: tuple[str, ...]
) -> DataFrame:
    """resolve_patch_state's aggregation over a frame that already carries
    ``_ord`` (shared by the from-scratch and incremental entry points)."""
    resets = f"{op_col} IN ('I','D')"
    aggs = [
        F.expr(f"max(_ord) FILTER (WHERE {resets})").alias("_r_ord"),
        F.expr(f"max_by({op_col}, _ord) FILTER (WHERE {resets})").alias("_r_op"),
        F.expr(f"max(_ord) FILTER (WHERE {op_col} = 'U')").alias("_u_ord"),
    ]
    for c in patch_cols:
        patched = f"{op_col} = 'U' AND {c} IS NOT NULL"
        aggs += [
            F.expr(f"max_by({c}, _ord) FILTER (WHERE {resets})").alias(f"_r_{c}"),
            F.expr(f"max(_ord) FILTER (WHERE {patched})").alias(f"_w_ord_{c}"),
            F.expr(f"max_by({c}, _ord) FILTER (WHERE {patched})").alias(f"_w_{c}"),
        ]
    g = d.groupBy(key).agg(*aggs)
    exists = F.when(F.col("_r_ord").isNull(), F.col("_u_ord").isNotNull()).otherwise(
        (F.col("_r_op") == F.lit("I"))
        | F.coalesce(F.col("_u_ord") > F.col("_r_ord"), F.lit(False))
    )
    outs = [F.col(key)]
    for c in patch_cols:
        live_patch = F.col(f"_w_ord_{c}").isNotNull() & (
            F.col("_r_ord").isNull() | (F.col(f"_w_ord_{c}") > F.col("_r_ord"))
        )
        outs.append(
            F.when(live_patch, F.col(f"_w_{c}"))
            .when(F.col("_r_op") == F.lit("I"), F.col(f"_r_{c}"))
            .alias(c)
        )
    return g.filter(exists).select(*outs)
