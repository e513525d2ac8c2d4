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

__all__ = [
    "resolve_patch_state",
    "apply_patch_batch",
    "merge_patch_batch",
    "read_patch_state",
    "patch_buffer_schema",
]


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


def _fold_buffer(
    d: DataFrame, key: str, op_col: str, patch_cols: tuple[str, ...]
) -> DataFrame:
    """The fold's AGGREGATION BUFFER per key, from raw events carrying
    ``_ord``: last-reset (ord, op, values), last-'U' ord, and per column the
    last non-NULL patch (ord, value). Buffers form a commutative semigroup
    under :func:`_merge_buffers` — the foundation of out-of-order-safe
    incremental ingest."""
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
    return d.groupBy(key).agg(*aggs)


def _merge_buffers(
    frames: DataFrame, key: str, patch_cols: tuple[str, ...]
) -> DataFrame:
    """Re-aggregate a union of buffer rows into one buffer per key. Every
    component is a max / max_by over the stored ordinals, so the merge is
    associative AND commutative — batches may arrive in any order and the
    result is the same as folding the concatenated log."""
    aggs = [
        F.expr("max(_r_ord)").alias("_r_ord"),
        F.expr("max_by(_r_op, _r_ord) FILTER (WHERE _r_ord IS NOT NULL)").alias("_r_op"),
        F.expr("max(_u_ord)").alias("_u_ord"),
    ]
    for c in patch_cols:
        aggs += [
            F.expr(
                f"max_by(_r_{c}, _r_ord) FILTER (WHERE _r_ord IS NOT NULL)"
            ).alias(f"_r_{c}"),
            F.expr(f"max(_w_ord_{c})").alias(f"_w_ord_{c}"),
            F.expr(
                f"max_by(_w_{c}, _w_ord_{c}) FILTER (WHERE _w_ord_{c} IS NOT NULL)"
            ).alias(f"_w_{c}"),
        ]
    return frames.groupBy(key).agg(*aggs)


def buffer_state_view(
    buf: DataFrame, key: str, patch_cols: tuple[str, ...]
) -> DataFrame:
    """Project a buffer frame to the resolved state (live rows only)."""
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
    return buf.filter(exists).select(*outs)


def _fold_ordered(
    d: DataFrame, key: str, op_col: str, patch_cols: tuple[str, ...]
) -> DataFrame:
    """resolve_patch_state's aggregation over a frame that already carries
    ``_ord`` (shared by the from-scratch and incremental entry points)."""
    return buffer_state_view(_fold_buffer(d, key, op_col, patch_cols), key, patch_cols)


def merge_patch_batch(table, batch: DataFrame, epoch_id: int | None = None,
                      key: str = "url",
                      ts_col: str = "warc_ts",
                      seq_col: str = "lsn",
                      op_col: str = "op",
                      patch_cols: tuple[str, ...] = ("title", "lang", "score")) -> dict:
    """Ingest one micro-batch of sparse patches into a keyed LakeTable,
    exactly-once and ORDER-INDEPENDENT.

    The table stores each key's fold BUFFER (per-column winning ordinals +
    values, a commutative semigroup under :func:`_merge_buffers`), not the
    projected row — exactly a streaming engine's keyed aggregation state,
    made durable. Per batch: read only the touched keys' buffers
    (left_semi — never the whole table), merge with the batch's buffer, and
    commit one row per touched key under the merge_cdc epoch guard (a
    redelivered batch is a metadata no-op). Because buffer merge is
    commutative, out-of-order and late batches converge to the same state
    as the one-shot fold — no ordered-delivery contract needed.

    Read the resolved state with :func:`read_patch_state`.

    Ordering keys for the table's own LWW resolve: ``warc_ts`` = the max
    event time folded into the buffer so far (monotone non-decreasing
    under merge), ``lsn`` = epoch id (tie-break; monotone per stream).

    Shape at 100 TB: O(batch + touched keys) per epoch — table-size
    independent; the same cost class as pipeline.py's apply_epoch.
    """
    from data_exchange_routing_spark.lake.table import DELETED_COL, LSN_COL

    d = batch.withColumn(
        "_ord",
        F.format_string(
            "%020d|%020d",
            F.unix_micros(F.col(ts_col).cast("timestamp")),
            F.col(seq_col),
        ),
    )
    new_buf = _fold_buffer(d, key, op_col, patch_cols)
    old_buf = table.read().join(
        new_buf.select(key), key, "left_semi"
    ).drop(ts_col, LSN_COL, DELETED_COL)
    merged = _merge_buffers(old_buf.unionByName(new_buf), key, patch_cols)
    # max event time folded so far, recoverable from the buffer itself:
    # greatest of the three ordinal families, %020d micros prefix
    best_ord = F.greatest(
        F.coalesce(F.col("_r_ord"), F.lit("")),
        F.coalesce(F.col("_u_ord"), F.lit("")),
        *[F.coalesce(F.col(f"_w_ord_{c}"), F.lit("")) for c in patch_cols],
    )
    rows = merged.select(
        key,
        *[col for c in patch_cols for col in (f"_r_{c}", f"_w_ord_{c}", f"_w_{c}")],
        "_r_ord",
        "_r_op",
        "_u_ord",
        F.timestamp_micros(F.substring(best_ord, 1, 20).cast("long")).alias(ts_col),
        F.lit(epoch_id if epoch_id is not None else 0).cast("long").alias(LSN_COL),
        F.lit(False).alias(DELETED_COL),
    )
    return table.merge_cdc(rows, epoch_id=epoch_id, source="patch")


def read_patch_state(
    table,
    key: str = "url",
    patch_cols: tuple[str, ...] = ("title", "lang", "score"),
) -> DataFrame:
    """Resolved live rows of a patch-ingested LakeTable (projects the
    stored fold buffers; dead keys' buffers stay in the table so a late
    reviving 'U' still sees the tombstone ordinal)."""
    return buffer_state_view(table.read(), key, patch_cols)


def patch_buffer_schema(
    patch_col_types: dict[str, str] | None = None,
    key: str = "url",
    key_type: str = "string",
    ts_col: str = "warc_ts",
):
    """DDL schema for a buffer-storing patch table (pass to
    LakeTable.create)."""
    from pyspark.sql import types as T

    if patch_col_types is None:
        patch_col_types = {"title": "string", "lang": "string", "score": "double"}
    parts = [f"{key} {key_type}", "_r_ord string", "_r_op string", "_u_ord string"]
    for c, t in patch_col_types.items():
        parts += [f"_r_{c} {t}", f"_w_ord_{c} string", f"_w_{c} {t}"]
    parts.append(f"{ts_col} timestamp")
    return T.StructType.fromDDL(", ".join(parts))
