"""Snapshot-then-stream bootstrap (Debezium-style initial load + switchover).

A CDC consumer that joins an existing source does an initial consistent
SNAPSHOT, then switches to tailing the change log from a position at or
before the snapshot's cut — the overlap region is redelivered and must not
corrupt state. The reference ingests pre-existing blobs through the same
idempotent routing path as live events (RouteIngestedFile.kt:100-103
at-least-once redelivery; CHANGELOG 0.0.41), which is exactly this contract.

Soundness under last-writer-wins by ordinal ``(warc_ts, lsn)``:

Let ``cut`` and ``overlap <= cut`` be event-time positions. The snapshot
folds every event with ``warc_ts <= cut`` into one live row per key (the
prefix winner, dead keys absent); the tail redelivers every event with
``warc_ts > overlap``. For any key, the global winner ``w`` either has
``warc_ts > overlap`` (it is redelivered and beats the snapshot row, whose
ordinal is <= w's) or ``warc_ts <= overlap`` — in which case NO event of the
key lands in ``(overlap, cut]`` (w is the prefix maximum), so the snapshot
row IS w if live, and if w is a tombstone the key has no row anywhere.
Either way resolving ``snapshot-as-inserts UNION tail`` equals resolving the
full log. The cut MUST be taken in resolve-ordinal order (event time here);
for an epoch/file split that is not ordinal-ordered, the snapshot must carry
its tombstones instead — see :func:`bootstrap_destination` +
``LakeTable.read(include_tombstones=True)``.

Scale shape: the snapshot fold is one map-side-combinable ``max_by``
aggregation (operators/dedup.py); the union is a metadata concat; the final
resolve is the same single aggregation. No extra shuffle vs plain replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_exchange_routing_spark.operators.dedup import dedup_last_writer

__all__ = ["snapshot_live_state", "snapshot_then_stream", "bootstrap_destination"]


def snapshot_live_state(
    events: DataFrame, key: str = "url", op_col: str = "op"
) -> DataFrame:
    """Consistent snapshot of a change stream: live LWW winner per key,
    re-emitted as a full-image insert at its original ordinal (the shape a
    Debezium initial snapshot publishes as READ/'r' records)."""
    win = dedup_last_writer(events, key=key)
    return win.filter(F.col(op_col) != F.lit("D")).withColumn(op_col, F.lit("I"))


def snapshot_then_stream(
    events: DataFrame,
    cut,
    overlap,
    key: str = "url",
    ts_col: str = "warc_ts",
    op_col: str = "op",
) -> DataFrame:
    """Final live state via bootstrap: snapshot at ``cut`` (event time) plus
    a redelivered tail from ``overlap <= cut``. Equal to resolving the full
    log (proof in the module docstring); the equality is the oracle gate of
    the ``cdc_bootstrap_switchover`` registry query."""
    snap = snapshot_live_state(events.filter(F.col(ts_col) <= F.lit(cut)), key, op_col)
    tail = events.filter(F.col(ts_col) > F.lit(overlap))
    win = dedup_last_writer(snap.unionByName(tail), key=key)
    return win.filter(F.col(op_col) != F.lit("D"))


def bootstrap_destination(
    table, snapshot_df: DataFrame, epoch_id: int = 0, source: str = "bootstrap"
) -> dict:
    """Seed a destination LakeTable from another warehouse's resolved state
    (initial-load path). ``snapshot_df`` must carry the table schema plus
    ``warc_ts``/``_lsn``/``_deleted`` — i.e. ``read(with_internal=True,
    include_tombstones=True)`` of the source. Tombstones MUST be included
    when the tail that follows is split by epoch/file rather than by
    ordinal: a stale live event redelivered for a key that died before the
    snapshot cut would otherwise resurrect it. Idempotent via the merge_cdc
    epoch guard."""
    return table.merge_cdc(snapshot_df, epoch_id=epoch_id, source=source)
