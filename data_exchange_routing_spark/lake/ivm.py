"""Incremental view maintenance (IVM) over a keyed CDC table.

``RollupView`` maintains aggregates over an APPEND stream; aggregating a
KEYED table (its current resolved state) is harder — an update must RETRACT
the row's previous contribution (possibly from a different group) before
adding the new one, and a delete must decrement. This module maintains
``SELECT group_cols, count(*), sum(x)... FROM keyed_table`` incrementally,
the Materialize/Flink retractable-aggregate shape, using only engine
primitives:

- a *contribution table* (keyed like the source) stores, per ever-seen key,
  the last applied revision: its (warc_ts, source lsn) CDC order, an
  ``is_dead`` flag (tombstones stay VISIBLE here — a later stale event must
  still lose to them), and the (group, value) columns it contributed.
  Retraction lookups are bucket-pruned to the keys a batch touches —
  O(batch + touched buckets), never O(table).
- an *adjustment log* (append-only) receives per-batch (group, ±delta)
  partial rows; the finished aggregate is one small fold over it
  (groups × batches rows, compacted via ``compact()``).

LWW parity: a feed batch's winner adjusts the view ONLY if it beats the
stored revision in the source's own (warc_ts DESC, lsn DESC) order — so
out-of-order redelivery of older revisions nets to zero, exactly as it
no-ops in the source table.

Exactly-once: both commits ride epoch guards. Adjustments are a
deterministic function of (batch, contribution state), and the adjustment
append commits BEFORE the contribution merge — a crash between the two
redelivers into "adjustment skipped by guard, contribution re-applies
(idempotent merge)" and the view converges. Batches must arrive in
change-feed order (the ChangeFeedConsumer's durable cursor provides it).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .table import DELETED_COL, LSN_COL, LakeTable

_TS_FLOOR = "0001-01-01 00:00:00"


class KeyedAggView:
    """Incrementally-maintained GROUP BY over a keyed table's change feed.

    ``group_by``: grouping columns of the source rows (non-empty);
    ``sums``: {out_col: source_col} numeric sums. ``n_rows`` (count of live
    source rows per group) is always maintained.
    """

    def __init__(self, spark: SparkSession, path: str, key: str,
                 group_by: list[str], sums: dict[str, str]):
        if not group_by:
            raise ValueError("group_by must be non-empty")
        self.spark = spark
        self.path = os.path.abspath(path)
        self.key = key
        self.group_by = list(group_by)
        self.sums = dict(sums)
        self.value_cols = sorted(set(list(group_by) + list(sums.values())))
        self.contrib = LakeTable(spark, os.path.join(self.path, "contrib"))
        self.adjust = LakeTable(spark, os.path.join(self.path, "adjust"))

    # ---------------------------------------------------------- lifecycle
    @classmethod
    def create(cls, spark, path, key, group_by, sums,
               source_schema: T.StructType, n_buckets: int = 16) -> "KeyedAggView":
        v = cls(spark, path, key, group_by, sums)
        by_name = {f.name: f for f in source_schema.fields}
        contrib_fields = [
            T.StructField(key, by_name[key].dataType),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("src_lsn", T.LongType()),
            T.StructField("is_dead", T.BooleanType()),
        ] + [
            T.StructField(c, by_name[c].dataType, True)
            for c in v.value_cols
            if c not in (key, "warc_ts")
        ]
        LakeTable.create(
            spark, v.contrib.path, T.StructType(contrib_fields),
            key=key, n_buckets=n_buckets,
        )
        adj_fields = [T.StructField(c, by_name[c].dataType, True) for c in group_by] + [
            T.StructField("n_rows", T.LongType())
        ] + [T.StructField(out, T.DoubleType(), True) for out in sums]
        LakeTable.create(spark, v.adjust.path, T.StructType(adj_fields))
        return v

    @classmethod
    def load(cls, spark, path, key, group_by, sums) -> "KeyedAggView":
        v = cls(spark, path, key, group_by, sums)
        LakeTable.load(spark, v.contrib.path)
        LakeTable.load(spark, v.adjust.path)
        return v

    # -------------------------------------------------------- maintenance
    def apply_changes(self, changes: DataFrame, epoch_id: int) -> dict:
        """Fold one change-feed batch (``read_changes(with_internal=True)``
        rows: source columns + ``_lsn``/``_deleted``). Multiple revisions of
        a key within the batch net to its LWW winner — intermediate
        revisions were never applied, so only the final one adjusts against
        the stored contribution."""
        # full no-op only when BOTH halves landed — a crash between the two
        # leaves the adjustment guard set and the contribution missing, and
        # redelivery must still re-apply the contribution merge (each half
        # is individually guarded below)
        if self.adjust.snapshot().epoch_committed(
            "ivm", epoch_id
        ) and self.contrib.snapshot().epoch_committed("ivm", epoch_id):
            return {"skipped": True, "epoch_id": epoch_id}
        need = [self.key, "warc_ts", LSN_COL, DELETED_COL] + self.value_cols
        batch = changes.select(*dict.fromkeys(need))
        from pyspark.sql import Window as W

        w = W.partitionBy(self.key).orderBy(F.desc("warc_ts"), F.desc(LSN_COL))
        win = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # retraction lookup — bucket-pruned to the batch's keys; tombstones
        # are stored as live is_dead rows so the LWW comparison sees them
        old = self.contrib.lookup_join(
            win.select(self.key),
            columns=["warc_ts", "src_lsn", "is_dead"] + self.value_cols,
        ).select(
            self.key,
            F.col("warc_ts").alias("_old_ts"),
            F.col("src_lsn").alias("_old_lsn"),
            F.col("is_dead").alias("_old_dead"),
            *[F.col(c).alias(f"_old_{c}") for c in self.value_cols],
        )
        j = win.join(old, self.key, "left")
        floor = F.lit(_TS_FLOOR).cast("timestamp")
        w_ts = F.coalesce(F.col("warc_ts"), floor)
        o_ts = F.coalesce(F.col("_old_ts"), floor)
        had_old = F.col("_old_lsn").isNotNull()
        w_lsn = F.coalesce(F.col(LSN_COL), F.lit(0))
        o_lsn = F.coalesce(F.col("_old_lsn"), F.lit(0))
        wins = ~had_old | (w_ts > o_ts) | ((w_ts == o_ts) & (w_lsn > o_lsn))
        appl = j.filter(wins)
        alive = ~F.coalesce(F.col(DELETED_COL), F.lit(False))
        minus = appl.filter(had_old & ~F.coalesce(F.col("_old_dead"), F.lit(False))).select(
            *[F.col(f"_old_{c}").alias(c) for c in self.group_by],
            F.lit(-1).cast("long").alias("n_rows"),
            *[
                (-F.coalesce(F.col(f"_old_{col}").cast("double"), F.lit(0.0))).alias(out)
                for out, col in self.sums.items()
            ],
        )
        plus = appl.filter(alive).select(
            *self.group_by,
            F.lit(1).cast("long").alias("n_rows"),
            *[
                F.coalesce(F.col(col).cast("double"), F.lit(0.0)).alias(out)
                for out, col in self.sums.items()
            ],
        )
        nonzero = F.col("n_rows") != 0
        for out in self.sums:
            nonzero = nonzero | (F.col(out) != 0.0)
        adj = (
            minus.unionByName(plus)
            .groupBy(*self.group_by)
            .agg(
                F.sum("n_rows").alias("n_rows"),
                *[F.sum(out).alias(out) for out in self.sums],
            )
            .filter(nonzero)
        )
        # adjustments FIRST (crash argument in the module docstring)
        res_a = self.adjust.append(adj, epoch_id=epoch_id, source="ivm")
        # contribution state: every batch winner merges with the SOURCE's
        # (warc_ts, lsn), so contrib's own LWW replicates the source exactly
        # — losers of `wins` simply lose the merge too. Tombstones become
        # live is_dead markers.
        upd = win.select(
            self.key,
            "warc_ts",
            F.coalesce(F.col(LSN_COL), F.lit(0)).cast("long").alias("src_lsn"),
            F.coalesce(F.col(DELETED_COL), F.lit(False)).alias("is_dead"),
            *[c for c in self.value_cols if c not in (self.key, "warc_ts")],
        ).withColumn(LSN_COL, F.col("src_lsn")).withColumn(
            DELETED_COL, F.lit(False)
        )
        res_c = self.contrib.merge_cdc(upd, epoch_id=epoch_id, source="ivm")
        return {"skipped": False, "adjust": res_a, "contrib": res_c}

    def read(self) -> DataFrame:
        """The finished aggregate: one fold over the adjustment log. Groups
        whose live-row count netted to zero disappear, exactly like the
        batch GROUP BY over the source's current state."""
        folded = (
            self.adjust.read()
            .groupBy(*self.group_by)
            .agg(
                F.sum("n_rows").alias("n_rows"),
                *[F.sum(out).alias(out) for out in self.sums],
            )
        )
        return folded.filter(F.col("n_rows") > 0)

    def compact(self) -> dict:
        """Fold the adjustment log to one file (append-only rewrite); the
        contribution table compacts via normal keyed maintenance."""
        return self.adjust.rewrite_files()
