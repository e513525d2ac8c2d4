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

from .table import DELETED_COL, LSN_COL, LakeTable, _atomic_write_json

_TS_FLOOR = "0001-01-01 00:00:00"


class KeyedAggView:
    """Incrementally-maintained GROUP BY over a keyed table's change feed.

    ``group_by``: grouping columns of the source rows (non-empty);
    ``sums``: {out_col: source_col} numeric sums. ``n_rows`` (count of live
    source rows per group) is always maintained.

    ``mins`` / ``maxs``: {out_col: source_col} RETRACTABLE extrema (VERDICT
    r04 item 2). Min/max are not decomposable under retraction with ±deltas
    alone — retracting the current min forces a fallback to the next live
    value. Rather than re-scanning the source per affected group, the view
    keeps a per-(group, column, value) COUNT histogram as a second
    append-only log (the Flink/Materialize retractable-extrema state shape,
    expressed with the same epoch-guarded log machinery as ``adjust``): an
    applied insert appends (+1), a retraction (−1); ``read()`` folds the
    log to counts, keeps values with net count > 0, and takes min/max per
    group — so a retracted minimum falls back to the next value purely
    from view-local state, O(log) per read, O(batch) per apply, never
    O(source). State is O(distinct (group, value)) — the documented
    trade-off; for extreme-cardinality value columns compact() keeps the
    log folded to exactly that bound. NULL values contribute nothing
    (SQL min/max ignore NULLs; a group with only NULLs reads NULL).
    """

    def __init__(self, spark: SparkSession, path: str, key: str,
                 group_by: list[str], sums: dict[str, str],
                 mins: dict[str, str] | None = None,
                 maxs: dict[str, str] | None = None):
        if not group_by:
            raise ValueError("group_by must be non-empty")
        self.spark = spark
        self.path = os.path.abspath(path)
        self.key = key
        self.group_by = list(group_by)
        self.sums = dict(sums)
        self.mins = dict(mins or {})
        self.maxs = dict(maxs or {})
        self.extrema_cols = sorted(set(self.mins.values()) | set(self.maxs.values()))
        self.value_cols = sorted(
            set(list(group_by) + list(sums.values()) + self.extrema_cols)
        )
        self.contrib = LakeTable(spark, os.path.join(self.path, "contrib"))
        self.adjust = LakeTable(spark, os.path.join(self.path, "adjust"))
        self.elog = (
            LakeTable(spark, os.path.join(self.path, "elog"))
            if self.extrema_cols
            else None
        )

    # ---------------------------------------------------------- lifecycle
    @classmethod
    def create(cls, spark, path, key, group_by, sums,
               source_schema: T.StructType, n_buckets: int = 16,
               mins: dict[str, str] | None = None,
               maxs: dict[str, str] | None = None) -> "KeyedAggView":
        v = cls(spark, path, key, group_by, sums, mins=mins, maxs=maxs)
        by_name = {f.name: f for f in source_schema.fields}
        # readable validation up front: a missing column otherwise KeyErrors
        # deep in field construction; 'warc_ts'/internal names collide with
        # the contribution table's CDC bookkeeping columns
        reserved = {"warc_ts", "src_lsn", "is_dead", "n_rows", LSN_COL, DELETED_COL, key}
        for c in list(group_by) + list(sums.values()) + v.extrema_cols:
            if c not in by_name:
                raise ValueError(f"column {c!r} not in source schema")
            if c in reserved:
                raise ValueError(
                    f"column {c!r} collides with the view's key/ordering/"
                    "bookkeeping columns; alias it in the source first"
                )
        seen_out = set(group_by)
        for out in list(sums) + list(v.mins) + list(v.maxs):
            if out in reserved or out in seen_out:
                raise ValueError(f"aggregate output name {out!r} collides")
            seen_out.add(out)
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
        if v.elog is not None:
            elog_fields = [
                T.StructField(c, by_name[c].dataType, True) for c in group_by
            ] + [
                T.StructField("_ecol", T.StringType(), False),
                T.StructField("_eval", T.DoubleType(), False),
                T.StructField("_ecnt", T.LongType(), False),
            ]
            LakeTable.create(spark, v.elog.path, T.StructType(elog_fields))
        return v

    @classmethod
    def load(cls, spark, path, key, group_by, sums,
             mins: dict[str, str] | None = None,
             maxs: dict[str, str] | None = None) -> "KeyedAggView":
        v = cls(spark, path, key, group_by, sums, mins=mins, maxs=maxs)
        LakeTable.load(spark, v.contrib.path)
        LakeTable.load(spark, v.adjust.path)
        if v.elog is not None:
            LakeTable.load(spark, v.elog.path)
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
        if (
            self.adjust.snapshot().epoch_committed("ivm", epoch_id)
            and self.contrib.snapshot().epoch_committed("ivm", epoch_id)
            and (
                self.elog is None
                or self.elog.snapshot().epoch_committed("ivm", epoch_id)
            )
        ):
            return {"skipped": True, "epoch_id": epoch_id}
        need = [self.key, "warc_ts", LSN_COL, DELETED_COL] + self.value_cols
        batch = changes.select(*dict.fromkeys(need))
        from pyspark.sql import Window as W

        w = W.partitionBy(self.key).orderBy(F.desc("warc_ts"), F.desc(LSN_COL))
        win = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            # materialized ONCE: the winner set feeds the retraction lookup,
            # the adjustment append AND the contribution merge — without
            # this the batch window re-evaluates per job
            .localCheckpoint(eager=True)
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
        # adjustments FIRST (crash argument in the module docstring).
        # epoch ids here are change-feed to_version cursor positions —
        # contiguous — so both guards use the monotonic high-watermark
        # encoding (the plain set guard would grow each snapshot by one
        # integer per batch forever; see mirror_into_table)
        res_a = self.adjust.append(
            adj, epoch_id=epoch_id, source="ivm", epoch_monotonic=True
        )
        # extrema histogram deltas (retractable min/max): per extrema column,
        # the retracted old value counts −1 and the applied new value +1 —
        # NULLs contribute nothing (SQL min/max ignore them). Same guarded
        # append machinery as the adjustments; ordered adjust → elog →
        # contrib so every crash point redelivers into guarded no-ops with
        # the contribution state still at its pre-batch image.
        res_e = None
        if self.elog is not None:
            parts = []
            for c in self.extrema_cols:
                parts.append(
                    appl.filter(
                        had_old
                        & ~F.coalesce(F.col("_old_dead"), F.lit(False))
                        & F.col(f"_old_{c}").isNotNull()
                    ).select(
                        *[F.col(f"_old_{g}").alias(g) for g in self.group_by],
                        F.lit(c).alias("_ecol"),
                        F.col(f"_old_{c}").cast("double").alias("_eval"),
                        F.lit(-1).cast("long").alias("_ecnt"),
                    )
                )
                parts.append(
                    appl.filter(alive & F.col(c).isNotNull()).select(
                        *self.group_by,
                        F.lit(c).alias("_ecol"),
                        F.col(c).cast("double").alias("_eval"),
                        F.lit(1).cast("long").alias("_ecnt"),
                    )
                )
            edelta = parts[0]
            for p in parts[1:]:
                edelta = edelta.unionByName(p)
            edelta = (
                edelta.groupBy(*self.group_by, "_ecol", "_eval")
                .agg(F.sum("_ecnt").alias("_ecnt"))
                .filter(F.col("_ecnt") != 0)
            )
            res_e = self.elog.append(
                edelta, epoch_id=epoch_id, source="ivm", epoch_monotonic=True
            )
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
        res_c = self.contrib.merge_cdc(
            upd, epoch_id=epoch_id, source="ivm", epoch_monotonic=True
        )
        return {"skipped": False, "adjust": res_a, "contrib": res_c, "elog": res_e}

    def read(self) -> DataFrame:
        """The finished aggregate: one fold over the adjustment log. Groups
        whose live-row count netted to zero disappear, exactly like the
        batch GROUP BY over the source's current state.

        Sum semantics: contributions are ``SUM(COALESCE(x, 0))`` — a group
        whose live values are all NULL reads 0.0 where SQL ``sum(x)`` would
        read NULL (sums must net exactly under retraction, so NULL cannot
        be represented in the log). Consumers needing the distinction can
        compare ``n_rows`` against a maintained non-null count column."""
        folded = (
            self.adjust.read()
            .groupBy(*self.group_by)
            .agg(
                F.sum("n_rows").alias("n_rows"),
                *[F.sum(out).alias(out) for out in self.sums],
            )
        )
        out = folded.filter(F.col("n_rows") > 0)
        if self.elog is not None:
            # fold the histogram once, then take per-column extrema over the
            # values still live (net count > 0); a left join keeps SQL
            # semantics for all-NULL groups (no histogram rows -> NULL)
            histo = (
                self.elog.read()
                .groupBy(*self.group_by, "_ecol", "_eval")
                .agg(F.sum("_ecnt").alias("_c"))
                .filter(F.col("_c") > 0)
            )
            aggs = [
                F.min(F.when(F.col("_ecol") == col, F.col("_eval"))).alias(o)
                for o, col in self.mins.items()
            ] + [
                F.max(F.when(F.col("_ecol") == col, F.col("_eval"))).alias(o)
                for o, col in self.maxs.items()
            ]
            ext = histo.groupBy(*self.group_by).agg(*aggs)
            # NULL-SAFE join on the group keys: SQL GROUP BY puts NULL keys
            # in one group, but a plain equi-join would never match them —
            # a NULL-keyed group with live non-NULL values must still read
            # its extrema (r05 review finding)
            e = ext.alias("_e")
            cond = None
            for g in self.group_by:
                c = out[g].eqNullSafe(F.col(f"_e.{g}"))
                cond = c if cond is None else (cond & c)
            out = out.join(e, cond, "left").drop(
                *[F.col(f"_e.{g}") for g in self.group_by]
            )
        return out

    def compact(self) -> dict:
        """FOLD the adjustment log: group-sum every accumulated adjustment
        row into one net row per group (dropping groups netted fully to
        zero) and rewrite the log with the result — read()'s sum-of-sums is
        invariant under this, and the log returns to O(live groups) instead
        of O(batches ever applied). The contribution table compacts via
        normal keyed maintenance."""
        nonzero = F.col("n_rows") != 0
        for out in self.sums:
            nonzero = nonzero | (F.col(out) != 0.0)

        def fold(df: DataFrame) -> DataFrame:
            return (
                df.groupBy(*self.group_by)
                .agg(
                    F.sum("n_rows").alias("n_rows"),
                    *[F.sum(out).alias(out) for out in self.sums],
                )
                .filter(nonzero)
            )

        res = self.adjust.rewrite_files(transform=fold)
        if self.elog is not None:
            # the histogram log folds to net counts per (group, col, value) —
            # read()'s fold-then-extrema is invariant under this, and the log
            # returns to O(distinct (group, value)) instead of O(batches)
            def efold(df: DataFrame) -> DataFrame:
                return (
                    df.groupBy(*self.group_by, "_ecol", "_eval")
                    .agg(F.sum("_ecnt").alias("_ecnt"))
                    .filter(F.col("_ecnt") != 0)
                )

            res = {"adjust": res, "elog": self.elog.rewrite_files(transform=efold)}
        return res


class KeyedJoinView:
    """Incrementally-maintained equi-join view ``fact ⋈ dim`` (many-to-one)
    over TWO keyed CDC tables' change feeds — the retractable delta-join of
    Materialize/Flink, using only engine primitives.

    The view is a keyed lake table (key = the fact key) storing the LEFT-join
    materialization: every live fact row + the dim payload columns (null when
    unmatched) + a ``_dim_matched`` flag. ``read()`` applies the inner filter
    for ``how="inner"``; storing the left shape keeps the view self-contained,
    so a dim insert can resurrect previously-unmatched fact rows without
    consulting the fact table.

    Maintenance (each apply is ONE epoch-guarded merge commit — atomic,
    crash-safe, redelivery is a guard no-op):

    - ``apply_fact_changes``: batch winners per fact key (the feed's own
      (warc_ts, lsn) order) are enriched against the dim's CURRENT state via
      ``lookup_join`` — bucket-pruned to the dim buckets the batch's fk
      values hash to, O(batch + touched buckets), never O(dim). Fact deletes
      tombstone the view row.
    - ``apply_dim_changes``: batch winners per dim key re-emit every
      dependent view row (fk = changed key) with the new dim image (nulls +
      matched=false on a dim delete). The dim delta is broadcast against one
      resolved view scan — O(view + delta); dims change rarely, and a
      fact-side fk bucketing (secondary index) is the documented scale path
      if they don't.

    LWW safety: view merges order by (warc_ts, _lsn) where warc_ts is the
    fact row's real event time and _lsn is a view-monotone tick
    (current_version+1, strictly increasing because every apply commits).
    A fact feed only ever emits winners of the fact table's own LWW, so a
    new image's warc_ts is >= the stored one; the tick breaks the tie in
    arrival order, which is exactly change-feed order. Convergence: each
    apply joins against the other side's state AT apply time, so whichever
    feed drains last repairs any interleaving — once both cursors reach the
    sources' final versions, the view equals the join of final states.
    """

    MATCH_COL = "_dim_matched"

    def __init__(self, spark: SparkSession, path: str, fact_key: str, fk: str,
                 dim: LakeTable, dim_cols: list[str], how: str = "inner",
                 fk_index: bool = False):
        if how not in ("inner", "left"):
            raise ValueError("how must be 'inner' or 'left'")
        self.spark = spark
        self.path = os.path.abspath(path)
        self.fact_key = fact_key
        self.fk = fk
        self.dim = dim
        self.dim_cols = list(dim_cols)
        self.how = how
        self.fk_index = fk_index
        self.view = LakeTable(spark, os.path.join(self.path, "view"))
        self.fkidx = (
            LakeTable(spark, os.path.join(self.path, "fkidx")) if fk_index else None
        )

    # ---------------------------------------------------------- lifecycle
    @classmethod
    def create(cls, spark, path, fact_schema: T.StructType, fact_key: str,
               fk: str, dim: LakeTable, dim_cols: list[str],
               how: str = "inner", n_buckets: int = 16,
               fk_index: bool = False) -> "KeyedJoinView":
        v = cls(spark, path, fact_key, fk, dim, dim_cols, how, fk_index)
        fact_names = set(fact_schema.fieldNames())
        for req in (fact_key, fk, "warc_ts"):
            if req not in fact_names:
                raise ValueError(f"fact schema missing required column {req!r}")
        clash = fact_names & set(dim_cols)
        if clash:
            raise ValueError(f"dim_cols clash with fact columns: {sorted(clash)}")
        dim_snap = dim.snapshot()
        if dim_snap.key is None:
            raise ValueError("dim must be a keyed table")
        dim_by_name = {f.name: f for f in dim_snap.schema().fields}
        missing = [c for c in dim_cols if c not in dim_by_name]
        if missing:
            raise ValueError(f"dim_cols not on dim table: {missing}")
        fields = list(fact_schema.fields) + [
            T.StructField(c, dim_by_name[c].dataType, True) for c in dim_cols
        ] + [T.StructField(cls.MATCH_COL, T.BooleanType(), True)]
        LakeTable.create(spark, v.view.path, T.StructType(fields),
                         key=fact_key, n_buckets=n_buckets)
        if fk_index:
            idx_fields = T.StructType([
                T.StructField(fk, fact_schema[fk].dataType),
                T.StructField("warc_ts", T.TimestampType()),
                T.StructField("buckets", T.ArrayType(T.IntegerType()), True),
            ])
            LakeTable.create(spark, v.fkidx.path, idx_fields, key=fk,
                             n_buckets=min(n_buckets, 8))
            # the index stores VIEW bucket ids — record the bucket count
            # they were computed under so a later view rebucket() can be
            # detected (stored ids would then be meaningless, and "stale
            # entries are only false positives" would silently break)
            _atomic_write_json(
                os.path.join(v.fkidx.meta_dir, "props.json"),
                {"view_n_buckets": n_buckets},
            )
        return v

    @classmethod
    def load(cls, spark, path, fact_key, fk, dim, dim_cols,
             how: str = "inner", fk_index: bool = False) -> "KeyedJoinView":
        v = cls(spark, path, fact_key, fk, dim, dim_cols, how, fk_index)
        LakeTable.load(spark, v.view.path)
        if fk_index:
            LakeTable.load(spark, v.fkidx.path)
        return v

    # -------------------------------------------------------- maintenance
    def _tick(self) -> int:
        return self.view.current_version() + 1

    def _fact_cols(self) -> list[str]:
        drop = set(self.dim_cols) | {self.MATCH_COL, LSN_COL, DELETED_COL,
                                     "_change_type"}
        return [f.name for f in self.view.snapshot().schema().fields
                if f.name not in drop]

    def apply_fact_changes(self, changes: DataFrame, epoch_id: int) -> dict:
        """Fold one fact change-feed batch (``read_changes(with_internal=
        True)`` rows). Winners per fact key are looked up against the dim's
        current state (bucket-pruned); losers within the batch were never
        table winners and net away."""
        from pyspark.sql import Window as W

        # full redelivery no-op BEFORE any job: the view commit is the last
        # half, so its guard witnessing the epoch means the fkidx half (if
        # any) committed too (index-first ordering below)
        if self.view.snapshot().epoch_committed("fact", epoch_id):
            return {"skipped": True, "epoch_id": epoch_id}
        fact_cols = self._fact_cols()
        need = list(dict.fromkeys(fact_cols + [LSN_COL, DELETED_COL]))
        batch = changes.select(*need)
        w = W.partitionBy(self.fact_key).orderBy(F.desc("warc_ts"), F.desc(LSN_COL))
        win = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .localCheckpoint(eager=True)  # feeds live/dead/fkidx branches once
        )
        tick = self._tick()
        alive = ~F.coalesce(F.col(DELETED_COL), F.lit(False))
        live = win.filter(alive).drop(LSN_COL, DELETED_COL)
        enriched = self.dim.lookup_join(
            live, probe_key=self.fk, columns=self.dim_cols,
            indicator=self.MATCH_COL,
        )
        upserts = (
            enriched.withColumn(LSN_COL, F.lit(tick).cast("long"))
            .withColumn(DELETED_COL, F.lit(False))
        )
        dead = win.filter(~alive).select(
            *fact_cols,
            *[F.lit(None).cast(t).alias(c) for c, t in self._dim_types()],
            F.lit(False).alias(self.MATCH_COL),
            F.lit(tick).cast("long").alias(LSN_COL),
            F.lit(True).alias(DELETED_COL),
        )
        rows = upserts.unionByName(dead)
        if self.fkidx is not None:
            # index commit FIRST: the invariant is fkidx ⊇ the live view's
            # (fk -> fact-key-bucket) pairs, so a crash between the two
            # commits only leaves extra buckets (pruning false positives);
            # redelivery heals via each table's own guard. Additive-only —
            # stale entries cost scan breadth, never correctness.
            self._update_fk_index(win.filter(alive), epoch_id)
        return self.view.merge_cdc(rows, epoch_id=epoch_id, source="fact",
                                   epoch_monotonic=True)

    def _update_fk_index(self, live_winners: DataFrame, epoch_id: int) -> dict:
        nb = self.view.snapshot().n_buckets
        pairs = (
            live_winners.filter(F.col(self.fk).isNotNull())
            .select(
                self.fk,
                F.pmod(F.xxhash64(F.col(self.fact_key)), F.lit(nb))
                .cast("int").alias("_b"),
            )
            .groupBy(self.fk)
            .agg(F.collect_set("_b").alias("_new_b"))
        )
        old = self.fkidx.lookup_join(pairs.select(self.fk), columns=["buckets"])
        merged = pairs.join(old, self.fk, "left").select(
            self.fk,
            F.to_timestamp(F.lit(_TS_FLOOR)).alias("warc_ts"),
            F.array_sort(
                F.array_union(
                    F.coalesce(F.col("buckets"), F.array().cast("array<int>")),
                    F.col("_new_b"),
                )
            ).alias("buckets"),
            F.lit(self.fkidx.current_version() + 1).cast("long").alias(LSN_COL),
            F.lit(False).alias(DELETED_COL),
        )
        return self.fkidx.merge_cdc(merged, epoch_id=epoch_id, source="fact",
                                    epoch_monotonic=True)

    def apply_dim_changes(self, changes: DataFrame, epoch_id: int) -> dict:
        """Fold one dim change-feed batch: re-emit every live view row whose
        fk equals a changed dim key. The batch is only a TRIGGER SET — the
        re-emitted enrichment values come from the dim table's CURRENT
        resolved state (bucket-pruned lookup), not the batch images: a
        change feed delivers raw committed revisions, so a late-arriving
        stale revision (older warc_ts landing in a later feed batch) must
        not overwrite newer dim data the dim's own LWW already kept. The
        delta is broadcast; one resolved view scan, no O(view × delta)."""
        if self.view.snapshot().epoch_committed("dim", epoch_id):
            return {"skipped": True, "epoch_id": epoch_id}
        dim_key = self.dim.snapshot().key
        keys = changes.select(F.col(dim_key).alias("_jv_dk")).distinct()
        state = self.dim.lookup_join(
            keys, probe_key="_jv_dk", columns=self.dim_cols,
            indicator="_jv_alive",
        )
        delta = state.select(
            "_jv_dk",
            "_jv_alive",
            *[F.col(c).alias(f"_jv_{c}") for c in self.dim_cols],
        )
        fact_cols = self._fact_cols()
        touched: list[int] | None = None
        if self.fkidx is not None and self._fkidx_valid():
            # scale path: the fk index names the view buckets that can hold
            # dependent rows — O(delta + touched buckets), never O(view)
            idx = self.fkidx.lookup_join(
                keys, probe_key="_jv_dk", columns=["buckets"]
            )
            touched = sorted(
                {
                    b
                    for r in idx.select(
                        F.explode_outer(F.col("buckets")).alias("b")
                    ).distinct().collect()
                    for b in [r[0]]
                    if b is not None
                }
            )
            cur = self.view.read(buckets=touched).select(*fact_cols)
        else:
            cur = self.view.read().select(*fact_cols)
        tick = self._tick()
        dep = cur.join(
            F.broadcast(delta), F.col(self.fk) == F.col("_jv_dk"), "inner"
        )
        rows = dep.select(
            *fact_cols,
            *[
                F.when(F.col("_jv_alive"), F.col(f"_jv_{c}")).alias(c)
                for c in self.dim_cols
            ],
            F.col("_jv_alive").alias(self.MATCH_COL),
            F.lit(tick).cast("long").alias(LSN_COL),
            F.lit(False).alias(DELETED_COL),
        )
        res = self.view.merge_cdc(rows, epoch_id=epoch_id, source="dim",
                                  epoch_monotonic=True)
        if touched is not None:
            res = dict(res, touched_buckets=touched)
        return res

    def _fkidx_valid(self) -> bool:
        """The index's stored bucket ids are only meaningful under the view
        bucket count they were computed with; after a view rebucket() the
        scale path falls back to full view scans (correct, just broader)
        until the index is rebuilt."""
        import json as _json

        p = os.path.join(self.fkidx.meta_dir, "props.json")
        if not os.path.exists(p):
            return False
        with open(p) as fh:
            rec = _json.load(fh).get("view_n_buckets")
        return rec == self.view.snapshot().n_buckets

    def _dim_types(self) -> list[tuple[str, T.DataType]]:
        by_name = {f.name: f.dataType for f in self.view.snapshot().schema().fields}
        return [(c, by_name[c]) for c in self.dim_cols]

    # -------------------------------------------------------------- reads
    def read(self) -> DataFrame:
        """The finished join view. ``inner``: unmatched fact rows are
        filtered (they stay stored so a later dim insert resurrects them);
        ``left``: unmatched rows surface with null dim columns."""
        df = self.view.read()
        if self.how == "inner":
            df = df.filter(F.col(self.MATCH_COL))
        return df.drop(self.MATCH_COL)

    def compact(self) -> dict:
        out = {"view": self.view.compact()}
        if self.fkidx is not None:
            out["fkidx"] = self.fkidx.compact()
        return out
