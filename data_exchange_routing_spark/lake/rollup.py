"""Incremental rollup views: per-epoch PARTIAL aggregates, merge-on-read
combine — the hypertable-continuous-aggregate shape over this repo's lake.

Maintaining an aggregate table across a CDC/event stream must not re-scan
history: each epoch appends only its own partial sums per group (O(batch)),
the reader finishes the fold with one small groupBy over the stored partials
(O(#groups x #epochs-since-compaction)), and ``compact()`` periodically
merges partials back to one row per group. Epoch idempotency rides the same
snapshot guard as every other table, so at-least-once redelivery of a batch
cannot double-count.

Supported aggregate kinds (all decomposable: partial per epoch, re-aggregable
at read): count, sum, min, max — avg derives as sum/count at read time — and
approx_distinct: a mergeable DataSketches HLL sketch per epoch
(``hll_sketch_agg``), union-folded at read (``hll_union_agg``) and finished
to an estimate (``hll_sketch_estimate``). Sketch union is associative, so
the incrementally-maintained estimate is bit-identical to a one-shot sketch
over the full history (asserted in tests) while each epoch still appends
only O(#groups) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.lake.table import LakeTable

_KINDS = {"count", "sum", "min", "max", "approx_distinct"}
_REAGG = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "approx_distinct": F.hll_union_agg,
}


class RollupView:
    """An incrementally-maintained GROUP BY view stored as a lake table.

    ``group_by``: grouping column names; ``aggs``: {out_col: (kind, in_col)}
    with kind in {count,sum,min,max} (for count, in_col is ignored).
    """

    def __init__(self, spark: SparkSession, path: str, group_by: list[str], aggs: dict):
        for out, (kind, _col) in aggs.items():
            if kind not in _KINDS:
                raise ValueError(f"{out}: unsupported aggregate kind {kind!r}")
        self.spark = spark
        self.group_by = list(group_by)
        self.aggs = dict(aggs)
        self.table = LakeTable(spark, path)

    @classmethod
    def create(cls, spark, path, group_by, aggs, batch_schema: T.StructType) -> "RollupView":
        view = cls(spark, path, group_by, aggs)
        sample = spark.createDataFrame([], batch_schema)
        partial_schema = view._partials(sample).schema
        LakeTable.create(spark, path, partial_schema)  # unkeyed: plain appends
        return view

    @classmethod
    def load(cls, spark, path, group_by, aggs) -> "RollupView":
        view = cls(spark, path, group_by, aggs)
        LakeTable.load(spark, path)
        return view

    def _exprs(self):
        out = []
        for name, (kind, col) in self.aggs.items():
            if kind == "count":
                out.append(F.count(F.lit(1)).alias(name))
            elif kind == "approx_distinct":
                out.append(F.hll_sketch_agg(F.col(col)).alias(name))
            else:
                out.append(getattr(F, kind)(F.col(col)).alias(name))
        return out

    def _partials(self, batch: DataFrame) -> DataFrame:
        return batch.groupBy(*self.group_by).agg(*self._exprs())

    def apply_epoch(self, batch: DataFrame, epoch_id: int, source: str = "rollup") -> dict:
        """Fold one micro-batch into the view: ONE aggregation over the batch,
        one appended delta of #groups rows. Idempotent per (source, epoch)."""
        return self.table.append(self._partials(batch), epoch_id=epoch_id, source=source)

    def _folded_partials(self) -> DataFrame:
        """Stored partials folded to one row per group, KEEPING the partial
        representation (sketches stay binary/mergeable) — the compaction
        form, not the user-facing finished aggregate."""
        parts = self.table.read()
        aggs = [
            _REAGG[kind](F.col(name)).alias(name) for name, (kind, _c) in self.aggs.items()
        ]
        return parts.groupBy(*self.group_by).agg(*aggs)

    def read(self) -> DataFrame:
        """The finished aggregate: re-aggregate stored partials (count and
        sum re-fold with sum; min/max with min/max; HLL sketches union-fold
        and finish to a long estimate)."""
        folded = self._folded_partials()
        finish = [
            F.hll_sketch_estimate(F.col(name)).alias(name)
            if kind == "approx_distinct"
            else F.col(name)
            for name, (kind, _c) in self.aggs.items()
        ]
        return folded.select(*self.group_by, *finish)

    def compact(self) -> dict:
        """Merge all partials into one row per group (append-only table:
        rewrite via a fresh commit of the folded state, then vacuum via the
        usual snapshot expiry)."""
        folded = self._folded_partials()
        snap = self.table.snapshot()
        staged = self.table._stage_files(
            self.table._align(folded, snap.schema()), snap, snap.version + 1, bucketed=False
        )
        for f in staged:
            f["kind"] = "base"
        from data_exchange_routing_spark.lake.table import Snapshot

        new = Snapshot(
            version=snap.version + 1,
            schema_json=snap.schema_json,
            n_buckets=snap.n_buckets,
            key=None,
            committed_epochs=snap.committed_epochs,
            summary={"operation": "rollup-compact"},
        )
        new.replace_files(staged)
        try:
            self.table._write_snapshot(new)
        except FileExistsError:
            return {"skipped": True, "reason": "commit-conflict"}
        return {"skipped": False, "version": new.version}
