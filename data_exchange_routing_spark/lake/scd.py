"""Slowly-changing-dimension Type 2 maintenance over a CDC stream.

The classic warehouse versioned-dimension: every revision of an entity
becomes a history row with a validity interval [valid_from, valid_to);
the newest revision is open-ended (valid_to NULL, is_current true);
deletes close the current interval without opening a new one. Kimball's
SCD2, the temporal shape behind "what did this row look like on date X"
(answered by ``valid_from <= X < valid_to``) without replaying the log.

Incremental contract (the part a 100 TB pipeline needs):

- Per epoch batch, work is O(batch + touched keys): the previous current
  version of each touched key comes from a bucket-pruned ``lookup_join``
  against the ``cur`` pointer table — the history table is NEVER scanned
  on the write path.
- Exactly-once via the same dual epoch-guard discipline as ``lake/ivm.py``
  (history first, pointers second; a crash between heals on re-run because
  the history merge re-skips and the pointer merge is deterministic on
  unchanged inputs).
- Epochs must arrive in order per key (binlog segments): a batch revision
  at-or-before a key's current valid_from is REFUSED loudly before
  anything commits. Out-of-order value folding is a different operator —
  ``operators/patches.py`` — because interval semantics cannot net
  retroactive revisions without rewriting neighbors.
- lsns must be globally increasing across epochs (they are the log's own
  sequence numbers); the closure row re-merges over the open version at
  the same ``warc_ts`` and wins on the higher lsn.

Reference anchor: the reference pipeline's idempotent upsert sinks
(fns-routing RouteIngestedFile.kt:543-545 last-writer semantics) keep only
current state; SCD2 is the standard lake-side extension that keeps every
state with its validity window.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.lake.table import LakeTable


class Scd2Table:
    """Two lake tables: ``hist`` (keyed by ``_skey`` = key@valid_from-micros,
    one row per version) and ``cur`` (keyed by the entity key, one pointer
    row per key carrying the current version's valid_from, liveness and
    attributes — the attrs ride along so closing a version re-emits the full
    row without reading history)."""

    def __init__(self, spark: SparkSession, path: str, key: str, attr_cols: list[str]):
        self.spark = spark
        self.path = os.path.abspath(path)
        self.key = key
        self.attr_cols = list(attr_cols)
        self.hist = LakeTable(spark, os.path.join(self.path, "hist"))
        self.cur = LakeTable(spark, os.path.join(self.path, "cur"))

    # ------------------------------------------------------------ lifecycle
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        key: str,
        attr_cols: list[str],
        source_schema: T.StructType,
        n_buckets: int = 16,
    ) -> "Scd2Table":
        s = cls(spark, path, key, attr_cols)
        by_name = {f.name: f for f in source_schema.fields}
        missing = [c for c in [key, *attr_cols] if c not in by_name]
        if missing:
            raise ValueError(f"source schema lacks {missing}")
        attrs = [T.StructField(c, by_name[c].dataType) for c in attr_cols]
        hist_schema = T.StructType(
            [
                T.StructField("_skey", T.StringType()),
                T.StructField(key, by_name[key].dataType),
                T.StructField("warc_ts", T.TimestampType()),
                T.StructField("valid_from", T.TimestampType()),
                T.StructField("valid_to", T.TimestampType()),
                T.StructField("is_current", T.BooleanType()),
                *attrs,
            ]
        )
        cur_schema = T.StructType(
            [
                T.StructField(key, by_name[key].dataType),
                T.StructField("warc_ts", T.TimestampType()),
                T.StructField("valid_from", T.TimestampType()),
                T.StructField("is_live", T.BooleanType()),
                *attrs,
            ]
        )
        LakeTable.create(spark, os.path.join(s.path, "hist"), hist_schema,
                         key="_skey", n_buckets=n_buckets)
        LakeTable.create(spark, os.path.join(s.path, "cur"), cur_schema,
                         key=key, n_buckets=n_buckets)
        return s

    @classmethod
    def load(cls, spark: SparkSession, path: str, key: str, attr_cols: list[str]) -> "Scd2Table":
        return cls(spark, path, key, attr_cols)

    # ------------------------------------------------------------- reading
    def history(self) -> DataFrame:
        return self.hist.read().drop("_skey", "warc_ts")

    def current(self) -> DataFrame:
        return self.history().filter(F.col("is_current"))

    def as_of(self, ts) -> DataFrame:
        """State of every entity at time ``ts`` (point-in-time read)."""
        h = self.history()
        return h.filter(
            (F.col("valid_from") <= F.lit(ts))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(ts)))
        ).drop("is_current")

    # ------------------------------------------------------------- writing
    def apply_batch(self, batch: DataFrame, epoch_id: int) -> dict:
        """Fold one CDC epoch into the dimension.

        ``batch`` columns: key, op ('I'|'U'|'D'), warc_ts, lsn, attrs.
        Revisions are ordered (warc_ts, lsn) per key; same-(key, ts)
        collisions keep the max-lsn revision (LWW within the tick).
        """
        k = self.key
        hist_done = self.hist.committed_epochs("scd")
        cur_done = self.cur.committed_epochs("scd")
        if epoch_id in hist_done and epoch_id in cur_done:
            return {"skipped": True, "epoch_id": epoch_id}

        b = batch.select(
            k, "op", "warc_ts", F.col("lsn").cast("long").alias("lsn"), *self.attr_cols
        )
        # LWW within a (key, ts) tick, then the per-key revision chain
        tick = Window.partitionBy(k, "warc_ts").orderBy(F.col("lsn").desc())
        b = b.withColumn("_rn", F.row_number().over(tick)).filter(F.col("_rn") == 1).drop("_rn")
        chain = Window.partitionBy(k).orderBy("warc_ts", "lsn")
        b = b.withColumn("_next_ts", F.lead("warc_ts").over(chain)).withColumn(
            "_is_last", F.lead("warc_ts").over(chain).isNull()
        )

        # previous current pointers for ONLY the touched keys (bucket-pruned)
        firsts = b.groupBy(k).agg(
            F.min(F.struct("warc_ts", "lsn")).alias("_f"),
        ).select(k, F.col("_f.warc_ts").alias("_first_ts"), F.col("_f.lsn").alias("_first_lsn"))
        prev = self.cur.lookup_join(firsts, probe_key=k, how="left")

        if epoch_id not in hist_done:
            # ordering guard BEFORE any commit: a revision at-or-before the
            # key's current pointer cannot be expressed as an interval edit
            ooo = prev.filter(
                F.col("valid_from").isNotNull()
                & (F.col("_first_ts") <= F.col("valid_from"))
            ).limit(1).collect()
            if ooo:
                r = ooo[0]
                raise ValueError(
                    f"out-of-order SCD2 batch for key {r[k]!r}: revision at "
                    f"{r['_first_ts']} is not after current valid_from "
                    f"{r['valid_from']}; SCD2 requires ordered epochs (see "
                    "operators/patches.py for out-of-order value folding)"
                )

        # string-cast (not unix_micros) so TIMESTAMP and TIMESTAMP_NTZ
        # sources both work; the cast renders microsecond precision, so the
        # skey is unique per (key, ts) after the tick dedup above
        skey = lambda key_col, ts_col: F.concat(  # noqa: E731
            F.col(key_col).cast("string"),
            F.lit("@"),
            F.col(ts_col).cast("string"),
        )
        # closure of the previously-current version (full row re-emitted from
        # the pointer's attrs; same warc_ts, higher lsn => wins LWW)
        closures = (
            prev.filter(F.col("is_live") == True)  # noqa: E712
            .select(
                skey(k, "valid_from").alias("_skey"),
                F.col(k),
                F.col("valid_from").alias("warc_ts"),
                "valid_from",
                F.col("_first_ts").alias("valid_to"),
                F.lit(False).alias("is_current"),
                *self.attr_cols,
                F.col("_first_lsn").alias("_lsn"),
                F.lit(False).alias("_deleted"),
            )
        )
        # version rows: every non-delete revision; a following revision of
        # ANY op (incl. D) closes it
        versions = b.filter(F.col("op") != "D").select(
            skey(k, "warc_ts").alias("_skey"),
            F.col(k),
            F.col("warc_ts"),
            F.col("warc_ts").alias("valid_from"),
            F.col("_next_ts").alias("valid_to"),
            F.col("_is_last").alias("is_current"),
            *self.attr_cols,
            F.col("lsn").alias("_lsn"),
            F.lit(False).alias("_deleted"),
        )
        self.hist.merge_cdc(closures.unionByName(versions), epoch_id=epoch_id, source="scd")

        if epoch_id not in cur_done:
            last = b.filter(F.col("_is_last")).select(
                F.col(k),
                F.col("warc_ts"),
                F.col("warc_ts").alias("valid_from"),
                (F.col("op") != "D").alias("is_live"),
                *self.attr_cols,
                F.col("lsn").alias("_lsn"),
                F.lit(False).alias("_deleted"),
            )
            self.cur.merge_cdc(last, epoch_id=epoch_id, source="scd")
        return {"skipped": False, "epoch_id": epoch_id}
