"""Persistent, incrementally-maintained LSH near-dup index.

The one-shot ``minhash_lsh_candidates`` recomputes signatures for the whole
corpus every run — fine for a batch curation pass, wrong for CDC ingest where
each micro-batch of crawled pages must be checked against *everything seen so
far*. This module keeps the LSH band relation (doc_id, band, band_hash, epoch)
as a lake table (reference semantics: the route-config-backed dedup guard in
RouteIngestedFile.kt:543-545 generalized to near-dup): per epoch the new
batch's signatures are computed ONCE, appended under the epoch id
(redelivery -> metadata no-op, same exactly-once contract as every other
sink), and the near-dup pairs involving the new docs are read back from the
committed files.

Scale shape at 100 TB:
- signatures/banding of the BATCH only — O(batch), never O(corpus);
- the pair probe broadcasts the batch's band rows and streams the index scan
  through a BroadcastHashJoin: the corpus-sized side NEVER shuffles (plan
  asserted in tests);
- the index row is ~(int, 32-char hash, long, long) per (doc, band) — for
  k=128/b=16 that is ~16 small rows per document, orders of magnitude below
  the text; per-epoch appends are one file (compaction machinery from
  lake/table.py applies when epochs accumulate);
- incremental == full-batch recompute is gate-checked by an oracle-backed
  registry query (`doc_incremental_lsh_pairs` reuses the
  `doc_minhash_lsh_pairs` DuckDB twin verbatim).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.functions.dedup_text import LSH_BANDS, MINHASH_K, lsh_band_rows
from data_exchange_routing_spark.lake.table import LakeTable

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("band_hash", T.StringType(), False),
        T.StructField("epoch", T.LongType(), False),
    ]
)

# CDC tombstones (VERDICT r03 item 4): (doc_id, upto) kills every band row
# of that doc with epoch <= upto — the same MoR/LWW shape the lake tables
# and the ANN indexes use. Stored as a second epoch-guarded lake table, so
# both writes of one maintenance epoch are independently idempotent.
_TOMB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("upto", T.LongType(), False),
    ]
)


class NearDupIndex:
    """LSH band index persisted as an (unkeyed, epoch-guarded) lake table."""

    def __init__(self, spark: SparkSession, path: str, k: int, bands: int):
        self.spark = spark
        self.path = path
        self.k = k
        self.bands = bands
        self.table = LakeTable.load(spark, path)
        self._tomb_path = os.path.join(path, "_tombstones")
        self._tombstones: LakeTable | None = None  # resolved lazily

    def _tomb_table(self, create: bool = False) -> "LakeTable | None":
        """Tombstone sidecar, resolved LAZILY (r04 advice): merely opening a
        pre-CDC index for read-only use (live_pairs on a replica or a
        read-only mount) must not write. The sidecar is created by the
        first tombstone WRITE (apply_changes); a missing sidecar reads as
        'no tombstones'. Load-first (not an isdir probe) so a crash
        mid-create leaves a retryable state instead of a directory that
        shadows every later create."""
        if self._tombstones is None:
            try:
                self._tombstones = LakeTable.load(self.spark, self._tomb_path)
            except FileNotFoundError:
                if not create:
                    return None
                LakeTable.create(self.spark, self._tomb_path, _TOMB_SCHEMA)
                self._tombstones = LakeTable.load(self.spark, self._tomb_path)
        return self._tombstones

    def _tomb_rows(self) -> int:
        """Live tombstone row count from the sidecar MANIFEST (no Spark
        job); 0 when the sidecar was never created."""
        tombs = self._tomb_table()
        if tombs is None:
            return 0
        return sum(e.get("rows", 0) for e in tombs.snapshot().files)

    @property
    def tombstones(self) -> "LakeTable":
        t = self._tomb_table()
        if t is None:
            raise FileNotFoundError(
                f"no tombstone sidecar at {self._tomb_path} (none written yet)"
            )
        return t

    @classmethod
    def create(
        cls, spark: SparkSession, path: str, k: int = MINHASH_K, bands: int = LSH_BANDS
    ) -> "NearDupIndex":
        LakeTable.create(spark, path, _SCHEMA)
        with open(os.path.join(path, "lsh.json"), "w", encoding="utf-8") as f:
            json.dump({"k": k, "bands": bands}, f)
        return cls(spark, path, k, bands)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "NearDupIndex":
        with open(os.path.join(path, "lsh.json"), encoding="utf-8") as f:
            cfg = json.load(f)
        return cls(spark, path, cfg["k"], cfg["bands"])

    def compact(self, n_files: int = 1, fold_tombstones: bool = True) -> dict:
        """Fold the per-epoch band-row files into ``n_files`` base files,
        cluster-sorted by (band, band_hash) so row-group stats tighten.
        Run periodically (e.g. every K epochs) to keep the probe scan
        O(n_files) instead of O(epochs).

        ``fold_tombstones`` additionally applies the tombstone filter AS the
        rewrite (a read-equivalent fold: every probe already reads through
        ``_live_rows``) and then empties the tombstone table — the sidecar
        returns to O(0) instead of growing with update/delete history.
        Tombstone application is idempotent against an epoch-preserving
        rewrite (surviving rows have epoch > every upto that targeted their
        doc), so a crash between the two rewrites changes nothing for
        readers. Single-maintainer contract: never run concurrently with
        ``apply_changes`` (same rule as every lake rewrite)."""
        # fold only when tombstone ROWS exist (manifest-only count): an
        # insert-only history bumps the sidecar's version with empty
        # epoch-guard appends, and the non-transform rewrite path should be
        # taken then — it preserves row-lineage ids and skips the pointless
        # sidecar rewrite
        n_tomb = self._tomb_rows()
        fold = fold_tombstones and n_tomb > 0
        res = self.table.rewrite_files(
            n_files=n_files,
            sort_by=["band", "band_hash"],
            transform=(lambda _df: self._live_rows()) if fold else None,
        )
        if fold and not res.get("skipped"):
            self._tomb_table().rewrite_files(
                n_files=1, transform=lambda df: df.limit(0)
            )
        return res

    def maintain(
        self,
        tombstone_rows_budget: int = 1_000_000,
        delta_files_budget: int = 16,
        n_files: int = 1,
    ) -> dict:
        """Conditional maintenance — the ops-loop entry, symmetric to the
        ANN indexes' ``index_maintain``: compacts ONLY when the MoR debt
        warrants a rewrite. Triggers when the tombstone sidecar's live row
        count (manifest-only read, no Spark job) outgrows
        ``tombstone_rows_budget`` (the point where _live_rows' broadcast
        stops being free) or when per-epoch band-row appends have
        accumulated past ``delta_files_budget`` files (probe scan cost is
        O(files)). Otherwise a cheap stat read."""
        n_tomb = self._tomb_rows()
        n_files_now = len(self.table.snapshot().files)
        if n_tomb <= tombstone_rows_budget and n_files_now <= delta_files_budget:
            return {
                "compacted": False,
                "tombstone_rows": n_tomb,
                "index_files": n_files_now,
            }
        res = self.compact(n_files=n_files, fold_tombstones=True)
        res.update(
            {
                # a commit-conflict-skipped rewrite did NOT pay the debt —
                # report honestly so the ops loop retries next cycle
                "compacted": not res.get("skipped", False),
                "tombstone_rows": n_tomb,
                "index_files": n_files_now,
            }
        )
        return res

    def check_and_add(
        self,
        docs: DataFrame,
        epoch_id: int,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """Index ``docs`` under ``epoch_id`` and return the near-dup candidate
        pairs (doc_a < doc_b) that involve at least one doc of this epoch —
        vs the entire corpus indexed so far. Idempotent: redelivering an
        epoch changes nothing and returns the same pairs.

        Signatures are computed exactly once (at append time); the pair probe
        re-reads the committed band rows from parquet instead of recomputing
        the minhash aggregation."""
        rows = lsh_band_rows(docs, id_col, text_col, self.k, self.bands).select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "band",
            "band_hash",
            F.lit(epoch_id).cast("long").alias("epoch"),
        )
        self.table.append(rows, epoch_id=epoch_id, source="lsh-index")

        all_rows = self._live_rows()
        new = all_rows.filter(F.col("epoch") == epoch_id)
        a, n = all_rows.alias("a"), new.alias("n")
        # older epochs pair with every colliding new doc; within the epoch the
        # a < n ordering keeps each new-new pair once; a == n never pairs
        involves_new = (F.col("a.epoch") < F.lit(epoch_id)) | (
            (F.col("a.epoch") == F.lit(epoch_id)) & (F.col("a.doc_id") < F.col("n.doc_id"))
        )
        return (
            a.join(
                F.broadcast(n),
                (F.col("a.band") == F.col("n.band"))
                & (F.col("a.band_hash") == F.col("n.band_hash")),
            )
            .where(involves_new & (F.col("a.doc_id") != F.col("n.doc_id")))
            .select(
                F.least(F.col("a.doc_id"), F.col("n.doc_id")).alias("doc_a"),
                F.greatest(F.col("a.doc_id"), F.col("n.doc_id")).alias("doc_b"),
            )
            .distinct()
        )

    # ------------------------------------------------- CDC maintenance
    def _live_rows(self) -> DataFrame:
        """Band rows surviving the tombstones: epoch > max(upto) per doc.
        The aggregated tombstone relation is O(deleted/updated docs) and
        broadcast, so the corpus-sized band table still never shuffles.
        When no tombstone was ever written (no sidecar, or version 1 = the
        create snapshot) the read is returned unchanged — the pre-CDC
        plan."""
        all_rows = self.table.read()
        tombs = self._tomb_table()
        if tombs is None:  # sidecar never created: read-only pre-CDC index
            return all_rows
        snap = tombs.snapshot()
        n_tomb = sum(e.get("rows", 0) for e in snap.files)
        if snap.version <= 1 or n_tomb == 0:
            # never written, or emptied by a compact(fold_tombstones=True)
            return all_rows
        tomb = tombs.read().groupBy("doc_id").agg(F.max("upto").alias("_upto"))
        # manifest-only row total decides the join strategy: broadcast while
        # the delete/update set is small, shuffle join once it isn't (and a
        # deployment there should compact the sidecar away)
        if n_tomb < 2_000_000:
            tomb = F.broadcast(tomb)
        return (
            all_rows.join(tomb, "doc_id", "left")
            .filter(F.col("_upto").isNull() | (F.col("epoch") > F.col("_upto")))
            .drop("_upto")
        )

    def apply_changes(
        self,
        changes: DataFrame,
        epoch_id: int,
        id_col: str = "doc_id",
        text_col: str = "text",
        op_col: str = "op",
    ) -> DataFrame:
        """CDC-consistent maintenance (one deduplicated batch: one row per
        doc, op in I/U/D; text required for I/U) and the near-dup candidate
        pairs the batch's live upserts form against the LIVE corpus.

        Upserts tombstone every prior band row of the doc (upto =
        epoch_id - 1: a re-crawled page's old shingles must stop matching)
        and append fresh band rows under this epoch; deletes tombstone
        through epoch_id. Both writes are epoch-guarded lake commits, so a
        crashed/redelivered epoch converges — the same two-layer
        idempotency as every other sink (reference semantics:
        RouteIngestedFile.kt:543-545's dedup guard under replay)."""
        ch = changes.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(op_col).alias("_op"),
            F.col(text_col).alias("_text"),
        )
        # only ops that can shadow existing band rows tombstone (updates
        # kill <= epoch-1, deletes <= epoch); declared INSERTS write none,
        # so an insert-heavy crawl feed never grows the sidecar O(corpus)
        tomb = ch.filter(F.col("_op") != "I").select(
            "doc_id",
            F.when(F.col("_op") == "D", F.lit(epoch_id))
            .otherwise(F.lit(epoch_id - 1))
            .cast("long")
            .alias("upto"),
        )
        self._tomb_table(create=True).append(
            tomb, epoch_id=epoch_id, source="lsh-tombstone"
        )
        ups = ch.filter(F.col("_op") != "D").select(
            F.col("doc_id").alias(id_col), F.col("_text").alias(text_col)
        )
        return self.check_and_add(ups, epoch_id, id_col=id_col, text_col=text_col)

    def live_pairs(self) -> DataFrame:
        """ALL near-dup candidate pairs among the LIVE corpus (doc_a <
        doc_b): the standard banded bucket self-join over the tombstone-
        filtered band rows — sub-quadratic (collisions only), never
        all-pairs. This is the retraction-aware view: pairs involving
        deleted docs vanish, and an updated doc pairs only via its CURRENT
        shingles — the check the per-epoch ``apply_changes`` deltas cannot
        give (they only report pairs involving that epoch's docs)."""
        live = self._live_rows()
        a, b = live.alias("a"), live.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
            )
            .distinct()
        )


def sync_neardup_from_changefeed(
    consumer,
    index: NearDupIndex,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Drive near-dup index maintenance from a lake table's change feed —
    the document-side twin of similarity.sync_index_from_changefeed: crawled
    pages land in a keyed lake table (exactly-once), this consumer tails its
    feed into the LSH band index, and ``live_pairs`` then reflects exactly
    the table's resolved state (updates retract old shingles, deletes
    retract docs). ``consumer`` must be created ``with_internal=True``;
    multi-version ranges resolve last-writer per key with the source's
    (warc_ts, lsn) ordering. Epoch id = range to_version; redelivery hits
    the index tables' epoch guards (both lake-table appends are
    independently idempotent)."""
    from pyspark.sql import Window as _W

    def fn(changes: DataFrame, _from_v: int, to_v: int) -> None:
        if "_lsn" not in changes.columns:
            raise ValueError(
                "sync_neardup_from_changefeed needs the internal CDC columns; "
                "create the ChangeFeedConsumer with with_internal=True"
            )
        order = [F.desc("_lsn")]
        if "warc_ts" in changes.columns:
            order.insert(0, F.desc_nulls_last("warc_ts"))
        w = _W.partitionBy(id_col).orderBy(*order)
        last = (
            changes.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .withColumn(
                "op",
                F.when(F.col("_change_type") == "delete", F.lit("D")).otherwise(
                    F.lit("U")
                ),
            )
        )
        index.apply_changes(last, epoch_id=to_v, id_col=id_col, text_col=text_col)

    return consumer.drain(fn)
