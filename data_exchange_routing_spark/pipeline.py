"""End-to-end CDC replay pipeline (SURVEY.md §3.1 restated Spark-first).

Per micro-batch (epoch), mirroring the reference pipe
parseMessage -> validateSourceBlobMeta -> validateDestinationRoutes ->
routeSourceBlobToDestination -> sendProcessingStatus
(RouteIngestedFile.kt:91-98; pipe: Util.kt:19-21):

1. normalize metadata keys + coalesce routing keys   (P3, P4)
2. validity split -> dead_letter append              (F1-F2, K3)
3. broadcast route join -> multicast split           (J1, F3-F4, M1)
4. per destination: last-writer-wins dedup           (A-dedup)
5. vectorized text extraction on surviving rows only (P9 slot)
6. additive schema evolution from open metadata      (§1.3)
7. epoch-id-guarded merge commit                     (K1-K2, T1-T2)
8. lineage/metrics rows per (epoch, destination, bucket) (K4-K6)

Error rows never abort the batch (F12, CHANGELOG 0.0.40) — they divert to the
dead_letter table with exact error strings.

Scale shape per epoch: one scan of the batch (cached), one broadcast join
(config ~5 rows), one hash aggregation per destination (map-side combined, so
Zipf-hot urls pre-reduce before the shuffle), extraction only on the deduped
survivors, and O(batch)-sized delta file writes — per-epoch cost is O(batch),
independent of table size (merge-on-read lake layer).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_exchange_routing_spark import __version__
from data_exchange_routing_spark.functions.extract import extract_text
from data_exchange_routing_spark.lake.table import DELETED_COL, LSN_COL, LakeTable
from data_exchange_routing_spark.operators.dedup import dedup_last_writer
from data_exchange_routing_spark.operators.parse import (
    coalesce_routing_keys,
    enrich_meta,
    normalize_meta_keys,
)
from data_exchange_routing_spark.operators.routing import annotate_routes, split_routed
from data_exchange_routing_spark.operators.validate import split_valid
from data_exchange_routing_spark.schemas import (
    DEAD_LETTER,
    LINEAGE_METRICS,
    WEB_PAGES,
)
from data_exchange_routing_spark.sources.configs import (
    DESTINATION_TABLES,
    default_route_config,
)

# meta keys that are plumbing, never promoted to top-level columns
STANDARD_META_KEYS = {
    "data_stream_id",
    "data_stream_route",
    "reporting_jurisdiction",
    "system_provider",
    "engine_version",
    "dex_ingest_datetime",
    "upload_id",
    "meta_destination_id",
    "meta_ext_event",
}


class Warehouse:
    """A directory of lake tables + replay checkpoints."""

    def __init__(self, spark: SparkSession, root: str, n_buckets: int = 16):
        self.spark = spark
        self.root = os.path.abspath(root)
        self.n_buckets = n_buckets
        os.makedirs(os.path.join(self.root, "_checkpoints"), exist_ok=True)

    def table_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def table(self, name: str) -> LakeTable:
        return LakeTable.load(self.spark, self.table_path(name))

    def init_tables(self) -> None:
        for name in DESTINATION_TABLES:
            LakeTable.create(self.spark, self.table_path(name), WEB_PAGES, key="url", n_buckets=self.n_buckets)
        LakeTable.create(self.spark, self.table_path("dead_letter"), DEAD_LETTER)
        LakeTable.create(self.spark, self.table_path("lineage_metrics"), LINEAGE_METRICS)

    # ---- checkpoint log: epoch N fully applied (offsets WAL analog, T3) ----
    def checkpoint_path(self, epoch_id: int) -> str:
        return os.path.join(self.root, "_checkpoints", f"epoch-{epoch_id:08d}.json")

    def mark_epoch_done(self, epoch_id: int, stats: dict) -> None:
        with open(self.checkpoint_path(epoch_id), "w") as f:
            json.dump({"epoch_id": epoch_id, **stats}, f)

    def completed_epochs(self) -> set[int]:
        d = os.path.join(self.root, "_checkpoints")
        return {
            int(f[len("epoch-") : -len(".json")])
            for f in os.listdir(d)
            if f.startswith("epoch-") and f.endswith(".json")
        }


def detect_promotable_meta_keys(df: DataFrame) -> list[str]:
    """Open-world metadata -> additive schema evolution: any non-standard key
    appearing in the batch becomes a top-level nullable string column
    (reference open-world enrichment, RouteIngestedFile.kt:196-209; tolerant
    parsing, dtos/AzureBlobCreateEventMesage.kt:3). One tiny distinct-agg job."""
    keys = [
        r[0]
        for r in df.select(F.explode(F.map_keys(F.col("meta"))).alias("k")).distinct().collect()
    ]
    return sorted(k for k in keys if k not in STANDARD_META_KEYS)


def apply_epoch(
    wh: Warehouse,
    events: DataFrame,
    epoch_id: int,
    dedup_strategy: str = "agg",
) -> dict:
    """Apply one micro-batch of change events. Idempotent: re-running any
    epoch (crash replay, at-least-once redelivery of the whole batch) is a
    no-op thanks to per-table epoch guards."""
    t0 = time.time()
    route_config = default_route_config(wh.spark)

    batch = normalize_meta_keys(events)
    batch = coalesce_routing_keys(batch)
    batch = batch.persist()
    try:
        valid, dead_validate = split_valid(batch)
        # enrichment happens after validation (the reference validates raw
        # metadata before enriching: RouteIngestedFile.kt:111-146 vs :196-209)
        valid = enrich_meta(valid, __version__)
        annotated = annotate_routes(valid, route_config)
        routed, dead_route = split_routed(annotated)
        routed = routed.persist()

        dl = wh.table("dead_letter")
        dl.append(dead_validate, epoch_id=epoch_id, source="validate")
        dl.append(dead_route, epoch_id=epoch_id, source="route")

        promote = detect_promotable_meta_keys(batch)
        stats: dict = {"epoch_id": epoch_id, "destinations": {}, "promoted_columns": promote}

        lineage = wh.table("lineage_metrics")
        for dest in sorted(set(DESTINATION_TABLES)):
            dest_events = routed.filter(F.col("destination_table") == dest)
            delta = dedup_last_writer(dest_events, key="url", strategy=dedup_strategy)
            delta = delta.withColumn("text", extract_text(F.col("html")))
            cols = [
                F.col("url"),
                F.col("warc_ts"),
                F.col("html"),
                F.col("text"),
                F.col("lang"),
                F.col("lsn").alias(LSN_COL),
                (F.col("op") == "D").alias(DELETED_COL),
            ]
            for k in promote:
                cols.append(F.col("meta").getItem(k).alias(k))
            delta = delta.select(*cols).persist()

            table = wh.table(dest)
            res = table.merge_cdc(delta, epoch_id=epoch_id, source="cdc")
            if not res.get("skipped"):
                snap = table.snapshot()
                bucket = F.pmod(F.xxhash64(F.col("url")), F.lit(snap.n_buckets)).cast("int")
                lrows = (
                    delta.groupBy(bucket.alias("partition_id"))
                    .agg(
                        F.count(F.lit(1)).alias("rows_applied"),
                        F.sum(F.coalesce(F.length(F.col("html")), F.lit(0))).cast("long").alias("bytes"),
                        F.max("warc_ts").alias("watermark"),
                    )
                    .select(
                        F.lit(epoch_id).cast("long").alias("epoch_id"),
                        F.col("partition_id"),
                        F.lit(dest).alias("destination_table"),
                        F.col("rows_applied"),
                        F.col("bytes"),
                        F.col("watermark"),
                        F.lit("SUCCESS").alias("status"),
                        F.lit(None).cast(LINEAGE_METRICS["issues"].dataType).alias("issues"),
                        F.timestamp_seconds(F.lit(t0)).alias("start_ts"),
                        F.current_timestamp().alias("end_ts"),
                    )
                )
                lineage.append(lrows, epoch_id=epoch_id, source=f"lineage-{dest}")
            stats["destinations"][dest] = res
            delta.unpersist()
        return stats
    finally:
        batch.unpersist()
        try:
            routed.unpersist()
        except Exception:
            pass


def replay(
    wh: Warehouse,
    events_dir: str,
    dedup_strategy: str = "agg",
    stop_after_epoch: int | None = None,
    compact_every: int | None = None,
) -> dict:
    """Bounded replay of a partitioned event log (binlog-segment dirs
    epoch_hint=K/), resuming from the checkpoint log. The streaming variant
    (streaming/ingest.py) drives the same apply_epoch via foreachBatch."""
    spark = wh.spark
    wh.init_tables()
    done = wh.completed_epochs()
    epochs = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(events_dir)
        if d.startswith("epoch_hint=")
    )
    applied = []
    for e in epochs:
        if e in done:
            continue
        if stop_after_epoch is not None and e > stop_after_epoch:
            break
        events = spark.read.parquet(os.path.join(events_dir, f"epoch_hint={e}"))
        stats = apply_epoch(wh, events, epoch_id=e, dedup_strategy=dedup_strategy)
        wh.mark_epoch_done(e, {"n_destinations": len(stats["destinations"])})
        applied.append(e)
        if compact_every and (e + 1) % compact_every == 0:
            for dest in sorted(set(DESTINATION_TABLES)):
                wh.table(dest).compact()
    return {"applied_epochs": applied, "skipped_epochs": sorted(done)}
