"""Export sinks (SURVEY.md §2.2 K8 delimited sink, K4 report sink; §2.3 P10
JSON serialization).

Reference basis:
- K8: ADF DelimitedTextSink with quoteAllText=true and a ``.txt`` extension
  (spikes/PL_ReportStream/pipeline/PL_ReportStream.json:29-49) ->
  ``df.write.option("quoteAll", true).csv(...)``; PreserveHierarchy maps to
  ``partitionBy`` directory layout.
- K4/P10: one PSReportEnvelope JSON per processed unit
  (PSReportEnvelope.kt:7-58, serialized gson.toJson at
  RouteIngestedFile.kt:411) -> ``to_json(struct(...))`` over the
  lineage_metrics table: a pure JVM expression, one string per commit row.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_exchange_routing_spark import __version__

REPORT_SERVICE = "data_exchange_routing_spark"


def write_delimited(
    df: DataFrame,
    path: str,
    quote_all: bool = True,
    header: bool = True,
    extension: str | None = ".txt",
    partition_by: list[str] | None = None,
) -> list[str]:
    """K8 delimited sink. quoteAll + header mirror the ADF sink config; the
    ADF sink's ``.txt`` extension is applied by a driver-side rename of the
    task-written parts (local-fs convenience — on object stores leave
    ``extension=None`` and let the catalog record locations). Returns the
    written data-file paths."""
    writer = df.write.mode("overwrite").option("quoteAll", str(quote_all).lower()).option(
        "header", str(header).lower()
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)  # PreserveHierarchy analog
    writer.csv(path)
    written: list[str] = []
    for root, _dirs, names in os.walk(path):
        for name in names:
            if not name.startswith("part-"):
                continue
            full = os.path.join(root, name)
            if extension and not name.endswith(extension):
                base = name.split(".")[0] + extension
                target = os.path.join(root, base)
                os.rename(full, target)
                full = target
            written.append(full)
    return sorted(written)


def report_envelope_json(lineage: DataFrame, stage: str = "apply_epoch") -> DataFrame:
    """P10/K4: serialize lineage rows into PSReportEnvelope-shaped JSON
    strings, one per (epoch, destination) commit. Mirrors
    PSReportEnvelope.kt:7-58 field names (upload_id/stage_info/...); the
    whole projection is JVM-side ``to_json(struct(...))`` — no Python in the
    row path."""
    envelope = F.struct(
        F.concat_ws("-", F.lit("epoch"), F.col("epoch_id")).alias("upload_id"),
        F.col("destination_table").alias("data_stream_id"),
        F.lit("cdc").alias("data_stream_route"),
        F.date_format(F.col("watermark"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias(
            "dex_ingest_timestamp"
        ),
        F.struct(
            F.lit(REPORT_SERVICE).alias("service"),
            F.lit(stage).alias("stage"),
            F.lit(__version__).alias("version"),
            F.col("status").alias("status"),
            F.col("issues").alias("issues"),
            F.date_format(F.col("start_ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias(
                "start_processing_time"
            ),
            F.date_format(F.col("end_ts"), "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").alias(
                "end_processing_time"
            ),
        ).alias("stage_info"),
        F.struct(
            F.col("rows_applied").alias("rows_applied"),
            F.col("bytes").alias("bytes"),
            F.col("partition_id").alias("partition_id"),
        ).alias("data"),
    )
    return lineage.select(
        F.col("epoch_id"),
        F.col("destination_table"),
        F.to_json(envelope).alias("report"),
    )
