"""Predicate-routed stream multicast (SURVEY.md §2.2 K10, §2.4 F11, §3.3).

Reference basis: the ASA streaming PoC fans ONE event stream into an archive
sink (SELECT *) plus per-category sinks gated by predicates
(``WHERE casecategory = 'covid'`` / ``'flu'``) —
spikes/streamingPoC/StreamAnalytics Job query.txt:1-27.

Spark-first restatement: one ``readStream`` and ONE ``foreachBatch`` that
persists the micro-batch once and writes the archive plus every filtered
branch from that cached batch — N+1 sinks for one source scan per trigger,
instead of N+1 independent streaming queries each re-reading the source
(which is what a literal one-query-per-sink translation would cost). Branch
predicates are Catalyst column expressions, so each branch write prunes
columns/rows JVM-side.

At scale: the persist is per-micro-batch (bounded by maxFilesPerTrigger /
maxBytesPerTrigger), branches write disjoint output dirs, and the single
checkpoint gives all sinks the same exactly-once epoch boundary — the ASA
job's per-sink consistency, for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery


def stream_multicast(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    out_dir: str,
    branches: dict[str, Column],
    checkpoint_dir: str,
    archive_name: str = "archive",
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Fan one file-source stream into ``{out_dir}/{archive_name}`` (all rows)
    plus ``{out_dir}/{branch}`` per predicate. Bounded runs use the
    availableNow trigger; ``branches`` maps sink name -> Catalyst predicate.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def process(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            batch.write.mode("append").parquet(f"{out_dir}/{archive_name}")
            for name, pred in branches.items():
                batch.filter(pred).write.mode("append").parquet(f"{out_dir}/{name}")
        finally:
            batch.unpersist()

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
