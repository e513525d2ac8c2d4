"""Streaming near-dup detection: the persistent LSH index as a CDC stage.

A crawl feed never sees the corpus twice — each micro-batch of documents
must be checked against everything ingested before it. This wires
``NearDupIndex.check_and_add`` into a Structured Streaming foreachBatch:
per micro-batch the new docs' band rows are appended under the batch id
(the same epoch-guard exactly-once contract as the main ingest: a restart
replaying a batch is a metadata no-op) and the pairs involving the batch's
docs land in a ``near_dup_pairs`` lake table, also under the batch id.

Scale shape: per batch the work is O(batch signatures) + one broadcast-probe
scan of the index — the corpus side never shuffles (asserted in
test_dedup_index.py); state lives in the lake, not in streaming state, so
the stream restarts from checkpoint with zero state rebuild.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from data_exchange_routing_spark.functions.dedup_index import NearDupIndex
from data_exchange_routing_spark.lake.table import LakeTable

PAIRS_SCHEMA = T.StructType(
    [
        T.StructField("doc_a", T.LongType(), False),
        T.StructField("doc_b", T.LongType(), False),
        T.StructField("epoch", T.LongType(), False),
    ]
)


def stream_near_dup(
    spark: SparkSession,
    docs_dir: str,
    docs_schema: T.StructType,
    index_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> StreamingQuery:
    """availableNow tail of a parquet document feed -> per-batch near-dup
    check against (and append into) the persistent LSH index. Returns the
    running query; callers awaitTermination()."""
    idx = (
        NearDupIndex.load(spark, index_path)
        if LakeTable(spark, index_path).exists()
        else NearDupIndex.create(spark, index_path)
    )
    pairs_table = (
        LakeTable.load(spark, pairs_path)
        if LakeTable(spark, pairs_path).exists()
        else LakeTable.create(spark, pairs_path, PAIRS_SCHEMA)
    )

    def process(batch_df, batch_id: int) -> None:
        pairs = idx.check_and_add(batch_df, int(batch_id), id_col=id_col, text_col=text_col)
        pairs_table.append(
            pairs.withColumn("epoch", F.lit(int(batch_id)).cast("long")),
            epoch_id=int(batch_id),
            source="near-dup-pairs",
        )

    reader = spark.readStream.schema(docs_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return (
        reader.parquet(docs_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
