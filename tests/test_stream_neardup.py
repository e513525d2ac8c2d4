"""Streaming near-dup stage: multi-batch drain equals one-shot candidates;
checkpoint restart adds nothing (exactly-once at the surface)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.functions.dedup_text import minhash_lsh_candidates
from data_exchange_routing_spark.lake.table import LakeTable
from data_exchange_routing_spark.streaming.neardup import stream_near_dup

SF_DIR = "/root/testdata/sf0.001"
DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def _setup_feed(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    feed = str(tmp_path / "feed")
    # three files -> three micro-batches with maxFilesPerTrigger=1
    for e in range(3):
        docs.filter(F.col("doc_id") % 3 == e).coalesce(1).write.mode("append").parquet(feed)
    return docs, feed


def _drain(spark, feed, tmp_path):
    q = stream_near_dup(
        spark,
        feed,
        DOCS_SCHEMA,
        index_path=str(tmp_path / "idx"),
        pairs_path=str(tmp_path / "pairs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination()


def test_stream_matches_one_shot_and_restart_is_noop(spark, tmp_path):
    docs, feed = _setup_feed(spark, tmp_path)
    _drain(spark, feed, tmp_path)

    pairs = LakeTable.load(spark, str(tmp_path / "pairs")).read()
    got = {(r.doc_a, r.doc_b) for r in pairs.select("doc_a", "doc_b").collect()}
    want = {(r.doc_a, r.doc_b) for r in minhash_lsh_candidates(docs).collect()}
    assert got == want
    n_epochs = pairs.select("epoch").distinct().count()
    assert n_epochs == 3  # one commit per micro-batch

    # restart on the same checkpoint: nothing new to read, tables unchanged
    v_pairs = LakeTable.load(spark, str(tmp_path / "pairs")).current_version()
    v_idx = LakeTable.load(spark, str(tmp_path / "idx")).current_version()
    _drain(spark, feed, tmp_path)
    assert LakeTable.load(spark, str(tmp_path / "pairs")).current_version() == v_pairs
    assert LakeTable.load(spark, str(tmp_path / "idx")).current_version() == v_idx
