"""Watermarked stream-stream interval join: streaming result must equal the
batch join on the same data (availableNow drain)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from data_exchange_routing_spark.streaming.joins import interval_join

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


@pytest.fixture(scope="module")
def split_dirs(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ssj"))
    e = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    purchases = e.filter("event_type = 'purchase'").select("event_id", "user_id", "ts")
    views = e.filter("event_type = 'view'").select("event_id", "user_id", "ts")
    purchases.write.parquet(root + "/purchases")
    views.write.parquet(root + "/views")
    return root


def test_stream_stream_join_matches_batch(spark, split_dirs, tmpdir_path):
    batch_l = spark.read.parquet(split_dirs + "/purchases")
    batch_r = spark.read.parquet(split_dirs + "/views")
    expected = sorted(
        (r["event_id"], r["view_event_id"])
        for r in interval_join(
            batch_l,
            batch_r.withColumnRenamed("event_id", "view_event_id"),
            on="user_id",
            left_ts="ts",
            right_ts="ts",
        ).select("event_id", "view_event_id").collect()
    )
    assert expected  # joins exist in this dataset

    sl = spark.readStream.schema(SCHEMA).parquet(split_dirs + "/purchases")
    sr = (
        spark.readStream.schema(SCHEMA)
        .parquet(split_dirs + "/views")
        .withColumnRenamed("event_id", "view_event_id")
    )
    out = os.path.join(tmpdir_path, "out")
    q = (
        interval_join(sl, sr, on="user_id", left_ts="ts", right_ts="ts")
        .select("event_id", "view_event_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(tmpdir_path, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r["event_id"], r["view_event_id"]) for r in spark.read.parquet(out).collect()
    )
    assert got == expected
