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


def test_stream_left_outer_interval_join(spark, split_dirs, tmpdir_path):
    """Streaming left-outer drain equals the batch left join: purchases with
    no views in range appear null-padded once the stream ends."""
    batch_l = spark.read.parquet(split_dirs + "/purchases")
    batch_r = spark.read.parquet(split_dirs + "/views").withColumnRenamed("event_id", "view_event_id")
    expected = sorted(
        (r["event_id"], r["view_event_id"])
        for r in interval_join(
            batch_l, batch_r, on="user_id", left_ts="ts", right_ts="ts", how="left_outer"
        ).select("event_id", "view_event_id").collect()
    )
    n_unmatched = sum(1 for _, v in expected if v is None)
    assert n_unmatched > 0  # outer semantics actually exercised

    sl = spark.readStream.schema(SCHEMA).parquet(split_dirs + "/purchases")
    sr = (
        spark.readStream.schema(SCHEMA)
        .parquet(split_dirs + "/views")
        .withColumnRenamed("event_id", "view_event_id")
    )
    out = os.path.join(tmpdir_path, "out_lo")
    q = (
        interval_join(sl, sr, on="user_id", left_ts="ts", right_ts="ts", how="left_outer")
        .select("event_id", "view_event_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(tmpdir_path, "ckpt_lo"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = sorted(
        (r["event_id"], r["view_event_id"]) for r in spark.read.parquet(out).collect()
    )
    # Streaming outer semantics: a null-padded left row is emitted only once
    # the watermark passes its ts (a matching right event could arrive until
    # then). At end-of-input the final watermark is max(ts) - 2h, so
    # unmatched purchases in the last 2h stay pending — drop them from the
    # batch expectation.
    from pyspark.sql import functions as F

    max_ts = (
        batch_l.select(F.max("ts").alias("m"))
        .unionByName(spark.read.parquet(split_dirs + "/views").select(F.max("ts").alias("m")))
        .agg(F.max("m"))
        .collect()[0][0]
    )
    import datetime as dt

    # guaranteed-emission region: strictly older than watermark + lookback
    cutoff = max_ts - dt.timedelta(hours=3)
    ts_by_id = {r["event_id"]: r["ts"] for r in batch_l.collect()}
    exp_matched = sorted((e, v) for e, v in expected if v is not None)
    got_matched = sorted((e, v) for e, v in got if v is not None)
    assert got_matched == exp_matched  # matches are exact
    exp_null_all = {e for e, v in expected if v is None}
    got_null = {e for e, v in got if v is None}
    assert got_null <= exp_null_all  # no spurious nulls
    must_emit = {e for e in exp_null_all if ts_by_id[e] < cutoff}
    assert must_emit <= got_null and got_null  # old unmatched rows emitted


def test_interval_join_suffixes_clashing_right_columns(spark):
    """ADVICE r01: any right column sharing a name with a left column must be
    suffixed (not just the join keys); non-clashing columns keep their name."""
    import datetime as dt

    l = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10), "L")], "user_id long, ts timestamp, src string"
    )
    r = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 9, 30), "R", 7)],
        "user_id long, ts timestamp, src string, extra long",
    )
    out = interval_join(l, r, on="user_id", left_ts="ts", right_ts="ts")
    assert out.columns == ["user_id", "ts", "src", "user_id_r", "ts_r", "src_r", "extra"]
    row = out.collect()[0]
    assert row["src"] == "L" and row["src_r"] == "R" and row["extra"] == 7


def test_stream_full_outer_interval_join(spark, split_dirs, tmpdir_path):
    """Streaming full-outer drain equals the batch full join: unmatched rows
    from BOTH sides appear null-padded once the watermark passes them.

    Spark semantics note (observed, not a bug): availableNow does NOT
    force-close join state still inside the watermark at end-of-input, so
    rows near the stream end would stay unflushed. Production streams carry
    punctuation/heartbeat events for exactly this; the test appends one
    far-future sentinel per side (excluded from the comparison) to advance
    both watermarks past all real rows."""
    from pyspark.sql import functions as F

    # sentinel rows push each stream's watermark beyond every real row;
    # 10 days apart so the sentinels cannot join each other
    for side, days, dest in (("purchases", 20, "full_l"), ("views", 10, "full_r")):
        base = spark.read.parquet(split_dirs + "/" + side)
        hi = base.agg(F.max("ts")).collect()[0][0]
        sent = spark.createDataFrame(
            [(-1, -1, hi + __import__("datetime").timedelta(days=days))], SCHEMA
        )
        base.unionByName(sent).write.mode("overwrite").parquet(
            os.path.join(tmpdir_path, dest)
        )
    full_l = os.path.join(tmpdir_path, "full_l")
    full_r = os.path.join(tmpdir_path, "full_r")
    batch_l = spark.read.parquet(split_dirs + "/purchases")
    batch_r = spark.read.parquet(split_dirs + "/views").withColumnRenamed(
        "event_id", "view_event_id"
    )
    _k = lambda t: tuple(map(repr, t))  # noqa: E731 — None-safe ordering
    expected = sorted(
        (
            (r["event_id"], r["view_event_id"])
            for r in interval_join(
                batch_l, batch_r, on="user_id", left_ts="ts", right_ts="ts",
                how="full_outer",
            ).select("event_id", "view_event_id").collect()
        ),
        key=_k,
    )
    assert any(a is None for a, _ in expected)  # right-only rows exist
    assert any(b is None for _, b in expected)  # left-only rows exist

    sl = spark.readStream.schema(SCHEMA).parquet(full_l)
    sr = (
        spark.readStream.schema(SCHEMA)
        .parquet(full_r)
        .withColumnRenamed("event_id", "view_event_id")
    )
    out = os.path.join(tmpdir_path, "out_full")
    q = (
        interval_join(sl, sr, on="user_id", left_ts="ts", right_ts="ts", how="full_outer")
        .select("event_id", "view_event_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(tmpdir_path, "ckpt_full"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (
            (r["event_id"], r["view_event_id"])
            for r in spark.read.parquet(out).collect()
            if r["event_id"] != -1 and r["view_event_id"] != -1
        ),
        key=_k,
    )
    assert got == expected
