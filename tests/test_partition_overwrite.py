"""Dynamic partition overwrite (LakeTable.overwrite_partitions): replace
exactly the partitions present in the batch, one atomic commit, untouched
partitions carried metadata-only."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("kind", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _rows(spark, rows):
    return spark.createDataFrame(
        [(i, ts, k, float(v)) for i, ts, k, v in rows],
        "event_id long, kind_ts string, kind string, value double",
    ).select(
        "event_id",
        F.to_timestamp(F.col("kind_ts")).alias("ts"),
        "kind",
        "value",
    )


def _base(spark):
    return _rows(
        spark,
        [
            (1, "2024-01-01 01:00:00", "a", 1),
            (2, "2024-01-01 02:00:00", "b", 2),
            (3, "2024-01-02 01:00:00", "a", 3),
            (4, "2024-01-02 02:00:00", "b", 4),
            (5, "2024-01-03 01:00:00", "a", 5),
        ],
    )


def _state(t):
    return {
        tuple(r)
        for r in t.read()
        .select("event_id", F.date_format("ts", "yyyy-MM-dd").alias("d"), "kind", "value")
        .collect()
    }


def test_replaces_only_batch_partitions(spark, tmpdir_path):
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA)
    t.set_partition_spec([{"name": "d", "col": "ts", "transform": "days"}])
    t.append(_base(spark), epoch_id=0)
    pre_paths = {f["path"] for f in t.snapshot().files}
    # replace day 2024-01-02 with ONE row (fewer rows than before: proves
    # the old partition rows are gone, not merged)
    batch = _rows(spark, [(9, "2024-01-02 12:00:00", "c", 99)])
    res = t.overwrite_partitions(batch, epoch_id=1)
    assert res["skipped"] is False
    assert res["partitions_replaced"] == 1
    assert res["files_dropped"] >= 1 and res["files_kept"] >= 1
    assert res["rows_deleted"] == 2 and res["rows_added"] == 1
    assert _state(t) == {
        (1, "2024-01-01", "a", 1.0),
        (2, "2024-01-01", "b", 2.0),
        (5, "2024-01-03", "a", 5.0),
        (9, "2024-01-02", "c", 99.0),
    }
    # untouched partitions carried over metadata-only: same file paths
    post_paths = {f["path"] for f in t.snapshot().files}
    assert len(pre_paths & post_paths) == res["files_kept"]
    # time travel: the pre-overwrite snapshot still reads the old state
    assert t.read(version=t.current_version() - 1).count() == 5


def test_epoch_guard_and_empty_batch(spark, tmpdir_path):
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA)
    t.set_partition_spec([{"name": "d", "col": "ts", "transform": "days"}])
    t.append(_base(spark), epoch_id=0)
    batch = _rows(spark, [(9, "2024-01-02 12:00:00", "c", 99)])
    t.overwrite_partitions(batch, epoch_id=1)
    before = _state(t)
    # exact redelivery: guard no-op even with a different batch payload
    res = t.overwrite_partitions(_rows(spark, [(8, "2024-01-01 05:00:00", "z", 0)]), epoch_id=1)
    assert res["skipped"] is True
    assert _state(t) == before
    # empty batch replaces nothing, commits the guard only
    empty = _base(spark).filter(F.lit(False))
    res = t.overwrite_partitions(empty, epoch_id=2)
    assert res["skipped"] is False and res["partitions_replaced"] == 0
    assert res["files_dropped"] == 0 and res["rows_added"] == 0
    assert _state(t) == before
    assert t.overwrite_partitions(empty, epoch_id=2)["skipped"] is True


def test_old_spec_files_rewritten_minus_matching_rows(spark, tmpdir_path):
    """Files written under an OLDER spec can't prove disjointness through the
    current spec's tuples — they are rewritten CoW minus matching rows."""
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA)
    t.set_partition_spec([{"name": "d", "col": "ts", "transform": "days"}])
    t.append(_base(spark), epoch_id=0)
    t.set_partition_spec(
        [
            {"name": "d", "col": "ts", "transform": "days"},
            {"name": "k", "col": "kind", "transform": "identity"},
        ]
    )
    # replace partition (2024-01-02, 'a') under the NEW spec: event 3 (old
    # spec file) must disappear; event 4 (same day, kind b) must survive
    batch = _rows(spark, [(7, "2024-01-02 09:00:00", "a", 70)])
    res = t.overwrite_partitions(batch, epoch_id=1)
    assert res["files_rewritten"] >= 1
    assert _state(t) == {
        (1, "2024-01-01", "a", 1.0),
        (2, "2024-01-01", "b", 2.0),
        (4, "2024-01-02", "b", 4.0),
        (5, "2024-01-03", "a", 5.0),
        (7, "2024-01-02", "a", 70.0),
    }


def test_null_partition_value_is_replaceable(spark, tmpdir_path):
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA)
    t.set_partition_spec([{"name": "d", "col": "ts", "transform": "days"}])
    t.append(
        _base(spark).unionByName(
            spark.createDataFrame(
                [(6, None, "n", 6.0)], "event_id long, ts timestamp, kind string, value double"
            )
        ),
        epoch_id=0,
    )
    # a batch with a null ts replaces the NULL partition only
    batch = spark.createDataFrame(
        [(10, None, "n2", 60.0)], "event_id long, ts timestamp, kind string, value double"
    )
    res = t.overwrite_partitions(batch, epoch_id=1)
    assert res["partitions_replaced"] == 1
    got = {tuple(r) for r in t.read().select("event_id", "kind").collect()}
    assert (6, "n") not in got and (10, "n2") in got
    assert {(1, "a"), (2, "b"), (3, "a"), (4, "b"), (5, "a")} <= got


def test_validations(spark, tmpdir_path):
    keyed = LakeTable.create(
        spark, f"{tmpdir_path}/k",
        T.StructType([T.StructField("url", T.StringType()),
                      T.StructField("warc_ts", T.TimestampType())]),
        key="url", n_buckets=2,
    )
    with pytest.raises(ValueError, match="append-only"):
        keyed.overwrite_partitions(keyed.read())
    plain = LakeTable.create(spark, f"{tmpdir_path}/p", SCHEMA)
    with pytest.raises(ValueError, match="partition spec"):
        plain.overwrite_partitions(_base(spark))


def test_streaming_refresh_replaces_partitions_exactly_once(spark, tmpdir_path):
    """Crawl-refresh stream: micro-batches replace their partitions through
    the epoch guard; a checkpointed re-run changes nothing."""
    from data_exchange_routing_spark.streaming.ingest import stream_refresh_partitions

    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA)
    t.set_partition_spec([{"name": "d", "col": "ts", "transform": "days"}])
    t.append(_base(spark), epoch_id=0)
    # two refresh files -> two micro-batches (maxFilesPerTrigger=1): day 1
    # then day 2, each with fewer rows than the original partition
    refresh_dir = f"{tmpdir_path}/refresh"
    _rows(spark, [(11, "2024-01-01 09:00:00", "r", 10)]).coalesce(1).write.parquet(
        f"{refresh_dir}/f1"
    )
    _rows(spark, [(12, "2024-01-02 09:00:00", "r", 20)]).coalesce(1).write.parquet(
        f"{refresh_dir}/f2"
    )
    import glob
    import shutil

    flat = f"{tmpdir_path}/flat"
    import os
    os.makedirs(flat)
    for i, f in enumerate(sorted(glob.glob(f"{refresh_dir}/*/*.parquet"))):
        shutil.copy(f, f"{flat}/part-{i}.parquet")
    ckpt = f"{tmpdir_path}/ckpt"
    q = stream_refresh_partitions(
        spark, t, flat, ckpt, SCHEMA, max_files_per_trigger=1
    )
    q.awaitTermination(120)
    expected = {
        (5, "2024-01-03", "a", 5.0),
        (11, "2024-01-01", "r", 10.0),
        (12, "2024-01-02", "r", 20.0),
    }
    assert _state(t) == expected
    v = t.current_version()
    # re-run from the same checkpoint: availableNow re-reads nothing new
    q2 = stream_refresh_partitions(spark, t, flat, ckpt, SCHEMA)
    q2.awaitTermination(120)
    assert _state(t) == expected and t.current_version() == v
    # a manually redelivered batch id is a guard no-op even with new data
    res = t.overwrite_partitions(
        _rows(spark, [(99, "2024-01-01 01:00:00", "x", 0)]),
        epoch_id=0, source="stream-refresh",
    )
    assert res["skipped"] is True and _state(t) == expected
