"""Snapshot-then-stream bootstrap (operators/bootstrap.py): switchover
algebra vs the full-log resolve, and an engine-level initial-load handoff
that must be table-diff-equal to a from-scratch replay."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from data_exchange_routing_spark.operators.bootstrap import (
    bootstrap_destination,
    snapshot_then_stream,
)
from data_exchange_routing_spark.operators.dedup import dedup_last_writer
from data_exchange_routing_spark.sources.datagen import (
    derive_change_events_from_events,
)


def _events(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    return derive_change_events_from_events(ev).localCheckpoint(eager=True)


def _state(df):
    return {
        r["url"]: (r["warc_ts"], r["lsn"], r["lang"], r["content_type"])
        for r in df.collect()
    }


@pytest.mark.parametrize("cut_frac,overlap_frac", [
    (0.6, 0.3),   # genuine overlap region
    (0.6, 0.6),   # exact switchover, no redundancy (Debezium's default)
    (0.6, 0.0),   # the entire log redelivered on top of the snapshot
    (1.0, 0.5),   # snapshot already final; tail must not regress it
])
def test_switchover_algebra_matches_full_resolve(spark, cut_frac, overlap_frac):
    events = _events(spark)
    lo, hi = events.agg(F.min("warc_ts"), F.max("warc_ts")).first()
    got = snapshot_then_stream(
        events, lo + (hi - lo) * cut_frac, lo + (hi - lo) * overlap_frac
    )
    want = dedup_last_writer(events).filter(F.col("op") != "D")
    assert _state(got) == _state(want) and want.count() > 0


def test_engine_bootstrap_then_tail_equals_full_replay(spark, tmpdir_path):
    """Initial load from another warehouse's resolved state (WITH its
    tombstones — the epoch split is not ordinal-ordered), then tail replay
    from an overlapping segment: every destination table must end
    table-diff-equal to a from-scratch full replay, and re-running the
    bootstrap commit must be an epoch-guard no-op."""
    from data_exchange_routing_spark.pipeline import Warehouse, replay
    from data_exchange_routing_spark.sources.configs import DESTINATION_TABLES
    from data_exchange_routing_spark.sources.datagen import write_change_events

    events_dir = os.path.join(tmpdir_path, "events")
    write_change_events(spark, events_dir, 1500, 150, n_epochs=4)

    full = Warehouse(spark, os.path.join(tmpdir_path, "full"), n_buckets=4)
    replay(full, events_dir)

    src = Warehouse(spark, os.path.join(tmpdir_path, "src"), n_buckets=4)
    replay(src, events_dir, stop_after_epoch=1)  # source state at the cut

    boot = Warehouse(spark, os.path.join(tmpdir_path, "boot"), n_buckets=4)
    boot.init_tables()
    dests = sorted(set(DESTINATION_TABLES))
    for dest in dests:
        snap = src.table(dest).read(with_internal=True, include_tombstones=True)
        r = bootstrap_destination(boot.table(dest), snap)
        assert r["skipped"] is False
    # epoch 1 is deliberately redelivered: folded into the snapshot AND tailed
    replay(boot, events_dir, from_epoch=1)

    for dest in dests:
        a = full.table(dest).read()
        b = boot.table(dest).read()
        assert sorted(a.columns) == sorted(b.columns), dest
        cols = sorted(a.columns)
        canon = lambda df: sorted(
            tuple(repr(v) for v in row) for row in df.select(*cols).collect()
        )
        rows_a = canon(a)
        rows_b = canon(b)
        assert rows_a == rows_b and rows_a, dest
        # dead keys must agree too (tombstone handoff worked)
        dead_a = {
            r["url"] for r in full.table(dest)
            .read(with_internal=True, include_tombstones=True)
            .filter(F.col("_deleted")).collect()
        }
        dead_b = {
            r["url"] for r in boot.table(dest)
            .read(with_internal=True, include_tombstones=True)
            .filter(F.col("_deleted")).collect()
        }
        assert dead_a == dead_b, dest

    # redelivered bootstrap commit: metadata no-op under the epoch guard
    dest = dests[0]
    snap = src.table(dest).read(with_internal=True, include_tombstones=True)
    assert bootstrap_destination(boot.table(dest), snap)["skipped"] is True


def test_read_include_tombstones_exposes_dead_keys(spark, tmpdir_path):
    from data_exchange_routing_spark.lake.table import LakeTable
    from pyspark.sql import types as T

    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"),
        T.StructType.fromDDL("url string, v int, warc_ts timestamp"),
        key="url", n_buckets=2,
    )
    rows = spark.createDataFrame(
        [("a", 1, "2024-01-01 00:00:00", 1, False),
         ("b", 2, "2024-01-01 00:00:00", 2, False),
         ("b", None, "2024-01-02 00:00:00", 3, True)],
        "url string, v int, warc_ts string, _lsn long, _deleted boolean",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    t.merge_cdc(rows, epoch_id=0)
    assert {r["url"] for r in t.read().collect()} == {"a"}
    full = t.read(with_internal=True, include_tombstones=True)
    assert {(r["url"], r["_deleted"]) for r in full.collect()} == {
        ("a", False), ("b", True),
    }
