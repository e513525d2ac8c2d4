"""Change-feed consumer: compaction-proof incremental reads, durable cursor,
end-to-end exactly-once mirroring, loud failure past snapshot expiry."""

from __future__ import annotations

import os
from datetime import datetime

import pytest
from pyspark.sql import types as T

from data_exchange_routing_spark.lake.changefeed import ChangeFeedConsumer, mirror_into_table
from data_exchange_routing_spark.lake.table import DELETED_COL, LSN_COL, LakeTable
from data_exchange_routing_spark.schemas import WEB_PAGES


def _delta(spark, rows):
    schema = T.StructType(
        WEB_PAGES.fields
        + [T.StructField(LSN_COL, T.LongType()), T.StructField(DELETED_COL, T.BooleanType())]
    )
    return spark.createDataFrame(rows, schema)


def _row(url, ts, lsn, deleted=False, text="t"):
    return (url, datetime(2024, 1, 1, 0, 0, ts), b"<x>", text, "en", lsn, deleted)


def _state(t):
    return sorted((r["url"], r["text"]) for r in t.read().select("url", "text").collect())


def test_read_changes_survives_intervening_compaction(spark, tmpdir_path):
    """Regression: a consumer whose cursor predates a compaction must still
    see the deltas that compaction folded away. Endpoint-manifest diffing
    loses them (added at v+1, gone by v+3); the pairwise walk does not."""
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=4)
    v0 = t.snapshot().version
    t.merge_cdc(_delta(spark, [_row("a", 1, 1)]), epoch_id=0)
    t.merge_cdc(_delta(spark, [_row("b", 2, 2)]), epoch_id=1)
    assert t.compact()["skipped"] is False  # folds both deltas into base files
    t.merge_cdc(_delta(spark, [_row("c", 3, 3)]), epoch_id=2)
    got = sorted(r["url"] for r in t.read_changes(v0).collect())
    assert got == ["a", "b", "c"]
    # and base files written by the compaction are NOT re-emitted as changes
    assert t.read_changes(v0).count() == 3


def test_consumer_mirror_exactly_once_and_converges(spark, tmpdir_path):
    src = LakeTable.create(spark, os.path.join(tmpdir_path, "src"), WEB_PAGES, key="url", n_buckets=4)
    dst = LakeTable.create(spark, os.path.join(tmpdir_path, "dst"), WEB_PAGES, key="url", n_buckets=2)
    src.merge_cdc(_delta(spark, [_row("a", 1, 1), _row("b", 1, 2)]), epoch_id=0)
    src.merge_cdc(_delta(spark, [_row("a", 5, 3, text="newer"), _row("b", 6, 4, deleted=True)]), epoch_id=1)

    c = ChangeFeedConsumer(spark, src.path, "mirror", with_internal=True)
    res = c.drain(mirror_into_table(dst, "mirror"))
    assert res["processed_versions"] >= 2
    assert _state(dst) == _state(src) == [("a", "newer")]

    # redelivery of an already-processed range (cursor rewound = crash before
    # advance) is a downstream metadata no-op -> exactly-once end-to-end
    v_before = dst.current_version()
    c.seek(1)
    c.drain(mirror_into_table(dst, "mirror"))
    assert _state(dst) == [("a", "newer")]
    assert dst.current_version() == v_before  # epoch guard skipped the commit

    # new upstream changes flow through incrementally, including deletes
    src.merge_cdc(_delta(spark, [_row("a", 9, 9, deleted=True), _row("d", 2, 5, text="new")]), epoch_id=2)
    c.drain(mirror_into_table(dst, "mirror"))
    assert _state(dst) == _state(src) == [("d", "new")]


def test_consumer_crash_between_fn_and_advance_redelivers(spark, tmpdir_path):
    src = LakeTable.create(spark, os.path.join(tmpdir_path, "src"), WEB_PAGES, key="url", n_buckets=4)
    src.merge_cdc(_delta(spark, [_row("a", 1, 1)]), epoch_id=0)
    c = ChangeFeedConsumer(spark, src.path, "crashy", with_internal=True)
    calls = []

    def boom(df, from_v, to_v):
        calls.append((from_v, to_v, df.count()))
        raise RuntimeError("crash after side effect, before cursor advance")

    with pytest.raises(RuntimeError):
        c.process_available(boom)
    assert c.position() == 1  # cursor did NOT advance

    seen = []
    c.process_available(lambda df, f, t_: seen.append(df.count()))
    assert seen == [1] and calls[0][2] == 1  # same batch redelivered


def test_consumer_micro_batching_bounds_range(spark, tmpdir_path):
    src = LakeTable.create(spark, os.path.join(tmpdir_path, "src"), WEB_PAGES, key="url", n_buckets=4)
    for i in range(4):
        src.merge_cdc(_delta(spark, [_row(f"u{i}", 1 + i, i + 1)]), epoch_id=i)
    c = ChangeFeedConsumer(spark, src.path, "micro")
    ranges = []
    c.drain(lambda df, f, t_: ranges.append((f, t_)), max_versions_per_batch=2)
    assert all(t_ - f <= 2 for f, t_ in ranges) and len(ranges) >= 2
    # contiguous, gap-free coverage of (1, head]
    assert ranges[0][0] == 1 and ranges[-1][1] == src.current_version()
    assert all(a[1] == b[0] for a, b in zip(ranges, ranges[1:]))


def test_consumer_past_expiry_fails_loudly(spark, tmpdir_path):
    src = LakeTable.create(spark, os.path.join(tmpdir_path, "src"), WEB_PAGES, key="url", n_buckets=4)
    for i in range(8):
        src.merge_cdc(_delta(spark, [_row(f"u{i}", 1 + i, i + 1)]), epoch_id=i)
    src.expire_snapshots(keep_last=2)
    c = ChangeFeedConsumer(spark, src.path, "laggard")
    with pytest.raises(ValueError, match="not reconstructible"):
        c.process_available(lambda df, f, t_: None)
    # recovery path: rebuild from a full read, reseek to head, tail onward
    c.seek(src.current_version())
    src.merge_cdc(_delta(spark, [_row("fresh", 9, 99)]), epoch_id=100)
    got = []
    c.process_available(lambda df, f, t_: got.append(sorted(r["url"] for r in df.collect())))
    assert got == [["fresh"]]


def test_mirror_without_internal_columns_fails_loudly(spark, tmpdir_path):
    """A consumer created without with_internal=True must not silently
    resurrect source tombstones in the mirror — the callback raises."""
    src = LakeTable.create(spark, os.path.join(tmpdir_path, "src"), WEB_PAGES, key="url", n_buckets=2)
    dst = LakeTable.create(spark, os.path.join(tmpdir_path, "dst"), WEB_PAGES, key="url", n_buckets=2)
    src.merge_cdc(_delta(spark, [_row("a", 1, 1)]), epoch_id=0)
    c = ChangeFeedConsumer(spark, src.path, "bad")  # with_internal defaults False
    with pytest.raises(ValueError, match="with_internal=True"):
        c.drain(mirror_into_table(dst, "bad"))
    assert c.position() == 1  # nothing advanced


def test_mirror_epoch_guard_stays_o1_via_monotonic_watermark(spark, tmpdir_path):
    """Version-derived epoch ids use the high-watermark guard: the
    destination's committed-epoch encoding stays O(1) per source instead of
    growing one integer per processed batch."""
    src = LakeTable.create(spark, os.path.join(tmpdir_path, "src"), WEB_PAGES, key="url", n_buckets=2)
    dst = LakeTable.create(spark, os.path.join(tmpdir_path, "dst"), WEB_PAGES, key="url", n_buckets=2)
    c = ChangeFeedConsumer(spark, src.path, "m", with_internal=True)
    for i in range(6):
        src.merge_cdc(_delta(spark, [_row(f"u{i}", 1, i + 1)]), epoch_id=i)
        c.drain(mirror_into_table(dst, "m"))
    enc = dst.snapshot().committed_epochs["m"]
    assert enc["extra"] == [] and enc["w"] == src.current_version()
    # redelivery below the watermark is still a no-op
    c.seek(1)
    v = dst.current_version()
    c.drain(mirror_into_table(dst, "m"))
    assert dst.current_version() == v
    assert sorted(r["url"] for r in dst.read().collect()) == [f"u{i}" for i in range(6)]


def test_drain_snapshots_head_once(spark, tmpdir_path):
    """drain() must terminate against a producer that commits during the
    drain: it processes up to the head observed at start, leaving newer
    versions for the next call."""
    src = LakeTable.create(spark, os.path.join(tmpdir_path, "src"), WEB_PAGES, key="url", n_buckets=2)
    for i in range(3):
        src.merge_cdc(_delta(spark, [_row(f"u{i}", 1, i + 1)]), epoch_id=i)
    c = ChangeFeedConsumer(spark, src.path, "live", with_internal=True)
    produced = iter(range(100, 106))

    def fn_and_produce(df, f, t_):
        # a concurrent producer lands one more version during every batch
        i = next(produced)
        src.merge_cdc(_delta(spark, [_row(f"w{i}", 1, i)]), epoch_id=i)

    res = c.drain(fn_and_produce, max_versions_per_batch=1)
    assert res["to_version"] == 4  # the head at drain start (create + 3)
    assert c.position() == 4
    assert c.pending()[1] > 4  # newer commits remain for the next drain


def test_mirror_propagates_schema_evolution(spark, tmpdir_path):
    """A source-side additive column flows through the feed into the mirror
    (null-backfilled for pre-evolution mirror rows)."""
    from pyspark.sql import functions as F

    src = LakeTable.create(spark, os.path.join(tmpdir_path, "src"), WEB_PAGES, key="url", n_buckets=2)
    dst = LakeTable.create(spark, os.path.join(tmpdir_path, "dst"), WEB_PAGES, key="url", n_buckets=2)
    c = ChangeFeedConsumer(spark, src.path, "evo", with_internal=True)
    src.merge_cdc(_delta(spark, [_row("old", 1, 1)]), epoch_id=0)
    c.drain(mirror_into_table(dst, "evo"))
    evolved = _delta(spark, [_row("new", 2, 2)]).withColumn("charset", F.lit("utf-8"))
    src.merge_cdc(evolved, epoch_id=1)
    c.drain(mirror_into_table(dst, "evo"))
    got = {r["url"]: r["charset"] for r in dst.read().collect()}
    assert got == {"old": None, "new": "utf-8"}
    assert "charset" in dst.read().columns
