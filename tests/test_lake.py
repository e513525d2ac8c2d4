"""Lake table format unit tests: atomic commits, merge semantics, schema
evolution, bucket pruning, concurrent commit safety, compaction."""

from __future__ import annotations

import os
import threading
from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def test_merge_last_writer_wins_and_delete(spark, tmpdir_path):
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=4)
    t.merge_cdc(_delta(spark, [_row("a", 1, 1), _row("b", 1, 2)]), epoch_id=0)
    t.merge_cdc(
        _delta(spark, [_row("a", 5, 3, text="newer"), _row("b", 2, 4, deleted=True)]), epoch_id=1
    )
    # out-of-order late event for a: older ts must NOT win
    t.merge_cdc(_delta(spark, [_row("a", 3, 5, text="late-old")]), epoch_id=2)
    got = {r["url"]: r["text"] for r in t.read().collect()}
    assert got == {"a": "newer"}


def test_epoch_idempotency(spark, tmpdir_path):
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=4)
    t.merge_cdc(_delta(spark, [_row("a", 1, 1)]), epoch_id=7)
    res = t.merge_cdc(_delta(spark, [_row("a", 9, 9, text="dup-replay")]), epoch_id=7)
    assert res["skipped"] is True
    assert [r["text"] for r in t.read().collect()] == ["t"]


def test_schema_evolution_null_backfill(spark, tmpdir_path):
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=4)
    t.merge_cdc(_delta(spark, [_row("old", 1, 1)]), epoch_id=0)
    evolved = _delta(spark, [_row("new", 2, 2)]).withColumn("charset", F.lit("utf-8"))
    t.merge_cdc(evolved, epoch_id=1)
    got = {r["url"]: r["charset"] for r in t.read().collect()}
    assert got == {"old": None, "new": "utf-8"}
    # old files untouched on disk; backfill happens at read
    assert "charset" in [f.name for f in t.snapshot().schema().fields]


def test_bucket_pruning_reads_subset(spark, tmpdir_path):
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=8)
    rows = [_row(f"u{i}", 1, i) for i in range(50)]
    t.merge_cdc(_delta(spark, rows), epoch_id=0)
    full = t.read().count()
    one_bucket = t.read(buckets=[3]).count()
    assert 0 < one_bucket < full
    # pruning happens in the manifest: fewer files are even listed
    snap = t.snapshot()
    assert len([f for f in snap.files if f["bucket"] == 3]) < len(snap.files)


def test_concurrent_commits_all_land(spark, tmpdir_path):
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=4)
    errs = []

    def worker(i):
        try:
            t.merge_cdc(_delta(spark, [_row(f"w{i}", 1, i)]), epoch_id=100 + i, source=f"s{i}")
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    [th.start() for th in threads]
    [th.join() for th in threads]
    assert not errs
    assert t.read().count() == 6
    assert t.current_version() == 7  # 1 create + 6 commits, no lost updates


def test_compact_retains_tombstones_and_preserves_state(spark, tmpdir_path):
    """Compaction keeps winning tombstones (round-2 fix): a late event OLDER
    than the tombstone must still lose after compaction; only a delivery
    watermark above the tombstone reclaims it."""
    from datetime import datetime

    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=4)
    t.merge_cdc(_delta(spark, [_row("a", 1, 1), _row("b", 1, 2)]), epoch_id=0)
    t.merge_cdc(_delta(spark, [_row("b", 5, 3, deleted=True)]), epoch_id=1)
    before = sorted(r["url"] for r in t.read().collect())
    res = t.compact()
    assert res["skipped"] is False
    after = sorted(r["url"] for r in t.read().collect())
    assert before == after == ["a"]
    assert all(f["kind"] == "base" for f in t.snapshot().files)
    # the tombstone survived the rewrite (read() filters it; probe raw files)
    def _raw(tbl):
        snap = tbl.snapshot()
        return tbl._read_files(snap, snap.files, with_internal=True)

    assert _raw(t).filter(F.col("url") == "b").count() == 1
    # ...so an out-of-order redelivery OLDER than the tombstone still loses
    # (with the tombstone dropped this resurrected "b" — hypothesis-found bug)
    t.merge_cdc(_delta(spark, [_row("b", 2, 1, text="stale")]), epoch_id=2)
    assert sorted(r["url"] for r in t.read().collect()) == ["a"]

    # a delivery watermark ABOVE the tombstone's (warc_ts, lsn) reclaims it
    t.compact(tombstone_watermark=(datetime(2024, 1, 1, 0, 0, 59), 0))
    assert _raw(t).filter(F.col("url") == "b").count() == 0
    assert sorted(r["url"] for r in t.read().collect()) == ["a"]
    # a watermark BELOW a tombstone keeps it
    t.merge_cdc(_delta(spark, [_row("a", 9, 9, deleted=True)]), epoch_id=3)
    t.compact(tombstone_watermark=(datetime(2024, 1, 1, 0, 0, 5), 0))
    assert _raw(t).filter(F.col("url") == "a").count() == 1
    assert t.read().count() == 0


def test_append_table_no_key(spark, tmpdir_path):
    schema = T.StructType([T.StructField("x", T.LongType())])
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), schema)
    t.append(spark.range(5).select(F.col("id").alias("x")), epoch_id=0)
    t.append(spark.range(3).select(F.col("id").alias("x")), epoch_id=1)
    assert t.read().count() == 8
    # append is epoch-guarded too
    t.append(spark.range(100).select(F.col("id").alias("x")), epoch_id=1)
    assert t.read().count() == 8


def test_time_travel_read_by_version(spark, tmpdir_path):
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=4)
    t.merge_cdc(_delta(spark, [_row("a", 1, 1)]), epoch_id=0)
    v1 = t.current_version()
    t.merge_cdc(_delta(spark, [_row("b", 2, 2)]), epoch_id=1)
    assert t.read(version=v1).count() == 1
    assert t.read().count() == 2


def test_crash_before_commit_leaves_no_trace(spark, tmpdir_path):
    """Staged files without a snapshot link are invisible (atomic commit)."""
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=4)
    t.merge_cdc(_delta(spark, [_row("a", 1, 1)]), epoch_id=0)
    snap = t.snapshot()
    # simulate a crashed writer: stage files but never commit
    out = t._align(_delta(spark, [_row("ghost", 9, 9)]), snap.schema())
    t._stage_files(out.withColumn("_b", F.lit(0)), snap, 99, bucketed=True)
    assert sorted(r["url"] for r in t.read().collect()) == ["a"]


def test_epoch_encoding_compact_and_correct(spark, tmpdir_path):
    from data_exchange_routing_spark.lake.table import _dec_epochs, _enc_epochs

    s = {0, 1, 2, 3, 7, 9}
    enc = _enc_epochs(s)
    assert enc == {"w": 3, "extra": [7, 9]}
    assert _dec_epochs(enc) == s
    assert _dec_epochs([1, 2]) == {1, 2}  # legacy list form
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=2)
    for e in range(5):
        t.merge_cdc(_delta(spark, [_row(f"u{e}", 1, e)]), epoch_id=e)
    snap = t.snapshot()
    assert snap.committed_epochs["default"] == {"w": 4, "extra": []}
    assert t.committed_epochs() == {0, 1, 2, 3, 4}


def test_expire_and_vacuum(spark, tmpdir_path):
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=2)
    for e in range(4):
        t.merge_cdc(_delta(spark, [_row(f"u{e}", 1, e)]), epoch_id=e)
    t.compact()  # deltas now unreferenced by the newest snapshot
    state_before = sorted(r["url"] for r in t.read().collect())
    res = t.expire_snapshots(keep_last=1)
    assert len(res["removed_snapshots"]) >= 4
    vac = t.vacuum_orphans()
    assert vac["removed_files"] > 0
    assert sorted(r["url"] for r in t.read().collect()) == state_before
    # epoch guards survive expiry
    skip = t.merge_cdc(_delta(spark, [_row("dup", 9, 99)]), epoch_id=2)
    assert skip["skipped"] is True


def test_read_changes_incremental_feed(spark, tmpdir_path):
    import datetime as dt

    from pyspark.sql import types as T

    from data_exchange_routing_spark.lake.table import LakeTable

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("v", T.IntegerType(), True),
        ]
    )
    t = LakeTable.create(spark, tmpdir_path + "/t", schema, key="url", n_buckets=4)
    ts = dt.datetime(2024, 1, 1)

    def delta(rows, epoch):
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, v int, _lsn long, _deleted boolean")
        return t.merge_cdc(df, epoch_id=epoch, source="cdc")

    v0 = t.snapshot().version
    delta([("a", ts, 1, 1, False), ("b", ts, 1, 2, False)], 0)
    v1 = t.snapshot().version
    delta([("a", ts + dt.timedelta(1), 2, 3, False), ("b", ts + dt.timedelta(1), None, 4, True)], 1)
    v2 = t.snapshot().version

    c01 = t.read_changes(v0, v1)
    assert sorted((r["url"], r["_change_type"]) for r in c01.collect()) == [
        ("a", "upsert"), ("b", "upsert"),
    ]
    c12 = t.read_changes(v1, v2)
    assert sorted((r["url"], r["_change_type"]) for r in c12.collect()) == [
        ("a", "upsert"), ("b", "delete"),
    ]
    # full range = union of both commits
    assert t.read_changes(v0).count() == 4
    # change feed carries no internal columns
    assert not {c for c in c12.columns if c.startswith("_")} - {"_change_type"}


def test_rollback_restores_state_and_epoch_guard(spark, tmpdir_path):
    import datetime as dt

    from pyspark.sql import types as T

    from data_exchange_routing_spark.lake.table import LakeTable

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
        ]
    )
    t = LakeTable.create(spark, tmpdir_path + "/t", schema, key="url", n_buckets=4)
    ts = dt.datetime(2024, 1, 1)

    def delta(rows, epoch):
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, _lsn long, _deleted boolean")
        return t.merge_cdc(df, epoch_id=epoch, source="cdc")

    delta([("a", ts, 1, False)], 0)
    v_good = t.snapshot().version
    delta([("a", ts + dt.timedelta(1), 2, True), ("c", ts, 3, False)], 1)
    assert sorted(r["url"] for r in t.read().collect()) == ["c"]

    res = t.rollback(v_good)
    assert res["rolled_back_to"] == v_good
    assert sorted(r["url"] for r in t.read().collect()) == ["a"]
    # epoch guard rewound: epoch 1 re-applies (is NOT skipped)
    out = delta([("a", ts + dt.timedelta(1), 2, True), ("c", ts, 3, False)], 1)
    assert not out.get("skipped")
    assert sorted(r["url"] for r in t.read().collect()) == ["c"]
    # history preserved: time travel to the pre-rollback version still works
    assert t.read(version=v_good).count() == 1


def test_partial_bucket_compaction(spark, tmpdir_path):
    import datetime as dt

    from pyspark.sql import types as T

    from data_exchange_routing_spark.lake.table import LakeTable

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("v", T.IntegerType(), True),
        ]
    )
    t = LakeTable.create(spark, tmpdir_path + "/t", schema, key="url", n_buckets=4)
    ts = dt.datetime(2024, 1, 1)
    urls = [f"u{i}" for i in range(40)]
    for epoch in range(3):
        rows = [(u, ts + dt.timedelta(days=epoch), epoch, epoch * 100 + i, False) for i, u in enumerate(urls)]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, v int, _lsn long, _deleted boolean")
        t.merge_cdc(df, epoch_id=epoch, source="cdc")

    before = {(r["url"], r["v"]) for r in t.read().collect()}
    stats = t.bucket_delta_stats()
    assert sum(s["n_delta_files"] for s in stats.values()) > 0

    # compact only the two worst buckets
    worst = sorted(stats, key=lambda b: -stats[b]["delta_rows"])[:2]
    res = t.compact(buckets=worst)
    assert not res.get("skipped")
    after_stats = t.bucket_delta_stats()
    for b in worst:
        assert after_stats[b]["n_delta_files"] == 0 and after_stats[b]["n_base_files"] > 0
    untouched = set(stats) - set(worst)
    for b in untouched:
        assert after_stats[b] == stats[b]
    # state identical after partial compaction
    assert {(r["url"], r["v"]) for r in t.read().collect()} == before
    # and the remaining buckets compact too
    t.compact(buckets=sorted(untouched))
    assert {(r["url"], r["v"]) for r in t.read().collect()} == before
    assert all(s["n_delta_files"] == 0 for s in t.bucket_delta_stats().values())


def test_point_read_prunes_and_matches(spark, tmpdir_path):
    import datetime as dt

    from pyspark.sql import types as T

    from data_exchange_routing_spark.lake.table import LakeTable

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("v", T.IntegerType(), True),
        ]
    )
    t = LakeTable.create(spark, tmpdir_path + "/t", schema, key="url", n_buckets=8)
    ts = dt.datetime(2024, 1, 1)
    for epoch in range(2):
        rows = [
            (f"u{i}", ts + dt.timedelta(days=epoch), epoch, epoch * 1000 + i, False)
            for i in range(100)
        ]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, v int, _lsn long, _deleted boolean")
        t.merge_cdc(df, epoch_id=epoch, source="cdc")

    got = t.point_read("u42").collect()
    assert len(got) == 1 and got[0]["v"] == 1  # latest version wins
    assert t.point_read("no-such-url").count() == 0
    # the key predicate reaches the parquet scan
    plan = t.point_read("u42")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "url" in plan.split("PushedFilters", 1)[1][:200]


def test_delete_where_and_history(spark, tmpdir_path):
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from data_exchange_routing_spark.lake.table import LakeTable

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("v", T.IntegerType(), True),
        ]
    )
    t = LakeTable.create(spark, tmpdir_path + "/t", schema, key="url", n_buckets=4)
    ts = dt.datetime(2024, 1, 1)
    rows = [(f"https://{'bad' if i % 3 == 0 else 'ok'}.example/{i}", ts, i, i, False) for i in range(30)]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, v int, _lsn long, _deleted boolean")
    t.merge_cdc(df, epoch_id=0, source="cdc")

    res = t.delete_where(F.col("url").startswith("https://bad."), lsn=10_000, epoch_id=0)
    assert not res.get("skipped")
    left = [r["url"] for r in t.read().collect()]
    assert len(left) == 20 and all(u.startswith("https://ok.") for u in left)
    # delete is idempotent under its epoch guard
    again = t.delete_where(F.col("url").startswith("https://bad."), lsn=10_001, epoch_id=0)
    assert again.get("skipped")
    # physical reclaim on compaction; state unchanged
    t.compact()
    assert t.read().count() == 20

    ops = [h["operation"] for h in t.history()]
    assert ops[0] is None or ops[0] in ("create",)  # initial snapshot
    assert "merge-on-read-delta" in str(ops) or "compact" in ops  # ops recorded
    versions = [h["version"] for h in t.history()]
    assert versions == sorted(versions)


def _commit_unbucketed(spark, t, rows, epoch):
    """Simulate a legacy unbucketed (-1) delta file on a keyed table: stage a
    parquet file directly and commit it with bucket=-1 metadata (the shape
    append_rows used to produce before it was blocked on keyed tables)."""
    import uuid

    snap = t.snapshot()
    aligned = t._align(_delta(spark, rows), snap.schema())
    rel = os.path.join("data", f"legacy-{uuid.uuid4().hex[:8]}")
    out = os.path.join(t.path, rel)
    aligned.repartition(1).write.parquet(out)
    entries = []
    for root, _dirs, names in os.walk(out):
        for name in names:
            if name.endswith(".parquet"):
                entries.append(
                    {
                        "path": os.path.relpath(os.path.join(root, name), t.path),
                        "bucket": -1,
                        "kind": "delta",
                        "rows": len(rows),
                    }
                )
    return t.commit_staged_files(entries, snap.schema(), epoch_id=epoch, source="legacy")


def test_unbucketed_files_survive_pruned_reads(spark, tmpdir_path):
    """ADVICE r01 (medium): bucket==-1 files must be visible to bucket-pruned
    reads and point_read, and a full compact must reclaim them exactly once."""
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=4)
    t.merge_cdc(_delta(spark, [_row(f"u{i}", 1, i) for i in range(20)]), epoch_id=0)
    _commit_unbucketed(spark, t, [_row("legacy-row", 2, 1000, text="from-minus1")], 1)

    # point_read goes through bucket pruning — it must still find the -1 row
    got = t.point_read("legacy-row").collect()
    assert len(got) == 1 and got[0]["text"] == "from-minus1"
    # explicit bucket-filtered reads see it too (for every bucket choice)
    assert any(
        r["url"] == "legacy-row" for r in t.read(buckets=[0, 1, 2, 3]).collect()
    )
    before = sorted(r["url"] for r in t.read().collect())

    # full compact folds the -1 file into real buckets, no duplication
    res = t.compact()
    assert not res.get("skipped")
    snap = t.snapshot()
    assert all(f["bucket"] != -1 for f in snap.files)
    assert sorted(r["url"] for r in t.read().collect()) == before
    assert t.read().filter(F.col("url") == "legacy-row").count() == 1


def test_selective_compact_with_stray_unbucketed_file(spark, tmpdir_path):
    """A newer tombstone in a bucket file + an older live row in a -1 file:
    selective compaction of that bucket must not resurrect the key."""
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=4)
    _commit_unbucketed(spark, t, [_row("k", 1, 1, text="old-live")], 0)
    t.merge_cdc(_delta(spark, [_row("k", 5, 2, deleted=True)]), epoch_id=1)
    t.merge_cdc(_delta(spark, [_row("other", 1, 3)]), epoch_id=2)
    assert sorted(r["url"] for r in t.read().collect()) == ["other"]

    for b in range(4):
        t.compact(buckets=[b])
    # -1 delta is still referenced (selective compacts leave it in place)...
    assert any(f["bucket"] == -1 for f in t.snapshot().files)
    # ...and the tombstone still beats the old -1 live row
    assert sorted(r["url"] for r in t.read().collect()) == ["other"]
    # full compact reclaims everything
    t.compact()
    assert all(f["bucket"] != -1 for f in t.snapshot().files)
    assert sorted(r["url"] for r in t.read().collect()) == ["other"]


def test_keyed_table_blocks_unbucketed_appends(spark, tmpdir_path):
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=4)
    with pytest.raises(ValueError, match="merge_cdc"):
        t.append(_delta(spark, [_row("a", 1, 1)]))
    with pytest.raises(ValueError, match="merge_cdc"):
        t.append_rows([("x",)], T.StructType([T.StructField("url", T.StringType())]))


def test_delete_where_stale_lsn_still_wins(spark, tmpdir_path):
    """ADVICE r01: a stale caller lsn must not make the delete silently no-op;
    the tombstone lsn is derived per-row from the victim's current _lsn."""
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=4)
    t.merge_cdc(_delta(spark, [_row("a", 1, 500), _row("b", 1, 600)]), epoch_id=0)
    # stale lsn=1 (far below the rows' 500/600) — would have lost before
    res = t.delete_where(F.col("url") == "a", lsn=1, epoch_id=1)
    assert not res.get("skipped")
    assert sorted(r["url"] for r in t.read().collect()) == ["b"]
    # lsn omitted entirely — derived floor alone
    t.delete_where(F.col("url") == "b", epoch_id=2)
    assert t.read().count() == 0


def test_manifest_segmentation_rolls_and_stays_correct(spark, tmpdir_path, monkeypatch):
    """VERDICT r01 item 5: snapshots must not rewrite the whole file list per
    commit. Past TAIL_MAX entries the inline tail rolls into an immutable
    segment file (and segments merge past SEG_MAX); reads, time travel,
    epoch guards, compaction and expiry all see the identical file set."""
    import json as _json

    from data_exchange_routing_spark.lake import table as tbl

    monkeypatch.setattr(tbl, "TAIL_MAX", 8)
    monkeypatch.setattr(tbl, "SEG_MAX", 3)
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=4)
    n_commits = 30
    for e in range(n_commits):
        t.merge_cdc(_delta(spark, [_row(f"u{i}", 1, e * 100 + i) for i in range(e % 3 + 1)]), epoch_id=e)
    snap = t.snapshot()
    assert snap.segments, "tail never rolled into a segment"
    with open(os.path.join(t.meta_dir, f"snapshot-{snap.version:08d}.json")) as f:
        d = _json.load(f)
    assert len(d["tail"]) <= 8  # inline part bounded
    assert d["n_files"] == len(snap.files) > 8
    # the merge policy also ran (many rolls, few refs)
    assert len(snap.segments) <= 4
    # state correct across rolls/merges
    assert t.read().count() == len({f"u{i}" for e in range(n_commits) for i in range(e % 3 + 1)})
    # epoch guard still intact
    assert t.merge_cdc(_delta(spark, [_row("dup", 9, 9)]), epoch_id=0)["skipped"]
    # compaction collapses the manifest and preserves state
    before = sorted(r["url"] for r in t.read().collect())
    t.compact()
    assert sorted(r["url"] for r in t.read().collect()) == before
    # expire GCs unreferenced segment manifests
    res = t.expire_snapshots(keep_last=1)
    assert res["removed_segments"] >= 1
    assert sorted(r["url"] for r in t.read().collect()) == before


def test_zorder_compaction_improves_rowgroup_skipping(spark, tmpdir_path):
    """compact(cluster_by=[ts, v]) must z-order rows inside each bucket so a
    range predicate on EITHER dimension overlaps fewer parquet row groups
    than the default key-clustered layout — measured from the real footer
    min/max stats — while the resolved state stays identical."""
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("v", T.IntegerType(), True),
        ]
    )
    import datetime as dt

    # INT96 (legacy default) timestamps carry no row-group stats; micros do
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), schema, key="url", n_buckets=2)
    base = dt.datetime(2024, 1, 1)
    # v deliberately uncorrelated with both url and time
    rows = [
        (f"u{i}", base + dt.timedelta(minutes=i % 977), (i * 7919) % 10000, i, False)
        for i in range(40000)
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, v int, _lsn long, _deleted boolean")
    t.merge_cdc(df, epoch_id=0, source="cdc")
    before = t.read().count()
    small_rg = {"parquet.block.size": str(48 * 1024)}

    def overlap_fraction() -> float:
        snap = t.snapshot()
        total = hit = 0
        for f in snap.files:
            md = pq.ParquetFile(os.path.join(t.path, f["path"])).metadata
            vi = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == "v"
            )
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(vi).statistics
                total += 1
                if s.min <= 5200 and s.max >= 4800:  # narrow v-band predicate
                    hit += 1
        assert total >= 16, f"need many row groups to measure skipping, got {total}"
        return hit / total

    t.compact(write_options=small_rg)  # key-clustered baseline
    frac_key = overlap_fraction()
    t.compact(cluster_by=["warc_ts", "v"], write_options=small_rg)
    frac_z = overlap_fraction()
    assert t.read().count() == before
    assert frac_z < 0.6 * frac_key, f"z-order did not prune: {frac_z:.2f} vs {frac_key:.2f}"
    # and time-range predicates still prune too (z-order serves BOTH dims)
    snap = t.snapshot()
    ts_hit = ts_total = 0
    lo = base + dt.timedelta(minutes=100)
    hi = base + dt.timedelta(minutes=200)
    for f in snap.files:
        md = pq.ParquetFile(os.path.join(t.path, f["path"])).metadata
        ti = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "warc_ts"
        )
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(ti).statistics
            ts_total += 1
            smin = s.min.replace(tzinfo=None) if s.min.tzinfo else s.min
            smax = s.max.replace(tzinfo=None) if s.max.tzinfo else s.max
            if smin <= hi and smax >= lo:
                ts_hit += 1
    assert ts_hit < ts_total  # some groups skipped on the time dimension too




# ---- property-based lake state machine -----------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_merge_row = st.tuples(
    st.integers(0, 7),      # url id (small domain -> plenty of key collisions)
    st.integers(0, 20),     # ts offset hours (ties + out-of-order arrivals)
    st.integers(0, 50),     # lsn (ties broken by (ts, lsn))
    st.integers(0, 99),     # value
    st.booleans(),          # tombstone
)
_op = st.one_of(
    st.tuples(st.just("merge"), st.lists(_merge_row, min_size=1, max_size=6)),
    st.tuples(st.just("compact_full")),
    st.tuples(st.just("compact_buckets"), st.sets(st.integers(0, 3), min_size=1, max_size=2)),
    st.tuples(st.just("rollback"), st.integers(0, 100)),
)
settings_lake = lambda f: settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)(given(ops=st.lists(_op, min_size=3, max_size=10))(f))


@settings_lake
def test_lake_random_operation_sequences_match_oracle(spark, tmp_path_factory, ops):
    """Property test: any interleaving of CDC merges (with out-of-order
    timestamps, duplicate lsns across epochs, tombstones), full/selective
    compactions and rollbacks must leave read() equal to a pure-Python
    last-writer-wins oracle replay of the same committed operations."""
    import datetime as dt

    tmpdir = str(tmp_path_factory.mktemp("lakeprop"))
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("v", T.IntegerType(), True),
        ]
    )
    t = LakeTable.create(spark, os.path.join(tmpdir, "t"), schema, key="url", n_buckets=4)
    base = dt.datetime(2024, 1, 1)

    oracle: dict[str, tuple] = {}  # url -> (ts, lsn, v, deleted)
    history: list[tuple[int, dict]] = [(t.current_version(), dict(oracle))]
    epoch = 0
    for op in ops:
        kind = op[0]
        if kind == "merge":
            rows = []
            per_key: dict[str, tuple] = {}
            for url_i, ts_off, lsn, v, deleted in op[1]:
                url = f"u{url_i}"
                ts = base + dt.timedelta(hours=ts_off)
                rec = (ts, lsn, v, deleted)
                # delta contract: one row per key per epoch (pre-deduped);
                # keep the CDC-greatest row like dedup_last_writer would
                cur = per_key.get(url)
                if cur is None or (rec[0], rec[1]) > (cur[0], cur[1]):
                    per_key[url] = rec
            for url, (ts, lsn, v, deleted) in per_key.items():
                rows.append((url, ts, v, lsn, deleted))
            df = spark.createDataFrame(
                rows, "url string, warc_ts timestamp, v int, _lsn long, _deleted boolean"
            )
            t.merge_cdc(df, epoch_id=epoch, source="prop")
            epoch += 1
            for url, (ts, lsn, v, deleted) in per_key.items():
                cur = oracle.get(url)
                if cur is None or (ts, lsn) > (cur[0], cur[1]):
                    oracle[url] = (ts, lsn, v, deleted)
            history.append((t.current_version(), dict(oracle)))
        elif kind == "compact_full":
            t.compact()
            history.append((t.current_version(), dict(oracle)))
        elif kind == "compact_buckets":
            t.compact(buckets=list(op[1]))
            history.append((t.current_version(), dict(oracle)))
        elif kind == "rollback":
            idx = op[1] % len(history)
            version, state = history[idx]
            t.rollback(version)
            oracle = dict(state)
            history.append((t.current_version(), dict(oracle)))

    got = {
        r["url"]: (r["warc_ts"], r["v"]) for r in t.read().collect()
    }
    exp = {
        url: (ts, v) for url, (ts, lsn, v, deleted) in oracle.items() if not deleted
    }
    assert got == exp


def test_broadcast_resolve_equals_window_resolve_and_skips_base_shuffle(spark, tmpdir_path):
    """Steady-state MOR read: with a compacted base + small deltas, read()
    must (a) return exactly what the full-window plan returns — updates,
    inserts, deletes, out-of-order revisions — and (b) never shuffle the
    untouched base rows (they flow through a broadcast anti join)."""
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=4)
    t.merge_cdc(_delta(spark, [_row(f"u{i}", 1, i) for i in range(30)]), epoch_id=0)
    t.compact()  # -> base files, one row per key
    # deltas: update u1, delete u2, insert new key, stale out-of-order for u3
    t.merge_cdc(
        _delta(spark, [_row("u1", 7, 100, text="v2"), _row("u2", 7, 101, deleted=True)]),
        epoch_id=1,
    )
    t.merge_cdc(
        _delta(spark, [_row("brand-new", 2, 102, text="n"), _row("u3", 0, 0, text="stale")]),
        epoch_id=2,
    )

    fast = t.read()
    plan = fast._jdf.queryExecution().executedPlan().toString()
    # merge branch: ONE full-width base scan folded with the broadcast delta
    # winners — everything above the BroadcastExchange (union, project, the
    # LeftOuter BHJ, the base FileScan) runs with NO exchange, so the full
    # table rows never shuffle
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    merge_branch = plan[: plan.index("BroadcastExchange")]
    assert "FileScan parquet" in merge_branch and "html" in merge_branch
    assert "Exchange" not in merge_branch
    # the fresh-keys anti join probes base by its KEY COLUMN ONLY (narrow
    # scan; the only base bytes that ever reach an exchange)
    anti = plan[plan.index("LeftAnti"):]
    assert any("ReadSchema: struct<url:string>" in l for l in anti.splitlines())

    expected = {("u1", "v2"), ("brand-new", "n")} | {
        (f"u{i}", "t") for i in range(30) if i not in (1, 2)
    }
    got_fast = {(r["url"], r["text"]) for r in fast.collect()}
    assert got_fast == expected

    # exact agreement with the full-window plan (forced via the threshold)
    old = LakeTable.RESOLVE_BROADCAST_MAX_DELTA_ROWS
    try:
        LakeTable.RESOLVE_BROADCAST_MAX_DELTA_ROWS = -1
        slow = t.read()
        assert "LeftAnti" not in slow._jdf.queryExecution().executedPlan().toString()
        assert {(r["url"], r["text"]) for r in slow.collect()} == got_fast
    finally:
        LakeTable.RESOLVE_BROADCAST_MAX_DELTA_ROWS = old

    # bucket-pruned reads use the same split safely
    b = t.snapshot()
    some_bucket = next(f["bucket"] for f in b.files if f["kind"] == "base")
    pruned = t.read(buckets=[some_bucket]).collect()
    assert {(r["url"], r["text"]) for r in pruned} <= expected


def test_compact_deltas_folds_logs_without_touching_base(spark, tmpdir_path):
    """Minor compaction: per-bucket delta winner survives, base files keep
    their exact paths, state is unchanged, tombstones keep beating
    out-of-order redeliveries, and the change feed still reconstructs."""
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=2)
    t.merge_cdc(_delta(spark, [_row(f"u{i}", 1, i) for i in range(12)]), epoch_id=0)
    t.compact()
    base_before = sorted(f["path"] for f in t.snapshot().files if f["kind"] == "base")
    v_before_deltas = t.current_version()
    # several small delta epochs: supersede u1 twice, delete u2, insert new
    t.merge_cdc(_delta(spark, [_row("u1", 3, 100, text="mid")]), epoch_id=1)
    t.merge_cdc(_delta(spark, [_row("u1", 7, 101, text="v2"), _row("u2", 7, 102, deleted=True)]), epoch_id=2)
    t.merge_cdc(_delta(spark, [_row("new", 2, 103, text="n")]), epoch_id=3)
    before_counts: dict = {}
    for f in t.snapshot().files:
        if f["kind"] == "delta":
            before_counts[f["bucket"]] = before_counts.get(f["bucket"], 0) + 1
    foldable = sum(n for n in before_counts.values() if n >= 2)
    assert foldable > 2
    single_file_paths = {
        f["path"]
        for f in t.snapshot().files
        if f["kind"] == "delta" and before_counts[f["bucket"]] == 1
    }
    state = sorted((r["url"], r["text"]) for r in t.read().select("url", "text").collect())

    res = t.compact_deltas()
    # only multi-file buckets fold; a bucket already at one file keeps its
    # exact file (no pointless rewrite under repeated maintenance cycles)
    assert res["skipped"] is False and res["folded_files"] == foldable
    snap = t.snapshot()
    per_bucket = {}
    for f in snap.files:
        if f["kind"] == "delta":
            per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    assert per_bucket and all(v == 1 for v in per_bucket.values())
    assert single_file_paths <= {f["path"] for f in snap.files}
    assert sorted(f["path"] for f in snap.files if f["kind"] == "base") == base_before
    assert sorted((r["url"], r["text"]) for r in t.read().select("url", "text").collect()) == state

    # idempotent: nothing left to fold (1 delta file per bucket)
    assert t.compact_deltas()["skipped"] is True

    # the folded winner still includes the tombstone: an OLDER redelivery of
    # u2 must lose after the fold
    t.merge_cdc(_delta(spark, [_row("u2", 2, 1, text="stale")]), epoch_id=4)
    assert "u2" not in {r["url"] for r in t.read().collect()}
    # epoch guards survive; change feed across the fold stays reconstructible
    assert t.merge_cdc(_delta(spark, [_row("zz", 9, 999)]), epoch_id=2)["skipped"] is True
    feed = t.read_changes(v_before_deltas).collect()
    assert {r["url"] for r in feed} == {"u1", "u2", "new"}
    # exactly the original deltas + the post-fold stale redelivery — the
    # folded winners are data, not changes (no duplicate delivery)
    assert len(feed) == 5


def test_rebucket_evolves_layout_preserving_state_and_guards(spark, tmpdir_path):
    """Bucket-count evolution: state identical, tombstones survive, future
    merges + point reads use the new layout, epoch guards carry over."""
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=2)
    t.merge_cdc(_delta(spark, [_row(f"u{i}", 1, i) for i in range(20)]), epoch_id=0)
    t.merge_cdc(_delta(spark, [_row("u3", 5, 100, deleted=True)]), epoch_id=1)
    before = sorted(r["url"] for r in t.read().collect())

    res = t.rebucket(8)
    assert res["skipped"] is False and res["n_buckets"] == 8
    assert sorted(r["url"] for r in t.read().collect()) == before
    snap = t.snapshot()
    assert snap.n_buckets == 8
    # files actually span the new bucket space, all base, no -1 strays
    got_buckets = {f["bucket"] for f in snap.files}
    assert got_buckets <= set(range(8)) and len(got_buckets) > 2
    assert all(f["kind"] == "base" for f in snap.files)
    # the winning tombstone survived the rewrite: an older redelivery of u3
    # must still lose after the migration
    t.merge_cdc(_delta(spark, [_row("u3", 2, 1, text="stale")]), epoch_id=2)
    assert sorted(r["url"] for r in t.read().collect()) == before
    # epoch guard carried over: redelivering epoch 0 is a no-op
    assert t.merge_cdc(_delta(spark, [_row("zzz", 9, 999)]), epoch_id=0)["skipped"] is True
    # point read computes the bucket from the NEW snapshot
    assert t.point_read("u7").count() == 1
    # no-op / idempotent call shape
    assert t.rebucket(8)["skipped"] is True
    # selective compaction over the new bucket ids still works
    t.merge_cdc(_delta(spark, [_row("u7", 9, 200, text="v2")]), epoch_id=3)
    worst = [b for b, s in t.bucket_delta_stats().items() if s["n_delta_files"] and b >= 0]
    assert t.compact(buckets=worst)["skipped"] is False
    assert {r["url"]: r["text"] for r in t.read().collect()}["u7"] == "v2"


def test_point_read_prunes_files_by_key_range(spark, tmpdir_path):
    """Manifest entries record the merge-key min/max from parquet footers;
    point_read must skip files in the key's bucket whose range cannot
    contain the key (observed via DataFrame.inputFiles), and still return
    the exact resolved row."""
    import datetime as dt

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("v", T.IntegerType(), True),
        ]
    )
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), schema, key="url", n_buckets=2)
    ts = dt.datetime(2024, 1, 1)
    # many commits, each covering a narrow disjoint key range -> files with
    # narrow [key_min, key_max] windows inside each bucket
    for epoch in range(8):
        rows = [
            (f"k{epoch:02d}{i:03d}", ts + dt.timedelta(hours=epoch), epoch * 1000 + i, epoch * 1000 + i, False)
            for i in range(50)
        ]
        df = spark.createDataFrame(rows, "url string, warc_ts timestamp, v int, _lsn long, _deleted boolean")
        t.merge_cdc(df, epoch_id=epoch, source="cdc")
    snap = t.snapshot()
    assert all("key_min" in f and "key_max" in f for f in snap.files)

    key = "k03007"
    got = t.point_read(key)
    rows = got.collect()
    assert len(rows) == 1 and rows[0]["v"] == 3007
    read_files = {os.path.relpath(p.replace("file:", ""), t.path) for p in got.inputFiles()}
    bucket_files = {f["path"] for f in snap.files}
    assert read_files <= bucket_files
    # pruning really happened: far fewer files read than the table holds
    # (the key's bucket holds ~8 files; its range matches only ~1)
    assert len(read_files) <= 2, f"read {len(read_files)} files: {read_files}"
    assert t.point_read("no-such-key").count() == 0


def test_broadcast_resolve_null_ts_loses_like_window(spark, tmpdir_path):
    """A NULL-warc_ts delta row must lose to a timestamped base row in BOTH
    resolve plans (window: desc NULLS LAST) — the broadcast CASE once let the
    NULL comparison hand the win to the delta."""
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_PAGES, key="url", n_buckets=2)
    t.merge_cdc(_delta(spark, [_row("a", 5, 1)]), epoch_id=0)
    t.compact()
    t.merge_cdc(
        _delta(spark, [("a", None, b"<x>", "nullts", "en", 99, False)]), epoch_id=1
    )
    assert {r["text"] for r in t.read().collect()} == {"t"}
    old = LakeTable.RESOLVE_BROADCAST_MAX_DELTA_ROWS
    try:
        LakeTable.RESOLVE_BROADCAST_MAX_DELTA_ROWS = -1
        assert {r["text"] for r in t.read().collect()} == {"t"}
    finally:
        LakeTable.RESOLVE_BROADCAST_MAX_DELTA_ROWS = old


def test_type_widening_int_to_long_float_to_double(spark, tmpdir_path):
    """Widening evolution: a batch with wider numeric types widens the table
    schema metadata-only; old INT32/FLOAT parquet files read back upcast
    (no rewrite). Narrower incoming batches cast up and never narrow back."""
    sch = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("x", T.IntegerType()),
            T.StructField("y", T.FloatType()),
        ]
    )
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "w"), sch)
    t.append(spark.createDataFrame([("a", 1, 1.5)], sch), epoch_id=0)

    wide = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("x", T.LongType()),
            T.StructField("y", T.DoubleType()),
        ]
    )
    t.append(spark.createDataFrame([("b", 2**40, 2.25)], wide), epoch_id=1)
    got = t.read()
    assert [f.dataType for f in got.schema.fields if f.name == "x"] == [T.LongType()]
    assert [f.dataType for f in got.schema.fields if f.name == "y"] == [T.DoubleType()]
    vals = {r.k: (r.x, r.y) for r in got.collect()}
    assert vals == {"a": (1, 1.5), "b": (2**40, 2.25)}

    # narrower batch after widening: values cast up, schema stays wide
    t.append(spark.createDataFrame([("c", 3, 3.5)], sch), epoch_id=2)
    got2 = t.read()
    assert [f.dataType for f in got2.schema.fields if f.name == "x"] == [T.LongType()]
    assert {r.k: r.x for r in got2.collect()} == {"a": 1, "b": 2**40, "c": 3}

    # incompatible/narrowing types never mutate the schema (string wins)
    assert t._evolved_schema(t.snapshot(), T.StructType(
        [T.StructField("k", T.IntegerType())]
    )) is None


def test_type_widening_on_staged_commit_path(spark, tmpdir_path):
    """commit_staged_files drives the same widening as a DataFrame commit."""
    sch = T.StructType([T.StructField("k", T.StringType()), T.StructField("x", T.IntegerType())])
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "s"), sch)
    t.append(spark.createDataFrame([("a", 1)], sch), epoch_id=0)
    wide = T.StructType([T.StructField("k", T.StringType()), T.StructField("x", T.LongType())])
    staged_dir = os.path.join(tmpdir_path, "staged")
    spark.createDataFrame([("b", 2**40)], wide).coalesce(1).write.parquet(staged_dir)
    pq = [os.path.join(staged_dir, f) for f in os.listdir(staged_dir) if f.endswith(".parquet")]
    t.commit_staged_files(
        [{"path": p, "rows": 1, "bucket": -1} for p in pq], wide, epoch_id=1, kind="base"
    )
    got = t.read()
    assert [f.dataType for f in got.schema.fields if f.name == "x"] == [T.LongType()]
    assert {r.k: r.x for r in got.collect()} == {"a": 1, "b": 2**40}


def test_ts_stats_pruned_time_scoped_read(spark, tmpdir_path):
    """Append-only tables record timestamp ranges in the manifest; a
    ts_filter read prunes non-overlapping files before Spark lists them and
    still returns exactly the rows in range. Keyed tables refuse."""
    sch = T.StructType(
        [T.StructField("v", T.LongType()), T.StructField("ts", T.TimestampType())]
    )
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "ts"), sch)
    for day, epoch in ((1, 0), (10, 1), (20, 2)):
        t.append(
            spark.createDataFrame(
                [(day * 100 + i, datetime(2024, 1, day, i)) for i in range(3)], sch
            ),
            epoch_id=epoch,
        )
    snap = t.snapshot()
    assert all("ts" in (f.get("ts_stats") or {}) for f in snap.files)

    lo, hi = datetime(2024, 1, 9), datetime(2024, 1, 11)
    pruned = [
        f for f in snap.files
        if f["ts_stats"]["ts"][1] >= lo.isoformat()
        and f["ts_stats"]["ts"][0] <= hi.isoformat()
    ]
    assert len(pruned) == 1  # only the day-10 file overlaps

    got = sorted(r.v for r in t.read(ts_filter=("ts", lo, hi)).collect())
    assert got == [1000, 1001, 1002]
    # open-ended bounds work
    assert t.read(ts_filter=("ts", datetime(2024, 1, 15), None)).count() == 3
    assert t.read(ts_filter=("ts", None, None)).count() == 9

    keyed = LakeTable.create(
        spark, os.path.join(tmpdir_path, "keyed"), WEB_PAGES, key="url", n_buckets=2
    )
    with pytest.raises(ValueError):
        keyed.read(ts_filter=("warc_ts", lo, hi))


def test_metadata_stats_exact_without_data_reads(spark, tmpdir_path):
    """metadata_stats answers count(*)/min/max from the manifest alone:
    exact equality vs a full scan on an append-only table, upper-bound +
    key-range semantics on a keyed table. Zero Spark jobs: the call never
    touches a data file (pure manifest fold)."""
    from datetime import datetime

    sch = T.StructType.fromDDL("v int, ts timestamp")
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "m"), sch)
    for day, epoch in ((2, 0), (12, 1), (22, 2)):
        t.append(
            spark.createDataFrame(
                [(day * 10 + i, datetime(2024, 3, day, i)) for i in range(4)], sch
            ),
            epoch_id=epoch,
        )
    before = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    stats = t.metadata_stats()
    after = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    assert list(before) == list(after)  # no Spark job ran

    df = t.read()
    assert stats["rows"] == df.count()
    lo, hi = df.agg(F.min("ts"), F.max("ts")).first()
    # footer stats are tz-aware isoformat; normalize the UTC suffix
    got_rng = tuple(s.replace("+00:00", "") for s in stats["ts_ranges"]["ts"])
    assert got_rng == (lo.isoformat(), hi.isoformat())
    assert stats["n_files"] == 3 and stats["bytes"] > 0

    keyed = LakeTable.create(
        spark, os.path.join(tmpdir_path, "mk"), WEB_PAGES, key="url", n_buckets=2
    )
    rows = spark.createDataFrame(
        [(f"u{i:02d}", datetime(2024, 3, 1), None, None, "en", i, False)
         for i in range(6)] +
        [("u00", datetime(2024, 3, 2), None, None, "en", 9, False)],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, _lsn long, _deleted boolean",
    )
    keyed.merge_cdc(rows, epoch_id=0)
    ks = keyed.metadata_stats()
    assert "rows" not in ks  # keyed: only an upper bound is honest
    assert ks["rows_upper_bound"] == 7 >= keyed.read().count() == 6
    assert ks["key_range"] == ("u00", "u05")


def test_as_of_timestamp_time_travel(spark, tmpdir_path):
    """AS OF TIMESTAMP resolves the newest snapshot committed <= ts from
    metadata alone and reads exactly that version's state."""
    import pytest as _pytest
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    t = LakeTable.create(spark, tmpdir_path, schema)
    for e in range(3):
        t.append(spark.createDataFrame([(e * 10 + i, f"e{e}") for i in range(5)], schema), epoch_id=e)
    hist = t.history()
    assert all(h["committed_at"] is not None for h in hist)
    assert [h["committed_at"] for h in hist] == sorted(h["committed_at"] for h in hist)

    # exactly at v3's commit time -> v3 (inclusive bound), i.e. epochs 0..1
    v3_ts = next(h["committed_at"] for h in hist if h["version"] == 3)
    assert t.as_of_version(v3_ts) == 3
    assert t.read(as_of=v3_ts).count() == 10
    assert {r["v"] for r in t.read(as_of=v3_ts).collect()} == {"e0", "e1"}

    # far future -> current; before the table existed -> error; both -> error
    assert t.read(as_of=v3_ts + 1e6).count() == 15
    with _pytest.raises(ValueError, match="no snapshot"):
        t.as_of_version(hist[0]["committed_at"] - 60.0)
    with _pytest.raises(ValueError, match="not both"):
        t.read(version=2, as_of=v3_ts)

    # datetime bound (naive = UTC) resolves like the float form. fromtimestamp
    # rounds to microseconds, which can land just BELOW the stored float, so
    # nudge 1 ms past the commit instant (still before the next version).
    from datetime import datetime, timezone

    dt = datetime.fromtimestamp(v3_ts + 0.001, tz=timezone.utc).replace(tzinfo=None)
    assert t.as_of_version(dt) == 3


def test_delete_eq_prunes_and_removes_only_matches(spark, tmpdir_path):
    """GDPR-style delete on an append-only table: only may-match files are
    rewritten (partition + stats pruning), result equals a relational
    anti-filter, NULLs survive, and epoch guards carry over."""
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("n", T.LongType()),
        ]
    )
    t = LakeTable.create(spark, tmpdir_path, schema)
    t.set_partition_spec([{"name": "ub", "col": "url", "transform": "bucket", "param": 4}])
    rows = [(f"u{i % 20}", datetime(2024, 1, 1 + i % 5), i) for i in range(200)]
    rows += [(None, datetime(2024, 2, 1), 1000)]
    t.append(spark.createDataFrame(rows, schema), epoch_id=0)
    total_files = len(t.snapshot().files)

    res = t.delete_eq("url", "u7")
    assert not res["skipped"]
    assert res["rows_deleted"] == 10
    assert 0 < res["files_rewritten"] < total_files  # bucket-pruned rewrite
    left = t.read()
    assert left.filter(F.col("url") == "u7").count() == 0
    assert left.count() == 191  # 201 - 10; NULL row kept
    assert left.filter(F.col("url").isNull()).count() == 1
    assert t.committed_epochs() == {0}  # guards survive the rewrite

    # idempotent second delete: nothing may match after the first
    res2 = t.delete_eq("url", "u7")
    assert res2["rows_deleted"] == 0


def test_delete_range_and_matching(spark, tmpdir_path):
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("n", T.LongType())]
    )
    t = LakeTable.create(spark, tmpdir_path, schema)
    t.set_partition_spec([{"name": "d", "col": "ts", "transform": "days"}])
    t.append(
        spark.createDataFrame(
            [(datetime(2024, 1, 1 + d, h), d * 100 + h) for d in range(5) for h in range(10)],
            schema,
        ),
        epoch_id=0,
    )
    res = t.delete_range("ts", datetime(2024, 1, 2), datetime(2024, 1, 3, 23))
    assert res["rows_deleted"] == 20
    assert 0 < res["files_rewritten"] < 5  # day files outside [2,3] untouched
    assert t.read().count() == 30
    assert t.read().filter((F.col("ts") >= "2024-01-02") & (F.col("ts") < "2024-01-04")).count() == 0

    # free-form predicate: every file rewritten, SQL NULL semantics
    res2 = t.delete_matching("n % 100 >= 8")
    assert res2["files_rewritten"] == len(t.snapshot(res2["version"] - 1).files)
    assert t.read().count() == 30 - 6  # h in {8,9} of the 3 surviving days
    assert t.read().filter(F.expr("n % 100 >= 8")).count() == 0

    # keyed tables refuse
    keyed = LakeTable.create(spark, tmpdir_path + "_k", schema, key="n")
    with pytest.raises(ValueError, match="delete_where"):
        keyed.delete_eq("n", 1)
