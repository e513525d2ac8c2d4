"""Merge-on-read delete files (Iceberg v2 position/equality delete analog)
on append-only lake tables.

Reference parity note: the reference engine has no row-delete surface at all
(its sinks are append/upsert-only — fns-routing RouteIngestedFile.kt); this
is a lake-layer capability a 100 TB deployment needs for GDPR/takedown
without rewriting wide page rows. Semantics follow the public Iceberg v2
spec shape: equality deletes apply only to data files with a smaller data
sequence number; position deletes name (file, row-index) identities.
"""
from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("v", T.LongType()),
    ]
)


def _mk(spark, path):
    return LakeTable.create(spark, path, schema=SCHEMA, key=None)


def _rows(spark, triples):
    ts = dt.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [(u, ts + dt.timedelta(hours=h), v) for u, h, v in triples], SCHEMA
    )


def _state(t, **kw):
    return sorted((r.url, r.v) for r in t.read(**kw).collect())


def test_eq_delete_is_metadata_only_and_excludes_rows(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2), ("c", 2, 3)]), epoch_id=0)
    files_before = {f["path"] for f in t.snapshot().files}
    r = t.delete_eq_mor("url", "b")
    assert not r["skipped"]
    # O(1) commit: no data files were added or removed, one delete file was
    snap = t.snapshot()
    assert {f["path"] for f in snap.files} == files_before
    assert [d["kind"] for d in snap.delete_files] == ["eqdel"]
    assert _state(t) == [("a", 1), ("c", 3)]


def test_eq_delete_sequence_rule_spares_later_appends(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2)]), epoch_id=0)
    t.delete_eq_mor("url", "b")
    # DELETE-then-INSERT: the same value appended later must survive
    t.append(_rows(spark, [("b", 5, 99)]), epoch_id=1)
    assert _state(t) == [("a", 1), ("b", 99)]


def test_eq_delete_multi_value_and_null_refused(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2), ("c", 2, 3)]), epoch_id=0)
    t.delete_eq_mor("url", ["a", "c"])
    assert _state(t) == [("b", 2)]
    with pytest.raises(ValueError, match="NULL"):
        t.delete_eq_mor("url", None)
    with pytest.raises(ValueError, match="no column"):
        t.delete_eq_mor("nope", "x")


def test_eq_delete_refused_on_keyed_table(spark, tmpdir_path):
    t = LakeTable.create(spark, tmpdir_path + "/t", schema=SCHEMA, key="url")
    with pytest.raises(ValueError, match="keyed"):
        t.delete_eq_mor("url", "a")
    with pytest.raises(ValueError, match="keyed"):
        t.delete_matching_mor("v > 0")


def test_position_delete_predicate_and_null_semantics(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    ts = dt.datetime(2026, 1, 1)
    t.append(
        spark.createDataFrame(
            [("a", ts, 1), ("b", ts, None), ("c", ts, 3)], SCHEMA
        ),
        epoch_id=0,
    )
    # SQL DELETE: NULL predicate keeps the row (v > 2 is NULL for b)
    r = t.delete_matching_mor("v > 2")
    assert r["rows_deleted"] == 1
    assert _state(t) == [("a", 1), ("b", None)]
    # IS NULL deletes through the position path
    t.delete_matching_mor("v IS NULL")
    assert _state(t) == [("a", 1)]
    # no matches -> no commit
    v = t.current_version()
    assert t.delete_matching_mor("v = 12345")["skipped"]
    assert t.current_version() == v


def test_position_delete_only_rewrites_nothing(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2)]), epoch_id=0)
    before = {f["path"] for f in t.snapshot().files}
    t.delete_matching_mor("url = 'a'")
    snap = t.snapshot()
    assert {f["path"] for f in snap.files} == before
    assert [d["kind"] for d in snap.delete_files] == ["posdel"]


def test_update_matching_mor_atomic_delete_plus_append(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2), ("c", 2, 3)]), epoch_id=0)
    r = t.update_matching_mor("v >= 2", {"v": "v * 10"})
    assert r["rows_updated"] == 2
    assert _state(t) == [("a", 1), ("b", 20), ("c", 30)]
    # one commit did both halves
    assert t.history()[-1]["operation"] == "update-matching-mor"
    # updated images are exempt from an EARLIER eq-delete (fresh seq)
    t2 = _mk(spark, tmpdir_path + "/t2")
    t2.append(_rows(spark, [("a", 0, 1), ("b", 1, 2)]), epoch_id=0)
    t2.delete_eq_mor("url", "b")
    assert _state(t2) == [("a", 1)]
    t2.update_matching_mor("url = 'a'", {"url": "'b'"})
    assert _state(t2) == [("b", 1)]


def test_time_travel_sees_pre_delete_state(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2)]), epoch_id=0)
    v_pre = t.current_version()
    t.delete_eq_mor("url", "a")
    t.delete_matching_mor("v = 2")
    assert _state(t) == []
    assert _state(t, version=v_pre) == [("a", 1), ("b", 2)]


def test_rewrite_files_materializes_and_clears_deletes(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2), ("c", 2, 3)]), epoch_id=0)
    t.delete_eq_mor("url", "b")
    t.delete_matching_mor("v = 3")
    r = t.rewrite_files(n_files=1)
    assert not r["skipped"]
    snap = t.snapshot()
    assert snap.delete_files == []
    assert _state(t) == [("a", 1)]
    # materialized: the surviving file physically lacks the deleted rows
    raw = spark.read.parquet(
        *[os.path.join(t.path, f["path"]) for f in snap.files]
    )
    assert raw.count() == 1
    # the delete files became orphans; vacuum reclaims them, and the rows
    # stay gone afterwards
    t.expire_snapshots(keep_last=1)
    t.vacuum_orphans()
    assert _state(t) == [("a", 1)]


def test_vacuum_keeps_live_delete_files(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2)]), epoch_id=0)
    t.delete_eq_mor("url", "a")
    t.delete_matching_mor("v = 2")
    t.vacuum_orphans()
    assert _state(t) == []  # delete files survived the vacuum


def test_clone_preserves_deletes_and_seq_ordering(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2), ("c", 2, 3)]), epoch_id=0)
    t.delete_eq_mor("url", "a")
    t.delete_matching_mor("v = 3")
    c = t.clone_to(tmpdir_path + "/c")
    assert _state(c) == [("b", 2)]
    # post-clone append of a previously eq-deleted value survives (the
    # clone's next data seq exceeds every copied delete seq)
    c.append(_rows(spark, [("a", 9, 7)]), epoch_id=1)
    assert _state(c) == [("a", 7), ("b", 2)]
    # source unaffected
    assert _state(t) == [("b", 2)]


def test_wap_branch_carries_and_publishes_deletes(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2)]), epoch_id=0)
    b = t.create_branch("audit")
    b.delete_eq_mor("url", "a")
    assert _state(b) == [("b", 2)]
    assert _state(t) == [("a", 1), ("b", 2)]  # main unaffected pre-publish
    t.publish_branch("audit")
    assert _state(t) == [("b", 2)]


def test_wap_rebase_refuses_branch_delete_changes(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1)]), epoch_id=0)
    b = t.create_branch("audit")
    b.delete_eq_mor("url", "a")
    t.append(_rows(spark, [("c", 3, 3)]), epoch_id=1)  # main advances
    with pytest.raises(RuntimeError, match="delete files"):
        t.publish_branch("audit", rebase=True)


def test_cow_delete_and_expire_interop(spark, tmpdir_path):
    # CoW delete_eq / expire_data on a table with live MoR deletes must not
    # resurrect rows (rewrites read through the delete-applying scan)
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2), ("c", 2, 3)]), epoch_id=0)
    t.delete_eq_mor("url", "b")
    t.delete_eq("v", 3)  # CoW rewrite of the matching file
    assert _state(t) == [("a", 1)]
    # the MoR delete list survived the CoW commit
    assert [d["kind"] for d in t.snapshot().delete_files] == ["eqdel"]


def test_eq_delete_blocks_rename_and_drop_of_referenced_column(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1)]), epoch_id=0)
    t.delete_eq_mor("v", 99)
    with pytest.raises(ValueError, match="equality-delete"):
        t.rename_column("v", "w")
    with pytest.raises(ValueError, match="equality-delete"):
        t.drop_column("v")
    # materializing unblocks
    t.rewrite_files(n_files=1)
    t.rename_column("v", "w")
    assert "w" in t.snapshot().schema().fieldNames()


def test_eq_delete_applies_through_type_widening(spark, tmpdir_path):
    # delete values written at int precision still match after the column
    # widens to long (read-side cast to the CURRENT schema type)
    schema = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("n", T.IntegerType())]
    )
    t = LakeTable.create(spark, tmpdir_path + "/t", schema=schema, key=None)
    t.append(spark.createDataFrame([("a", 1), ("b", 2)], schema), epoch_id=0)
    t.delete_eq_mor("n", 2)
    wide = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("n", T.LongType())]
    )
    t.append(spark.createDataFrame([("c", 2 ** 40)], wide), epoch_id=1)
    out = sorted((r.url, r.n) for r in t.read().collect())
    assert out == [("a", 1), ("c", 2 ** 40)]


def test_mor_delete_on_hidden_partitioned_table(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.set_partition_spec(
        [{"name": "url_p", "col": "url", "transform": "truncate", "param": 1}]
    )
    t.append(_rows(spark, [("ax", 0, 1), ("ay", 1, 2), ("bx", 2, 3)]), epoch_id=0)
    t.delete_matching_mor("url = 'ay'")
    assert _state(t) == [("ax", 1), ("bx", 3)]
    # partition-pruned read still applies the deletes
    got = sorted(
        (r.url, r.v) for r in t.read(part_eq=("url", "ax")).collect()
    )
    assert got == [("ax", 1)]
    pruned = sorted(
        (r.url, r.v)
        for r in t.read(part_range=("url", "a", "azzz")).collect()
    )
    assert pruned == [("ax", 1)]


def test_mor_identity_survives_duplicate_basenames(spark, tmpdir_path):
    """Regression: one multicast staged write reuses the SAME task-uuid part
    filename across every _b=K partition directory, so a basename is NOT a
    file identity. Caught end-to-end (row count fanned out 121->426 through
    the seq join); row identity is now the manifest-relative path."""
    import os

    from data_exchange_routing_spark.lake.staging import (
        DEST_COL,
        stage_multicast_delta,
    )

    t = _mk(spark, tmpdir_path + "/t")
    ts = dt.datetime(2026, 1, 1)
    rows = [(f"u{i}", ts + dt.timedelta(hours=i), i) for i in range(40)]
    delta = spark.createDataFrame(rows, SCHEMA).withColumn(DEST_COL, F.lit("t"))
    entries = stage_multicast_delta(delta, tmpdir_path + "/staging", n_buckets=8)["t"]
    basenames = [os.path.basename(e["path"]) for e in entries]
    assert len(entries) > 1 and len(set(basenames)) == 1, (
        "precondition: staged part files must share one basename"
    )
    t.commit_staged_files(
        [dict(e, path=os.path.relpath(e["path"], t.path)) for e in entries],
        SCHEMA,
        epoch_id=0,
    )
    assert t.read().count() == 40
    # eq-delete: no fan-out through the seq mapping, exact survivors
    t.delete_eq_mor("url", ["u3", "u17"])
    assert t.read().count() == 38
    # pos-delete must kill rows in exactly ONE of the same-named files
    r = t.delete_matching_mor("v IN (5, 25)")
    assert r["rows_deleted"] == 2
    assert t.read().count() == 36
    assert _state(t) == sorted(
        (f"u{i}", i) for i in range(40) if i not in (3, 17, 5, 25)
    )
    # posdel identities are manifest-relative paths, not basenames
    snap = t.snapshot()
    pos = [d for d in snap.delete_files if d["kind"] == "posdel"]
    pdf = spark.read.parquet(
        *[os.path.join(t.path, d["path"]) for d in pos]
    ).collect()
    assert all("/" in row.file for row in pdf), [row.file for row in pdf]
    # compact materializes everything and clears the delete list
    t.rewrite_files(n_files=2)
    assert not t.snapshot().delete_files
    assert t.read().count() == 36


# ------------------------------------------------------------------
# compact_mor_deletes: targeted (minor) MoR compaction
# ------------------------------------------------------------------


def test_compact_mor_rewrites_only_affected_files(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2)]), epoch_id=0)
    t.append(_rows(spark, [("c", 2, 3), ("d", 3, 4)]), epoch_id=1)
    t.append(_rows(spark, [("e", 4, 5)]), epoch_id=2)
    by_epoch = {f["path"]: f for f in t.snapshot().files}
    # position delete hits only the first file's rows
    t.delete_matching_mor("url = 'b'")
    pre = _state(t)
    r = t.compact_mor_deletes()
    assert not r["skipped"] and r["files_rewritten"] == 1
    snap = t.snapshot()
    assert snap.delete_files == []
    assert _state(t) == pre == [("a", 1), ("c", 3), ("d", 4), ("e", 5)]
    # the two untouched files carried over verbatim (same manifest paths)
    kept = {f["path"] for f in snap.files} & set(by_epoch)
    assert len(kept) == 2
    # materialized: physical bytes of the new snapshot lack the deleted row
    raw = spark.read.parquet(*[os.path.join(t.path, f["path"]) for f in snap.files])
    assert raw.count() == 4


def test_compact_mor_eq_seq_rule_spares_later_files(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2)]), epoch_id=0)
    t.delete_eq_mor("url", "b")
    # same value appended AFTER the delete: its file has seq > delete seq
    t.append(_rows(spark, [("b", 5, 99)]), epoch_id=1)
    later = {f["path"] for f in t.snapshot().files if f["seq"] > 2}
    r = t.compact_mor_deletes()
    assert not r["skipped"] and r["files_rewritten"] == 1
    snap = t.snapshot()
    assert later <= {f["path"] for f in snap.files}  # exempt file untouched
    assert snap.delete_files == []
    assert _state(t) == [("a", 1), ("b", 99)]


def test_compact_mor_prunes_by_partition_and_stats(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.set_partition_spec(
        [{"name": "url_p", "col": "url", "transform": "truncate", "param": 1}]
    )
    t.append(
        _rows(spark, [("ax", 0, 1), ("ay", 1, 2), ("bx", 2, 3), ("by", 3, 4)]),
        epoch_id=0,
    )
    t.delete_eq_mor("url", "ay")
    n_files = len(t.snapshot().files)
    assert n_files == 2  # one per truncate(url,1) partition value
    r = t.compact_mor_deletes()
    assert not r["skipped"]
    # only the url=a* partition file may match; b* stayed metadata-only
    assert r["files_rewritten"] == 1 and r["files_kept"] == n_files - 1
    assert _state(t) == [("ax", 1), ("bx", 3), ("by", 4)]
    assert t.snapshot().delete_files == []


def test_compact_mor_stale_deletes_drop_metadata_only(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2)]), epoch_id=0)
    t.delete_matching_mor("url = 'a'")
    # a CoW delete rewrites the file, orphaning the posdel identities
    t.delete_matching("v = 2")
    assert _state(t) == [("a", 1)] or _state(t) == []  # a was MoR-deleted
    pre = _state(t)
    r = t.compact_mor_deletes()
    assert not r["skipped"]
    assert r["files_rewritten"] == 0  # stale posdel names no live file
    assert t.snapshot().delete_files == []
    assert _state(t) == pre


def test_compact_mor_preserves_epoch_guards_and_update_images(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2)]), epoch_id=7)
    t.update_matching_mor("url = 'b'", {"v": "v * 10"})
    t.compact_mor_deletes()
    assert _state(t) == [("a", 1), ("b", 20)]
    # redelivery of the folded epoch is still a no-op
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2)]), epoch_id=7)
    assert _state(t) == [("a", 1), ("b", 20)]
    # and the cycle can repeat: new deletes land and compact again
    t.delete_eq_mor("url", ["a"])
    assert not t.compact_mor_deletes()["skipped"]
    assert _state(t) == [("b", 20)]
    assert t.compact_mor_deletes()["skipped"]  # nothing left to fold


def test_compact_mor_unblocks_rename_and_time_travel(spark, tmpdir_path):
    t = _mk(spark, tmpdir_path + "/t")
    t.append(_rows(spark, [("a", 0, 1), ("b", 1, 2)]), epoch_id=0)
    t.delete_eq_mor("v", 2)
    v_mor = t.current_version()
    t.compact_mor_deletes()
    # eq-delete no longer references v -> rename allowed
    t.rename_column("v", "w")
    assert sorted((r.url, r.w) for r in t.read().collect()) == [("a", 1)]
    # time travel to the MoR snapshot still applies its delete files
    assert _state(t, version=v_mor) == [("a", 1)]
