"""Generic MERGE INTO and write-audit-publish branches (lake/table.py).

MERGE semantics mirror Delta/Iceberg ``MERGE INTO t USING s ON t.k = s.k``
(matched+delete first, then matched+update, then not-matched+insert); WAP
mirrors Iceberg's branch commit -> audit -> publish flow (reference parity:
the staged-upload-then-atomic-commit pattern of RouteIngestedFile.kt:470-550
lifted to whole-table granularity)."""

from __future__ import annotations

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _ts(i):
    return datetime(2024, 1, 1, 0, 0, i)


def _base_table(spark, path):
    t = LakeTable.create(spark, path, SCHEMA, key="url", n_buckets=4)
    rows = [(f"u{i}", _ts(1), i * 10, "en") for i in range(8)]
    t.merge_cdc(
        spark.createDataFrame(rows, SCHEMA)
        .withColumn("_lsn", F.lit(1))
        .withColumn("_deleted", F.lit(False)),
        epoch_id=0,
    )
    return t


def _state(t):
    return {r["url"]: (r["cnt"], r["lang"]) for r in t.read().collect()}


def test_merge_into_update_delete_insert(spark, tmpdir_path):
    t = _base_table(spark, os.path.join(tmpdir_path, "m"))
    src = spark.createDataFrame(
        # u0: delete; u2/u4: update; u9: insert; u5 matched but no clause hits
        [
            ("u0", _ts(2), 999, "del"),
            ("u2", _ts(2), 7, "upd"),
            ("u4", _ts(2), 9, "upd"),
            ("u5", _ts(2), 1, "noop"),
            ("u9", _ts(2), 90, "ins"),
        ],
        "url string, warc_ts timestamp, cnt long, action string",
    )
    res = t.merge_into(
        src,
        when_matched_update={"cnt": "t.cnt + s.cnt"},
        matched_condition="s.action = 'upd'",
        when_matched_delete="s.action = 'del'",
        when_not_matched_insert=True,
        insert_condition="s.action = 'ins'",
        epoch_id=1,
    )
    assert not res["skipped"]
    st = _state(t)
    assert "u0" not in st  # deleted
    assert st["u2"] == (27, "en") and st["u4"] == (49, "en")  # t.cnt + s.cnt, lang kept
    assert st["u5"] == (50, "en")  # untouched: no clause matched
    assert st["u9"] == (90, None)  # insert; lang absent from source -> null
    assert len(st) == 8  # 8 - 1 delete + 1 insert
    # exactly-once: reapplying the same epoch is a no-op
    assert t.merge_into(src, when_matched_delete=True, epoch_id=1)["skipped"]
    assert _state(t) == st


def test_merge_into_update_all_evolves_schema(spark, tmpdir_path):
    t = _base_table(spark, os.path.join(tmpdir_path, "m2"))
    src = spark.createDataFrame(
        [("u1", _ts(3), 111, "fr", "utf-8"), ("u3", _ts(3), 333, "de", "ascii")],
        "url string, warc_ts timestamp, cnt long, lang string, charset string",
    )
    t.merge_into(src, when_matched_update="all", when_not_matched_insert=False, epoch_id=2)
    df = t.read()
    assert "charset" in df.columns  # additive evolution via update-all
    got = {r["url"]: (r["cnt"], r["lang"], r["charset"]) for r in df.collect()}
    assert got["u1"] == (111, "fr", "utf-8")
    assert got["u3"] == (333, "de", "ascii")
    assert got["u0"] == (0, "en", None)  # untouched rows null-backfilled


def test_merge_into_requires_key_and_warc_ts(spark, tmpdir_path):
    unkeyed = LakeTable.create(spark, os.path.join(tmpdir_path, "nk"), SCHEMA)
    with pytest.raises(ValueError, match="keyed"):
        unkeyed.merge_into(spark.createDataFrame([], SCHEMA))
    t = _base_table(spark, os.path.join(tmpdir_path, "m3"))
    no_ts = spark.createDataFrame([("u1", 5)], "url string, cnt long")
    with pytest.raises(ValueError, match="warc_ts"):
        t.merge_into(no_ts, when_matched_update="all")
    # but updates/deletes alone work without a source warc_ts (target's kept)
    t.merge_into(no_ts, when_matched_update={"cnt": "s.cnt"},
                 when_not_matched_insert=False, epoch_id=3)
    assert _state(t)["u1"] == (5, "en")


def test_wap_branch_isolated_until_publish(spark, tmpdir_path):
    t = _base_table(spark, os.path.join(tmpdir_path, "w"))
    v_main = t.current_version()
    b = t.create_branch("audit")
    delta = spark.createDataFrame(
        [("u2", _ts(5), 777, "en")], SCHEMA
    ).withColumn("_lsn", F.lit(9)).withColumn("_deleted", F.lit(False))
    b.merge_cdc(delta, epoch_id=10)
    # main untouched: same version, same rows; branch sees the write
    assert t.current_version() == v_main
    assert _state(t)["u2"] == (20, "en")
    assert _state(b)["u2"] == (777, "en")
    # audit passes -> publish fast-forwards main to the branch head
    res = t.publish_branch("audit")
    assert res["mode"] == "fast_forward"
    assert _state(t)["u2"] == (777, "en")
    # epoch guard carried across publish: re-applying epoch 10 on main no-ops
    assert t.merge_cdc(delta, epoch_id=10)["skipped"]


def test_wap_publish_conflict_and_rebase(spark, tmpdir_path):
    t = _base_table(spark, os.path.join(tmpdir_path, "w2"))
    b = t.create_branch("audit")

    def img(url, ts, cnt, lsn):
        return (
            spark.createDataFrame([(url, ts, cnt, "en")], SCHEMA)
            .withColumn("_lsn", F.lit(lsn))
            .withColumn("_deleted", F.lit(False))
        )

    b.merge_cdc(img("u1", _ts(6), 61, 6), epoch_id=20)
    t.merge_cdc(img("u7", _ts(7), 71, 7), epoch_id=30)  # main advances too
    with pytest.raises(RuntimeError, match="rebase"):
        t.publish_branch("audit")
    res = t.publish_branch("audit", rebase=True)
    assert res["mode"] == "rebase"
    st = _state(t)
    assert st["u1"] == (61, "en") and st["u7"] == (71, "en")  # both writes survive
    # both epoch guards survive the merge
    assert t.merge_cdc(img("u1", _ts(6), 0, 6), epoch_id=20)["skipped"]
    assert t.merge_cdc(img("u7", _ts(7), 0, 7), epoch_id=30)["skipped"]


def test_wap_abort_then_vacuum_reclaims_branch_files(spark, tmpdir_path):
    t = _base_table(spark, os.path.join(tmpdir_path, "w3"))
    b = t.create_branch("bad")
    b.merge_cdc(
        spark.createDataFrame([("u2", _ts(8), -1, "xx")], SCHEMA)
        .withColumn("_lsn", F.lit(99))
        .withColumn("_deleted", F.lit(False)),
        epoch_id=40,
    )
    before = _state(t)
    # while the branch lives, vacuum must NOT reclaim its staged files
    assert t.vacuum_orphans()["removed_files"] == 0
    assert _state(b)["u2"] == (-1, "xx")
    t.abort_branch("bad")
    assert "bad" not in t.list_branches()
    assert t.vacuum_orphans()["removed_files"] > 0  # branch-only files reclaimed
    assert _state(t) == before  # main never saw the audit-failed write
    with pytest.raises(ValueError, match="main"):
        b.vacuum_orphans()
