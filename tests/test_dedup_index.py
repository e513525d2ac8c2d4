"""Persistent incremental LSH near-dup index: idempotency, plan shape,
reload. (Incremental == full-batch equivalence is gate-checked by the
oracle-backed `doc_incremental_lsh_pairs` registry query.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_exchange_routing_spark.functions.dedup_index import NearDupIndex
from data_exchange_routing_spark.functions.dedup_text import minhash_lsh_candidates

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _pairs(df) -> set[tuple]:
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_incremental_matches_full_batch(spark, tmp_path):
    docs = _docs(spark)
    idx = NearDupIndex.create(spark, str(tmp_path / "idx"))
    got = set()
    for e in range(3):
        got |= _pairs(idx.check_and_add(docs.filter(F.col("doc_id") % 3 == e), epoch_id=e))
    want = _pairs(minhash_lsh_candidates(docs))
    assert got == want


def test_redelivery_is_idempotent(spark, tmp_path):
    docs = _docs(spark)
    idx = NearDupIndex.create(spark, str(tmp_path / "idx"))
    half = docs.filter(F.col("doc_id") % 2 == 0)
    first = _pairs(idx.check_and_add(half, epoch_id=7))
    n_rows = idx.table.read().count()
    version = idx.table.current_version()
    # redelivery: same epoch id — no new files, no new version, same pairs
    again = _pairs(idx.check_and_add(half, epoch_id=7))
    assert again == first
    assert idx.table.read().count() == n_rows
    assert idx.table.current_version() == version


def test_corpus_side_never_shuffles(spark, tmp_path):
    docs = _docs(spark)
    idx = NearDupIndex.create(spark, str(tmp_path / "idx"))
    idx.check_and_add(docs.filter(F.col("doc_id") < 100), epoch_id=0).count()
    pairs = idx.check_and_add(docs.filter(F.col("doc_id") >= 100), epoch_id=1)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the corpus scan feeds the probe side straight from parquet: no Exchange
    # may sit between the index FileScan and the broadcast join
    probe_side = plan.split("BroadcastHashJoin")[1]
    scan_half = probe_side.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in scan_half


def test_compact_preserves_state_and_epoch_guard(spark, tmp_path):
    docs = _docs(spark)
    idx = NearDupIndex.create(spark, str(tmp_path / "idx"))
    got = set()
    for e in range(2):
        got |= _pairs(idx.check_and_add(docs.filter(F.col("doc_id") % 3 == e), epoch_id=e))

    rows_before = sorted(map(tuple, idx.table.read().collect()))
    res = idx.compact(n_files=1)
    assert not res.get("skipped")
    snap = idx.table.snapshot()
    assert len(snap.files) == 1 and snap.files[0]["kind"] == "base"
    assert sorted(map(tuple, idx.table.read().collect())) == rows_before

    # the epoch guard survives the rewrite: redelivery is still a no-op
    v = idx.table.current_version()
    idx.check_and_add(docs.filter(F.col("doc_id") % 3 == 1), epoch_id=1)
    assert idx.table.current_version() == v

    # and later epochs still find their pairs against the folded index
    got |= _pairs(idx.check_and_add(docs.filter(F.col("doc_id") % 3 == 2), epoch_id=2))
    assert got == _pairs(minhash_lsh_candidates(docs))


def test_rewrite_files_rejects_keyed_tables(spark, tmp_path):
    import pytest
    from pyspark.sql import types as T

    from data_exchange_routing_spark.lake.table import LakeTable

    t = LakeTable.create(
        spark,
        str(tmp_path / "keyed"),
        T.StructType([T.StructField("url", T.StringType(), False)]),
        key="url",
    )
    with pytest.raises(ValueError, match="unkeyed"):
        t.rewrite_files()


def test_reload_and_continue(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "idx")
    NearDupIndex.create(spark, path, k=8, bands=4).check_and_add(
        docs.filter(F.col("doc_id") % 2 == 0), epoch_id=0
    ).count()
    idx2 = NearDupIndex.load(spark, path)
    assert (idx2.k, idx2.bands) == (8, 4)
    got = _pairs(idx2.check_and_add(docs.filter(F.col("doc_id") % 2 == 1), epoch_id=1))
    # cross-epoch pairs exist on this corpus and every pair involves an odd id
    full = _pairs(minhash_lsh_candidates(docs))
    want = {p for p in full if p[0] % 2 == 1 or p[1] % 2 == 1}
    assert got == want


def test_corpus_side_never_shuffles_with_tombstones(spark, tmp_path):
    """The MAINTAINED probe keeps the pre-CDC plan shape: the tombstone
    filter joins in as a second BroadcastHashJoin, so the corpus-sized band
    scan still reaches the pair probe without any hash-partition Exchange."""
    docs = _docs(spark)
    idx = NearDupIndex.create(spark, str(tmp_path / "idx"))
    idx.apply_changes(
        docs.filter(F.col("doc_id") < 100).withColumn("op", F.lit("I")), epoch_id=0
    ).count()
    idx.apply_changes(
        docs.filter(F.col("doc_id") < 3).withColumn("op", F.lit("D")), epoch_id=1
    ).count()
    pairs = idx.apply_changes(
        docs.filter(F.col("doc_id") >= 100).withColumn("op", F.lit("I")), epoch_id=2
    )
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # The small relations may shuffle (tombstone agg on doc_id, the final
    # pair distinct) — the CORPUS must not: no exchange keyed on the band
    # join keys anywhere, and at most the tombstone agg's own doc_id
    # exchange (a sort-merge fallback on either broadcast join would add
    # corpus-sized exchanges on exactly these keys)
    assert "hashpartitioning(band" not in plan, plan[:3000]
    # the tombstone agg's own (tiny) doc_id exchange appears once per
    # _live_rows subtree — corpus side and broadcast probe side — never more
    # (a sort-merge fallback on either join would add corpus-sized ones)
    assert plan.count("hashpartitioning(doc_id") <= 2, plan[:3000]
