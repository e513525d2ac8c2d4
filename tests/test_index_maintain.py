"""CDC-consistent ANN/LSH index maintenance (VERDICT r03 item 4).

The persisted IVF / IVF-PQ indexes and the NearDupIndex support incremental
ADD; these gates prove the delete/update path: after a replay containing
deletes and updates, searching the index matches brute force over the FINAL
state, redelivered epochs are no-ops, crash-window duplicate appends
collapse, and compaction folds tombstones away without changing results.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from data_exchange_routing_spark.functions import similarity as SIM


def _vec(i: int, dim: int = 8) -> list[float]:
    # deterministic, well-spread directions
    return [float(((i * 31 + j * 17) % 13) - 6) / 6.0 + 0.01 * j for j in range(dim)]


def _emb_df(spark, ids):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in ids], "vec_id long, embedding array<double>"
    )


def _apply_standard_epochs(spark, root, kind):
    """build on ids 0..19; epoch 1 inserts 20..29; epoch 2 updates ids%5==0
    (negated vectors); epoch 3 deletes ids%7==0. Returns the FINAL state df."""
    build = _emb_df(spark, range(20))
    if kind == "ivf":
        SIM.ivf_index_build(build, root, n_centroids=4)
        apply = SIM.ivf_index_apply_changes
    else:
        SIM.ivfpq_index_build(build, root, n_centroids=4, m=4, nbits=4)
        apply = SIM.ivfpq_index_apply_changes

    ins = _emb_df(spark, range(20, 30)).withColumn("op", F.lit("I"))
    apply(spark, root, ins, epoch_id=1)

    upd = _emb_df(spark, [i for i in range(30) if i % 5 == 0]).select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
        F.lit("U").alias("op"),
    )
    apply(spark, root, upd, epoch_id=2)

    dels = spark.createDataFrame(
        [(i, None, "D") for i in range(30) if i % 7 == 0],
        "vec_id long, embedding array<double>, op string",
    )
    apply(spark, root, dels, epoch_id=3)

    final = spark.createDataFrame(
        [
            (i, [-x for x in _vec(i)] if i % 5 == 0 else _vec(i))
            for i in range(30)
            if i % 7 != 0
        ],
        "vec_id long, embedding array<double>",
    )
    return final


def _exhaustive(spark, root, kind, queries, k=3):
    if kind == "ivf":
        return SIM.ivf_index_search(spark, root, queries, k=k, n_probe=64)
    return SIM.ivfpq_index_search(
        spark, root, queries, k=k, n_probe=64, rerank=10_000_000
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("kind", ["ivf", "ivfpq"])
def test_apply_changes_matches_brute_force_over_final_state(spark, kind):
    root = tempfile.mkdtemp(prefix=f"idxm_{kind}_") + "/idx"
    final = _apply_standard_epochs(spark, root, kind)
    qids = [r["vec_id"] for r in final.filter("vec_id < 6").collect()]
    queries = final.filter(F.col("vec_id").isin(qids))
    got = _exhaustive(spark, root, kind, queries, k=3)
    want = SIM.brute_force_topk(final, query_ids=qids, k=3)
    assert _rows(got) == _rows(want)
    # deleted / stale ids never surface
    nn = {r["nn_id"] for r in got.collect()}
    assert all(i % 7 != 0 for i in nn)


@pytest.mark.parametrize("kind", ["ivf", "ivfpq"])
def test_redelivered_epoch_is_a_noop(spark, kind):
    root = tempfile.mkdtemp(prefix=f"idxr_{kind}_") + "/idx"
    final = _apply_standard_epochs(spark, root, kind)
    queries = final.filter("vec_id < 6")
    before = _rows(_exhaustive(spark, root, kind, queries))
    # redeliver epoch 2 (the updates) — meta guard must skip it entirely
    upd = _emb_df(spark, [i for i in range(30) if i % 5 == 0]).select(
        "vec_id",
        F.transform("embedding", lambda x: -x).alias("embedding"),
        F.lit("U").alias("op"),
    )
    apply = SIM.ivf_index_apply_changes if kind == "ivf" else SIM.ivfpq_index_apply_changes
    res = apply(spark, root, upd, epoch_id=2)
    assert res["skipped"] is True
    assert _rows(_exhaustive(spark, root, kind, queries)) == before


def test_crash_window_duplicate_rows_collapse(spark):
    """A crash between the corpus append and the meta commit redelivers the
    epoch and re-appends identical (vid, iseq) rows; _live_filter dedups."""
    root = tempfile.mkdtemp(prefix="idxdup_") + "/idx"
    final = _apply_standard_epochs(spark, root, "ivf")
    queries = final.filter("vec_id < 6")
    before = _rows(SIM.ivf_index_search(spark, root, queries, k=3, n_probe=64))
    # simulate the crash: epoch 2's upsert rows land twice in the corpus
    upd = _emb_df(spark, [i for i in range(30) if i % 5 == 0]).select(
        "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
    )
    SIM.ivf_index_add(spark, root, upd, iseq=2)
    got = SIM.ivf_index_search(spark, root, queries, k=3, n_probe=64)
    assert _rows(got) == before
    nn_rows = got.collect()
    assert len({(r["query_id"], r["nn_id"]) for r in nn_rows}) == len(nn_rows)


@pytest.mark.parametrize("kind", ["ivf", "ivfpq"])
def test_compact_preserves_results_and_drops_tombstones(spark, kind):
    root = tempfile.mkdtemp(prefix=f"idxc_{kind}_") + "/idx"
    final = _apply_standard_epochs(spark, root, kind)
    queries = final.filter("vec_id < 6")
    before = _rows(_exhaustive(spark, root, kind, queries))
    res = SIM.index_compact(spark, root, kind=kind)
    # DEFERRED reclaim (r04 advice): the old generation and its tombstone
    # sidecar survive this compact so a search that resolved the old meta
    # stays safe through the whole compaction...
    assert os.path.isdir(os.path.join(root, res["dropped"]))
    assert os.path.isdir(os.path.join(root, "tombstones"))
    assert _rows(_exhaustive(spark, root, kind, queries)) == before
    # ...and the NEXT compact's orphan sweep reclaims them
    res_next = SIM.index_compact(spark, root, kind=kind)
    assert not os.path.isdir(os.path.join(root, res["dropped"]))
    assert not os.path.isdir(os.path.join(root, "tombstones"))
    assert os.path.isdir(os.path.join(root, res_next["corpus_rel"]))
    assert _rows(_exhaustive(spark, root, kind, queries)) == before
    # post-compact maintenance still works on the new generation
    apply = SIM.ivf_index_apply_changes if kind == "ivf" else SIM.ivfpq_index_apply_changes
    dels = spark.createDataFrame(
        [(1, None, "D")], "vec_id long, embedding array<double>, op string"
    )
    apply(spark, root, dels, epoch_id=4)
    after = _exhaustive(spark, root, kind, queries)
    assert 1 not in {r["nn_id"] for r in after.collect()}


def test_sync_from_changefeed_converges_to_table_state(spark, tmpdir_path):
    """End-to-end CDC story: a keyed lake table takes merge_cdc epochs with
    inserts/updates/deletes; the change-feed consumer tails it into the IVF
    index; exhaustive search == brute force over the table's final state."""
    from data_exchange_routing_spark.lake.changefeed import ChangeFeedConsumer
    from data_exchange_routing_spark.lake.table import LakeTable
    from pyspark.sql import types as T

    tpath = os.path.join(tmpdir_path, "emb_table")
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
        ]
    )
    table = LakeTable.create(spark, tpath, schema, key="vec_id", n_buckets=4)

    def batch(rows_, lsn0, deleted=False):
        from datetime import datetime, timedelta

        t0 = datetime(2024, 1, 1)
        return spark.createDataFrame(
            [
                (i, t0 + timedelta(seconds=lsn0 + j), v, lsn0 + j, deleted)
                for j, (i, v) in enumerate(rows_)
            ],
            "vec_id long, warc_ts timestamp, embedding array<double>, "
            "_lsn long, _deleted boolean",
        )

    table.merge_cdc(batch([(i, _vec(i)) for i in range(20)], 0), epoch_id=0, source="t")

    root = os.path.join(tmpdir_path, "idx")
    SIM.ivf_index_build(table.read(), root, n_centroids=4)
    consumer = ChangeFeedConsumer(spark, tpath, "ann-index", with_internal=True)
    consumer.seek(table.current_version())  # index already holds the build

    # epoch: updates + inserts; then an epoch of deletes
    table.merge_cdc(
        batch([(i, [-x for x in _vec(i)]) for i in range(0, 30, 5)], 100),
        epoch_id=1,
        source="t",
    )
    table.merge_cdc(
        batch([(i, None) for i in range(0, 30, 7)], 200, deleted=True),
        epoch_id=2,
        source="t",
    )
    res = SIM.sync_index_from_changefeed(consumer, root, kind="ivf")
    assert res["processed_versions"] > 0

    final = table.read().select("vec_id", "embedding")
    qids = [r["vec_id"] for r in final.filter("vec_id < 6").collect()]
    got = SIM.ivf_index_search(
        spark, root, final.filter(F.col("vec_id").isin(qids)), k=3, n_probe=64
    )
    want = SIM.brute_force_topk(final, query_ids=qids, k=3)
    assert _rows(got) == _rows(want)
    # redeliver the whole feed range: cursor-reset replay must be a no-op
    consumer.seek(1)
    consumer.seek(table.current_version() - 2)
    SIM.sync_index_from_changefeed(consumer, root, kind="ivf")
    got2 = SIM.ivf_index_search(
        spark, root, final.filter(F.col("vec_id").isin(qids)), k=3, n_probe=64
    )
    assert _rows(got2) == _rows(want)


def test_neardup_index_apply_changes(spark):
    """Near-dup LSH index under CDC: an updated page's OLD shingles stop
    matching, a deleted page stops pairing, redelivery is a no-op."""
    from data_exchange_routing_spark.functions.dedup_index import NearDupIndex

    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    other = "completely different text about spark partitions and shuffle planning"

    root = tempfile.mkdtemp(prefix="ndidx_") + "/idx"
    idx = NearDupIndex.create(spark, root, k=32, bands=8)
    docs0 = spark.createDataFrame(
        [(1, base), (2, other)], "doc_id long, text string"
    )
    pairs0 = idx.check_and_add(docs0, epoch_id=0)
    assert pairs0.count() == 0

    # doc 3 duplicates doc 1 -> pair (1,3)
    ins = spark.createDataFrame(
        [(3, base + " extra", "I")], "doc_id long, text string, op string"
    )
    assert _rows(idx.apply_changes(ins, epoch_id=1)) == [(1, 3)]

    # doc 1 is re-crawled with unrelated text: its old shingles must not
    # match doc 4 (a copy of the OLD doc 1); doc 4 still pairs with doc 3
    upd = spark.createDataFrame(
        [(1, other + " revised", "U")], "doc_id long, text string, op string"
    )
    idx.apply_changes(upd, epoch_id=2)
    ins4 = spark.createDataFrame(
        [(4, base, "I")], "doc_id long, text string, op string"
    )
    pairs = _rows(idx.apply_changes(ins4, epoch_id=3))
    assert (3, 4) in pairs and all(1 not in p for p in pairs)

    # delete doc 3: a new copy (doc 5) pairs only with the live doc 4
    d3 = spark.createDataFrame(
        [(3, None, "D")], "doc_id long, text string, op string"
    )
    idx.apply_changes(d3, epoch_id=4)
    ins5 = spark.createDataFrame(
        [(5, base + " more", "I")], "doc_id long, text string, op string"
    )
    pairs5 = _rows(idx.apply_changes(ins5, epoch_id=5))
    assert (4, 5) in pairs5 and all(3 not in p for p in pairs5)

    # redelivered epoch: identical pairs, no state change
    again = _rows(idx.apply_changes(ins5, epoch_id=5))
    assert again == pairs5


def test_neardup_compact_folds_tombstones(spark):
    """compact(fold_tombstones=True): pairs identical before/after, the
    sidecar empties, and maintenance keeps working on the folded index."""
    from data_exchange_routing_spark.functions.dedup_index import NearDupIndex

    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    other = "completely different text about spark partitions and shuffle planning"
    root = tempfile.mkdtemp(prefix="ndfold_") + "/idx"
    idx = NearDupIndex.create(spark, root, k=32, bands=8)
    docs = spark.createDataFrame(
        [(1, base, "I"), (2, other, "I"), (3, base + " x", "I")],
        "doc_id long, text string, op string",
    )
    idx.apply_changes(docs, epoch_id=0)
    idx.apply_changes(
        spark.createDataFrame([(3, None, "D")], "doc_id long, text string, op string"),
        epoch_id=1,
    )
    before = _rows(idx.live_pairs())
    res = idx.compact(fold_tombstones=True)
    assert not res.get("skipped")
    assert sum(e.get("rows", 0) for e in idx.tombstones.snapshot().files) == 0
    assert _rows(idx.live_pairs()) == before
    # folded band table holds only live docs' rows
    assert idx.table.read().filter("doc_id = 3").count() == 0
    # post-fold maintenance: a new copy of doc 1 still pairs with it
    pairs = _rows(
        idx.apply_changes(
            spark.createDataFrame(
                [(4, base + " y", "I")], "doc_id long, text string, op string"
            ),
            epoch_id=2,
        )
    )
    assert (1, 4) in pairs and all(3 not in p for p in pairs)


def test_sync_neardup_from_changefeed(spark, tmpdir_path):
    """Document-side changefeed sync: crawled pages in a keyed lake table;
    the consumer tails updates+deletes into the NearDupIndex; live_pairs
    reflects the table's resolved final state. Redelivery is a no-op."""
    from data_exchange_routing_spark.functions.dedup_index import (
        NearDupIndex,
        sync_neardup_from_changefeed,
    )
    from data_exchange_routing_spark.lake.changefeed import ChangeFeedConsumer
    from data_exchange_routing_spark.lake.table import LakeTable
    from pyspark.sql import types as T
    from datetime import datetime, timedelta

    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    other = "completely different text about spark partitions and shuffle planning"

    tpath = os.path.join(tmpdir_path, "docs_table")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    table = LakeTable.create(spark, tpath, schema, key="doc_id", n_buckets=4)
    t0 = datetime(2024, 1, 1)

    def batch(rows_, lsn0, deleted=False):
        return spark.createDataFrame(
            [
                (i, t0 + timedelta(seconds=lsn0 + j), tx, lsn0 + j, deleted)
                for j, (i, tx) in enumerate(rows_)
            ],
            "doc_id long, warc_ts timestamp, text string, _lsn long, _deleted boolean",
        )

    # doc 1 and 3 are near-dups; doc 2 unrelated
    table.merge_cdc(
        batch([(1, base), (2, other), (3, base + " x")], 0), epoch_id=0, source="t"
    )
    root = os.path.join(tmpdir_path, "ndidx")
    idx = NearDupIndex.create(spark, root, k=32, bands=8)
    consumer = ChangeFeedConsumer(spark, tpath, "nd-index", with_internal=True)
    sync_neardup_from_changefeed(consumer, idx)
    assert _rows(idx.live_pairs()) == [(1, 3)]

    # update doc 1 away from the dup cluster; delete doc 3; insert doc 4 = base
    table.merge_cdc(batch([(1, other + " v2"), (4, base + " y")], 100), epoch_id=1, source="t")
    table.merge_cdc(batch([(3, None)], 200, deleted=True), epoch_id=2, source="t")
    sync_neardup_from_changefeed(consumer, idx)
    pairs = _rows(idx.live_pairs())
    assert pairs == [] or all(p[0] != 3 and p[1] != 3 for p in pairs)
    # doc 4 pairs with nothing (1 moved away, 3 deleted)… except itself-none
    assert (1, 4) not in pairs and (3, 4) not in pairs

    # cursor-reset replay converges: the coarser range reapplies under a NEW
    # to_version epoch (not a guard no-op), but tombstone-then-add LWW makes
    # reapplication state-idempotent — the live view is unchanged
    consumer.seek(1)
    sync_neardup_from_changefeed(consumer, idx)
    assert _rows(idx.live_pairs()) == pairs


def test_index_maintain_compacts_only_when_debt_warrants(spark):
    """index_maintain is a cheap no-op below budget; over budget it compacts
    (folding tombstones + clearing markers) and searches are unchanged."""
    root = tempfile.mkdtemp(prefix="idxmaint_") + "/idx"
    final = _apply_standard_epochs(spark, root, "ivf")
    queries = final.filter("vec_id < 6")
    before = _rows(SIM.ivf_index_search(spark, root, queries, k=3, n_probe=64))
    # debt below both budgets: no rewrite happens
    res = SIM.index_maintain(spark, root, kind="ivf")
    assert res["compacted"] is False and res["tombstone_bytes"] > 0
    # shrink the byte budget to force the compaction path
    res2 = SIM.index_maintain(spark, root, kind="ivf", tombstone_budget_bytes=0)
    assert res2["compacted"] is True
    # old sidecar is retired (meta points at the new generation's) but kept
    # on disk for in-flight readers until the next compact's orphan sweep
    assert os.path.isdir(os.path.join(root, "tombstones"))
    assert _rows(SIM.ivf_index_search(spark, root, queries, k=3, n_probe=64)) == before
    # post-compact: stats read back as zero debt
    res3 = SIM.index_maintain(spark, root, kind="ivf")
    assert res3 == {"compacted": False, "tombstone_bytes": 0, "inflight_markers": 0}


@pytest.mark.parametrize("kind", ["ivf", "ivfpq"])
def test_narrow_probe_recall_survives_maintenance(spark, kind):
    """Production-shaped narrow probes on a MAINTAINED index keep recall:
    the tombstone filter must not eat live candidates, and updated vectors
    must be findable via their NEW list assignments."""
    root = tempfile.mkdtemp(prefix=f"idxrec_{kind}_") + "/idx"
    final = _apply_standard_epochs(spark, root, kind)
    qids = [r["vec_id"] for r in final.filter("vec_id < 8").collect()]
    queries = final.filter(F.col("vec_id").isin(qids))
    want = {
        (r["query_id"], r["nn_id"])
        for r in SIM.brute_force_topk(final, query_ids=qids, k=3).collect()
    }
    if kind == "ivf":
        got_df = SIM.ivf_index_search(spark, root, queries, k=3, n_probe=3)
    else:
        got_df = SIM.ivfpq_index_search(
            spark, root, queries, k=3, n_probe=3, rerank=10_000_000
        )
    got = {(r["query_id"], r["nn_id"]) for r in got_df.collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.9, f"post-maintenance narrow-probe recall {recall:.2f}"
    # and still no stale/deleted ids even on the narrow path
    assert all(nn % 7 != 0 for _q, nn in got)


def test_concurrent_maintainer_raises_instead_of_corrupting(spark):
    """VERDICT r04 item 6: the single-maintainer contract is ENFORCED — a
    second concurrent apply_changes/index_compact fails loudly via the
    exclusive-create lease, and a dead maintainer's stale lease is stolen."""
    root = tempfile.mkdtemp(prefix="idxlease_") + "/idx"
    SIM.ivf_index_build(_emb_df(spark, range(20)), root, n_centroids=4)
    lock = os.path.join(root, "maintainer.lock")
    with open(lock, "w") as f:
        f.write("pid=99999")  # a live maintainer holds the lease
    ins = _emb_df(spark, range(20, 25)).withColumn("op", F.lit("I"))
    with pytest.raises(SIM.IndexMaintainerBusy):
        SIM.ivf_index_apply_changes(spark, root, ins, epoch_id=1)
    with pytest.raises(SIM.IndexMaintainerBusy):
        SIM.index_compact(spark, root, kind="ivf")
    # crashed maintainer: a lease older than the stale window is stolen once
    os.utime(lock, (1, 1))
    res = SIM.ivf_index_apply_changes(spark, root, ins, epoch_id=1)
    assert res == {"skipped": False, "epoch_id": 1}
    assert not os.path.exists(lock)  # released after the epoch


def test_compact_resets_dedup_gate(spark):
    """r04 advice: after index_compact the corpus is duplicate-free, so a
    quiescent index must NOT pay the (vid, iseq) dedup shuffle on every
    search forever — the compacted_epochs watermark resets the gate."""
    root = tempfile.mkdtemp(prefix="idxgate_") + "/idx"
    final = _apply_standard_epochs(spark, root, "ivf")
    queries = final.filter("vec_id < 4")

    def probe_plan():
        df = SIM.ivf_index_search(spark, root, queries, k=3, n_probe=64)
        return df._jdf.queryExecution().executedPlan().toString()

    # maintained, uncompacted: the crash-window dedup shuffles on (vid, iseq)
    assert "hashpartitioning(vid" in probe_plan()
    SIM.index_compact(spark, root, kind="ivf")
    # compacted + quiescent: the shuffle-free bulk probe plan is restored
    assert "hashpartitioning(vid" not in probe_plan()
    # a NEW maintenance epoch re-arms the gate (its crash window is real)
    dels = spark.createDataFrame(
        [(2, None, "D")], "vec_id long, embedding array<double>, op string"
    )
    SIM.ivf_index_apply_changes(spark, root, dels, epoch_id=9)
    assert "hashpartitioning(vid" in probe_plan()


def test_inflight_search_survives_compaction(spark):
    """r04 advice: a search that resolved the OLD meta (plan built before
    the compact) must run to completion — the old generation and its
    tombstone sidecar are reclaimed by the NEXT compact, not this one."""
    root = tempfile.mkdtemp(prefix="idxinflight_") + "/idx"
    final = _apply_standard_epochs(spark, root, "ivf")
    queries = final.filter("vec_id < 6")
    stale_df = SIM.ivf_index_search(spark, root, queries, k=3, n_probe=64)
    expected = _rows(SIM.ivf_index_search(spark, root, queries, k=3, n_probe=64))
    SIM.index_compact(spark, root, kind="ivf")
    # the pre-compact plan still scans the old generation — and it is intact
    assert _rows(stale_df) == expected


def test_readonly_open_writes_nothing(spark):
    """r04 advice: opening a pre-CDC NearDupIndex for read-only use must not
    create the tombstone sidecar (it would fail on a read-only mount) — the
    sidecar is born on the first tombstone WRITE."""
    from data_exchange_routing_spark.functions.dedup_index import NearDupIndex

    root = tempfile.mkdtemp(prefix="ndro_") + "/lsh"
    idx = NearDupIndex.create(spark, root, k=16, bands=4)
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "alpha beta gamma delta epsilon eta")],
        "doc_id long, text string",
    )
    idx.check_and_add(docs, epoch_id=1)
    before = sorted(os.listdir(root))
    ro = NearDupIndex.load(spark, root)
    ro.live_pairs().collect()
    ro.compact(fold_tombstones=True)  # nothing to fold; must not create either
    assert sorted(os.listdir(root)) == before
    assert not os.path.isdir(os.path.join(root, "_tombstones"))
    # the first tombstone write creates the sidecar
    ch = spark.createDataFrame([(1, "D", None)], "doc_id long, op string, text string")
    ro.apply_changes(ch, epoch_id=2)
    assert os.path.isdir(os.path.join(root, "_tombstones"))


def test_neardup_maintain_compacts_only_when_debt_warrants(spark):
    """NearDupIndex.maintain: cheap no-op below budget; over budget it
    folds tombstones + delta files and pair results are unchanged."""
    from data_exchange_routing_spark.functions.dedup_index import NearDupIndex

    root = tempfile.mkdtemp(prefix="ndmaint_") + "/lsh"
    idx = NearDupIndex.create(spark, root, k=16, bands=4)
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta eta theta {i % 3}")
         for i in range(12)],
        "doc_id long, text string",
    )
    idx.check_and_add(docs, epoch_id=1)
    ch = spark.createDataFrame(
        [(2, "D", None), (5, "D", None)], "doc_id long, op string, text string"
    )
    idx.apply_changes(ch, epoch_id=2)
    before = sorted(map(tuple, idx.live_pairs().collect()))
    res = idx.maintain()  # debt below both budgets
    assert res["compacted"] is False and res["tombstone_rows"] == 2
    res2 = idx.maintain(tombstone_rows_budget=0)
    assert res2["compacted"] is True
    assert sorted(map(tuple, idx.live_pairs().collect())) == before
    res3 = idx.maintain()
    assert res3 == {"compacted": False, "tombstone_rows": 0, "index_files": 1}


def test_stale_steal_lock_does_not_wedge_recovery(spark):
    """r05 review round 2: a crashed STEALER's leftover steal file must not
    block lease recovery forever — debris older than the steal window is
    cleared and acquisition proceeds."""
    root = tempfile.mkdtemp(prefix="idxsteal_") + "/idx"
    SIM.ivf_index_build(_emb_df(spark, range(10)), root, n_centroids=2)
    lock = os.path.join(root, "maintainer.lock")
    steal = lock + ".steal"
    with open(lock, "w") as f:
        f.write("crashed maintainer")
    os.utime(lock, (1, 1))  # stale main lease
    with open(steal, "w") as f:
        f.write("crashed stealer")
    os.utime(steal, (1, 1))  # stale steal debris
    ins = _emb_df(spark, range(10, 12)).withColumn("op", F.lit("I"))
    res = SIM.ivf_index_apply_changes(spark, root, ins, epoch_id=1)
    assert res == {"skipped": False, "epoch_id": 1}
    assert not os.path.exists(lock) and not os.path.exists(steal)
    # a FRESH steal file (live stealer) still blocks
    with open(lock, "w") as f:
        f.write("x")
    os.utime(lock, (1, 1))
    with open(steal, "w") as f:
        f.write("live stealer")
    dels = spark.createDataFrame(
        [(1, None, "D")], "vec_id long, embedding array<double>, op string"
    )
    with pytest.raises(SIM.IndexMaintainerBusy, match="stealing"):
        SIM.ivf_index_apply_changes(spark, root, dels, epoch_id=2)
    os.unlink(steal)
    os.unlink(lock)
