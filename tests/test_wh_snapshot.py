"""Warehouse-level consistent cuts: cross-table snapshot isolation."""

import pytest

from data_exchange_routing_spark.pipeline import Warehouse, replay
from data_exchange_routing_spark.schemas import WEB_PAGES
from data_exchange_routing_spark.sources.configs import DESTINATION_TABLES
from data_exchange_routing_spark.sources.datagen import write_change_events


def _mk_wh(spark, tmp_path, n_epochs=3):
    events = str(tmp_path / "events")
    write_change_events(spark, events, 400, 60, n_epochs=n_epochs)
    wh = Warehouse(spark, str(tmp_path / "wh"), n_buckets=8)
    return wh, events


def _norm(df):
    return sorted(tuple(r) for r in df.collect())


def test_consistent_snapshot_and_fresh_cut_reads(spark, tmp_path):
    wh, events = _mk_wh(spark, tmp_path)
    replay(wh, events)
    pins = wh.consistent_snapshot()
    assert set(DESTINATION_TABLES) <= set(pins)
    views = wh.read_consistent()
    assert _norm(views["web_pages"]) == _norm(wh.table("web_pages").read())
    assert views["dead_letter"].count() == wh.table("dead_letter").read().count()


def test_published_tag_pins_prefix_state_across_later_epochs(spark, tmp_path):
    wh, events = _mk_wh(spark, tmp_path, n_epochs=3)
    replay(wh, events, stop_after_epoch=0, max_concurrent_epochs=1)
    want_pages = _norm(wh.table("web_pages").read())
    want_dead = wh.table("dead_letter").read().count()
    wh.publish_snapshot("after_epoch0")
    replay(wh, events, max_concurrent_epochs=1)  # epochs 1..2 land
    assert _norm(wh.table("web_pages").read()) != want_pages  # state moved on
    views = wh.read_consistent("after_epoch0")
    assert _norm(views["web_pages"]) == want_pages
    assert views["dead_letter"].count() == want_dead


def test_torn_epoch_is_detected_then_heals(spark, tmp_path):
    wh, events = _mk_wh(spark, tmp_path)
    replay(wh, events)
    pipeline_tables = sorted(set(DESTINATION_TABLES))
    # half-committed epoch: the guard lands on ONE destination table only
    wh.table(pipeline_tables[0]).commit_staged_files(
        [], WEB_PAGES, epoch_id=99, source="cdc"
    )
    with pytest.raises(RuntimeError, match="torn epoch"):
        wh.consistent_snapshot(max_attempts=2)
    for name in pipeline_tables[1:]:
        wh.table(name).commit_staged_files([], WEB_PAGES, epoch_id=99, source="cdc")
    wh.table("dead_letter").commit_staged_files(
        [], wh.table("dead_letter").snapshot().schema(), epoch_id=99, source="dead_letter"
    )
    wh.table("lineage_metrics").commit_staged_files(
        [], wh.table("lineage_metrics").snapshot().schema(), epoch_id=99, source="lineage"
    )
    pins = wh.consistent_snapshot()
    assert pins["web_pages"] >= 1


def test_duplicate_tag_and_missing_tag_raise(spark, tmp_path):
    wh, events = _mk_wh(spark, tmp_path, n_epochs=2)
    replay(wh, events)
    wh.publish_snapshot("v1")
    with pytest.raises(ValueError, match="already exists"):
        wh.publish_snapshot("v1")
    with pytest.raises(FileNotFoundError, match="no snapshot tag"):
        wh.read_consistent("nope")
    with pytest.raises(ValueError, match="invalid tag"):
        wh.publish_snapshot("../escape")


def test_rollback_to_tag_then_replay_reconverges(spark, tmp_path):
    wh, events = _mk_wh(spark, tmp_path, n_epochs=3)
    replay(wh, events, stop_after_epoch=0, max_concurrent_epochs=1)
    wh.publish_snapshot("good")
    want_cut = _norm(wh.table("web_pages").read())
    replay(wh, events, max_concurrent_epochs=1)
    want_full = _norm(wh.table("web_pages").read())
    assert want_full != want_cut

    res = wh.rollback_to("good")
    assert set(res["checkpoints_removed"]) == {1, 2}
    assert _norm(wh.table("web_pages").read()) == want_cut
    # guards rewound on every pipeline table — the cut's epoch set only
    assert wh.table("dead_letter").snapshot().epochs("dead_letter") == {0}
    assert wh.table("web_pages").snapshot().epochs("cdc") == {0}

    # the undone epochs redeliver and the warehouse reconverges exactly
    replay(wh, events, max_concurrent_epochs=1)
    assert _norm(wh.table("web_pages").read()) == want_full


def test_cached_result_hits_until_input_commits(spark, tmp_path):
    wh, events = _mk_wh(spark, tmp_path, n_epochs=2)
    replay(wh, events, stop_after_epoch=0, max_concurrent_epochs=1)
    calls = {"n": 0}

    def q():
        calls["n"] += 1
        return (
            wh.table("web_pages").read().groupBy("lang").count()
        )

    df1, info1 = wh.cached_result("lang_counts", q, tables=["web_pages"])
    want = sorted(map(tuple, df1.collect()))
    assert info1["hit"] is False and calls["n"] == 1
    df2, info2 = wh.cached_result("lang_counts", q, tables=["web_pages"])
    assert info2["hit"] is True and calls["n"] == 1  # served, not recomputed
    assert sorted(map(tuple, df2.collect())) == want

    replay(wh, events, max_concurrent_epochs=1)  # epoch 1 commits -> invalidate
    df3, info3 = wh.cached_result("lang_counts", q, tables=["web_pages"])
    assert info3["hit"] is False and calls["n"] == 2
    assert info3["fingerprint"] != info1["fingerprint"]
    assert sorted(map(tuple, df3.collect())) == sorted(
        map(tuple, wh.table("web_pages").read().groupBy("lang").count().collect())
    )
    # vacuum keeps the newest fingerprint only; the hit still serves
    assert wh.vacuum_cache()["removed"] == 1
    _, info4 = wh.cached_result("lang_counts", q, tables=["web_pages"])
    assert info4["hit"] is True and calls["n"] == 2


def test_checkpoint_compaction_watermark_and_rollback_below_it(spark, tmp_path):
    """compact_checkpoints folds the contiguous done-prefix of per-epoch
    mark files into ONE watermark file (at 10^5 epochs the checkpoint dir
    otherwise costs an O(marks) listing per replay start); resume-skip,
    rollback and reconvergence all keep working THROUGH the compacted
    representation — including rollback to a cut BELOW the watermark."""
    import os

    wh, events = _mk_wh(spark, tmp_path, n_epochs=3)
    replay(wh, events, stop_after_epoch=0, max_concurrent_epochs=1)
    wh.publish_snapshot("good")
    want_cut = _norm(wh.table("web_pages").read())

    # compacting mid-stream: epoch 0 folds into the watermark, and the
    # resumed replay must still skip it (no redelivery)
    res0 = wh.compact_checkpoints()
    assert res0["watermark"] == 1 and res0["marks_removed"] == 1
    out = replay(wh, events, max_concurrent_epochs=1)
    assert out["applied_epochs"] == [1, 2] and out["skipped_epochs"] == [0]
    want_full = _norm(wh.table("web_pages").read())
    assert want_full != want_cut

    res1 = wh.compact_checkpoints()
    assert res1["watermark"] == 3 and res1["marks_removed"] == 2
    assert wh.completed_epochs() == {0, 1, 2}
    d = os.path.join(wh.root, "_checkpoints")
    assert not [f for f in os.listdir(d) if f.startswith("epoch-")]
    res2 = wh.compact_checkpoints()
    assert (res2["watermark"], res2["marks_removed"]) == (3, 0)
    assert res2["done"] == {0, 1, 2}  # reusable done set (one listing)

    # rollback to a cut entirely below the watermark: the watermark lowers
    # to the first undone epoch and the undone epochs redeliver exactly
    wh.rollback_to("good")
    assert wh.checkpoint_watermark() == 1
    assert wh.completed_epochs() == {0}
    assert _norm(wh.table("web_pages").read()) == want_cut
    replay(wh, events, max_concurrent_epochs=1)
    assert _norm(wh.table("web_pages").read()) == want_full
    assert wh.completed_epochs() == {0, 1, 2}


def test_checkpoint_compaction_floor_for_bootstrapped_consumers(spark, tmp_path):
    """Round-3 review: a consumer bootstrapped past a TRUNCATED WAL prefix
    never applies epoch 0, so an unvouched fold would no-op forever and the
    checkpoint dir would regrow unbounded. The vouch floor is
    min(from_epoch, truncation point): over a truncated log the fold starts
    at the switchover and the vouching survives rollback; over a
    NON-truncated log a typo'd from_epoch vouches NOTHING and a plain
    re-run heals the skipped epochs."""
    import os

    from data_exchange_routing_spark.sources.pyds import truncate_binlog

    # --- typo'd from_epoch over a non-truncated log: recoverable ---------
    wh0, events0 = _mk_wh(spark, tmp_path / "typo", n_epochs=3)
    replay(wh0, events0, from_epoch=1, max_concurrent_epochs=1)
    assert wh0.checkpoint_vouched_floor() == 0  # nothing vouched
    healed = replay(wh0, events0, max_concurrent_epochs=1)
    assert healed["applied_epochs"] == [0]  # plain re-run applies epoch 0

    # --- genuine bootstrap: WAL truncated below the switchover -----------
    wh, events = _mk_wh(spark, tmp_path / "boot", n_epochs=3)
    truncate_binlog(events, 1)  # epoch 0 segment GC'd
    replay(wh, events, from_epoch=1, max_concurrent_epochs=1)
    assert wh.checkpoint_vouched_floor() == 1
    assert wh.checkpoint_watermark() >= 1
    res = wh.compact_checkpoints()
    assert res["watermark"] == 3 and res["done"] == {0, 1, 2}
    d = os.path.join(wh.root, "_checkpoints")
    assert not [f for f in os.listdir(d) if f.startswith("epoch-")]
    # plain replay (no from_epoch): bootstrapped-over epoch 0 stays vouched
    out = replay(wh, events, max_concurrent_epochs=1)
    assert out["applied_epochs"] == [] and out["skipped_epochs"] == [0, 1, 2]

    # --- rollback after bootstrap keeps the vouching ----------------------
    wh.publish_snapshot("cut12")
    # (no later epochs to undo — the point is the vouch floor survives and
    # plain replay keeps working instead of demanding truncated epochs)
    wh.rollback_to("cut12")
    assert wh.checkpoint_vouched_floor() == 1
    out2 = replay(wh, events, max_concurrent_epochs=1)
    assert out2["applied_epochs"] == []


def test_corrupt_watermark_degrades_to_zero_not_crash(spark, tmp_path):
    """A torn/empty watermark.json must not brick the warehouse: the reader
    warns and returns 0, and redelivery is safe (per-table epoch guards)."""
    wh, events = _mk_wh(spark, tmp_path, n_epochs=2)
    replay(wh, events, max_concurrent_epochs=1)
    want = _norm(wh.table("web_pages").read())
    wh.compact_checkpoints()
    with open(wh._checkpoint_watermark_path(), "w") as f:
        f.write("")  # torn write
    assert wh.checkpoint_watermark() == 0
    out = replay(wh, events, max_concurrent_epochs=1)  # redelivers, guarded
    assert _norm(wh.table("web_pages").read()) == want
    assert set(out["applied_epochs"]) == {0, 1}  # re-applied as no-ops


def test_checkpoint_watermark_algebra_random_interleavings(tmp_path):
    """Property: under ANY interleaving of out-of-order epoch marks and
    (floored) compactions, completed_epochs() equals the reference set of
    every epoch ever marked (plus floor-vouched prefixes), and compaction
    never changes it. Pure checkpoint-log algebra — no Spark session."""
    import random

    from data_exchange_routing_spark.pipeline import Warehouse

    rng = random.Random(17)
    for trial in range(20):
        root = str(tmp_path / f"walg{trial}")
        wh = Warehouse.__new__(Warehouse)  # skip spark-needing __init__ work
        wh.spark = None
        wh.root = root
        wh.n_buckets = 1
        import os
        os.makedirs(os.path.join(root, "_checkpoints"), exist_ok=True)
        reference: set[int] = set()
        vouched = 0
        for _ in range(30):
            op = rng.random()
            if op < 0.65:
                e = rng.randrange(0, 40)
                wh.mark_epoch_done(e, {"t": trial})
                reference.add(e)
            elif op < 0.85:
                wh.compact_checkpoints()
            else:
                floor = rng.randrange(0, 20)
                wh.compact_checkpoints(floor=floor)
                vouched = max(vouched, floor)
            expect = reference | set(range(vouched))
            # the watermark can only cover marked-or-vouched prefixes
            got = wh.completed_epochs()
            assert got == expect, (
                f"trial {trial}: {sorted(got)} != {sorted(expect)}"
            )
        # steady state: contiguous prefix is one file, tail stays as marks
        wh.compact_checkpoints()
        w = wh.checkpoint_watermark()
        expect = reference | set(range(vouched))
        assert set(range(w)) <= expect
        assert w not in expect  # watermark stops exactly at the first gap
