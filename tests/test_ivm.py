"""Incremental view maintenance over a keyed CDC table: retraction,
group moves, deletes, out-of-order revisions, crash redelivery."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.lake.ivm import KeyedAggView
from data_exchange_routing_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, ts string, lang string, n long, _lsn long, _deleted boolean"
    ).select(
        "url", F.to_timestamp("ts").alias("warc_ts"), "lang", "n", "_lsn", "_deleted"
    )


def _expected(src):
    return sorted(
        tuple(r)
        for r in src.read()
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum(F.col("n").cast("double")).alias("sum_n"))
        .collect()
    )


def _got(view):
    return sorted(tuple(r) for r in view.read().collect())


def test_ivm_tracks_source_through_updates_deletes_and_ooo(spark, tmp_path):
    src = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA, key="url", n_buckets=8)
    view = KeyedAggView.create(
        spark, str(tmp_path / "view"), key="url", group_by=["lang"],
        sums={"sum_n": "n"}, source_schema=SCHEMA, n_buckets=8,
    )
    epochs = [
        # epoch 0: inserts across two groups
        [(f"u{i}", "2024-01-01 00:00:00", "en" if i % 2 == 0 else "de", i, 1, False)
         for i in range(20)],
        # epoch 1: group moves (en->fr for %4) + value changes + two deletes
        [(f"u{i}", "2024-01-02 00:00:00", "fr", i + 100, 2, False)
         for i in range(0, 20, 4)]
        + [("u1", "2024-01-02 00:00:00", "de", 0, 2, True),
           ("u3", "2024-01-02 00:00:00", "de", 0, 2, True)],
        # epoch 2: out-of-order stale revisions (older ts) that must LOSE,
        # plus a genuine newer update and a delete-then... revive of u1
        [("u0", "2023-12-01 00:00:00", "zz", 999, 3, False),  # stale: loses
         ("u2", "2024-01-03 00:00:00", "en", 500, 3, False),  # wins
         ("u1", "2024-01-03 00:00:00", "en", 7, 3, False)],   # revives
    ]
    prev_v = src.current_version()
    for e, rows in enumerate(epochs):
        src.merge_cdc(_batch(spark, rows), epoch_id=e)
        cur_v = src.current_version()
        feed = src.read_changes(prev_v, cur_v, with_internal=True)
        view.apply_changes(feed, epoch_id=e)
        prev_v = cur_v
        assert _got(view) == _expected(src), f"epoch {e}"
    # the stale zz revision must not have leaked a group
    assert all(r[0] != "zz" for r in _got(view))

    # redelivery of the last feed batch is a no-op
    res = view.apply_changes(
        src.read_changes(prev_v - 1, prev_v, with_internal=True), epoch_id=2
    )
    assert res["skipped"] is True
    assert _got(view) == _expected(src)

    # compaction preserves the aggregate
    view.compact()
    assert _got(view) == _expected(src)


def test_ivm_crash_between_commits_heals_on_redelivery(spark, tmp_path, monkeypatch):
    src = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA, key="url", n_buckets=8)
    view = KeyedAggView.create(
        spark, str(tmp_path / "view"), key="url", group_by=["lang"],
        sums={"sum_n": "n"}, source_schema=SCHEMA, n_buckets=8,
    )
    v0 = src.current_version()
    src.merge_cdc(
        _batch(spark, [(f"u{i}", "2024-01-01 00:00:00", "en", i, 1, False) for i in range(8)]),
        epoch_id=0,
    )
    feed0 = src.read_changes(v0, with_internal=True)
    view.apply_changes(feed0, epoch_id=0)
    v1 = src.current_version()
    src.merge_cdc(
        _batch(spark, [("u0", "2024-01-02 00:00:00", "de", 1000, 2, False)]), epoch_id=1
    )
    feed1 = src.read_changes(v1, with_internal=True)

    # crash AFTER the adjustment append, BEFORE the contribution merge
    real_merge = view.contrib.merge_cdc

    def boom(*a, **k):
        raise RuntimeError("simulated crash")

    monkeypatch.setattr(view.contrib, "merge_cdc", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        view.apply_changes(feed1, epoch_id=1)
    monkeypatch.setattr(view.contrib, "merge_cdc", real_merge)

    # redelivery: adjustment append skips by guard, contribution re-applies
    res = view.apply_changes(feed1, epoch_id=1)
    assert res["skipped"] is False
    assert res["adjust"]["skipped"] is True and res["contrib"]["skipped"] is False
    assert _got(view) == _expected(src)
    # and a THIRD delivery is a full no-op
    assert view.apply_changes(feed1, epoch_id=1)["skipped"] is True


def test_ivm_driven_by_changefeed_consumer(spark, tmp_path):
    """Composition: the durable-cursor ChangeFeedConsumer drives the IVM
    view (epoch id = the feed's to_version, unique and ordered); an
    interrupted drain resumes from the cursor and the view converges."""
    from data_exchange_routing_spark.lake.changefeed import ChangeFeedConsumer

    src = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA, key="url", n_buckets=8)
    view = KeyedAggView.create(
        spark, str(tmp_path / "view"), key="url", group_by=["lang"],
        sums={"sum_n": "n"}, source_schema=SCHEMA, n_buckets=8,
    )
    consumer = ChangeFeedConsumer(
        spark, src.path, consumer_id="ivm", with_internal=True
    )

    def fold(changes, _from_v, to_v):
        view.apply_changes(changes, epoch_id=to_v)

    for e in range(3):
        rows = [
            (f"u{i}", f"2024-01-0{e + 1} 00:00:00",
             "en" if (i + e) % 2 == 0 else "de", i * (e + 1), e + 1,
             e == 2 and i % 5 == 0)
            for i in range(15)
        ]
        src.merge_cdc(_batch(spark, rows), epoch_id=e)
        consumer.drain(fold, max_versions_per_batch=1)
        assert _got(view) == _expected(src), f"epoch {e}"

    # a fresh consumer object resumes from the durable cursor: nothing new
    c2 = ChangeFeedConsumer(spark, src.path, consumer_id="ivm", with_internal=True)
    assert c2.drain(fold)["processed_versions"] == 0
    assert _got(view) == _expected(src)


def test_aggview_compact_folds_log_and_guards_stay_flat(spark, tmpdir_path):
    """compact() group-sums the adjustment log to O(live groups) rows (read
    unchanged), and the monotonic epoch guards keep committed_epochs at a
    bounded encoding instead of one integer per batch."""
    from data_exchange_routing_spark.lake.ivm import KeyedAggView

    src_schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n", T.LongType()),
        ]
    )
    view = KeyedAggView.create(
        spark, f"{tmpdir_path}/agg_fold", "url", ["lang"], {"sum_n": "n"},
        src_schema, n_buckets=4,
    )
    for ep in range(1, 7):
        batch = (
            spark.createDataFrame(
                [(f"u{i}", "en" if i % 2 else "de", i + ep) for i in range(6)],
                "url string, lang string, n long",
            )
            .withColumn("warc_ts", F.to_timestamp(F.lit(f"2024-01-0{ep} 00:00:00")))
            .withColumn("_lsn", F.lit(ep).cast("long"))
            .withColumn("_deleted", F.lit(False))
        )
        view.apply_changes(batch, epoch_id=ep)
    before = {tuple(r) for r in view.read().collect()}
    n_log_rows = view.adjust.read().count()
    assert n_log_rows > 2  # adjustments accumulated across epochs
    res = view.compact()
    assert not res.get("skipped", False)
    assert view.adjust.read().count() == 2  # one net row per live group
    assert {tuple(r) for r in view.read().collect()} == before
    # monotonic guard: committed_epochs holds a watermark, not 6 integers
    enc = view.adjust.snapshot().committed_epochs["ivm"]
    assert isinstance(enc, dict) and enc.get("w") == 6 and not enc.get("extra")


def test_aggview_create_validates_columns(spark, tmpdir_path):
    from data_exchange_routing_spark.lake.ivm import KeyedAggView

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("n", T.LongType()),
        ]
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in source schema"):
        KeyedAggView.create(spark, f"{tmpdir_path}/v1", "url", ["nope"], {}, schema)
    with _pytest.raises(ValueError, match="collides"):
        KeyedAggView.create(spark, f"{tmpdir_path}/v2", "url", ["warc_ts"], {}, schema)


def _expected_mm(src):
    return sorted(
        tuple(r)
        for r in src.read()
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("n").cast("double")).alias("sum_n"),
            F.min(F.col("n").cast("double")).alias("min_n"),
            F.max(F.col("n").cast("double")).alias("max_n"),
        )
        .collect()
    )


def test_ivm_minmax_tracks_source_through_retractions(spark, tmp_path):
    """VERDICT r04 item 2: retractable min/max — updates that move the
    extreme row across groups, deletes that retract the current min/max
    (forcing fallback to the next live value), out-of-order stale losses,
    NULL values, redelivery, compaction."""
    src = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA, key="url", n_buckets=8)
    view = KeyedAggView.create(
        spark, str(tmp_path / "view"), key="url", group_by=["lang"],
        sums={"sum_n": "n"}, mins={"min_n": "n"}, maxs={"max_n": "n"},
        source_schema=SCHEMA, n_buckets=8,
    )
    epochs = [
        # epoch 0: u0 holds en's min (0), u19 de's max (19); u6 NULL value
        [(f"u{i}", "2024-01-01 00:00:00", "en" if i % 2 == 0 else "de",
          None if i == 6 else i, 1, False) for i in range(20)],
        # epoch 1: DELETE the current en-min (u0) and de-max (u19): both
        # groups must fall back to their next live values; move u2 (en) to
        # fr with a huge value
        [("u0", "2024-01-02 00:00:00", "en", 0, 2, True),
         ("u19", "2024-01-02 00:00:00", "de", 0, 2, True),
         ("u2", "2024-01-02 00:00:00", "fr", 5000, 2, False)],
        # epoch 2: stale revision must lose; update u4's value DOWN so it
        # becomes en's new min; revive u0 into de
        [("u4", "2023-06-01 00:00:00", "zz", -99, 3, False),   # stale: loses
         ("u4", "2024-01-03 00:00:00", "en", -7, 3, False),    # new en min
         ("u0", "2024-01-03 00:00:00", "de", 123, 3, False)],
    ]
    prev_v = src.current_version()
    for e, rows in enumerate(epochs):
        src.merge_cdc(_batch(spark, rows), epoch_id=e)
        cur_v = src.current_version()
        view.apply_changes(src.read_changes(prev_v, cur_v, with_internal=True), epoch_id=e)
        prev_v = cur_v
        assert _got(view) == _expected_mm(src), f"epoch {e}"
    # redelivery is a full no-op
    res = view.apply_changes(
        src.read_changes(prev_v - 1, prev_v, with_internal=True), epoch_id=2
    )
    assert res["skipped"] is True
    # compaction folds both logs without changing the readout
    view.compact()
    assert _got(view) == _expected_mm(src)
    # histogram is folded to net counts: no row with _ecnt <= 0 remains
    assert view.elog.read().filter(F.col("_ecnt") <= 0).count() == 0


def test_ivm_minmax_all_null_group_reads_null(spark, tmp_path):
    src = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA, key="url", n_buckets=4)
    view = KeyedAggView.create(
        spark, str(tmp_path / "view"), key="url", group_by=["lang"],
        sums={}, mins={"min_n": "n"}, maxs={"max_n": "n"},
        source_schema=SCHEMA, n_buckets=4,
    )
    v0 = src.current_version()
    src.merge_cdc(
        _batch(spark, [("a", "2024-01-01 00:00:00", "en", None, 1, False),
                       ("b", "2024-01-01 00:00:00", "en", None, 1, False),
                       ("c", "2024-01-01 00:00:00", "de", 3, 1, False)]),
        epoch_id=0,
    )
    view.apply_changes(src.read_changes(v0, with_internal=True), epoch_id=0)
    got = {r["lang"]: (r["min_n"], r["max_n"]) for r in view.read().collect()}
    assert got == {"en": (None, None), "de": (3.0, 3.0)}


def test_ivm_minmax_crash_between_elog_and_contrib_heals(spark, tmp_path, monkeypatch):
    """Crash AFTER adjust+elog appends, BEFORE the contribution merge:
    redelivery skips both guarded appends and re-applies the merge."""
    src = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA, key="url", n_buckets=4)
    view = KeyedAggView.create(
        spark, str(tmp_path / "view"), key="url", group_by=["lang"],
        sums={"sum_n": "n"}, mins={"min_n": "n"}, maxs={},
        source_schema=SCHEMA, n_buckets=4,
    )
    v0 = src.current_version()
    src.merge_cdc(
        _batch(spark, [(f"u{i}", "2024-01-01 00:00:00", "en", i, 1, False) for i in range(6)]),
        epoch_id=0,
    )
    feed0 = src.read_changes(v0, with_internal=True)
    view.apply_changes(feed0, epoch_id=0)
    v1 = src.current_version()
    src.merge_cdc(  # delete the current min: the retraction crosses the crash
        _batch(spark, [("u0", "2024-01-02 00:00:00", "en", 0, 2, True)]), epoch_id=1
    )
    feed1 = src.read_changes(v1, with_internal=True)
    real_merge = view.contrib.merge_cdc
    monkeypatch.setattr(
        view.contrib, "merge_cdc",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("simulated crash")),
    )
    with pytest.raises(RuntimeError, match="simulated crash"):
        view.apply_changes(feed1, epoch_id=1)
    monkeypatch.setattr(view.contrib, "merge_cdc", real_merge)
    res = view.apply_changes(feed1, epoch_id=1)
    assert res["skipped"] is False
    assert res["adjust"]["skipped"] is True and res["elog"]["skipped"] is True
    assert res["contrib"]["skipped"] is False
    assert _got(view) == sorted(
        tuple(r) for r in src.read().groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("n").cast("double")).alias("sum_n"),
            F.min(F.col("n").cast("double")).alias("min_n"),
        ).collect()
    )
    assert view.apply_changes(feed1, epoch_id=1)["skipped"] is True


def test_ivm_minmax_null_group_key_reads_extrema(spark, tmp_path):
    """r05 review finding: GROUP BY puts NULL keys in one group, so the
    extrema join must be null-safe — a NULL-keyed group with live non-NULL
    values reads its real min/max, not NULL."""
    src = LakeTable.create(spark, str(tmp_path / "src"), SCHEMA, key="url", n_buckets=4)
    view = KeyedAggView.create(
        spark, str(tmp_path / "view"), key="url", group_by=["lang"],
        sums={}, mins={"min_n": "n"}, maxs={"max_n": "n"},
        source_schema=SCHEMA, n_buckets=4,
    )
    v0 = src.current_version()
    src.merge_cdc(
        _batch(spark, [("a", "2024-01-01 00:00:00", None, 7, 1, False),
                       ("b", "2024-01-01 00:00:00", None, 3, 1, False),
                       ("c", "2024-01-01 00:00:00", "en", 5, 1, False)]),
        epoch_id=0,
    )
    view.apply_changes(src.read_changes(v0, with_internal=True), epoch_id=0)
    got = {r["lang"]: (r["n_rows"], r["min_n"], r["max_n"]) for r in view.read().collect()}
    assert got == {None: (2, 3.0, 7.0), "en": (1, 5.0, 5.0)}
