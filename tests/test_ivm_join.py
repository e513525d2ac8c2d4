"""KeyedJoinView: incremental fact ⋈ dim join maintenance from two change
feeds. The invariant checked after EVERY apply: the view equals the
from-scratch join of the two source tables' CURRENT resolved states — so
group moves, dim deletes/resurrections, redelivery and interleaving all
reduce to one equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.lake.ivm import KeyedJoinView
from data_exchange_routing_spark.lake.table import LakeTable

FACT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)
DIM_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("region", T.StringType()),
        T.StructField("boost", T.LongType()),
    ]
)


def _fact_batch(spark, rows, ts, lsn):
    return (
        spark.createDataFrame(rows, "url string, lang string, n long, _deleted boolean")
        .withColumn("warc_ts", F.to_timestamp(F.lit(ts)))
        .withColumn("_lsn", F.lit(lsn).cast("long"))
    )


def _dim_batch(spark, rows, ts, lsn):
    return (
        spark.createDataFrame(rows, "lang string, region string, boost long, _deleted boolean")
        .withColumn("warc_ts", F.to_timestamp(F.lit(ts)))
        .withColumn("_lsn", F.lit(lsn).cast("long"))
    )


def _expected(fact: LakeTable, dim: LakeTable, how: str):
    f = fact.read()
    d = dim.read().drop("warc_ts")
    j = f.join(d, "lang", how)
    return {tuple(r) for r in j.select("url", "lang", "n", "region", "boost").collect()}


def _got(view: KeyedJoinView):
    return {
        tuple(r)
        for r in view.read().select("url", "lang", "n", "region", "boost").collect()
    }


@pytest.fixture()
def setup(spark, tmpdir_path):
    fact = LakeTable.create(
        spark, f"{tmpdir_path}/fact", FACT_SCHEMA, key="url", n_buckets=4
    )
    dim = LakeTable.create(
        spark, f"{tmpdir_path}/dim", DIM_SCHEMA, key="lang", n_buckets=4
    )
    return fact, dim


def _drive(spark, fact, dim, view, script):
    """script: list of ("fact"|"dim", batch, epoch). Applies each through the
    real change feed and asserts view == from-scratch join after every step."""
    pv = {"fact": fact.current_version(), "dim": dim.current_version()}
    for kind, batch, ep in script:
        src = fact if kind == "fact" else dim
        src.merge_cdc(batch, epoch_id=ep)
        cv = src.current_version()
        feed = src.read_changes(pv[kind], cv, with_internal=True)
        if kind == "fact":
            view.apply_fact_changes(feed, epoch_id=ep)
        else:
            view.apply_dim_changes(feed, epoch_id=ep)
        pv[kind] = cv
        assert _got(view) == _expected(fact, dim, view.how), (
            f"divergence after {kind} epoch {ep}"
        )


@pytest.mark.parametrize("fk_index", [False, True])
def test_inner_join_lifecycle(spark, tmpdir_path, setup, fk_index):
    """Insert → group move → fact delete → dim update → dim delete →
    dim insert (resurrection), equality checked after every apply — with and
    without the fk secondary index (bucket-pruned dim applies)."""
    fact, dim = setup
    view = KeyedJoinView.create(
        spark, f"{tmpdir_path}/v", FACT_SCHEMA, fact_key="url", fk="lang",
        dim=dim, dim_cols=["region", "boost"], how="inner", n_buckets=4,
        fk_index=fk_index,
    )
    script = [
        ("dim", _dim_batch(spark, [("en", "r-en", 1, False), ("fr", "r-fr", 2, False)], "2024-01-01", 1), 0),
        # u3 is unmatched (lang zz) until the dim insert at the end
        ("fact", _fact_batch(spark, [("u1", "en", 10, False), ("u2", "fr", 20, False), ("u3", "zz", 30, False)], "2024-01-01", 1), 0),
        # group move u1 en→fr; delete u2
        ("fact", _fact_batch(spark, [("u1", "fr", 11, False), ("u2", "fr", 0, True)], "2024-01-02", 2), 1),
        # dim update fr payload (must re-emit u1), delete en, insert zz (resurrects u3)
        ("dim", _dim_batch(spark, [("fr", "r2-fr", 7, False), ("en", None, None, True), ("zz", "r-zz", 9, False)], "2024-01-02", 2), 1),
    ]
    _drive(spark, fact, dim, view, script)
    final = _got(view)
    assert final == {("u1", "fr", 11, "r2-fr", 7), ("u3", "zz", 30, "r-zz", 9)}


def test_left_join_shows_unmatched(spark, tmpdir_path, setup):
    fact, dim = setup
    view = KeyedJoinView.create(
        spark, f"{tmpdir_path}/v", FACT_SCHEMA, fact_key="url", fk="lang",
        dim=dim, dim_cols=["region", "boost"], how="left", n_buckets=4,
    )
    script = [
        ("fact", _fact_batch(spark, [("u1", "en", 1, False), ("u2", "zz", 2, False)], "2024-01-01", 1), 0),
        ("dim", _dim_batch(spark, [("en", "r-en", 5, False)], "2024-01-01", 1), 0),
        # dim delete drops the payload but the fact row stays visible
        ("dim", _dim_batch(spark, [("en", None, None, True)], "2024-01-02", 2), 1),
    ]
    _drive(spark, fact, dim, view, script)
    assert _got(view) == {("u1", "en", 1, None, None), ("u2", "zz", 2, None, None)}


def test_redelivery_is_idempotent(spark, tmpdir_path, setup):
    """Exact redelivery of an applied feed batch is an epoch-guard no-op for
    both feeds."""
    fact, dim = setup
    view = KeyedJoinView.create(
        spark, f"{tmpdir_path}/v", FACT_SCHEMA, fact_key="url", fk="lang",
        dim=dim, dim_cols=["region", "boost"], how="inner", n_buckets=4,
    )
    dim.merge_cdc(_dim_batch(spark, [("en", "r-en", 1, False)], "2024-01-01", 1), epoch_id=0)
    dfeed = dim.read_changes(1, dim.current_version(), with_internal=True)
    assert view.apply_dim_changes(dfeed, epoch_id=0)["skipped"] is False
    fact.merge_cdc(_fact_batch(spark, [("u1", "en", 1, False)], "2024-01-01", 1), epoch_id=0)
    ffeed = fact.read_changes(1, fact.current_version(), with_internal=True)
    assert view.apply_fact_changes(ffeed, epoch_id=0)["skipped"] is False
    before = _got(view)
    v_before = view.view.current_version()
    # crash-redelivery: both applies re-run with the same epoch ids
    assert view.apply_dim_changes(dfeed, epoch_id=0)["skipped"] is True
    assert view.apply_fact_changes(ffeed, epoch_id=0)["skipped"] is True
    assert _got(view) == before
    assert view.view.current_version() == v_before


def test_multi_revision_batch_nets_to_winner(spark, tmpdir_path, setup):
    """A feed batch spanning several commits applies only each key's LWW
    winner — intermediate revisions never hit the view."""
    fact, dim = setup
    view = KeyedJoinView.create(
        spark, f"{tmpdir_path}/v", FACT_SCHEMA, fact_key="url", fk="lang",
        dim=dim, dim_cols=["region", "boost"], how="inner", n_buckets=4,
    )
    dim.merge_cdc(_dim_batch(spark, [("en", "r-en", 1, False), ("fr", "r-fr", 2, False)], "2024-01-01", 1), epoch_id=0)
    view.apply_dim_changes(dim.read_changes(1, dim.current_version(), with_internal=True), epoch_id=0)
    # three fact commits folded into ONE feed batch
    fact.merge_cdc(_fact_batch(spark, [("u1", "en", 1, False)], "2024-01-01", 1), epoch_id=0)
    fact.merge_cdc(_fact_batch(spark, [("u1", "fr", 2, False)], "2024-01-02", 2), epoch_id=1)
    fact.merge_cdc(_fact_batch(spark, [("u1", "en", 3, False)], "2024-01-03", 3), epoch_id=2)
    feed = fact.read_changes(1, fact.current_version(), with_internal=True)
    view.apply_fact_changes(feed, epoch_id=0)
    assert _got(view) == {("u1", "en", 3, "r-en", 1)}


def test_load_roundtrip(spark, tmpdir_path, setup):
    fact, dim = setup
    view = KeyedJoinView.create(
        spark, f"{tmpdir_path}/v", FACT_SCHEMA, fact_key="url", fk="lang",
        dim=dim, dim_cols=["region", "boost"], how="inner", n_buckets=4,
    )
    dim.merge_cdc(_dim_batch(spark, [("en", "r-en", 1, False)], "2024-01-01", 1), epoch_id=0)
    view.apply_dim_changes(dim.read_changes(1, dim.current_version(), with_internal=True), epoch_id=0)
    fact.merge_cdc(_fact_batch(spark, [("u1", "en", 1, False)], "2024-01-01", 1), epoch_id=0)
    view.apply_fact_changes(fact.read_changes(1, fact.current_version(), with_internal=True), epoch_id=0)
    re = KeyedJoinView.load(
        spark, f"{tmpdir_path}/v", fact_key="url", fk="lang", dim=dim,
        dim_cols=["region", "boost"], how="inner",
    )
    assert _got(re) == {("u1", "en", 1, "r-en", 1)}


def test_create_validations(spark, tmpdir_path, setup):
    fact, dim = setup
    with pytest.raises(ValueError, match="clash"):
        KeyedJoinView.create(
            spark, f"{tmpdir_path}/v1", FACT_SCHEMA, fact_key="url", fk="lang",
            dim=dim, dim_cols=["n"], how="inner",
        )
    with pytest.raises(ValueError, match="not on dim"):
        KeyedJoinView.create(
            spark, f"{tmpdir_path}/v2", FACT_SCHEMA, fact_key="url", fk="lang",
            dim=dim, dim_cols=["nope"], how="inner",
        )
    with pytest.raises(ValueError, match="how"):
        KeyedJoinView.create(
            spark, f"{tmpdir_path}/v3", FACT_SCHEMA, fact_key="url", fk="lang",
            dim=dim, dim_cols=["region"], how="full",
        )


def test_fk_index_prunes_dim_apply(spark, tmpdir_path, setup):
    """With fk_index on, a dim apply scans only the view buckets the index
    names for the touched keys — strictly fewer than n_buckets here — and
    still repairs every dependent row."""
    fact, dim = setup
    view = KeyedJoinView.create(
        spark, f"{tmpdir_path}/v", FACT_SCHEMA, fact_key="url", fk="lang",
        dim=dim, dim_cols=["region", "boost"], how="inner", n_buckets=16,
        fk_index=True,
    )
    dim.merge_cdc(_dim_batch(spark, [("en", "r-en", 1, False), ("fr", "r-fr", 2, False)], "2024-01-01", 1), epoch_id=0)
    view.apply_dim_changes(dim.read_changes(1, dim.current_version(), with_internal=True), epoch_id=0)
    fact.merge_cdc(
        _fact_batch(spark, [("u1", "en", 1, False), ("u2", "fr", 2, False), ("u3", "fr", 3, False)], "2024-01-01", 1),
        epoch_id=0,
    )
    view.apply_fact_changes(fact.read_changes(1, fact.current_version(), with_internal=True), epoch_id=0)
    pv = dim.current_version()
    dim.merge_cdc(_dim_batch(spark, [("fr", "r2-fr", 9, False)], "2024-01-02", 2), epoch_id=1)
    res = view.apply_dim_changes(dim.read_changes(pv, dim.current_version(), with_internal=True), epoch_id=1)
    touched = res["touched_buckets"]
    # only u2/u3's buckets (fr rows) — at most 2 of 16, never the full table
    assert 0 < len(touched) <= 2
    assert _got(view) == {
        ("u1", "en", 1, "r-en", 1),
        ("u2", "fr", 2, "r2-fr", 9),
        ("u3", "fr", 3, "r2-fr", 9),
    }


def test_stale_dim_revision_does_not_overwrite_newer(spark, tmpdir_path, setup):
    """A late-arriving STALE dim revision (older warc_ts committed in a
    later feed batch) must not overwrite newer dim data in the view: the
    dim table's own LWW keeps the newer row, and the view re-enriches from
    the dim's CURRENT state, not the batch image."""
    fact, dim = setup
    view = KeyedJoinView.create(
        spark, f"{tmpdir_path}/v_stale", FACT_SCHEMA, "url", "lang",
        dim, ["region", "boost"], how="left",
    )
    _drive(spark, fact, dim, view, [
        ("dim", _dim_batch(spark, [("en", "NEW", 2, False)], "2024-01-05 00:00:00", 10), 0),
        ("fact", _fact_batch(spark, [("u1", "en", 1, False)], "2024-01-01 00:00:00", 1), 0),
        # stale revision: older warc_ts, later feed batch — dim LWW keeps NEW
        ("dim", _dim_batch(spark, [("en", "OLD", 1, False)], "2024-01-02 00:00:00", 11), 1),
    ])
    rows = {r.url: r.region for r in view.read().collect()}
    assert rows == {"u1": "NEW"}


def test_fkidx_bypassed_after_view_rebucket(spark, tmpdir_path, setup):
    """ADVICE-class fix: fkidx bucket ids are only meaningful under the
    bucket count they were computed with. After view.rebucket() the dim
    apply must fall back to a full view scan (correct, broader) instead of
    scanning the wrong buckets and silently missing dependent rows."""
    fact, dim = setup
    view = KeyedJoinView.create(
        spark, f"{tmpdir_path}/v_rb", FACT_SCHEMA, "url", "lang",
        dim, ["region", "boost"], how="left", n_buckets=4, fk_index=True,
    )
    _drive(spark, fact, dim, view, [
        ("dim", _dim_batch(spark, [("en", "R1", 1, False)], "2024-01-01 00:00:00", 1), 0),
        ("fact", _fact_batch(spark, [(f"u{i}", "en", i, False) for i in range(8)],
                             "2024-01-02 00:00:00", 2), 0),
    ])
    assert view._fkidx_valid()
    view.view.rebucket(16)
    assert not view._fkidx_valid()
    # dim update after the rebucket: full-scan fallback keeps correctness
    _drive(spark, fact, dim, view, [
        ("dim", _dim_batch(spark, [("en", "R2", 2, False)], "2024-01-03 00:00:00", 3), 1),
    ])
    assert {r.region for r in view.read().collect()} == {"R2"}
