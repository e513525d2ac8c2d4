"""Warehouse.register_views: the spark.sql surface over the lake layer —
live views equal the DataFrame API; tag-pinned views are snapshot-isolated."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_exchange_routing_spark.pipeline import Warehouse, replay
from data_exchange_routing_spark.sources.datagen import write_change_events


def test_sql_views_match_dataframe_api_and_pin_tags(spark, tmpdir_path):
    events = f"{tmpdir_path}/events"
    write_change_events(spark, events, 600, 60, n_epochs=2)
    wh = Warehouse(spark, f"{tmpdir_path}/wh", n_buckets=4)
    replay(wh, events, stop_after_epoch=0)
    wh.publish_snapshot("after_e0")
    replay(wh, events)

    views = wh.register_views()
    assert "web_pages" in views
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT lang, count(*) AS n FROM web_pages GROUP BY lang"
        ).collect()
    }
    exp = {
        tuple(r)
        for r in wh.table("web_pages").read()
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == exp and got

    # tag-pinned views see ONLY epoch 0 — and SQL joins across them are
    # consistent (same cut for every table)
    wh.register_views(tag="after_e0", prefix="t0_")
    live = spark.sql("SELECT count(*) FROM web_pages").first()[0]
    pinned = spark.sql("SELECT count(*) FROM t0_web_pages").first()[0]
    assert 0 < pinned < live
    assert pinned == wh.read_consistent("after_e0")["web_pages"].count()


def test_metadata_views_files_snapshots_partitions(spark, tmpdir_path):
    """Iceberg table$files-style metadata views: manifest-derived file,
    snapshot and partition tables agree with the table's own accounting,
    and never open a data file."""
    events = f"{tmpdir_path}/events"
    write_change_events(spark, events, 500, 50, n_epochs=2)
    wh = Warehouse(spark, f"{tmpdir_path}/wh", n_buckets=4)
    replay(wh, events)

    views = wh.register_views(metadata=True)
    assert "web_pages__files" in views and "web_pages__snapshots" in views

    t = wh.table("web_pages")
    snap = t.snapshot()
    files = spark.sql(
        "SELECT count(*) AS n, sum(rows) AS r, sum(bytes) AS b FROM web_pages__files"
    ).first()
    assert files.n == len(snap.files)
    assert files.r == sum(e.get("rows", 0) for e in snap.files)
    assert files.b == sum(e.get("bytes", 0) for e in snap.files)
    # live row count of the resolved table <= manifest rows (tombstones etc.)
    assert files.r >= t.read().count()

    snaps = spark.sql(
        "SELECT max(version) AS v, count(*) AS n FROM web_pages__snapshots"
    ).first()
    assert snaps.v == snap.version and snaps.n >= 1
    ops = {r.operation for r in spark.sql(
        "SELECT DISTINCT operation FROM web_pages__snapshots").collect()}
    assert any(op and "merge" in op for op in ops), ops  # CDC merges recorded

    # partitions view: unpartitioned keyed table -> one NULL-partition row
    # per spec bucket group; totals still reconcile
    parts = spark.sql(
        "SELECT sum(n_files) AS nf, sum(rows) AS r FROM web_pages__partitions"
    ).first()
    assert parts.nf == len(snap.files) and parts.r == files.r


def test_tagged_metadata_views_pin_to_the_same_cut(spark, tmpdir_path):
    """Regression (round-3 ADVICE): register_views(tag=..., metadata=True)
    must materialize the metadata views AS OF the tagged versions — one
    registration, ONE consistent state for data AND metadata. Previously the
    data views honored the tag while __files/__snapshots described the
    later live state."""
    events = f"{tmpdir_path}/events"
    write_change_events(spark, events, 600, 60, n_epochs=3)
    wh = Warehouse(spark, f"{tmpdir_path}/wh", n_buckets=4)
    replay(wh, events, stop_after_epoch=0)
    wh.publish_snapshot("cut0")
    t = wh.table("web_pages")
    pinned_version = t.snapshot().version
    pinned_files = len(t.snapshot().files)
    pinned_rows = sum(e.get("rows", 0) for e in t.snapshot().files)
    replay(wh, events)  # two more epochs on top
    assert t.snapshot().version > pinned_version

    wh.register_views(tag="cut0", prefix="c0_", metadata=True)
    # __snapshots truncates at the pinned version
    v = spark.sql("SELECT max(version) AS v FROM c0_web_pages__snapshots").first().v
    assert v == pinned_version
    # __files describes the tagged manifest, not the live one
    f = spark.sql(
        "SELECT count(*) AS n, sum(rows) AS r FROM c0_web_pages__files"
    ).first()
    assert f.n == pinned_files and f.r == pinned_rows
    live_files = len(t.snapshot().files)
    assert (f.n, spark.sql("SELECT max(version) FROM c0_web_pages__snapshots").first()[0]) != (
        live_files, t.snapshot().version
    )
    # __partitions reconciles with the tagged __files
    p = spark.sql(
        "SELECT sum(n_files) AS nf, sum(rows) AS r FROM c0_web_pages__partitions"
    ).first()
    assert p.nf == f.n and p.r == f.r


def test_metadata_views_partitioned_table(spark, tmpdir_path):
    """On a hidden-partitioned table the partitions view carries the
    transform tuples with per-partition file/row counts."""
    from pyspark.sql import types as T

    from data_exchange_routing_spark.lake.table import LakeTable

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("host", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
        ]
    )
    t = LakeTable.create(spark, f"{tmpdir_path}/pt", schema)
    t.set_partition_spec(
        [{"name": "host_b", "col": "host", "transform": "bucket", "param": 4}]
    )
    df = spark.range(200).select(
        F.col("id"),
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string")).alias("host"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
    )
    t.append(df, epoch_id=0, source="t")
    pdf = t.metadata_df("partitions").toPandas()
    assert pdf["n_files"].sum() == len(t.snapshot().files)
    assert int(pdf["rows"].sum()) == 200
    # every partition row carries the bucket transform tuple
    assert all(p is not None and "host_b" in p for p in pdf["partition"])
    assert len(pdf) <= 4  # at most n buckets partitions
