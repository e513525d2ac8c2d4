"""Metadata-only parquet import (Iceberg add_files / migrate analog).

Onboarding an existing corpus must register files without reading a row:
byte-identical results vs reading the sources directly, footer stats good
enough to prune like native commits, exactly-once under redelivery, and a
lifecycle (expire/vacuum) that never touches the source files.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("n", T.LongType()),
    ]
)


def _corpus(spark, path, parts=3):
    df = spark.range(60).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.to_timestamp(
            F.concat(F.lit("2024-01-"), F.lpad((F.col("id") % 27 + 1).cast("string"), 2, "0"))
        ).alias("warc_ts"),
        F.col("id").alias("n"),
    )
    df.repartition(parts).write.mode("overwrite").parquet(path)
    return sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )


def test_import_roundtrip_and_stats(spark, tmp_path):
    srcs = _corpus(spark, str(tmp_path / "src"))
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    res = t.add_files(srcs, epoch_id=0)
    assert not res["skipped"] and res["files_imported"] == len(srcs)
    got = sorted(t.read().collect())
    want = sorted(spark.read.parquet(*srcs).select(*SCHEMA.fieldNames()).collect())
    assert got == want
    # footer stats registered like a native commit: every imported entry
    # carries ts ranges + numeric/string col stats + row/byte counts
    files = t.snapshot().files
    assert len(files) == len(srcs)
    for f in files:
        assert f["rows"] > 0 and f["bytes"] > 0 and f["bucket"] == -1
        assert "warc_ts" in f.get("ts_stats", {})
        assert "n" in f.get("col_stats", {}) and "url" in f.get("col_stats", {})


def test_import_is_exactly_once(spark, tmp_path):
    srcs = _corpus(spark, str(tmp_path / "src"))
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.add_files(srcs, epoch_id=7)
    v = t.current_version()
    res = t.add_files(srcs, epoch_id=7)  # redelivery
    assert res["skipped"] and t.current_version() == v
    assert t.read().count() == 60


def test_import_prunes_like_native(spark, tmp_path):
    """delete_eq on an imported table rewrites ONLY the file whose footer
    range may hold the key — metadata pruning works without a native write."""
    src_dir = str(tmp_path / "src")
    a = spark.createDataFrame([("a1", None, 1), ("a2", None, 2)], SCHEMA)
    b = spark.createDataFrame([("z8", None, 8), ("z9", None, 9)], SCHEMA)
    a.coalesce(1).write.parquet(src_dir + "/a")
    b.coalesce(1).write.parquet(src_dir + "/b")
    srcs = [
        os.path.join(d, f)
        for d in (src_dir + "/a", src_dir + "/b")
        for f in os.listdir(d)
        if f.endswith(".parquet")
    ]
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.add_files(srcs, epoch_id=0)
    res = t.delete_eq("url", "z9")
    assert res["files_rewritten"] == 1 and res["files_kept"] == 1
    assert sorted(r.url for r in t.read().collect()) == ["a1", "a2", "z8"]


def test_import_schema_evolution_and_null_backfill(spark, tmp_path):
    """A source file missing a table column reads back NULL; a source file
    carrying a NEW column additively evolves the table schema."""
    narrow = spark.createDataFrame([("u1",)], "url string")
    wide = spark.createDataFrame([("u2", 5, "en")], "url string, n long, lang string")
    narrow.coalesce(1).write.parquet(str(tmp_path / "narrow"))
    wide.coalesce(1).write.parquet(str(tmp_path / "wide"))
    srcs = [
        os.path.join(str(tmp_path / d), f)
        for d in ("narrow", "wide")
        for f in os.listdir(tmp_path / d)
        if f.endswith(".parquet")
    ]
    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        T.StructType([T.StructField("url", T.StringType()), T.StructField("n", T.LongType())]),
    )
    t.add_files(srcs, epoch_id=0)
    assert set(t.read().columns) == {"url", "n", "lang"}
    rows = {r.url: (r.n, r.lang) for r in t.read().collect()}
    assert rows == {"u1": (None, None), "u2": (5, "en")}


def test_import_rejects_keyed_tables_and_reserved_cols(spark, tmp_path):
    srcs = _corpus(spark, str(tmp_path / "src"))
    keyed = LakeTable.create(spark, str(tmp_path / "k"), SCHEMA, key="url", n_buckets=4)
    with pytest.raises(ValueError, match="append-only"):
        keyed.add_files(srcs, epoch_id=0)
    bad = spark.createDataFrame([(1, "x")], "`_lsn` long, url string")
    bad.coalesce(1).write.parquet(str(tmp_path / "bad"))
    bad_srcs = [
        os.path.join(str(tmp_path / "bad"), f)
        for f in os.listdir(tmp_path / "bad")
        if f.endswith(".parquet")
    ]
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    with pytest.raises(ValueError, match="reserved"):
        t.add_files(bad_srcs, epoch_id=0)


def test_import_derives_provable_partition_tuples(spark, tmp_path):
    """On a hidden-partitioned table, imported files whose footer stats PROVE
    a constant partition value get the tuple (metadata pruning + metadata
    partition overwrite work); mixed-day and null-bearing files get none and
    stay conservative."""
    from datetime import datetime

    day1 = spark.createDataFrame(
        [("a1", datetime(2024, 1, 1, 3), 1), ("a2", datetime(2024, 1, 1, 9), 2)], SCHEMA
    )
    day2 = spark.createDataFrame([("b1", datetime(2024, 1, 2, 5), 3)], SCHEMA)
    mixed = spark.createDataFrame(
        [("c1", datetime(2024, 1, 3, 1), 4), ("c2", datetime(2024, 1, 4, 1), 5)], SCHEMA
    )
    withnull = spark.createDataFrame([("d1", None, 6), ("d2", datetime(2024, 1, 5), 7)], SCHEMA)
    srcs = []
    for i, df in enumerate((day1, day2, mixed, withnull)):
        d = str(tmp_path / f"s{i}")
        df.coalesce(1).write.parquet(d)
        srcs += [os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")]
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.set_partition_spec([{"name": "d", "col": "warc_ts", "transform": "days"}])
    t.add_files(srcs, epoch_id=0)
    by_day = {f.get("partition", {}).get("d"): f for f in t.snapshot().files}
    assert {"2024-01-01", "2024-01-02"} <= set(by_day)
    unproven = [f for f in t.snapshot().files if "partition" not in f]
    assert len(unproven) == 2  # mixed-day + null-bearing
    # metadata pruning sees the proven tuples
    st = t.partition_prune_stats(part_eq=("warc_ts", datetime(2024, 1, 2, 12)))
    assert st["files_kept"] == 3  # day2 + the two unproven (conservative)
    # range read through the same pruning returns exact rows
    got = sorted(
        r.url for r in t.read(
            range_filter=("warc_ts", datetime(2024, 1, 1), datetime(2024, 1, 1, 23))
        ).collect()
    )
    assert got == ["a1", "a2"]
    # partition overwrite: the proven day-1 file drops METADATA-ONLY; the
    # unproven files are conservatively rewritten, never dropped
    repl = spark.createDataFrame([("a9", datetime(2024, 1, 1, 12), 9)], SCHEMA)
    res = t.overwrite_partitions(repl, epoch_id=1)
    assert res["files_dropped"] == 1
    assert sorted(r.url for r in t.read().collect()) == ["a9", "b1", "c1", "c2", "d1", "d2"]


def test_sources_survive_table_lifecycle(spark, tmp_path):
    """Hardlinked sources are never mutated or reclaimed: compaction +
    snapshot expiry + vacuum on the table leave the source bytes intact."""
    srcs = _corpus(spark, str(tmp_path / "src"))
    before = {p: open(p, "rb").read() for p in srcs}
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.add_files(srcs, epoch_id=0)
    t.rewrite_files(n_files=1)
    t.expire_snapshots(keep_last=1)
    t.vacuum_orphans()
    assert t.read().count() == 60
    for p, data in before.items():
        assert open(p, "rb").read() == data
