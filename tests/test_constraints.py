"""Write-time CHECK constraints: loud abort before staging, SQL NULL
semantics, tombstone exemption, add-time validation, exactly-once guard
interplay."""

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


def _batch(spark, vals, lsn=1, deleted=False):
    rows = [(u, n) for u, n in vals]
    df = spark.createDataFrame(rows, "url string, n long").select(
        "url",
        F.to_timestamp(F.lit("2024-01-01")).alias("warc_ts"),
        "n",
        F.lit(lsn).alias("_lsn"),
        F.lit(deleted).alias("_deleted"),
    )
    return df


def test_violating_commit_aborts_and_leaves_no_trace(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="url", n_buckets=4)
    t.add_constraint("n_nonneg", "n >= 0")
    t.merge_cdc(_batch(spark, [("a", 1), ("b", 2)]), epoch_id=0)
    v = t.current_version()
    with pytest.raises(ValueError, match="n_nonneg"):
        t.merge_cdc(_batch(spark, [("c", 3), ("d", -1)], lsn=2), epoch_id=1)
    assert t.current_version() == v  # nothing committed
    assert t.read().count() == 2
    assert 1 not in t.committed_epochs()  # epoch retriable after a fix
    t.merge_cdc(_batch(spark, [("c", 3), ("d", 1)], lsn=2), epoch_id=1)
    assert t.read().count() == 4


def test_null_passes_unless_not_null_constraint(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="url", n_buckets=4)
    t.add_constraint("n_nonneg", "n >= 0")
    null_batch = spark.createDataFrame([("a",)], "url string").select(
        "url",
        F.to_timestamp(F.lit("2024-01-01")).alias("warc_ts"),
        F.lit(None).cast("long").alias("n"),
        F.lit(1).alias("_lsn"),
        F.lit(False).alias("_deleted"),
    )
    t.merge_cdc(null_batch, epoch_id=0)  # NULL = unknown = passes (SQL CHECK)
    t.add_constraint("n_set", "n IS NOT NULL", validate=False)
    with pytest.raises(ValueError, match="n_set"):
        t.merge_cdc(null_batch.withColumn("_lsn", F.lit(2)), epoch_id=1)


def test_tombstones_exempt_and_deletes_flow(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="url", n_buckets=4)
    t.add_constraint("n_set", "n IS NOT NULL")
    t.merge_cdc(_batch(spark, [("a", 1), ("b", 2)]), epoch_id=0)
    t.delete_where(F.col("url") == "a", epoch_id=1)  # tombstone has NULL n
    assert {r["url"] for r in t.read().collect()} == {"b"}


def test_add_constraint_validates_existing_state(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="url", n_buckets=4)
    t.merge_cdc(_batch(spark, [("a", -5)]), epoch_id=0)
    with pytest.raises(ValueError, match="existing rows violate"):
        t.add_constraint("n_nonneg", "n >= 0")
    assert t._constraints() == {}
    t.add_constraint("n_nonneg", "n >= 0", validate=False)  # explicit override
    t.drop_constraint("n_nonneg")
    with pytest.raises(ValueError, match="no constraint"):
        t.drop_constraint("n_nonneg")


def test_append_rows_driver_path_enforced(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key=None, n_buckets=1)
    t.add_constraint("n_nonneg", "n >= 0")
    import datetime

    ts = datetime.datetime(2024, 1, 1)
    t.append_rows([("a", ts, 1)], SCHEMA, epoch_id=0)
    with pytest.raises(ValueError, match="n_nonneg"):
        t.append_rows([("b", ts, -1)], SCHEMA, epoch_id=1)
    assert t.read().count() == 1


def test_bad_expression_rejected_at_add_time(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, key="url", n_buckets=4)
    with pytest.raises(Exception):
        t.add_constraint("broken", "n >=== 0")
    with pytest.raises(ValueError, match="invalid constraint name"):
        t.add_constraint("no spaces!", "n >= 0")
    with pytest.raises(ValueError, match="already exists"):
        t.add_constraint("c1", "n >= 0")
        t.add_constraint("c1", "n >= 1")


# ------------------------------------------------- numeric col_stats pruning


def test_range_filter_prunes_files_and_stays_exact(spark, tmp_path):
    """col_stats generalize ts_stats: a numeric range read must open only
    files whose recorded range overlaps, and return exactly the plain
    predicate scan's rows."""
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        T.StructType(
            [T.StructField("url", T.StringType()), T.StructField("n", T.LongType())]
        ),
        key=None,
        n_buckets=1,
    )
    # 4 epoch commits with disjoint n ranges -> 4 files with tight stats
    for e in range(4):
        df = spark.range(e * 100, e * 100 + 100).select(
            F.concat(F.lit("u"), F.col("id")).alias("url"), F.col("id").alias("n")
        )
        t.append(df, epoch_id=e)
    files = t.snapshot().files
    assert all("col_stats" in f and "n" in f["col_stats"] for f in files)

    got = t.read(range_filter=("n", 150, 249))
    exact = t.read().filter((F.col("n") >= 150) & (F.col("n") <= 249))
    assert sorted(r["n"] for r in got.collect()) == sorted(r["n"] for r in exact.collect())
    # pruning really happened: only the 2 overlapping files' paths are read
    opened = {
        f["path"]
        for f in files
        if f["col_stats"]["n"][0] <= 249 and f["col_stats"]["n"][1] >= 150
    }
    assert len(opened) == 2
    import os

    read_paths = {
        os.path.relpath(r["p"].removeprefix("file://"), t.path)
        for r in got.select(F.input_file_name().alias("p")).distinct().collect()
    }
    assert read_paths == opened

    # open-ended bounds + keyed-table refusal
    assert t.read(range_filter=("n", 350, None)).count() == 50
    assert t.read(range_filter=("n", None, 49)).count() == 50
    kt = LakeTable.create(
        spark,
        str(tmp_path / "kt"),
        T.StructType(
            [
                T.StructField("url", T.StringType()),
                T.StructField("warc_ts", T.TimestampType()),
                T.StructField("n", T.LongType()),
            ]
        ),
        key="url",
        n_buckets=2,
    )
    with pytest.raises(ValueError, match="append-only"):
        kt.read(range_filter=("n", 0, 1))


# ------------------------------------------------- string col_stats pruning


def test_string_col_stats_prune_range_and_delete_eq(spark, tmp_path):
    """String columns get manifest min/max too (utf8 chunk stats are valid
    bounds whenever present), so the GDPR workhorse delete_eq("url", ...)
    and string range_filter reads prune files without Bloom or a partition
    spec."""
    import os

    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        T.StructType(
            [T.StructField("url", T.StringType()), T.StructField("n", T.LongType())]
        ),
        key=None,
        n_buckets=1,
    )
    # disjoint url prefixes per commit -> tight string stats per file
    for e, pfx in enumerate(["a", "b", "c"]):
        df = spark.range(100).select(
            F.concat(F.lit(f"https://{pfx}.example/p/"), F.col("id")).alias("url"),
            F.col("id").alias("n"),
        )
        t.append(df, epoch_id=e)
    files = t.snapshot().files
    assert all("url" in (f.get("col_stats") or {}) for f in files)

    # string range read opens only the b-prefix file
    got = t.read(range_filter=("url", "https://b", "https://c"))
    assert got.count() == 100
    read_paths = {
        os.path.relpath(r["p"].removeprefix("file://"), t.path)
        for r in got.select(F.input_file_name().alias("p")).distinct().collect()
    }
    assert len(read_paths) == 1

    # CoW delete_eq on a url rewrites exactly one file
    r = t.delete_eq("url", "https://c.example/p/7")
    assert r["files_rewritten"] == 1 and r["rows_deleted"] == 1

    # MoR eq-delete + minor compaction prune the same way
    t.delete_eq_mor("url", "https://a.example/p/7")
    rc = t.compact_mor_deletes()
    assert rc["files_rewritten"] == 1
    assert t.read().count() == 298


def test_string_stats_truncation_keeps_valid_bounds(spark, tmp_path):
    """Bounds longer than the cap are clamped BinaryTruncator-style: the
    min becomes a prefix (<= all values), the max gets its last kept code
    point bumped (>= all values) — so pruning long-url files stays exact."""
    from data_exchange_routing_spark.lake.table import (
        _STR_STATS_MAX,
        _bounded_str_range,
    )

    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        T.StructType([T.StructField("url", T.StringType())]),
        key=None,
        n_buckets=1,
    )
    long_a = "https://a.example/" + "x" * 200
    long_z = "https://z.example/" + "x" * 200
    t.append(spark.createDataFrame([(long_a + "/1",), (long_a + "/2",)], ["url"]), epoch_id=0)
    t.append(spark.createDataFrame([(long_z + "/1",), (long_z + "/2",)], ["url"]), epoch_id=1)
    for f in t.snapshot().files:
        lo, hi = f["col_stats"]["url"]
        assert len(lo) <= _STR_STATS_MAX and len(hi) <= _STR_STATS_MAX + 1
    # bounds stay valid: a probe INSIDE each file's true range never prunes
    # its file, and a probe between the two prefixes opens neither
    assert t.read(range_filter=("url", long_a, long_a + "/9")).count() == 2
    assert t.read(range_filter=("url", long_z, long_z + "/9")).count() == 2
    assert t.read(range_filter=("url", "https://m", "https://n")).count() == 0
    # delete_eq with a long value still hits exactly its file
    assert t.delete_eq("url", long_a + "/1")["files_rewritten"] == 1
    assert t.read().count() == 3

    # helper unit edges: prefix min, bumped max, pathological None
    lo, hi = _bounded_str_range("a" * 100, "b" * 100)
    assert lo == "a" * _STR_STATS_MAX
    assert hi == "b" * (_STR_STATS_MAX - 1) + "c" and hi > "b" * 100
    assert _bounded_str_range("a", chr(0x10FFFF) * (_STR_STATS_MAX + 1)) is None
    assert _bounded_str_range("a", "b") == ["a", "b"]
