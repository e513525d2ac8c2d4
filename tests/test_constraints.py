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
