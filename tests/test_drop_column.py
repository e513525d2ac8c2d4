"""Metadata-only DROP COLUMN with resurrection protection."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("n", T.LongType()),
        T.StructField("junk", T.StringType()),
    ]
)


def _mk(spark, path, key="url", n_buckets=8):
    t = LakeTable.create(spark, path, SCHEMA, key=key, n_buckets=n_buckets)
    df = spark.range(50).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.to_timestamp(F.lit("2024-01-01")).alias("warc_ts"),
        F.col("id").alias("n"),
        F.lit("OLD").alias("junk"),
    )
    if key:
        df = df.withColumn("_lsn", F.lit(1)).withColumn("_deleted", F.lit(False))
        t.merge_cdc(df, epoch_id=0)
    else:
        t.append(df, epoch_id=0)
    return t


def test_drop_is_metadata_only_and_blocks_resurrection(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    files_before = {f["path"] for f in t.snapshot().files}
    res = t.drop_column("junk")
    assert "junk" not in t.read().columns
    assert {f["path"] for f in t.snapshot().files} == files_before  # zero rewrites
    assert t.read().count() == 50  # rows intact
    # time travel to the pre-drop version still sees the column
    assert "junk" in t.read(version=res["version"] - 1).columns
    # resurrection refused while old bytes survive
    revive = spark.range(1).select(
        F.lit("u0").alias("url"),
        F.to_timestamp(F.lit("2024-02-01")).alias("warc_ts"),
        F.lit(0).cast("long").alias("n"),
        F.lit("NEW").alias("junk"),
        F.lit(2).alias("_lsn"),
        F.lit(False).alias("_deleted"),
    )
    with pytest.raises(ValueError, match="resurrect"):
        t.merge_cdc(revive, epoch_id=1)
    # full compact purges the bytes; the name becomes safe and old values
    # do NOT come back
    t.compact()
    t.merge_cdc(revive, epoch_id=1)
    got = {r["url"]: r["junk"] for r in t.read().select("url", "junk").collect()}
    assert got["u0"] == "NEW"
    assert all(v is None for u, v in got.items() if u != "u0")  # no resurrection


def test_drop_guards(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    for col in ("url", "warc_ts", "_lsn"):
        with pytest.raises(ValueError, match="cannot drop"):
            t.drop_column(col)
    with pytest.raises(ValueError, match="no column"):
        t.drop_column("ghost")


def test_drop_on_append_only_clears_via_rewrite_files(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), key=None)
    t.drop_column("junk")
    assert "junk" not in t.read().columns
    with pytest.raises(ValueError, match="resurrect"):
        t.append(
            spark.range(1).select(
                F.lit("x").alias("url"),
                F.to_timestamp(F.lit("2024-02-01")).alias("warc_ts"),
                F.lit(1).cast("long").alias("n"),
                F.lit("NEW").alias("junk"),
            ),
            epoch_id=1,
        )
    t.rewrite_files()
    t.append(
        spark.range(1).select(
            F.lit("x").alias("url"),
            F.to_timestamp(F.lit("2024-02-01")).alias("warc_ts"),
            F.lit(1).cast("long").alias("n"),
            F.lit("NEW").alias("junk"),
        ),
        epoch_id=1,
    )
    vals = {r["junk"] for r in t.read().select("junk").collect()}
    assert vals == {None, "NEW"}  # old rows null-backfill, never resurrect
