"""Metadata-only RENAME COLUMN: alias-mapped reads across file generations,
chain folding, time travel, guard rails, full-rewrite purge."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("n", T.LongType()),
        T.StructField("tag", T.StringType()),
    ]
)


def _row(spark, url, ts, n, lsn, colname="tag", val="x"):
    return spark.range(1).select(
        F.lit(url).alias("url"),
        F.to_timestamp(F.lit(ts)).alias("warc_ts"),
        F.lit(n).cast("long").alias("n"),
        F.lit(val).alias(colname),
        F.lit(lsn).alias("_lsn"),
        F.lit(False).alias("_deleted"),
    )


def _mk(spark, path):
    t = LakeTable.create(spark, path, SCHEMA, key="url", n_buckets=4)
    df = spark.range(30).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.to_timestamp(F.lit("2024-01-01")).alias("warc_ts"),
        F.col("id").alias("n"),
        F.concat(F.lit("t"), F.col("id")).alias("tag"),
        F.lit(1).alias("_lsn"),
        F.lit(False).alias("_deleted"),
    )
    t.merge_cdc(df, epoch_id=0)
    return t


def test_rename_is_metadata_only_and_reads_old_files(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    files_before = {f["path"] for f in t.snapshot().files}
    res = t.rename_column("tag", "label")
    assert {f["path"] for f in t.snapshot().files} == files_before  # zero rewrites
    got = {r["url"]: r["label"] for r in t.read().select("url", "label").collect()}
    assert got["u7"] == "t7" and len(got) == 30  # old bytes served as new name
    assert "tag" not in t.read().columns
    # time travel: pre-rename snapshot exposes the old name with values
    old = t.read(version=res["version"] - 1)
    assert "label" not in old.columns
    assert old.filter(F.col("url") == "u7").collect()[0]["tag"] == "t7"
    # post-rename writes use the new name; both file generations coalesce
    t.merge_cdc(_row(spark, "u7", "2024-02-01", 7, 2, "label", "NEW"), epoch_id=1)
    got = {r["url"]: r["label"] for r in t.read().select("url", "label").collect()}
    assert got["u7"] == "NEW" and got["u8"] == "t8"
    # change feed across the rename maps old-name files too
    feed = {r["url"]: r["label"] for r in t.read_changes(1).select("url", "label").collect()}
    assert feed["u8"] == "t8" and feed["u7"] == "NEW"


def test_rename_chain_folds_and_full_rewrite_clears(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.rename_column("tag", "mid")
    t.rename_column("mid", "label")
    assert t._rename_markers() == {"label": ["mid", "tag"]}
    got = {r["url"]: r["label"] for r in t.read().select("url", "label").collect()}
    assert got["u3"] == "t3"
    # re-adding an alias name via evolution is refused while bytes survive
    with pytest.raises(ValueError, match="alias"):
        t.merge_cdc(
            _row(spark, "u1", "2024-02-01", 1, 2, "label", "v").withColumn(
                "tag", F.lit("ghost")
            ),
            epoch_id=1,
        )
    t.compact()  # full rewrite purges old-name bytes
    assert t._rename_markers() == {}
    got = {r["url"]: r["label"] for r in t.read().select("url", "label").collect()}
    assert got["u3"] == "t3"
    # now the old name is reusable as a fresh column
    t.merge_cdc(
        _row(spark, "u1", "2024-02-01", 1, 2, "label", "v").withColumn("tag", F.lit("fresh")),
        epoch_id=1,
    )
    row = t.read().filter(F.col("url") == "u1").collect()[0]
    assert row["tag"] == "fresh" and row["label"] == "v"


def test_rename_guards(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="key/ordering/internal"):
        t.rename_column("url", "page")
    with pytest.raises(ValueError, match="key/ordering/internal"):
        t.rename_column("tag", "_lsn")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("tag", "n")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("ghost", "x")
    t.drop_column("n")
    with pytest.raises(ValueError, match="dropped"):
        t.rename_column("tag", "n")
    t.rename_column("tag", "label")
    with pytest.raises(ValueError, match="alias"):
        t.rename_column("label", "tag")  # tag is now label's alias


def test_drop_of_renamed_column_guards_all_alias_names(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.rename_column("tag", "label")
    t.drop_column("label")
    assert t._rename_markers() == {}
    # both the current and the alias name are resurrection-guarded
    for dead in ("label", "tag"):
        with pytest.raises(ValueError, match="resurrect|dropped"):
            t.merge_cdc(
                _row(spark, "u1", "2024-02-01", 1, 2, colname=dead, val="v"),
                epoch_id=1,
            )


def test_bucket_join_refuses_live_renames(spark, tmp_path):
    from data_exchange_routing_spark.lake.spj import bucket_join

    a = _mk(spark, str(tmp_path / "a"))
    b = _mk(spark, str(tmp_path / "b"))
    a.rename_column("tag", "label")
    with pytest.raises(ValueError, match="live column renames"):
        bucket_join(a, b)
    a.compact()  # purge -> allowed again
    assert bucket_join(a, b).count() == 30
