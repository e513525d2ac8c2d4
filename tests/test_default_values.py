"""ADD COLUMN with initial defaults (Iceberg v3 default-value analog).

Rows written before the column existed read the default; rows written after
— including explicit NULLs — read what was written. Application rides the
per-file data sequence number, so it is metadata + one column expression;
a rewrite materializes defaults and retires the machinery.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)


def _pages(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"), F.col("id").alias("n")
    )


def test_initial_default_vs_post_add_nulls(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.append(_pages(spark, 0, 5), epoch_id=0)
    res = t.add_column("tier", "string", default="web")
    assert res["default"] == "web"
    # post-add epoch: explicit value for even n, explicit NULL for odd n
    post = _pages(spark, 5, 10).withColumn(
        "tier", F.when(F.col("n") % 2 == 0, F.lit("news"))
    )
    t.append(post, epoch_id=1)
    rows = {r.url: r.tier for r in t.read().collect()}
    assert all(rows[f"u{i}"] == "web" for i in range(5))  # pre-add -> default
    assert rows["u6"] == "news" and rows["u5"] is None  # post-add kept verbatim
    assert len(rows) == 10


def test_rewrite_materializes_and_retires_default(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.append(_pages(spark, 0, 5), epoch_id=0)
    v_pre_add = t.current_version()
    t.add_column("tier", "string", default="web")
    v_add = t.current_version()
    before = sorted((r.url, r.tier) for r in t.read().collect())
    t.rewrite_files(n_files=1)
    snap = t.snapshot()
    assert t._active_defaults(snap, snap.files) == {}  # read tax retired
    assert sorted((r.url, r.tier) for r in t.read().collect()) == before
    # time travel to a pre-rewrite version re-activates the default
    assert all(r.tier == "web" for r in t.read(version=v_add).collect())
    # and to the pre-add version, the column does not exist
    assert "tier" not in t.read(version=v_pre_add).columns


KEYED_SCHEMA = T.StructType(
    SCHEMA.fields + [T.StructField("warc_ts", T.TimestampType())]
)


def _keyed_rows(spark, lo, hi, lsn):
    return (
        _pages(spark, lo, hi)
        .withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01")))
        .withColumn("_lsn", F.lit(lsn))
        .withColumn("_deleted", F.lit(False))
    )


def test_default_on_keyed_table_and_updates(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), KEYED_SCHEMA, key="url", n_buckets=4
    )
    t.merge_cdc(_keyed_rows(spark, 0, 6, 1), epoch_id=0)
    t.add_column("score", "double", default=1.5)
    upd = _keyed_rows(spark, 0, 2, 2).withColumn("score", F.lit(9.0))
    t.merge_cdc(upd, epoch_id=1)
    rows = {r.url: r.score for r in t.read().collect()}
    assert rows["u0"] == 9.0 and rows["u1"] == 9.0  # post-add updates win
    assert all(rows[f"u{i}"] == 1.5 for i in range(2, 6))  # old rows default


def test_rename_and_drop_carry_the_default(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.append(_pages(spark, 0, 3), epoch_id=0)
    t.add_column("tier", "string", default="web")
    t.rename_column("tier", "grade")
    assert all(r.grade == "web" for r in t.read().collect())
    t.drop_column("grade")
    assert t._column_defaults() == {}


def test_add_column_guards(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.append(_pages(spark, 0, 3), epoch_id=0)
    with pytest.raises(ValueError, match="already exists"):
        t.add_column("n", "long")
    with pytest.raises(ValueError, match="does not cast"):
        t.add_column("bad", "long", default="abc")
    t2 = LakeTable.create(spark, str(tmp_path / "t2"), SCHEMA)
    t2.append(_pages(spark, 0, 3).withColumn("junk", F.lit("x")), epoch_id=0)
    t2.drop_column("junk")
    with pytest.raises(ValueError, match="dropped"):
        t2.add_column("junk", "string", default="y")
    # plain additive add (no default): old rows NULL
    t.add_column("lang", "string")
    assert all(r.lang is None for r in t.read().collect())


def test_default_composes_with_mor_deletes(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.append(_pages(spark, 0, 6), epoch_id=0)
    t.add_column("tier", "string", default="web")
    t.delete_eq_mor("url", "u3")
    rows = {r.url: r.tier for r in t.read().collect()}
    assert "u3" not in rows and len(rows) == 5
    assert all(v == "web" for v in rows.values())


def test_mor_delete_on_defaulted_column_matches_effective_value(spark, tmp_path):
    """delete_eq_mor on the defaulted column deletes by the EFFECTIVE value:
    pre-add rows (stored NULL, read 'web') fall to delete_eq_mor('tier',
    'web'); post-add explicit values follow their own stored value."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.append(_pages(spark, 0, 4), epoch_id=0)
    t.add_column("tier", "string", default="web")
    post = _pages(spark, 4, 8).withColumn(
        "tier", F.when(F.col("n") % 2 == 0, F.lit("web")).otherwise(F.lit("news"))
    )
    t.append(post, epoch_id=1)
    t.delete_eq_mor("tier", "web")
    rows = {r.url: r.tier for r in t.read().collect()}
    # pre-add rows (effective 'web') and post-add explicit 'web' both gone
    assert rows == {"u5": "news", "u7": "news"}


def test_bucket_join_refuses_active_defaults(spark, tmp_path):
    from data_exchange_routing_spark.lake.spj import bucket_join

    left = LakeTable.create(
        spark, str(tmp_path / "l"), KEYED_SCHEMA, key="url", n_buckets=4
    )
    right = LakeTable.create(
        spark, str(tmp_path / "r"), KEYED_SCHEMA, key="url", n_buckets=4
    )
    left.merge_cdc(_keyed_rows(spark, 0, 4, 1), epoch_id=0)
    right.merge_cdc(_keyed_rows(spark, 0, 4, 1), epoch_id=0)
    left.add_column("tier", "string", default="web")
    with pytest.raises(ValueError, match="active column defaults"):
        bucket_join(left, right)
    left.compact()
    assert bucket_join(left, right).count() == 4


def test_imported_files_do_not_inherit_defaults(spark, tmpdir_path):
    """add_files x ADD COLUMN DEFAULT: an imported file registers with a
    FRESH data sequence number (Iceberg semantics), so its rows read
    as-written (NULL) — only files that PREDATE the column add read the
    default."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from data_exchange_routing_spark.lake.table import LakeTable

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    t = LakeTable.create(spark, f"{tmpdir_path}/t", schema)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], schema), epoch_id=0, source="s")
    t.add_column("tier", "string", default="bronze")

    # corpus written elsewhere, WITHOUT the tier column
    src = f"{tmpdir_path}/ext.parquet"
    pq.write_table(
        pa.table({"id": pa.array([10, 11], pa.int64()), "v": pa.array(["x", "y"])}), src
    )
    t.add_files([src], epoch_id=1, source="imp")

    rows = {r.id: r.tier for r in t.read().select("id", "tier").collect()}
    assert rows[1] == "bronze" and rows[2] == "bronze"  # pre-add files: default
    assert rows[10] is None and rows[11] is None  # imported: as-written (absent)


