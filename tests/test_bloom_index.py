"""Manifest-level Bloom file index: point-predicate file skipping on
non-key columns of append-only tables (Iceberg/Delta bloom index analog)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("value", T.LongType()),
    ]
)


def _mk(spark, path, n_commits=4, rows_per=300):
    t = LakeTable.create(spark, path, SCHEMA, bloom_cols=["host", "value"])
    for k in range(n_commits):
        # disjoint host ranges per commit -> a point probe hits ~1 commit
        df = spark.range(k * rows_per, (k + 1) * rows_per).select(
            F.col("id").alias("event_id"),
            F.concat(F.lit("h"), (F.col("id") / 10).cast("long")).alias("host"),
            (F.col("id") * 3).alias("value"),
        )
        t.append(df, epoch_id=k)
    return t


def _kept_files(t, col, value):
    props = t._props()
    bits, hashes = props["bloom_bits"], props["bloom_hashes"]
    snap = t.snapshot()
    return [
        f
        for f in snap.files
        if (f.get("bloom") or {}).get(col) is None
        or t._bloom_probe(f["bloom"][col], value, bits, hashes)
    ]


def test_bloom_read_exact_and_prunes_files(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    total = len(t.snapshot().files)
    assert total == 4
    got = sorted(tuple(r) for r in t.read(bloom_eq=("host", "h35")).collect())
    want = sorted(
        tuple(r) for r in t.read().filter(F.col("host") == "h35").collect()
    )
    assert got == want and len(got) == 10
    # the probe value lives in commit 1 only; pruning must drop most files
    assert len(_kept_files(t, "host", "h35")) < total
    # long-typed column probes hash identically on both sides
    got_v = t.read(bloom_eq=("value", 903)).collect()
    assert [r["event_id"] for r in got_v] == [301]
    assert len(_kept_files(t, "value", 903)) < total


def test_bloom_absent_value_prunes_everything(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    # no false negatives: an absent value may keep files (fp) but the exact
    # filter returns zero rows either way
    assert t.read(bloom_eq=("host", "no-such-host")).count() == 0


def test_bloom_guards(spark, tmp_path):
    with pytest.raises(ValueError, match="append-only"):
        LakeTable.create(
            spark, str(tmp_path / "k"),
            T.StructType(
                [
                    T.StructField("url", T.StringType()),
                    T.StructField("warc_ts", T.TimestampType()),
                ]
            ),
            key="url", bloom_cols=["url"],
        )
    with pytest.raises(ValueError, match="not in schema"):
        LakeTable.create(spark, str(tmp_path / "m"), SCHEMA, bloom_cols=["nope"])
    t = _mk(spark, str(tmp_path / "t"), n_commits=1)
    with pytest.raises(ValueError, match="no bloom index"):
        t.read(bloom_eq=("event_id", 1))
    with pytest.raises(ValueError, match="NULL"):
        t.read(bloom_eq=("host", None))


def test_bloom_on_append_rows_driver_path(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, bloom_cols=["host"])
    t.append_rows([(1, "a", 10), (2, "b", 20), (3, None, 30)], SCHEMA, epoch_id=0)
    t.append_rows([(4, "c", 40), (5, "d", 50)], SCHEMA, epoch_id=1)
    assert [r["event_id"] for r in t.read(bloom_eq=("host", "d")).collect()] == [5]
    kept = _kept_files(t, "host", "d")
    assert len(kept) == 1  # the first commit's bitmap rejects 'd'
    # NULL was never indexed; exact filter semantics still hold
    assert t.read(bloom_eq=("host", "a")).count() == 1


def test_unindexed_table_unaffected(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA)
    t.append(spark.range(5).select(
        F.col("id").alias("event_id"),
        F.lit("h").alias("host"),
        F.col("id").alias("value"),
    ), epoch_id=0)
    assert "bloom" not in t.snapshot().files[0]
    with pytest.raises(ValueError, match="no bloom index"):
        t.read(bloom_eq=("host", "h"))
