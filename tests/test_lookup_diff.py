"""lookup_join (bucket-pruned state enrichment) and diff (anti-entropy)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("n", T.LongType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _mk(spark, path, n_rows=200, n_buckets=16, mutate=None):
    t = LakeTable.create(spark, path, SCHEMA, key="url", n_buckets=n_buckets)
    df = spark.range(n_rows).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.to_timestamp(F.lit("2024-01-01")).alias("warc_ts"),
        F.col("id").alias("n"),
        F.lit("en").alias("lang"),
    )
    if mutate:
        df = mutate(df)
    t.merge_cdc(
        df.withColumn("_lsn", F.lit(1)).withColumn("_deleted", F.lit(False)),
        epoch_id=0,
    )
    return t


def test_lookup_join_matches_plain_join_and_null_fills(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    probe = spark.createDataFrame(
        [("u3", "a"), ("u7", "b"), ("nope", "c"), (None, "d")],
        "url string, tag string",
    )
    got = t.lookup_join(probe, columns=["n"])
    want = probe.join(t.read().select("url", "n"), "url", "left")
    key = lambda t: tuple(map(repr, t))  # noqa: E731 — None-safe ordering
    assert sorted(map(tuple, got.collect()), key=key) == sorted(
        map(tuple, want.collect()), key=key
    )
    rows = {r["url"]: r for r in got.collect() if r["url"] is not None}
    assert rows["u3"]["n"] == 3 and rows["nope"]["n"] is None


def test_lookup_join_renamed_key_and_clash_suffix(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    probe = spark.createDataFrame(
        [("u5", 99)], "page string, n int"  # probe has its own 'n'
    )
    got = t.lookup_join(probe, probe_key="page", columns=["n", "lang"])
    row = got.collect()[0]
    assert row["n"] == 99 and row["n_t"] == 5 and row["lang"] == "en"
    with pytest.raises(ValueError, match="no column"):
        t.lookup_join(probe, probe_key="missing")
    with pytest.raises(ValueError, match="columns not on table"):
        t.lookup_join(probe, probe_key="page", columns=["zzz"])


def test_diff_reports_only_disagreements(spark, tmp_path):
    a = _mk(spark, str(tmp_path / "a"), n_rows=50)
    b = _mk(
        spark,
        str(tmp_path / "b"),
        n_rows=52,  # u50, u51 right_only
        mutate=lambda df: df.withColumn(
            "n", F.when(F.col("url") == "u7", F.lit(777)).otherwise(F.col("n"))
        ),
    )
    # delete u3 on the right -> left_only
    b.delete_where(F.col("url") == "u3")
    got = {r["url"]: r["status"] for r in a.diff(b).collect()}
    assert got == {
        "u3": "left_only",
        "u7": "changed",
        "u50": "right_only",
        "u51": "right_only",
    }
    assert a.diff(a).count() == 0  # self-diff is empty
    # pinned columns: ignoring n hides the u7 change
    got2 = {r["url"]: r["status"] for r in a.diff(b, columns=["lang"]).collect()}
    assert "u7" not in got2 and got2["u3"] == "left_only"


def test_lookup_join_in_streaming_foreachbatch(spark, tmp_path):
    """The stream-side enrichment shape: each micro-batch enriches against
    the keyed table's CURRENT state via lookup_join inside foreachBatch;
    the drained result equals the one-shot batch join."""
    dim = _mk(spark, str(tmp_path / "dim"), n_rows=100)
    src_dir = str(tmp_path / "src")
    probe = spark.range(150).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),  # 100 hits, 50 misses
        (F.col("id") * 2).alias("x"),
    )
    probe.repartition(5).write.parquet(src_dir)
    out_dir = str(tmp_path / "out")
    stream = (
        spark.readStream.schema("url string, x long")
        .option("maxFilesPerTrigger", 2)
        .parquet(src_dir)
    )

    def enrich(batch, _epoch):
        dim.lookup_join(batch, columns=["n", "lang"]).write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(enrich)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    want = sorted(
        map(tuple, probe.join(dim.read().select("url", "n", "lang"), "url", "left").collect())
    )
    assert got == want and len(got) == 150


def test_diff_between_versions_is_net_change(spark, tmp_path):
    """t.diff(t, version=v1, other_version=v2): the NET state change between
    two snapshots — intermediate revisions (touched then reverted) drop out,
    unlike the change feed which streams every revision."""
    t = _mk(spark, str(tmp_path / "t"), n_rows=30)
    v1 = t.current_version()
    # epoch: create u100, change u5, touch-and-revert u7 (net no-op), delete u9
    ts2 = F.to_timestamp(F.lit("2024-01-02"))
    t.merge_cdc(
        spark.createDataFrame(
            [("u100", 100), ("u5", 555), ("u7", 7), ("u9", 0)], "url string, n long"
        ).select(
            "url", ts2.alias("warc_ts"), "n", F.lit("en").alias("lang"),
            F.lit(2).alias("_lsn"), (F.col("url") == "u9").alias("_deleted"),
        ),
        epoch_id=1,
    )
    v2 = t.current_version()
    got = {r["url"]: r["status"] for r in t.diff(t, version=v1, other_version=v2).collect()}
    # u7's new revision has identical public values -> net no-op, absent
    assert got == {"u100": "right_only", "u5": "changed", "u9": "left_only"}
    assert t.diff(t, version=v2, other_version=v2).count() == 0
