"""SCD Type 2 incremental maintenance: epoch-by-epoch fold == one-shot
window derivation, exactly-once redelivery, in-order enforcement,
point-in-time reads."""

import datetime

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.lake.scd import Scd2Table

SRC = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("tier", T.StringType()),
        T.StructField("score", T.LongType()),
    ]
)


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


# epochs of a small CDC log: inserts, updates, a delete + re-insert, a
# same-tick lsn collision, and a key that dies and stays dead
EPOCHS = [
    [
        ("a", "I", _ts(0), 1, "hot", 10),
        ("b", "I", _ts(1), 2, "cold", 20),
        ("c", "I", _ts(2), 3, "hot", 30),
        ("a", "U", _ts(5), 4, "warm", 11),
    ],
    [
        ("a", "U", _ts(10), 10, "cold", 12),
        ("b", "D", _ts(11), 11, None, None),
        ("c", "U", _ts(12), 12, "warm", 31),
        ("c", "U", _ts(12), 13, "cold", 32),  # same tick, higher lsn wins
    ],
    [
        ("b", "I", _ts(20), 20, "hot", 21),  # resurrection
        ("d", "D", _ts(21), 21, None, None),  # delete of never-seen key
        ("a", "D", _ts(22), 22, None, None),  # a dies and stays dead
    ],
]


def _one_shot(spark):
    """Plain window derivation over the whole log — the soundness oracle."""
    rows = [r for ep in EPOCHS for r in ep]
    df = spark.createDataFrame(rows, SRC)
    tick = Window.partitionBy("url", "warc_ts").orderBy(F.col("lsn").desc())
    df = df.withColumn("_rn", F.row_number().over(tick)).filter(F.col("_rn") == 1)
    chain = Window.partitionBy("url").orderBy("warc_ts", "lsn")
    df = df.withColumn("_next", F.lead("warc_ts").over(chain))
    return (
        df.filter(F.col("op") != "D")
        .select(
            "url",
            F.col("warc_ts").alias("valid_from"),
            F.col("_next").alias("valid_to"),
            F.col("_next").isNull().alias("is_current"),
            "tier",
            "score",
        )
    )


@pytest.fixture()
def folded(spark, tmp_path):
    s = Scd2Table.create(spark, str(tmp_path / "dim"), "url", ["tier", "score"], SRC, n_buckets=4)
    for e, rows in enumerate(EPOCHS):
        s.apply_batch(spark.createDataFrame(rows, SRC), epoch_id=e)
    return s


def _canon(df):
    return sorted(tuple(r) for r in df.select(
        "url", "valid_from", "valid_to", "is_current", "tier", "score").collect())


def test_incremental_fold_matches_one_shot(spark, folded):
    assert _canon(folded.history()) == _canon(_one_shot(spark))


def test_redelivery_is_noop(spark, folded):
    before = _canon(folded.history())
    out = folded.apply_batch(spark.createDataFrame(EPOCHS[1], SRC), epoch_id=1)
    assert out["skipped"] is True
    assert _canon(folded.history()) == before


def test_out_of_order_batch_refused(spark, folded):
    late = [("a", "U", _ts(3), 99, "late", 99)]  # before a's current valid_from
    with pytest.raises(ValueError, match="out-of-order"):
        folded.apply_batch(spark.createDataFrame(late, SRC), epoch_id=7)
    # nothing committed
    assert 7 not in folded.hist.committed_epochs("scd")


def test_current_and_as_of(spark, folded):
    cur = {r["url"]: (r["tier"], r["score"]) for r in folded.current().collect()}
    assert cur == {"b": ("hot", 21), "c": ("cold", 32)}  # a deleted, d never lived
    at = {r["url"]: (r["tier"], r["score"]) for r in folded.as_of(_ts(6)).collect()}
    assert at == {"a": ("warm", 11), "b": ("cold", 20), "c": ("hot", 30)}
    at0 = {r["url"] for r in folded.as_of(_ts(0)).collect()}
    assert at0 == {"a"}


def test_crash_between_commits_heals(spark, tmp_path):
    s = Scd2Table.create(spark, str(tmp_path / "dim"), "url", ["tier", "score"], SRC, n_buckets=4)
    s.apply_batch(spark.createDataFrame(EPOCHS[0], SRC), epoch_id=0)
    # simulate crash: commit epoch 1 into hist only (the module's first half)
    b = spark.createDataFrame(EPOCHS[1], SRC)
    real_merge = s.cur.merge_cdc
    calls = {"n": 0}

    def boom(*a, **kw):
        calls["n"] += 1
        raise RuntimeError("crash before cur commit")

    s.cur.merge_cdc = boom
    with pytest.raises(RuntimeError):
        s.apply_batch(b, epoch_id=1)
    s.cur.merge_cdc = real_merge
    assert 1 in s.hist.committed_epochs("scd")
    assert 1 not in s.cur.committed_epochs("scd")
    # re-run heals: hist skips via guard, cur applies
    s.apply_batch(b, epoch_id=1)
    s.apply_batch(spark.createDataFrame(EPOCHS[2], SRC), epoch_id=2)
    assert _canon(s.history()) == _canon(_one_shot(spark))
