"""Hidden partitioning: transform twins, manifest pruning, spec evolution.

Every pruned read is checked for EXACT result equality against the
unpartitioned full-scan-plus-filter twin — pruning must be an optimization
with zero semantic surface — and for the pruning itself via
``partition_prune_stats`` (metadata-only, no Spark jobs).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.lake import partition as PT
from data_exchange_routing_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("n", T.LongType()),
    ]
)


def _rows(spark, days, per_day=40, null_ts=0):
    rows = []
    for d in days:
        for i in range(per_day):
            rows.append((f"https://host{i % 7}.example/p{i}", datetime(2024, 3, d, i % 24, 5), d * 1000 + i))
    for i in range(null_ts):
        rows.append((f"https://null.example/{i}", None, -i))
    return spark.createDataFrame(rows, SCHEMA)


def _sorted(df):
    return [tuple(r) for r in df.orderBy("n").collect()]


def test_days_partition_prunes_and_result_exact(spark, tmpdir_path):
    t = LakeTable.create(spark, tmpdir_path, SCHEMA)
    t.set_partition_spec([{"name": "ts_day", "col": "warc_ts", "transform": "days"}])
    t.append(_rows(spark, [1, 2, 3]), epoch_id=0)
    t.append(_rows(spark, [4, 5, 6]), epoch_id=1)

    lo, hi = datetime(2024, 3, 2), datetime(2024, 3, 3, 23, 59, 59)
    stats = t.partition_prune_stats(part_range=("warc_ts", lo, hi))
    assert stats["files_total"] == 6  # one file per day per commit
    assert stats["files_kept"] == 2
    got = _sorted(t.read(part_range=("warc_ts", lo, hi)))
    want = _sorted(t.read().filter((F.col("warc_ts") >= lo) & (F.col("warc_ts") <= hi)))
    assert got == want and len(got) == 80


def test_null_partition_values_never_pruned(spark, tmpdir_path):
    t = LakeTable.create(spark, tmpdir_path, SCHEMA)
    t.set_partition_spec([{"name": "ts_day", "col": "warc_ts", "transform": "days"}])
    t.append(_rows(spark, [1, 2], null_ts=5), epoch_id=0)
    stats = t.partition_prune_stats(part_range=("warc_ts", datetime(2024, 3, 2), None))
    # day-1 file pruned; day-2 and the NULL (__HIVE_DEFAULT_PARTITION__) kept
    assert stats["files_total"] == 3 and stats["files_kept"] == 2
    got = _sorted(t.read(part_range=("warc_ts", datetime(2024, 3, 2), None)))
    assert len(got) == 40  # NULL warc_ts rows excluded by the row predicate


def test_spec_evolution_prunes_each_file_through_its_own_spec(spark, tmpdir_path):
    t = LakeTable.create(spark, tmpdir_path, SCHEMA)
    t.set_partition_spec([{"name": "ts_day", "col": "warc_ts", "transform": "days"}])
    t.append(_rows(spark, [1, 2]), epoch_id=0)  # spec 1: 2 files
    t.set_partition_spec(
        [
            {"name": "ts_day", "col": "warc_ts", "transform": "days"},
            {"name": "url_b", "col": "url", "transform": "bucket", "param": 4},
        ]
    )
    t.append(_rows(spark, [3, 4]), epoch_id=1)  # spec 2: 2 days x <=4 buckets

    url = "https://host3.example/p3"
    st = t.partition_prune_stats(part_eq=("url", url))
    # spec-1 files have no url transform -> kept; spec-2 files prune to the
    # one bucket per day that can hold this url
    spec2_files = st["files_total"] - 2
    assert spec2_files >= 4
    assert st["files_kept"] == 2 + 2
    got = _sorted(t.read(part_eq=("url", url)))
    want = _sorted(t.read().filter(F.col("url") == url))
    assert got == want and len(got) == 4  # one per day, 4 days

    # old files still range-prune by THEIR spec's days field
    st2 = t.partition_prune_stats(part_range=("warc_ts", datetime(2024, 3, 4), None))
    assert st2["files_kept"] < st2["files_total"]
    assert {r[2] // 1000 for r in _sorted(t.read(part_range=("warc_ts", datetime(2024, 3, 4), None)))} == {4}


def test_bucket_python_twin_matches_spark(spark):
    fld = {"name": "b", "col": "url", "transform": "bucket", "param": 8}
    df = spark.createDataFrame([(f"u{i}",) for i in range(200)], "url string")
    rows = df.select("url", PT.transform_col(fld).alias("b")).collect()
    for r in rows:
        assert r["b"] == PT._py_bucket(r["url"], 8)


def test_truncate_and_identity_transforms(spark, tmpdir_path):
    schema = T.StructType(
        [T.StructField("host", T.StringType()), T.StructField("size", T.LongType())]
    )
    t = LakeTable.create(spark, tmpdir_path, schema)
    t.set_partition_spec(
        [
            {"name": "hp", "col": "host", "transform": "truncate", "param": 4},
            {"name": "sz", "col": "size", "transform": "truncate", "param": 100},
        ]
    )
    rows = [(f"{p}{i}.example", i * 17 % 1000) for p in ("aaa", "bbb", "ccc") for i in range(50)]
    t.append(spark.createDataFrame(rows, schema), epoch_id=0)

    st = t.partition_prune_stats(part_eq=("host", "bbb7.example"))
    assert 0 < st["files_kept"] < st["files_total"]
    got = {tuple(r) for r in t.read(part_eq=("host", "bbb7.example")).collect()}
    want = {tuple(r) for r in t.read().filter(F.col("host") == "bbb7.example").collect()}
    assert got == want and got

    st2 = t.partition_prune_stats(part_range=("size", 250, 449))
    assert 0 < st2["files_kept"] < st2["files_total"]
    got2 = sorted(tuple(r) for r in t.read(part_range=("size", 250, 449)).collect())
    want2 = sorted(
        tuple(r) for r in t.read().filter((F.col("size") >= 250) & (F.col("size") <= 449)).collect()
    )
    assert got2 == want2 and got2


def test_rewrite_files_preserves_partition_layout(spark, tmpdir_path):
    t = LakeTable.create(spark, tmpdir_path, SCHEMA)
    t.set_partition_spec([{"name": "ts_day", "col": "warc_ts", "transform": "days"}])
    for e in range(3):
        t.append(_rows(spark, [1, 2]), epoch_id=e)
    assert t.partition_prune_stats()["files_total"] == 6
    res = t.rewrite_files()
    assert not res["skipped"]
    st = t.partition_prune_stats(part_range=("warc_ts", None, datetime(2024, 3, 1, 23, 59)))
    assert st["files_total"] == 2 and st["files_kept"] == 1  # refolded per day
    assert t.read(part_range=("warc_ts", None, datetime(2024, 3, 1, 23, 59))).count() == 120


def test_guards(spark, tmpdir_path):
    keyed = LakeTable.create(spark, tmpdir_path + "_k", SCHEMA, key="url")
    with pytest.raises(ValueError, match="append-only"):
        keyed.set_partition_spec([{"name": "d", "col": "warc_ts", "transform": "days"}])
    with pytest.raises(ValueError, match="append-only"):
        keyed.read(part_eq=("url", "x"))

    t = LakeTable.create(spark, tmpdir_path, SCHEMA)
    with pytest.raises(ValueError, match="not in schema"):
        t.set_partition_spec([{"name": "d", "col": "nope", "transform": "days"}])
    with pytest.raises(ValueError, match="timestamp"):
        t.set_partition_spec([{"name": "d", "col": "url", "transform": "days"}])
    with pytest.raises(ValueError, match="param"):
        t.set_partition_spec([{"name": "b", "col": "url", "transform": "bucket"}])
    t.set_partition_spec([{"name": "d", "col": "warc_ts", "transform": "days"}])
    with pytest.raises(ValueError, match="partition layout"):
        t.append_rows([("u", datetime(2024, 1, 1), 1)], SCHEMA, epoch_id=0)
    # clearing the spec restores the unpartitioned append path
    t.set_partition_spec(None)
    t.append_rows([("u", datetime(2024, 1, 1), 1)], SCHEMA, epoch_id=0)
    assert t.read().count() == 1


def test_streaming_append_lands_partitioned_exactly_once(spark, tmpdir_path):
    """foreachBatch streaming appends into a hidden-partitioned table: every
    micro-batch commits under its batchId epoch guard, files carry partition
    values, and a replayed batch (simulated redelivery) is a metadata no-op."""
    import os

    src = os.path.join(tmpdir_path, "src")
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "tbl"), SCHEMA)
    t.set_partition_spec([{"name": "ts_day", "col": "warc_ts", "transform": "days"}])
    _rows(spark, [1, 2]).write.parquet(os.path.join(src, "a"))
    _rows(spark, [3]).write.parquet(os.path.join(src, "b"))

    q = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
        .writeStream.foreachBatch(lambda df, bid: t.append(df, epoch_id=bid, source="stream"))
        .option("checkpointLocation", os.path.join(tmpdir_path, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert t.read().count() == 120
    parted = [f for f in t.snapshot().files if f.get("partition")]
    assert parted and all("ts_day" in f["partition"] for f in parted)
    st = t.partition_prune_stats(part_range=("warc_ts", datetime(2024, 3, 3), None))
    assert st["files_kept"] < st["files_total"]

    # redelivery of an already-committed micro-batch: epoch guard absorbs it
    res = t.append(_rows(spark, [1, 2]), epoch_id=0, source="stream")
    assert res["skipped"] and t.read().count() == 120


def test_write_salt_splits_hot_partitions_without_breaking_pruning(spark, tmpdir_path):
    """salt > 1 spreads one hot partition value across multiple writer tasks
    and files per commit; the manifest still prunes by partition value and
    results stay exact."""
    t = LakeTable.create(spark, tmpdir_path, SCHEMA)
    t.set_partition_spec(
        [{"name": "ts_day", "col": "warc_ts", "transform": "days"}], salt=4
    )
    t.append(_rows(spark, [1], per_day=400), epoch_id=0)  # one hot day
    files = t.snapshot().files
    assert len(files) > 1  # salted: >1 file for the single partition value
    assert all(f["partition"] == {"ts_day": "2024-03-01"} for f in files)

    st = t.partition_prune_stats(part_range=("warc_ts", datetime(2024, 3, 2), None))
    assert st["files_kept"] == 0  # all files pruned: the day misses the range
    assert t.read(part_range=("warc_ts", None, datetime(2024, 3, 1, 23, 59))).count() == 400
    # replay-stable: re-staging the same batch under a redelivered epoch id
    # is absorbed by the guard (deterministic salt, no rand())
    assert t.append(_rows(spark, [1], per_day=400), epoch_id=0)["skipped"]


# ---- property-based partitioned-table state machine ------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_prow = st.tuples(
    st.integers(0, 5),    # day (partition dimension; small -> shared dirs)
    st.integers(0, 6),    # host id (bucket/delete dimension)
    st.integers(0, 999),  # value
)
_spec_choice = st.sampled_from(
    [
        None,  # clear: subsequent appends unpartitioned
        [{"name": "d", "col": "warc_ts", "transform": "days"}],
        [{"name": "hb", "col": "url", "transform": "bucket", "param": 3}],
        [
            {"name": "d", "col": "warc_ts", "transform": "days"},
            {"name": "hb", "col": "url", "transform": "bucket", "param": 3},
        ],
    ]
)
_pop = st.one_of(
    st.tuples(st.just("append"), st.lists(_prow, min_size=1, max_size=8)),
    st.tuples(st.just("spec"), _spec_choice, st.integers(1, 3)),
    st.tuples(st.just("delete_eq"), st.integers(0, 6)),
    st.tuples(st.just("delete_range"), st.integers(0, 5), st.integers(0, 5)),
    st.tuples(st.just("rewrite")),
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=st.lists(_pop, min_size=3, max_size=10))
def test_partitioned_table_random_ops_match_oracle(spark, tmp_path_factory, ops):
    """Any interleaving of appends, spec evolutions (incl. clearing and
    salting), pruned deletes, and rewrites must leave (a) the full read equal
    to a pure-Python oracle and (b) every pruned read equal to the oracle
    filter — across files written under DIFFERENT specs in one table."""
    import os

    tmpdir = str(tmp_path_factory.mktemp("partprop"))
    t = LakeTable.create(spark, os.path.join(tmpdir, "t"), SCHEMA)
    oracle: list[tuple] = []  # (url, ts, n)
    epoch = 0
    n_uid = 0
    for op in ops:
        if op[0] == "append":
            rows = []
            for day, host, val in op[1]:
                n_uid += 1
                rows.append(
                    (f"https://h{host}.example/", datetime(2024, 3, 1 + day, 12), n_uid * 1000 + val)
                )
            t.append(spark.createDataFrame(rows, SCHEMA), epoch_id=epoch)
            epoch += 1
            oracle.extend(rows)
        elif op[0] == "spec":
            t.set_partition_spec(op[1], salt=op[2])
        elif op[0] == "delete_eq":
            url = f"https://h{op[1]}.example/"
            t.delete_eq("url", url)
            oracle = [r for r in oracle if r[0] != url]
        elif op[0] == "delete_range":
            lo = datetime(2024, 3, 1 + min(op[1], op[2]))
            hi = datetime(2024, 3, 1 + max(op[1], op[2]), 23, 59, 59)
            t.delete_range("warc_ts", lo, hi)
            oracle = [r for r in oracle if not (lo <= r[1] <= hi)]
        elif op[0] == "rewrite":
            t.rewrite_files()

    got = sorted(tuple(r) for r in t.read().collect())
    assert got == sorted(oracle)

    # pruned reads through whatever mix of specs the files carry
    lo, hi = datetime(2024, 3, 2), datetime(2024, 3, 4, 23, 59, 59)
    got_r = sorted(tuple(r) for r in t.read(part_range=("warc_ts", lo, hi)).collect())
    assert got_r == sorted(r for r in oracle if lo <= r[1] <= hi)
    url = "https://h3.example/"
    got_e = sorted(tuple(r) for r in t.read(part_eq=("url", url)).collect())
    assert got_e == sorted(r for r in oracle if r[0] == url)


def test_cross_type_bounds_never_prune_matching_rows(spark, tmpdir_path):
    """ADVICE-class fix: an integral-float bound on a long column (42.0 vs
    stored '42'), an int bound on a double column, and Python bools must
    prune consistently with the SQL row predicate — never silently empty."""
    t = LakeTable.create(
        spark,
        f"{tmpdir_path}/xb",
        T.StructType(
            [
                T.StructField("n", T.LongType()),
                T.StructField("x", T.DoubleType()),
                T.StructField("warc_ts", T.TimestampType()),
            ]
        ),
    )
    t.set_partition_spec(
        [
            {"name": "n_id", "col": "n", "transform": "identity"},
        ]
    )
    rows = [(i, float(i) / 2, datetime(2024, 3, 1, 0, 0)) for i in range(6)]
    t.append(spark.createDataFrame(rows, t.snapshot().schema()), epoch_id=0)

    # float bound on a long identity partition: must still find n == 4
    got = t.read(part_eq=("n", 4.0)).collect()
    assert [r.n for r in got] == [4]
    # non-integral float: empty BOTH ways (consistent with the row predicate)
    assert t.read(part_eq=("n", 4.5)).count() == 0
    # delete_eq with a float bound must actually delete (GDPR path)
    res = t.delete_eq("n", 3.0)
    assert not res.get("skipped", False)
    assert t.read().filter("n = 3").count() == 0


def test_cross_type_bucket_bound_prunes_consistently(spark, tmpdir_path):
    """bucket[N] transform: the bound is bucketed via the COLUMN-typed
    string ('42'), so a 42.0 probe lands in the same bucket."""
    t = LakeTable.create(
        spark,
        f"{tmpdir_path}/xbb",
        T.StructType(
            [
                T.StructField("n", T.LongType()),
                T.StructField("warc_ts", T.TimestampType()),
            ]
        ),
    )
    t.set_partition_spec(
        [{"name": "n_b", "col": "n", "transform": "bucket", "param": 4}]
    )
    rows = [(i, datetime(2024, 3, 1)) for i in range(20)]
    t.append(spark.createDataFrame(rows, t.snapshot().schema()), epoch_id=0)
    assert [r.n for r in t.read(part_eq=("n", 7.0)).collect()] == [7]


def test_salted_write_with_nested_map_column(spark, tmpdir_path):
    """Regression: a nested map (array<map<...>>) must be excluded from the
    write-salt hash at any depth — salted appends used to crash with
    HASH_MAP_TYPE."""
    t = LakeTable.create(
        spark,
        f"{tmpdir_path}/nm",
        T.StructType(
            [
                T.StructField("n", T.LongType()),
                T.StructField(
                    "headers",
                    T.ArrayType(T.MapType(T.StringType(), T.StringType())),
                ),
                T.StructField("warc_ts", T.TimestampType()),
            ]
        ),
    )
    t.set_partition_spec(
        [{"name": "d", "col": "warc_ts", "transform": "days"}], salt=2
    )
    df = spark.createDataFrame(
        [(i, [{"k": f"v{i}"}], datetime(2024, 3, 1)) for i in range(8)],
        t.snapshot().schema(),
    )
    t.append(df, epoch_id=0)
    assert t.read().count() == 8
