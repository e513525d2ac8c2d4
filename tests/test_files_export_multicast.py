"""Tests for file scans (S3/S6/S9, F8), export sinks (K8, K4/P10), and the
predicate-routed stream multicast (K10/F11)."""

from __future__ import annotations

import csv
import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.lake.export import report_envelope_json, write_delimited
from data_exchange_routing_spark.schemas import LINEAGE_METRICS
from data_exchange_routing_spark.sources.files import (
    ERR_BAD_EXTENSION,
    scan_binary,
    scan_delimited,
    split_by_extension,
)
from data_exchange_routing_spark.streaming.multicast import stream_multicast

CSV_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
    ]
)


def _write_files(root: str, files: dict[str, bytes]) -> None:
    for rel, payload in files.items():
        full = os.path.join(root, rel)
        os.makedirs(os.path.dirname(full), exist_ok=True)
        with open(full, "wb") as f:
            f.write(payload)


def test_scan_binary_recursive_with_glob(spark, tmpdir_path):
    _write_files(
        tmpdir_path,
        {
            "a/x.zip": b"PKzip-bytes",
            "a/b/y.zip": b"PKother",
            "a/skip.txt": b"nope",
        },
    )
    df = scan_binary(spark, tmpdir_path, glob="*.zip")
    rows = {os.path.basename(r["path"]): bytes(r["content"]) for r in df.collect()}
    assert rows == {"x.zip": b"PKzip-bytes", "y.zip": b"PKother"}
    # length column matches content size (blob properties analog)
    assert {r["length"] for r in df.collect()} == {11, 7}


def test_scan_delimited_recursive(spark, tmpdir_path):
    _write_files(
        tmpdir_path,
        {
            "2024/01/part1.csv": b"id,name\n1,alpha\n2,beta\n",
            "2024/02/part2.csv": b"id,name\n3,gamma\n",
        },
    )
    df = scan_delimited(spark, tmpdir_path, CSV_SCHEMA)
    got = sorted((r["id"], r["name"]) for r in df.collect())
    assert got == [(1, "alpha"), (2, "beta"), (3, "gamma")]


def test_split_by_extension_exact_error(spark):
    df = spark.createDataFrame(
        [("up/a.csv",), ("up/b.CSV",), ("up/c.xls",)], ["path"]
    )
    ok, bad = split_by_extension(df, ".csv")
    assert sorted(r["path"] for r in ok.collect()) == ["up/a.csv", "up/b.CSV"]
    bad_rows = bad.collect()
    assert [r["path"] for r in bad_rows] == ["up/c.xls"]
    assert bad_rows[0]["error"] == ERR_BAD_EXTENSION


def test_write_delimited_quote_all_txt(spark, tmpdir_path):
    df = spark.createDataFrame([(1, "alpha"), (2, "be,ta")], ["id", "name"]).coalesce(1)
    out = os.path.join(tmpdir_path, "out")
    files = write_delimited(df, out)
    assert files and all(f.endswith(".txt") for f in files)
    with open(files[0], newline="") as f:
        raw = f.read()
    # quoteAllText=true: every field quoted, including numerics
    assert '"1","alpha"' in raw and '"2","be,ta"' in raw
    parsed = list(csv.reader(raw.strip().splitlines()))
    assert parsed[0] == ["id", "name"]
    assert sorted(parsed[1:]) == [["1", "alpha"], ["2", "be,ta"]]


def test_report_envelope_json_shape(spark):
    ts = dt.datetime(2024, 3, 1, 12, 0, 0)
    row = {
        "epoch_id": 7,
        "partition_id": 3,
        "destination_table": "web_pages",
        "rows_applied": 100,
        "bytes": 4096,
        "watermark": ts,
        "status": "SUCCESS",
        "issues": [{"level": "WARNING", "message": "late rows"}],
        "start_ts": ts,
        "end_ts": ts,
    }
    lineage = spark.createDataFrame([row], LINEAGE_METRICS)
    out = report_envelope_json(lineage).collect()
    assert len(out) == 1
    env = json.loads(out[0]["report"])
    assert env["upload_id"] == "epoch-7"
    assert env["data_stream_id"] == "web_pages"
    assert env["stage_info"]["status"] == "SUCCESS"
    assert env["stage_info"]["issues"] == [{"level": "WARNING", "message": "late rows"}]
    assert env["data"] == {"rows_applied": 100, "bytes": 4096, "partition_id": 3}


def test_stream_multicast_branches(spark, tmpdir_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("casecategory", T.StringType()),
        ]
    )
    src = os.path.join(tmpdir_path, "src")
    rows = [(i, ["covid", "flu", "other"][i % 3]) for i in range(30)]
    spark.createDataFrame(rows, schema).write.parquet(src)
    out = os.path.join(tmpdir_path, "out")
    q = stream_multicast(
        spark,
        src,
        schema,
        out,
        branches={
            "covid": F.col("casecategory") == "covid",
            "flu": F.col("casecategory") == "flu",
        },
        checkpoint_dir=os.path.join(tmpdir_path, "ckpt"),
    )
    q.awaitTermination(120)
    archive = spark.read.parquet(os.path.join(out, "archive"))
    covid = spark.read.parquet(os.path.join(out, "covid"))
    flu = spark.read.parquet(os.path.join(out, "flu"))
    assert archive.count() == 30
    assert covid.count() == 10 and flu.count() == 10
    assert covid.select("casecategory").distinct().collect()[0][0] == "covid"
    # restart with same checkpoint: availableNow re-run is a no-op (T3)
    q2 = stream_multicast(
        spark,
        src,
        schema,
        out,
        branches={"covid": F.col("casecategory") == "covid", "flu": F.col("casecategory") == "flu"},
        checkpoint_dir=os.path.join(tmpdir_path, "ckpt"),
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(os.path.join(out, "archive")).count() == 30
