"""Zip explode (S11/M2), debatch (M3), path rewrite (P11), html escape (P9),
and the delimited text scan/sink roundtrip (S9/K8)."""

from __future__ import annotations

import io
import os
import zipfile

import pytest
from pyspark.sql import functions as F

from data_exchange_routing_spark.functions.extract import html_escape
from data_exchange_routing_spark.operators.explode_ops import (
    debatch,
    rewrite_output_path,
    zip_explode,
)


def _zip_bytes(entries: dict[str, bytes]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in entries.items():
            zf.writestr(name, data)
    return buf.getvalue()


def test_zip_explode_nested(spark):
    """Mirrors Unit_FnDecompressor happy paths: exact output entry lists for a
    flat csv and a nested zip with directories (Unit_FnDecompressor.kt:39-80)."""
    inner = _zip_bytes({"deep/inner.csv": b"a,b\n1,2"})
    outer = _zip_bytes(
        {
            "one.csv": b"x",
            "dir/": b"",  # directory entry -> skipped
            "dir/two.txt": b"y",
            "nested.zip": inner,
        }
    )
    flat = _zip_bytes({"only.csv": b"z"})
    df = spark.createDataFrame(
        [("upload-1.zip", outer), ("upload-2.zip", flat)], "name string, payload binary"
    )
    got = {(r["source_name"], r["entry_path"]): bytes(r["entry_bytes"]) for r in zip_explode(df).collect()}
    assert got == {
        ("upload-1.zip", "one.csv"): b"x",
        ("upload-1.zip", "dir/two.txt"): b"y",
        ("upload-1.zip", "nested.zip!deep/inner.csv"): b"a,b\n1,2",
        ("upload-2.zip", "only.csv"): b"z",
    }


def test_zip_explode_empty_zip_yields_nothing(spark):
    df = spark.createDataFrame([("empty.zip", _zip_bytes({}))], "name string, payload binary")
    assert zip_explode(df).count() == 0


def test_debatch_and_path_rewrite(spark):
    df = spark.createDataFrame(
        [("ingest/batch1.zip", "MSH|1\nMSH|2\n\nMSH|3")], "entry_path string, text string"
    )
    out = debatch(df, delimiter="\n")
    rows = sorted((r["record_index"], r["record"]) for r in out.collect())
    assert rows == [(0, "MSH|1"), (1, "MSH|2"), (3, "MSH|3")]  # empty line dropped
    rewritten = rewrite_output_path(df).first()["entry_path"]
    assert rewritten == "processed/batch1-decompressed/"


def test_html_escape_udf(spark):
    df = spark.createDataFrame([("<b>a & 'b' \"c\"</b>",), (None,)], "s string")
    got = [r["e"] for r in df.select(html_escape(F.col("s")).alias("e")).collect()]
    assert got[0] == "&lt;b&gt;a &amp; &#x27;b&#x27; &quot;c&quot;&lt;/b&gt;"
    assert got[1] is None


def test_csv_roundtrip_quote_all(spark, tmpdir_path):
    """S9 delimited scan + K8 quoteAll sink (PL_ReportStream.json:18-49)."""
    src = spark.createDataFrame(
        [(1, "plain"), (2, 'with "quotes", and commas')], "id long, s string"
    )
    out = os.path.join(tmpdir_path, "csv_out")
    src.coalesce(1).write.option("quoteAll", "true").option("header", "true").mode("overwrite").csv(out)
    back = (
        spark.read.option("header", "true")
        .option("recursiveFileLookup", "true")
        .schema("id long, s string")
        .csv(out)
    )
    assert sorted((r["id"], r["s"]) for r in back.collect()) == [
        (1, "plain"),
        (2, 'with "quotes", and commas'),
    ]
    with open(next(os.path.join(out, f) for f in os.listdir(out) if f.endswith(".csv"))) as fh:
        body = fh.read()
    assert '"plain"' in body  # quoteAll honored
