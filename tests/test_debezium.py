"""Debezium/Kafka-Connect envelope codec (operators/debezium.py).

Gates: (1) pinned wire semantics on hand-written envelopes — op mapping,
before-image selection for deletes, base64 binary, int64-micros timestamps,
tolerant handling of unknown ops / malformed JSON / missing payload;
(2) lossless round trip on the real CDC event shape (binary html + meta map);
(3) end-to-end: replaying an event log round-tripped through the Debezium
wire format produces a warehouse state identical to replaying it directly.
The oracle-backed registry query `events_debezium_roundtrip` additionally
gates the codec against DuckDB at sf0.01 (tests/test_queries_oracle.py).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.operators.debezium import (
    parse_debezium,
    to_debezium_json,
)

IMAGE = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def _parse_one(spark, value: str, image=IMAGE) -> dict:
    df = spark.createDataFrame([(value,)], "value string")
    rows = parse_debezium(df, image).collect()
    assert len(rows) == 1
    return rows[0].asDict()


def test_ops_and_image_selection(spark):
    # c and r -> I with the AFTER image
    for wire_op in ("c", "r"):
        r = _parse_one(
            spark,
            '{"payload": {"after": {"url": "https://a", "lang": "en"}, '
            '"op": "%s", "source": {"lsn": 7}}}' % wire_op,
        )
        assert (r["op"], r["lsn"], r["url"], r["lang"]) == ("I", 7, "https://a", "en")
    # u -> U; a REPLICA-IDENTITY-FULL before image is present and must be ignored
    r = _parse_one(
        spark,
        '{"payload": {"before": {"url": "https://a", "lang": "OLD"}, '
        '"after": {"url": "https://a", "lang": "fr"}, "op": "u", "source": {"lsn": 8}}}',
    )
    assert (r["op"], r["lang"]) == ("U", "fr")
    # d -> D with the BEFORE image (after is null in Debezium deletes)
    r = _parse_one(
        spark,
        '{"payload": {"before": {"url": "https://gone", "lang": "de"}, '
        '"op": "d", "source": {"lsn": 9}}}',
    )
    assert (r["op"], r["url"], r["lang"], r["html"]) == ("D", "https://gone", "de", None)


def test_tolerant_parse_never_throws(spark):
    # unknown op -> op NULL (flows to the F5 op-guard / dead-letter, F12)
    r = _parse_one(
        spark, '{"payload": {"after": {"url": "https://x"}, "op": "t", "source": {"lsn": 1}}}'
    )
    assert r["op"] is None and r["url"] == "https://x" and r["lsn"] == 1
    # malformed JSON and missing payload -> all-null row, no exception
    for bad in ("{not json", "{}", '{"payload": null}'):
        r = _parse_one(spark, bad)
        assert r["op"] is None and r["lsn"] is None and r["url"] is None
    # unknown envelope fields are ignored (tolerant parse)
    r = _parse_one(
        spark,
        '{"payload": {"after": {"url": "https://y"}, "op": "c", "source": {"lsn": 2},'
        ' "transaction": {"id": "tx-1"}, "extra": 5}, "schema": {"type": "struct"}}',
    )
    assert (r["op"], r["url"]) == ("I", "https://y")


def test_wire_types_binary_and_micros(spark):
    # binary rides base64; timestamps ride int64 epoch micros
    r = _parse_one(
        spark,
        '{"payload": {"after": {"url": "u", "html": "AAECw/8=", '
        '"warc_ts": 1700000000123456}, "op": "c", "source": {"lsn": 3}}}',
    )
    assert bytes(r["html"]) == bytes([0x00, 0x01, 0x02, 0xC3, 0xFF])
    assert r["warc_ts"].isoformat() == "2023-11-14T22:13:20.123456"


def test_encode_parse_round_trip_exact(spark):
    rows = [
        (1, "I", "https://a", "2024-01-02T03:04:05.000006", b"<html>&amp;</html>", "en",
         "text/html", {"data_stream_id": "s1", "charset": "utf-8"}),
        (2, "U", "https://a", "2024-01-02T03:04:06.000007", b"\xff\x00\xfe raw", "fr",
         "text/html", {"data_stream_id": "s1"}),
        (3, "D", "https://a", "2024-01-02T03:04:07.000008", None, "de",
         "application/pdf", {"data_stream_id": "s2"}),
        (4, "I", "https://b", None, b"", None, None, None),
    ]
    src = spark.createDataFrame(
        [(lsn, op, url, ts, html, lang, ct, meta) for lsn, op, url, ts, html, lang, ct, meta in rows],
        T.StructType(
            [T.StructField("lsn", T.LongType()), T.StructField("op", T.StringType())]
            + [T.StructField("url", T.StringType()), T.StructField("warc_ts", T.StringType())]
            + list(IMAGE.fields[2:])
        ),
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    wire = to_debezium_json(src, IMAGE)
    assert wire.columns == ["value"]
    # deletes carry before only; inserts/updates carry after only
    vals = {r["value"] for r in wire.collect()}
    assert any('"op":"d"' in v and '"before"' in v and '"after"' not in v for v in vals)
    assert all('"before"' not in v for v in vals if '"op":"c"' in v or '"op":"u"' in v)
    back = parse_debezium(wire, IMAGE).select("lsn", "op", *[f.name for f in IMAGE.fields])
    got = sorted(
        (tuple(r) for r in back.collect()), key=lambda t: t[0]
    )
    exp = [
        (lsn, op, url,
         __import__("datetime").datetime.fromisoformat(ts) if ts else None,
         bytearray(html) if html is not None else None, lang, ct, meta)
        for lsn, op, url, ts, html, lang, ct, meta in rows
    ]
    for g, e in zip(got, exp):
        assert g == tuple(e), f"{g} != {e}"


def test_replay_via_debezium_wire_equals_direct(spark, tmpdir_path):
    """The real gate: an event log relayed through the Debezium wire format
    replays to a warehouse state identical to replaying it directly."""
    from data_exchange_routing_spark.pipeline import Warehouse, apply_epoch, replay
    from data_exchange_routing_spark.sources.configs import DESTINATION_TABLES
    from data_exchange_routing_spark.sources.datagen import write_change_events

    events_dir = os.path.join(tmpdir_path, "events")
    write_change_events(spark, events_dir, 600, 60, n_epochs=3)

    wh_direct = Warehouse(spark, os.path.join(tmpdir_path, "wh_direct"), n_buckets=4)
    replay(wh_direct, events_dir)

    wh_dbz = Warehouse(spark, os.path.join(tmpdir_path, "wh_dbz"), n_buckets=4)
    wh_dbz.init_tables()
    for e in range(3):
        batch = spark.read.parquet(os.path.join(events_dir, f"epoch_hint={e}"))
        wire = to_debezium_json(batch.drop("epoch_hint"), IMAGE)
        decoded = parse_debezium(wire, IMAGE)
        apply_epoch(wh_dbz, decoded, epoch_id=e)

    def canon(df):
        # set ops reject MAP columns: canonicalize maps to sorted-entry JSON
        cols = []
        for f in df.schema.fields:
            c = F.col(f.name)
            if isinstance(f.dataType, T.MapType):
                c = F.to_json(F.array_sort(F.map_entries(c))).alias(f.name)
            cols.append(c)
        return df.select(*cols)

    for dest in sorted(set(DESTINATION_TABLES)) + ["dead_letter"]:
        a = canon(wh_direct.table(dest).read())
        b = canon(wh_dbz.table(dest).read())
        assert sorted(a.columns) == sorted(b.columns), dest
        cols = sorted(a.columns)
        sa = a.select(*cols).exceptAll(b.select(*cols)).count()
        sb = b.select(*cols).exceptAll(a.select(*cols)).count()
        assert a.count() == b.count() and sa == 0 and sb == 0, (
            f"{dest}: direct vs debezium-wire state differs ({sa}/{sb} rows)"
        )


def test_single_json_parse_in_plan(spark):
    """JsonToStructs is CodegenFallback (no codegen CSE), so the envelope
    must be parsed exactly once per row — plan regression gate."""
    df = spark.createDataFrame([('{"payload":{}}',)], "value string")
    plan = parse_debezium(df, IMAGE)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("from_json") == 1, plan
