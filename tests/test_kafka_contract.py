"""Kafka-path contract (VERDICT r01 item 6): the broker is unavailable in
this sandbox, so the value-parse + provenance projection (`parse_kafka_records`,
the source-independent half of `kafka_tail`) is driven with the exact record
shape Kafka delivers — (value binary JSON envelope, partition, offset) — and
must produce (a) byte-identical parsed events vs the parquet source, and
(b) an identical warehouse state when fed through the full CDC pipeline."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from data_exchange_routing_spark.schemas import CHANGE_EVENTS
from data_exchange_routing_spark.streaming.kafka import parse_kafka_records


def _as_kafka_records(events):
    """Serialize change events the way a producer would put them on the
    topic: one JSON envelope per record (binary html -> base64, Spark's
    to_json convention), plus partition/offset provenance."""
    return events.select(
        F.to_json(F.struct(*[F.col(f.name) for f in CHANGE_EVENTS.fields])).cast("binary").alias("value"),
        (F.col("lsn") % 4).cast("int").alias("partition"),
        F.col("lsn").alias("offset"),
    )


def test_kafka_projection_roundtrips_events(spark):
    from data_exchange_routing_spark.sources.datagen import generate_change_events

    events = generate_change_events(spark, 500, 80, n_epochs=2)
    parsed = parse_kafka_records(_as_kafka_records(events), CHANGE_EVENTS)
    assert parsed.columns == [f.name for f in CHANGE_EVENTS.fields] + [
        "_kafka_partition",
        "_kafka_offset",
    ]

    def key(r):
        return (
            r["lsn"],
            r["op"],
            r["url"],
            r["warc_ts"],
            bytes(r["html"]) if r["html"] is not None else None,
            r["lang"],
            r["content_type"],
            tuple(sorted((r["meta"] or {}).items())),
        )

    orig = sorted(key(r) for r in events.collect())
    got = sorted(key(r) for r in parsed.collect())
    assert got == orig  # byte-identical through the JSON envelope
    # provenance carried through
    off = {r["lsn"]: r["_kafka_offset"] for r in parsed.collect()}
    assert all(off[lsn] == lsn for lsn in off)


def test_kafka_path_pipeline_matches_file_source(spark, tmpdir_path):
    """Same payloads, two sources: parquet file tail vs the Kafka record
    projection. The downstream pipeline (validate -> route -> dedup ->
    extract -> multicast commit) must produce identical final tables."""
    from data_exchange_routing_spark.pipeline import Warehouse, apply_epoch
    from data_exchange_routing_spark.sources.datagen import generate_change_events

    events = generate_change_events(spark, 800, 120, n_epochs=2).cache()
    via_kafka = parse_kafka_records(_as_kafka_records(events), CHANGE_EVENTS).drop(
        "_kafka_partition", "_kafka_offset"
    )

    out = {}
    for name, src in [("file", events), ("kafka", via_kafka)]:
        wh = Warehouse(spark, os.path.join(tmpdir_path, name), n_buckets=4)
        wh.init_tables()
        for epoch in sorted(r[0] for r in src.select("epoch_hint").distinct().collect()):
            apply_epoch(wh, src.filter(F.col("epoch_hint") == epoch), epoch_id=epoch)
        rows = wh.table("web_pages").read().collect()
        out[name] = sorted(
            (r["url"], r["warc_ts"], r["text"], r["lang"]) for r in rows
        )
        dead = wh.table("dead_letter").read().collect()
        out[name + "_dead"] = sorted((r["url"], r["error"], r["stage"]) for r in dead)
    assert out["kafka"] == out["file"] and out["file"]
    assert out["kafka_dead"] == out["file_dead"]
    events.unpersist()


def test_kafka_debezium_values_roundtrip(spark):
    """A Debezium-connector topic (value = change-event envelope instead of
    a flat JSON row) parses to the same events through parse_kafka_debezium,
    with partition/offset provenance riding along."""
    from pyspark.sql import types as T

    from data_exchange_routing_spark.operators.debezium import to_debezium_json
    from data_exchange_routing_spark.sources.datagen import generate_change_events
    from data_exchange_routing_spark.streaming.kafka import parse_kafka_debezium

    image = T.StructType([f for f in CHANGE_EVENTS.fields if f.name not in ("lsn", "op")])
    events = generate_change_events(spark, 400, 60, n_epochs=2)
    records = to_debezium_json(events, image).select(
        F.col("value").cast("binary").alias("value"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
    )
    parsed = parse_kafka_debezium(records, image)
    assert parsed.columns[:2] == ["_kafka_partition", "_kafka_offset"]

    def key(r):
        return (
            r["lsn"],
            r["op"],
            r["url"],
            r["warc_ts"],
            bytes(r["html"]) if r["html"] is not None else None,
            r["lang"],
            r["content_type"],
            tuple(sorted((r["meta"] or {}).items())),
        )

    orig = sorted(key(r) for r in events.collect())
    got = sorted(key(r) for r in parsed.collect())
    assert got == orig
