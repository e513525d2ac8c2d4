"""Stateful streaming: cross-batch dedup state + watermarked windows."""

from __future__ import annotations

import os

import pytest

from data_exchange_routing_spark.schemas import CHANGE_EVENTS
from data_exchange_routing_spark.sources.datagen import write_change_events
from data_exchange_routing_spark.streaming.stateful import stateful_dedup, windowed_ingest_rate


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stateful_events"))
    write_change_events(spark, d, 2000, 150, n_epochs=4)
    return d


def _drain(spark, df, name, cp):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    return spark.sql(f"SELECT * FROM {name}")


def test_stateful_dedup_emits_monotone_per_url(spark, stream_dir, tmpdir_path):
    events = (
        spark.readStream.schema(CHANGE_EVENTS)
        .option("maxFilesPerTrigger", 32)  # force multiple micro-batches
        .parquet(stream_dir)
    )
    out = _drain(spark, stateful_dedup(events), "dedup_out", os.path.join(tmpdir_path, "cp1")).toPandas()

    # emitted sequence per url advances strictly in (warc_ts, lsn) across ALL
    # batches: cross-batch duplicates and stale out-of-order events are gone
    all_events = spark.read.parquet(stream_dir).toPandas()
    assert len(out) < len(all_events)
    assert not out.duplicated(subset=["url", "lsn"]).any()
    # final high-water mark per url equals the true max
    got_max = out.groupby("url").apply(lambda g: tuple(g.sort_values(["warc_ts", "lsn"]).iloc[-1][["warc_ts", "lsn"]]), include_groups=False)
    exp_max = all_events.groupby("url").apply(lambda g: tuple(g.sort_values(["warc_ts", "lsn"]).iloc[-1][["warc_ts", "lsn"]]), include_groups=False)
    for url, exp in exp_max.items():
        assert got_max[url] == exp, url


def test_windowed_ingest_rate_matches_batch(spark, stream_dir, tmpdir_path):
    events = spark.readStream.schema(CHANGE_EVENTS).parquet(stream_dir)
    out = _drain(
        spark, windowed_ingest_rate(events, "10 minutes", "20 minutes"), "win_out", os.path.join(tmpdir_path, "cp2")
    ).toPandas()
    assert len(out) > 0
    # spot-check one window against a batch recomputation
    batch = spark.read.parquet(stream_dir).toPandas()
    row = out.iloc[0]
    mask = (
        (batch["warc_ts"] >= row["window_start"])
        & (batch["warc_ts"] < row["window_end"])
        & (batch["content_type"] == row["content_type"])
    )
    assert int(mask.sum()) == int(row["n_events"])


def test_stateful_dedup_with_ttl_same_results_single_drain(spark, stream_dir, tmpdir_path):
    """TTL-enabled dedup produces identical output within one bounded drain
    (the timeout can only fire between batches; dropping idle state weakens
    dedup to at-least-once, which the idempotent sink absorbs)."""
    import os

    from pyspark.sql import functions as F

    from data_exchange_routing_spark.schemas import CHANGE_EVENTS
    from data_exchange_routing_spark.streaming.stateful import stateful_dedup

    out = {}
    for name, ttl in (("no_ttl", None), ("ttl", 60_000)):
        stream = spark.readStream.schema(CHANGE_EVENTS).parquet(stream_dir)
        q = (
            stateful_dedup(stream, state_ttl_ms=ttl)
            .writeStream.format("parquet")
            .option("path", os.path.join(tmpdir_path, f"out_{name}"))
            .option("checkpointLocation", os.path.join(tmpdir_path, f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        res = spark.read.parquet(os.path.join(tmpdir_path, f"out_{name}"))
        out[name] = sorted(
            (r["url"], r["lsn"]) for r in res.select("url", "lsn").collect()
        )
    assert out["no_ttl"] == out["ttl"] and len(out["ttl"]) > 0


def test_native_dedup_within_watermark_matches_batch_distinct(spark, stream_dir, tmpdir_path):
    """Native dropDuplicatesWithinWatermark contract: with redelivered files
    (every epoch's parquet duplicated) and all data inside the watermark,
    the drained stream equals batch dropDuplicates on the event id — the
    JVM-native scale path for plain redelivery suppression (T6)."""
    import shutil

    from data_exchange_routing_spark.streaming.stateful import native_dedup_within_watermark

    redeliver = os.path.join(tmpdir_path, "redelivered")
    n = 0
    for root, _dirs, files in os.walk(stream_dir):
        rel = os.path.relpath(root, stream_dir)
        dst_root = os.path.join(redeliver, rel)
        os.makedirs(dst_root, exist_ok=True)
        for f in files:
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(root, f), os.path.join(dst_root, f))
                shutil.copy(os.path.join(root, f), os.path.join(dst_root, f"dup_{f}"))
                n += 1
    assert n > 0

    events = (
        spark.readStream.schema(CHANGE_EVENTS)
        .option("maxFilesPerTrigger", 8)  # several micro-batches, dups split across them
        .parquet(redeliver)
    )
    out = _drain(
        spark,
        native_dedup_within_watermark(events, watermark="36500 days"),
        "native_dedup_out",
        os.path.join(tmpdir_path, "cp_native"),
    ).toPandas()

    exp = (
        spark.read.parquet(stream_dir)
        .dropDuplicates(["url", "lsn"])
        .toPandas()
    )
    assert len(out) == len(exp)
    assert not out.duplicated(subset=["url", "lsn"]).any()
    got_keys = set(map(tuple, out[["url", "lsn"]].itertuples(index=False)))
    exp_keys = set(map(tuple, exp[["url", "lsn"]].itertuples(index=False)))
    assert got_keys == exp_keys
