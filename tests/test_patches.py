"""Sparse-update (partial-column-image) CDC resolution — hand-built
scenarios covering every branch of the documented semantics
(operators/patches.py), independent of the derived-stream oracle gate
(`cdc_patch_resolve` in test_queries_oracle.py)."""

from __future__ import annotations

from datetime import datetime

from data_exchange_routing_spark.operators.patches import resolve_patch_state

SCHEMA = (
    "lsn long, op string, url string, warc_ts timestamp, "
    "title string, lang string, score double"
)


def _t(s: int):
    return datetime(2024, 1, 1, 0, 0, s)


def _resolve(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = resolve_patch_state(df)
    return {r["url"]: (r["title"], r["lang"], r["score"]) for r in out.collect()}


def test_patch_layering_over_insert(spark):
    got = _resolve(
        spark,
        [
            (1, "I", "a", _t(1), "t1", "en", 1.0),
            (2, "U", "a", _t(2), None, "fr", None),  # patches lang only
            (3, "U", "a", _t(3), "t3", None, None),  # patches title only
        ],
    )
    assert got == {"a": ("t3", "fr", 1.0)}


def test_delete_kills_and_u_revives_with_nulls(spark):
    got = _resolve(
        spark,
        [
            (1, "I", "a", _t(1), "t1", "en", 1.0),
            (2, "D", "a", _t(2), None, None, None),
            (1, "I", "b", _t(1), "t1", "en", 1.0),
            (2, "D", "b", _t(2), None, None, None),
            (3, "U", "b", _t(3), None, None, 9.0),  # revives; only score set
        ],
    )
    # 'a' is dead; 'b' revived with pre-delete columns NOT resurrected
    assert got == {"b": (None, None, 9.0)}


def test_patch_before_reset_is_discarded(spark):
    got = _resolve(
        spark,
        [
            (1, "U", "a", _t(1), "old", None, None),
            (2, "I", "a", _t(2), None, "en", 2.0),  # reset: title literally NULL
        ],
    )
    assert got == {"a": (None, "en", 2.0)}


def test_patches_alone_upsert_and_event_time_orders_before_seq(spark):
    got = _resolve(
        spark,
        [
            # seq 9 has the LATER event time -> wins despite smaller lsn
            (9, "U", "a", _t(5), "late", None, None),
            (10, "U", "a", _t(4), "early", None, 7.0),
        ],
    )
    assert got == {"a": ("late", None, 7.0)}


def test_duplicate_redelivery_is_a_noop(spark):
    rows = [
        (1, "I", "a", _t(1), "t1", "en", 1.0),
        (2, "U", "a", _t(2), "t2", None, None),
    ]
    assert _resolve(spark, rows + rows) == _resolve(spark, rows) == {
        "a": ("t2", "en", 1.0)
    }


def test_single_shuffle_plan(spark):
    """The whole resolve is ONE hash aggregate pair around ONE exchange —
    no window/sort, no join, partial aggregation present (map-side combine)."""
    df = spark.createDataFrame([(1, "I", "a", _t(1), "t", "en", 1.0)], SCHEMA)
    plan = resolve_patch_state(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Window" not in plan and "Join" not in plan
    # map-side combine: partial aggregates run before the exchange (the
    # filtered max_by buffers force SortAggregate, whose sorts are local
    # per-task — global=false — not a global sort)
    assert "partial_max" in plan


def test_incremental_fold_matches_one_shot(spark):
    """apply_patch_batch folded over time-ordered batches == one-shot
    resolve_patch_state over the whole log (the CDC incremental-ingest
    property; batches are cut on event-time boundaries, the binlog-segment
    contract)."""
    import pyspark.sql.functions as F

    from data_exchange_routing_spark.operators.patches import apply_patch_batch
    from data_exchange_routing_spark.sources.datagen import (
        derive_patch_events_from_events,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    patches = derive_patch_events_from_events(ev).localCheckpoint(eager=True)
    lo, hi = patches.agg(F.min("warc_ts"), F.max("warc_ts")).first()
    c1 = lo + (hi - lo) / 3
    c2 = lo + 2 * (hi - lo) / 3
    batches = [
        patches.filter(F.col("warc_ts") < F.lit(c1)),
        patches.filter((F.col("warc_ts") >= F.lit(c1)) & (F.col("warc_ts") < F.lit(c2))),
        patches.filter(F.col("warc_ts") >= F.lit(c2)),
    ]
    state = spark.createDataFrame(
        [], "url string, title string, lang string, score double"
    )
    for b in batches:
        state = apply_patch_batch(state, b).localCheckpoint(eager=True)
    got = sorted(map(tuple, state.collect()))
    want = sorted(map(tuple, resolve_patch_state(patches).collect()))
    assert got == want and len(want) > 0


def test_streaming_patch_ingest_exactly_once_out_of_order(spark, tmpdir_path):
    """Structured-Streaming sparse-patch ingest into a keyed LakeTable that
    stores the fold BUFFER per key (commutative merge): availableNow file
    stream -> foreachBatch merge_patch_batch, with the binlog segments
    deliberately ingested OUT of event-time order. Final resolved state ==
    one-shot resolve (order independence), and a checkpoint restart with no
    new data leaves the table version unchanged (exactly-once at the table
    surface)."""
    import os
    import time

    import pyspark.sql.functions as F

    from data_exchange_routing_spark.lake.table import LakeTable
    from data_exchange_routing_spark.operators.patches import (
        merge_patch_batch,
        patch_buffer_schema,
        read_patch_state,
    )
    from data_exchange_routing_spark.sources.datagen import (
        derive_patch_events_from_events,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    patches = derive_patch_events_from_events(ev).localCheckpoint(eager=True)
    lo, hi = patches.agg(F.min("warc_ts"), F.max("warc_ts")).first()
    seg = (
        F.when(F.col("warc_ts") < F.lit(lo + (hi - lo) / 3), 0)
        .when(F.col("warc_ts") < F.lit(lo + 2 * (hi - lo) / 3), 1)
        .otherwise(2)
    )
    src = os.path.join(tmpdir_path, "patch_log")
    for i in (2, 0, 1):  # NEWEST segment lands first: out-of-order delivery
        patches.filter(seg == i).coalesce(1).write.mode("overwrite").parquet(
            f"{src}/seg{i}"
        )
        time.sleep(1.1)  # distinct mtimes pin the file-source pickup order

    t = LakeTable.create(
        spark, os.path.join(tmpdir_path, "t"), patch_buffer_schema(),
        key="url", n_buckets=4,
    )

    def run_stream(cp):
        stream = (
            spark.readStream.schema(patches.schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(f"{src}/seg*")
        )
        q = (
            stream.writeStream.trigger(availableNow=True)
            .option("checkpointLocation", cp)
            .foreachBatch(lambda df, eid: merge_patch_batch(t, df, epoch_id=eid))
            .start()
        )
        q.awaitTermination(300)

    cp = os.path.join(tmpdir_path, "cp")
    run_stream(cp)
    assert t.committed_epochs("patch") >= {0, 1, 2}  # one epoch per segment file

    got = {
        r["url"]: (r["title"], r["lang"], r["score"])
        for r in read_patch_state(t).collect()
    }
    want = {
        r["url"]: (r["title"], r["lang"], r["score"])
        for r in resolve_patch_state(patches).collect()
    }
    assert got == want and len(want) > 0

    # restart on the same checkpoint: no new files -> no table change
    v = t.current_version()
    run_stream(cp)
    assert t.current_version() == v
