"""Incremental rollup view: per-epoch partials must equal a full recompute
at every point, survive duplicate epoch delivery, and compact losslessly."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_exchange_routing_spark.lake.rollup import RollupView

SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)

AGGS = {
    "n": ("count", None),
    "total": ("sum", "value"),
    "vmin": ("min", "value"),
    "vmax": ("max", "value"),
}


def _batch(spark, epoch, n=200):
    return spark.range(n).select(
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("event_type"),
        (F.col("id") % 37).alias("user_id"),
        (F.col("id") * 1.5 + epoch * 1000).alias("value"),
    )


def _expected(spark, batches):
    full = batches[0]
    for b in batches[1:]:
        full = full.unionAll(b)
    rows = (
        full.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
        )
        .collect()
    )
    return {r["event_type"]: (r["n"], round(r["total"], 6), r["vmin"], r["vmax"]) for r in rows}


def _got(view):
    return {
        r["event_type"]: (r["n"], round(r["total"], 6), r["vmin"], r["vmax"])
        for r in view.read().collect()
    }


def test_rollup_incremental_equals_full_recompute(spark, tmpdir_path):
    view = RollupView.create(
        spark, os.path.join(tmpdir_path, "v"), ["event_type"], AGGS, SCHEMA
    )
    batches = []
    for e in range(4):
        b = _batch(spark, e)
        batches.append(b)
        res = view.apply_epoch(b, epoch_id=e)
        assert not res.get("skipped")
        assert _got(view) == _expected(spark, batches), f"diverged at epoch {e}"

    # duplicate redelivery of a whole epoch is a guarded no-op
    dup = view.apply_epoch(_batch(spark, 2), epoch_id=2)
    assert dup.get("skipped")
    assert _got(view) == _expected(spark, batches)

    # compaction folds partials to one row per group, result unchanged
    n_files_before = len(view.table.snapshot().files)
    res = view.compact()
    assert not res.get("skipped")
    assert len(view.table.snapshot().files) < n_files_before
    assert _got(view) == _expected(spark, batches)
    # and the view keeps accepting epochs after compaction
    b = _batch(spark, 9)
    batches.append(b)
    view.apply_epoch(b, epoch_id=9)
    assert _got(view) == _expected(spark, batches)


def test_rollup_hll_distinct_matches_one_shot_sketch(spark, tmpdir_path):
    """approx_distinct partials union-fold across epochs to EXACTLY the
    estimate of one sketch over the full history (HLL union associativity),
    and survive redelivery + compaction like every other kind."""
    aggs = {"users": ("approx_distinct", "user_id"), "n": ("count", None)}
    view = RollupView.create(
        spark, os.path.join(tmpdir_path, "v"), ["event_type"], aggs, SCHEMA
    )
    batches = []
    for e in range(3):
        # vary user ranges so epochs overlap but are not identical
        b = _batch(spark, e, n=150 + 50 * e)
        batches.append(b)
        view.apply_epoch(b, epoch_id=e)

    full = batches[0]
    for b in batches[1:]:
        full = full.unionAll(b)
    want = {
        r["event_type"]: (r["users"], r["n"])
        for r in full.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("users"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }

    def got():
        return {r["event_type"]: (r["users"], r["n"]) for r in view.read().collect()}

    assert got() == want
    # small cardinality (<= 37 users) sits in the sketch's exact regime
    exact = {
        r["event_type"]: r["u"]
        for r in full.groupBy("event_type").agg(F.countDistinct("user_id").alias("u")).collect()
    }
    assert {k: v[0] for k, v in got().items()} == exact

    dup = view.apply_epoch(_batch(spark, 1, n=200), epoch_id=1)
    assert dup.get("skipped")
    assert got() == want

    res = view.compact()
    assert not res.get("skipped")
    assert got() == want


def test_rollup_rejects_unknown_aggregate(spark, tmpdir_path):
    with pytest.raises(ValueError, match="unsupported aggregate"):
        RollupView(spark, os.path.join(tmpdir_path, "x"), ["a"], {"m": ("median", "v")})


def test_rollup_histogram_incremental_quantile(spark, tmp_path):
    """Histogram partials maintained across epochs fold to the one-shot
    grid; the expression-based per-group quantile matches the driver-side
    helper and stays within one bin width of the exact percentile."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from data_exchange_routing_spark.functions.sketch import (
        histogram_quantile,
        histogram_sketch,
    )
    from data_exchange_routing_spark.lake.rollup import RollupView

    schema = T.StructType(
        [
            T.StructField("grp", T.StringType()),
            T.StructField("v", T.DoubleType()),
        ]
    )
    lo, hi, k = 0.0, 100.0, 20
    view = RollupView.create(
        spark,
        str(tmp_path / "view"),
        group_by=["grp"],
        aggs={"h": ("histogram", "v", (lo, hi, k)), "n": ("count", "v")},
        batch_schema=schema,
    )
    full = spark.range(3000).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("grp"),
        ((F.col("id") * 37) % 101).cast("double").alias("v"),
    )
    for e in range(3):
        view.apply_epoch(full.filter(F.col("id") % 3 == e), epoch_id=e)
    got = {r["grp"]: list(r["h"]) for r in view.read().collect()}
    want = {}
    for r in histogram_sketch(full, "v", lo, hi, k, by=["grp"]).collect():
        want.setdefault(r["grp"], [0] * (k + 2))[r["bin"]] = r["c"]
    assert got == want  # 3-epoch fold == one-shot grid

    qdf = {r["grp"]: r["h_q0.5"] for r in view.quantile("h", 0.5).collect()}
    for grp in ("a", "b"):
        rows = [{"bin": b, "c": c} for b, c in enumerate(got[grp]) if c]
        assert abs(qdf[grp] - histogram_quantile(rows, 0.5, lo, hi, k)) < 1e-9
        exact = (
            full.filter(F.col("grp") == grp)
            .agg(F.expr("percentile(v, 0.5)"))
            .collect()[0][0]
        )
        assert abs(qdf[grp] - exact) <= (hi - lo) / k
    # re-delivery is a no-op; compaction preserves the grid
    view.apply_epoch(full, epoch_id=1)
    view.compact()
    assert {r["grp"]: list(r["h"]) for r in view.read().collect()} == want
