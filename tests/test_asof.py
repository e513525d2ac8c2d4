"""Unit tests for the as-of join operator (union+window composition)."""

from __future__ import annotations

import datetime as dt

from data_exchange_routing_spark.operators.asof import asof_join


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_backward_basic_and_ties(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts(10)), (2, "k", _ts(20)), (3, "k", _ts(5)), (4, "other", _ts(10))],
        ["id", "key", "ts"],
    )
    right = spark.createDataFrame(
        [("k", _ts(10), "a"), ("k", _ts(15), "b"), ("k", _ts(30), "c")],
        ["key", "rts", "tag"],
    )
    out = asof_join(left, right, on=["key"], left_ts="ts", right_ts="rts", payload_cols=["tag"])
    got = {r["id"]: (r["rts_right"], r["tag_right"]) for r in out.collect()}
    # equal ts IS eligible (at-or-before)
    assert got[1] == (_ts(10), "a")
    assert got[2] == (_ts(15), "b")
    # left row before any right row -> nulls
    assert got[3] == (None, None)
    # key with no right rows at all -> nulls
    assert got[4] == (None, None)
    assert out.count() == 4


def test_asof_forward(spark):
    left = spark.createDataFrame([(1, "k", _ts(10)), (2, "k", _ts(31))], ["id", "key", "ts"])
    right = spark.createDataFrame(
        [("k", _ts(15), "b"), ("k", _ts(30), "c")], ["key", "rts", "tag"]
    )
    out = asof_join(
        left, right, on=["key"], left_ts="ts", right_ts="rts",
        payload_cols=["tag"], direction="forward",
    )
    got = {r["id"]: r["tag_right"] for r in out.collect()}
    assert got[1] == "b"  # smallest rts >= 10
    assert got[2] is None  # nothing at/after 31


def test_asof_single_shuffle_plan(spark):
    """The whole join is one exchange on the key — no join node at all."""
    left = spark.createDataFrame([(1, "k", _ts(1))], ["id", "key", "ts"])
    right = spark.createDataFrame([("k", _ts(1), "x")], ["key", "rts", "tag"])
    out = asof_join(left, right, on=["key"], left_ts="ts", right_ts="rts", payload_cols=["tag"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning(key") == 1
