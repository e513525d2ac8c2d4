"""Config-driven DAG orchestration tests — mirrors the reference's
Unit_FnOrchestrator.kt scenarios: exact executed (step:function@branch)
sequences, fan-out/fan-in branch ids, both fan-in failure policies, custom
and global error functions, mis-specified fans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_exchange_routing_spark.operators.orchestrate import (
    OrchestrationError,
    OrchestratorConfig,
    Trace,
    register,
    run_orchestration,
)


@register("add_one")
def add_one(df):
    return df.withColumn("x", F.col("x") + 1)


@register("double")
def double(df):
    return df.withColumn("x", F.col("x") * 2)


@register("split_even_odd")
def split_even_odd(df):
    return [df.filter(F.col("x") % 2 == 0), df.filter(F.col("x") % 2 != 0)]


@register("merge_noop")
def merge_noop(df):
    return df


@register("boom")
def boom(df):
    raise RuntimeError("boom")


@register("recover")
def recover(df):
    return df.withColumn("recovered", F.lit(True))


@register("global_handler")
def global_handler(df):
    return df.withColumn("global_error", F.lit(True))


def _cfg(steps, global_error=None):
    return OrchestratorConfig.from_dict({"steps": steps, "globalErrorFunction": global_error})


@pytest.fixture()
def data(spark):
    return spark.range(4).select(F.col("id").alias("x"))


def test_sequential_pipe_order(spark, data):
    cfg = _cfg(
        [
            {"stepNumber": 1, "functionToRun": "add_one"},
            {"stepNumber": 2, "functionToRun": "double"},
        ]
    )
    trace = Trace()
    out = run_orchestration(cfg, data, trace)
    assert trace.executed == ["1:add_one", "2:double"]
    assert sorted(r["x"] for r in out.collect()) == [2, 4, 6, 8]


def test_fan_out_fan_in_branch_ids(spark, data):
    cfg = _cfg(
        [
            {"stepNumber": 1, "functionToRun": "add_one"},
            {"stepNumber": 2, "functionToRun": "split_even_odd", "fanOutAfter": True},
            {"stepNumber": 3, "functionToRun": "double"},
            {"stepNumber": 4, "functionToRun": "merge_noop", "fanInBefore": True},
            {"stepNumber": 5, "functionToRun": "add_one"},
        ]
    )
    trace = Trace()
    out = run_orchestration(cfg, data, trace)
    assert trace.executed == [
        "1:add_one",
        "2:split_even_odd",
        "3:double@0",
        "3:double@1",
        "4:merge_noop",
        "5:add_one",
    ]
    # (x+1)*2+1 over 0..3
    assert sorted(r["x"] for r in out.collect()) == [3, 5, 7, 9]


def test_nested_branch_ids(spark, data):
    cfg = _cfg(
        [
            {"stepNumber": 1, "functionToRun": "split_even_odd", "fanOutAfter": True},
            {"stepNumber": 2, "functionToRun": "split_even_odd", "fanOutAfter": True},
            {"stepNumber": 3, "functionToRun": "double"},
            {"stepNumber": 4, "functionToRun": "merge_noop", "fanInBefore": True},
            {"stepNumber": 5, "functionToRun": "merge_noop", "fanInBefore": True},
        ]
    )
    trace = Trace()
    run_orchestration(cfg, data, trace)
    # two-level ids like the reference's "2_0"/"4_0_1" (Unit_FnOrchestrator.kt:126-137)
    assert "3:double@0_0" in trace.executed and "3:double@1_1" in trace.executed


def test_custom_error_function(spark, data):
    cfg = _cfg(
        [
            {"stepNumber": 1, "functionToRun": "boom", "customErrorFunction": "recover"},
            {"stepNumber": 2, "functionToRun": "add_one"},
        ]
    )
    trace = Trace()
    out = run_orchestration(cfg, data, trace)
    assert trace.executed == ["1:recover", "2:add_one"]
    assert out.first()["recovered"] is True


def test_global_error_function(spark, data):
    cfg = _cfg([{"stepNumber": 1, "functionToRun": "boom"}], global_error="global_handler")
    trace = Trace()
    out = run_orchestration(cfg, data, trace)
    assert trace.executed == ["-1:global_handler"]
    assert out.first()["global_error"] is True


def test_fan_in_any_fail_policy(spark, data):
    cfg = _cfg(
        [
            {"stepNumber": 1, "functionToRun": "split_even_odd", "fanOutAfter": True},
            {"stepNumber": 2, "functionToRun": "boom"},
            {"stepNumber": 3, "functionToRun": "merge_noop", "fanInBefore": True,
             "fanInFailIfAnyFail": True},
        ]
    )
    with pytest.raises(OrchestrationError, match="fan-in at step 3"):
        run_orchestration(cfg, data)


@register("boom_on_odd")
def boom_on_odd(df):
    # fails only for the odd branch (branch DataFrames carry parity)
    if df.filter(F.col("x") % 2 != 0).limit(1).count() > 0:
        raise RuntimeError("odd branch fails")
    return df


def test_fan_in_tolerant_policy_keeps_surviving_branches(spark, data):
    cfg = _cfg(
        [
            {"stepNumber": 1, "functionToRun": "split_even_odd", "fanOutAfter": True},
            {"stepNumber": 2, "functionToRun": "boom_on_odd"},
            {"stepNumber": 3, "functionToRun": "merge_noop", "fanInBefore": True,
             "fanInFailIfAnyFail": False},
        ]
    )
    out = run_orchestration(cfg, data)
    assert sorted(r["x"] for r in out.collect()) == [0, 2]  # odd branch dropped


def test_misspecified_fans_raise(spark, data):
    with pytest.raises(OrchestrationError, match="never fans in"):
        run_orchestration(
            _cfg([{"stepNumber": 1, "functionToRun": "split_even_odd", "fanOutAfter": True}]),
            data,
        )
    with pytest.raises(OrchestrationError, match="without matching fan-out"):
        run_orchestration(
            _cfg([{"stepNumber": 1, "functionToRun": "merge_noop", "fanInBefore": True}]),
            data,
        )
    with pytest.raises(OrchestrationError, match="returned branches without fanOutAfter"):
        run_orchestration(
            _cfg([{"stepNumber": 1, "functionToRun": "split_even_odd"}]), data
        )
