"""Plan-bytes audit as a CI gate (VERDICT r04 item 5).

The round-over-round shuffle-bytes audit (SCALE.md §16/§36) is the one
regression signal this host's paging noise cannot touch — but it ran as an
end-of-round ritual. This gate pins the audit per-commit: for every headline
query it asserts the RECORD counts the plan moves (shuffle-write records and
scan input records, read from the Spark REST API) against recorded
expectations. Records, unlike bytes, are independent of compression codec
AND host state — they change only when the plan changes (a new exchange, a
lost pushdown, a broken broadcast), which is exactly what must fail CI the
day it lands.

Expectations live in tests/plan_audit_expected.json, recorded at sf0.01
under the test session's fixed parallelism (cores=8, shuffle=8 — partial-agg
record counts depend on it). Re-record intentionally after a deliberate plan
change with:

    PLAN_AUDIT_RECORD=1 python -m pytest tests/test_plan_audit.py -q
"""

from __future__ import annotations

import json
import os
import urllib.request

import pytest

from bench import HEADLINE

EXPECTED_PATH = os.path.join(os.path.dirname(__file__), "plan_audit_expected.json")
SF_DIR = "/root/testdata/sf0.01"
# relative slack: AQE coalescing can shift partial-agg emit counts a little
# with input file layout; a plan regression (extra exchange / lost broadcast
# / lost pruning) moves records far beyond this
REL_TOL = 0.25
ABS_TOL = 2_000


def _stages(spark) -> list:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    return json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages"))


def _measure(spark, name: str) -> dict:
    """Sum metrics over ONLY the stages this query submits (stageId window)
    — cumulative-total deltas break when the UI store evicts old stages
    (spark.ui.retainedStages) mid-measurement after a long test session."""
    from data_exchange_routing_spark.plans.queries import QUERIES

    id0 = max((st["stageId"] for st in _stages(spark)), default=-1)
    QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    mine = [st for st in _stages(spark) if st["stageId"] > id0]
    return {
        "shuffle_records": sum(st.get("shuffleWriteRecords", 0) for st in mine),
        "input_records": sum(st.get("inputRecords", 0) for st in mine),
    }


@pytest.mark.plan_audit
@pytest.mark.smoke
def test_headline_plan_records_pinned(spark):
    if spark.sparkContext.uiWebUrl is None:
        pytest.skip("spark.ui disabled in this session; audit needs the REST API")
    record = os.environ.get("PLAN_AUDIT_RECORD") == "1"
    expected = {}
    if not record:
        with open(EXPECTED_PATH) as f:
            expected = json.load(f)
    got = {name: _measure(spark, name) for name in HEADLINE}
    if record:
        with open(EXPECTED_PATH, "w") as f:
            json.dump(got, f, indent=2, sort_keys=True)
        return
    failures = []
    for name in HEADLINE:
        if name not in expected:
            failures.append(
                f"{name}: no recorded baseline (new HEADLINE entry?) — "
                "run PLAN_AUDIT_RECORD=1 to pin it"
            )
            continue
        for metric in ("shuffle_records", "input_records"):
            want, have = expected[name][metric], got[name][metric]
            tol = max(ABS_TOL, REL_TOL * want)
            if abs(have - want) > tol:
                failures.append(f"{name}.{metric}: expected ~{want}, got {have}")
    assert not failures, (
        "plan regression (records moved changed beyond tolerance):\n  "
        + "\n  ".join(failures)
        + "\nIf the plan change is DELIBERATE, re-record with "
        "PLAN_AUDIT_RECORD=1 and justify in the commit message."
    )
