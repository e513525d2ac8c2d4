from __future__ import annotations

import shutil
import tempfile

import pytest

from data_exchange_routing_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # UI on: the plan-audit gate (tests/test_plan_audit.py) reads per-stage
    # record counts from the REST API; localhost-only, auto-incrementing port
    s = get_spark(
        "dex-spark-tests", cores=8, shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "true"},
    )
    yield s


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="dex_spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
