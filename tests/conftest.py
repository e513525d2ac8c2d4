from __future__ import annotations

import shutil
import tempfile

import pytest

from data_exchange_routing_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dex-spark-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="dex_spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
