"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship routing-multicast query at sf0.001.
queries()     -> every implemented operator from SURVEY.md §2 + the
                 training-data pipeline operators (plans/queries.py registry).
oracle_sql()  -> DuckDB twins for every SQL-expressible query; CDC replay,
                 LSH candidate generation and multimodal plumbing are
                 rows-only (their hard correctness gates live in tests/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_exchange_routing_spark.plans.queries import ORACLE, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["events_route_multicast"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE)
