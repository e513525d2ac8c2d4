"""Local replica of the driver's correctness gate: every oracle-checked query
runs in Spark AND DuckDB at sf0.01; row count, column names, and exact values
must agree (order-insensitive)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from data_exchange_routing_spark.plans.queries import DRIVER_PRIORITY, ORACLE, QUERIES

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "<null>"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"{v:.6f}"
        return f"{v:.6f}"
    if isinstance(v, pd.Timestamp):
        return v.tz_localize(None).isoformat() if v.tzinfo else v.isoformat()
    return str(v)


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def _marked(name: str):
    """`-m smoke` runs the 50 driver-priority queries; `-m full_oracle`
    the rest; no -m runs everything (the de-facto driver twin)."""
    mark = pytest.mark.smoke if name in DRIVER_PRIORITY else pytest.mark.full_oracle
    return pytest.param(name, marks=mark)


@pytest.mark.parametrize("name", [_marked(n) for n in sorted(ORACLE)])
def test_query_matches_oracle(spark, con, name):
    got = QUERIES[name](spark, SF_DIR).toPandas()
    exp = con.sql(ORACLE[name]).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {sorted(got.columns)} vs oracle {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: {len(got)} rows vs oracle {len(exp)}"
    g, e = _canon(got), _canon(exp)
    mismatches = [(a, b) for a, b in zip(g, e) if a != b][:5]
    assert g == e, f"{name}: first mismatches {mismatches}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE) - {"cdc_replay_web_pages"}))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
