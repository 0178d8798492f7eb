"""Shared fixtures: one SparkSession per test session, DuckDB oracle
harness replicating the driver's comparison (row count + schema +
order-insensitive value compare with columns sorted by name)."""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from mapreduce_framework_spark.session import get_spark

    spark = get_spark("mfs-tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def rows_normalized(cols, rows):
    """Sort columns by name (driver semantics), normalize, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out


def assert_oracle_parity(spark, duck, name: str, sf_dir: str = SF_DIR):
    """Run the registered Spark query and its DuckDB oracle; assert
    identical sorted-row multisets (the driver's hash check, made exact)."""
    from mapreduce_framework_spark.registry import get_query

    spec = get_query(name)
    sdf = spec.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    assert spec.oracle is not None, f"{name} has no oracle (rows-only)"
    res = duck.execute(spec.oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    _, s_norm = rows_normalized(s_cols, s_rows)
    _, d_norm = rows_normalized(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_norm, d_norm)):
        assert a == b, f"{name}: first row mismatch at sorted idx {i}:\n spark={a}\n duck ={b}"
