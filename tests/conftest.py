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


_INT_TYPES = {"tinyint", "smallint", "int", "integer", "bigint", "long", "short", "byte"}
_FLOAT_TYPES = {"float", "double", "real"}


def type_category(t: str) -> str:
    """Coarse cross-engine type category for the driver's pandas-level
    hash: it distinguishes int from float (DuckDB HUGEINT/DECIMAL coerce
    to float64 through pandas and then hash-mismatch Spark's int64 even
    when every cell is numerically equal — the round-4
    embedding_seed_farthest failure) but not integer widths.  Local
    value comparison can NOT catch this class (Python 1 == 1.0), so the
    category check is the only local guard."""
    t = t.strip().lower()
    if t.endswith("[]"):
        return f"array<{type_category(t[:-2])}>"
    if t.startswith("array<") and t.endswith(">"):
        return f"array<{type_category(t[6:-1])}>"
    if t in _INT_TYPES:
        return "int"
    if t in _FLOAT_TYPES:
        return "float"
    if t in ("varchar", "string"):
        return "str"
    if t.startswith("timestamp"):
        return "timestamp"
    if t == "date":
        return "date"
    if t in ("boolean", "bool"):
        return "bool"
    if t.startswith("decimal") or t in ("hugeint", "uhugeint"):
        # pandas-fragile: .df() coerces these to float64 on the driver.
        return f"FRAGILE:{t}"
    return t


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
    # Driver-hash type-category parity (see type_category docstring): an
    # int-vs-float divergence passes the value compare below but fails
    # the driver's pandas hash, so pin categories per column here.
    rel = duck.sql(spec.oracle)
    d_tmap = {c: type_category(str(t)) for c, t in zip(rel.columns, rel.types)}
    s_tmap = {f.name: type_category(f.dataType.simpleString()) for f in sdf.schema.fields}
    for col, s_cat in s_tmap.items():
        assert s_cat == d_tmap[col], (
            f"{name}.{col}: type category spark={s_cat} duck={d_tmap[col]} "
            f"— would hash-mismatch on the driver even with equal values"
        )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    _, s_norm = rows_normalized(s_cols, s_rows)
    _, d_norm = rows_normalized(d_cols, d_rows)
    for i, (a, b) in enumerate(zip(s_norm, d_norm)):
        assert a == b, f"{name}: first row mismatch at sorted idx {i}:\n spark={a}\n duck ={b}"
