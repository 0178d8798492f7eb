"""Driver-environment oracle-typing audit (round-4 verdict ask #2).

The driver compares Spark and DuckDB results through pandas, where
DuckDB HUGEINT (the default type of SUM(BIGINT)) and DECIMAL coerce to
float64.  A Spark bigint vs oracle float64 then hash-mismatches even
when every cell is numerically identical — rows_match/schema_match
true, hash_match false (the round-4 `embedding_seed_farthest` failure,
plus three latent siblings found and fixed this round:
profile_drift_ks, profile_fk_integrity, udf_grouped_agg).

This module pins the class WITHOUT running Spark: DuckDB's bind step
alone yields result types, so the whole-registry audit is sub-second.
The per-column Spark-vs-DuckDB category cross-check lives in
`assert_oracle_parity` (tests/conftest.py) and runs inside the full
parity sweep.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import SF_DIR, TABLES, type_category


@pytest.fixture(scope="module")
def oracle_map():
    import __spark_entry__ as contract

    return contract.oracle_sql()


@pytest.fixture(scope="module")
def duck_bind():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_no_pandas_fragile_types_in_any_oracle(oracle_map, duck_bind):
    """Every oracle's bound result schema must be free of HUGEINT /
    UHUGEINT / DECIMAL columns — each one is a latent driver hash
    mismatch on every round that samples the key.  Fix pattern:
    CAST(SUM(x) AS BIGINT) (see queries/clustering.py kmeans oracle)."""
    offenders = {}
    for name, sql in sorted(oracle_map.items()):
        rel = duck_bind.sql(sql)
        hits = [
            (col, str(ty))
            for col, ty in zip(rel.columns, rel.types)
            if type_category(str(ty)).startswith("FRAGILE")
        ]
        if hits:
            offenders[name] = hits
    assert not offenders, (
        "oracles emit pandas-fragile result types (coerce to float64 on "
        f"the driver): {offenders}"
    )


def test_oracle_columns_are_unique_and_named(oracle_map, duck_bind):
    """The driver sorts columns BY NAME before hashing; duplicate or
    auto-generated names make that sort ambiguous across engines."""
    for name, sql in sorted(oracle_map.items()):
        rel = duck_bind.sql(sql)
        cols = list(rel.columns)
        assert len(cols) == len(set(cols)), f"{name}: duplicate oracle columns {cols}"
        for c in cols:
            assert "(" not in c and " " not in c, (
                f"{name}: auto-generated oracle column name {c!r} — alias it"
            )
