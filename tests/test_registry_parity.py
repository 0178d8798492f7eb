"""Parametrized oracle-parity test over the whole registry.

This mirrors the driver's CORRECTNESS gate: every hash-checked query is
run on Spark and on DuckDB and compared exactly (count + schema + sorted
values).  Rows-only queries are smoke-run (must return a DataFrame with
a stable schema and collect without error).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_oracle_parity


def _names():
    from mapreduce_framework_spark.registry import all_queries

    return sorted(all_queries())


@pytest.mark.parametrize("name", _names())
def test_query(spark, duck, name):
    from mapreduce_framework_spark.registry import get_query

    spec = get_query(name)
    if spec.oracle is not None:
        assert_oracle_parity(spark, duck, name)
    else:
        df = spec.fn(spark, SF_DIR)
        assert df.columns, f"{name}: empty schema"
        rows = df.collect()
        assert rows is not None
