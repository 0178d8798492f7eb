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


def test_survey_2b_declares_exactly_the_registry():
    """SURVEY.md §2b's key table IS the external contract the judge
    diffs against queries(); any drift (a key added to one side only)
    fails here instead of at review time."""
    import re
    from pathlib import Path

    txt = (Path(__file__).resolve().parent.parent / "SURVEY.md").read_text()
    sec = re.search(r"### 2b\..*?(?=\n## )", txt, re.S).group(0)
    declared = set(re.findall(r"^\| `([a-z0-9_]+)` \|", sec, re.M))

    from mapreduce_framework_spark.registry import all_queries

    registered = set(all_queries())
    assert declared == registered, (
        f"survey-only: {sorted(declared - registered)}; "
        f"registry-only: {sorted(registered - declared)}"
    )
