"""The driver contract surface: ``__spark_entry__`` must be robust to
the HARNESS session's configuration, because the driver builds its own
SparkSession and merely passes it in.

The sharp edge is the session timezone: timestamp columns collect in
session-local time, so a non-UTC harness session would shift every
timestamp result against the naive-UTC parquet data and the DuckDB
oracle.  ``queries()`` therefore pins semantics-critical runtime confs
on the session it is handed, per call.
"""

from __future__ import annotations

import datetime

from tests.conftest import SF_DIR, rows_normalized


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.columns
    assert len(df.collect()) >= 0


def test_queries_pin_utc_on_foreign_session(spark, duck):
    """Run a timestamp-emitting query through queries() with the session
    deliberately mis-configured to a non-UTC timezone; the wrapper must
    repin UTC so results still match the oracle exactly."""
    import __spark_entry__ as e

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        fn = e.queries()["stream_tumbling_count"]
        sdf = fn(spark, SF_DIR)
        # The wrapper repinned the conf before building the plan ...
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        s_rows = [tuple(r) for r in sdf.collect()]
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")

    res = duck.execute(e.oracle_sql()["stream_tumbling_count"])
    d_cols = [d[0] for d in res.description]
    _, s_norm = rows_normalized(sdf.columns, s_rows)
    _, d_norm = rows_normalized(d_cols, res.fetchall())
    assert s_norm == d_norm
    # ... and the rows really contain timestamps (the guard is load-bearing).
    assert any(isinstance(v, datetime.datetime) for v in s_rows[0])


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 113
