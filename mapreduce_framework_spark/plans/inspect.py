"""Programmatic physical-plan assertions.

Scale regressions (lost pushdown, surprise shuffle, de-broadcast) are
invisible to correctness tests — results stay right while cost explodes
100×.  These helpers turn `.explain("formatted")` into assertions so
tests/test_plans.py pins the *plan*, not just the answer.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (broadcast exchanges excluded)."""
    plan = formatted_plan(df)
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning", plan)) + len(
        re.findall(r"^\(\d+\) Exchange\s*$", plan, flags=re.M)
    )


def has_operator(df: DataFrame, name: str) -> bool:
    return name in formatted_plan(df)


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists of each parquet scan's ReadSchema — what actually
    gets read off storage (column pruning evidence)."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans (predicate-pushdown
    evidence)."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def scan_files_read(df: DataFrame) -> list[int]:
    """Per-parquet-scan "number of files read" metric from the EXECUTED
    plan — runs the query (collect) and walks the final adaptive plan,
    descending through query stages.  The ground truth for partition-
    pruning assertions: planning-time strings show the PartitionFilters
    expression, but only this metric proves how many files the scan
    actually opened (``DataFrame.inputFiles()`` ignores pruning).
    Plan-diagnostics only (the collect executes the measured query) —
    never called from any query/operator path."""
    df.collect()
    out: list[int] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "FileSourceScanExec":
            m = node.metrics()
            if m.contains("numFiles"):
                out.append(int(m.apply("numFiles").value()))
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if name.endswith("QueryStageExec"):
            walk(node.plan())
            return
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out
