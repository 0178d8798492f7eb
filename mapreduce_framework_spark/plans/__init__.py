"""Physical-plan inspection utilities (the `.explain` feedback loop,
programmatic)."""

from mapreduce_framework_spark.plans.inspect import (
    formatted_plan,
    count_exchanges,
    has_operator,
    read_schema_columns,
    pushed_filters,
    scan_files_read,
)

__all__ = [
    "formatted_plan",
    "count_exchanges",
    "has_operator",
    "read_schema_columns",
    "pushed_filters",
    "scan_files_read",
]
