"""Query modules. Importing this package populates the registry."""

from mapreduce_framework_spark.queries import (  # noqa: F401
    aggregations,
    filters,
    joins,
    scalars,
    scans,
    setops,
    sorts,
    udfs,
    windows,
    wordcount,
)
