"""Query modules. Importing this package populates the registry."""

from mapreduce_framework_spark.queries import (  # noqa: F401
    aggregations,
    dedup,
    filters,
    graphs,
    joins,
    mapreduce_job,
    multimodal,
    pipeline,
    similarity,
    textstats,
    scalars,
    scans,
    setops,
    sorts,
    source_formats,
    sql_surface,
    streaming,
    udfs,
    windows,
    wordcount,
)
