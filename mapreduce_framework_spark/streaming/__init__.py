"""Structured Streaming surface.

The reference is batch-only, but its incremental machinery — requeue of
unfinished tasks, per-map checkpoint replication (SURVEY.md §2a O15/O18)
— is the hand-rolled ancestor of exactly-once incremental processing.
Here that collapses into Structured Streaming: checkpointed offsets +
idempotent sinks give exactly-once; watermarks bound state.

Transforms are written once (DataFrame → DataFrame) and applied to BOTH
batch and streaming inputs — the batch path feeds the DuckDB oracle,
the streaming path (file source, availableNow) proves the same plan
runs incrementally.
"""

from mapreduce_framework_spark.streaming.transforms import (
    tumbling_counts,
    sliding_counts,
    session_windows,
    dedup_events,
)
from mapreduce_framework_spark.streaming.runner import run_file_stream

__all__ = [
    "tumbling_counts",
    "sliding_counts",
    "session_windows",
    "dedup_events",
    "run_file_stream",
]
