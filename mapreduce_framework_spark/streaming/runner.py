"""File-source streaming runner.

Materializes a batch DataFrame as a time-range-partitioned parquet
directory, replays it as a stream in bounded micro-batches
(``maxFilesPerTrigger=1`` + ``availableNow``), and collects the result
from a memory sink.  Range partitioning on the time column makes the
micro-batch sequence time-ordered, so watermark semantics behave as
they would on a live, mostly-ordered stream — with the synthetic ~5%
late arrivals actually exercising late-row dropping.

On a real deployment the same transform attaches to a Kafka/files
source with a checkpoint dir; nothing in the transforms changes.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def run_file_stream(
    spark: SparkSession,
    source_df: DataFrame,
    transform,
    *,
    watermark: tuple[str, str] | None = None,
    output_mode: str = "complete",
    n_batches: int = 4,
    order_col: str = "ts",
) -> DataFrame:
    """Replay ``source_df`` as ``n_batches`` time-ordered micro-batches
    through ``transform``; return the memory-sink contents."""
    src_dir = tempfile.mkdtemp(prefix="mfs_stream_src_")
    ckpt_dir = tempfile.mkdtemp(prefix="mfs_stream_ckpt_")
    source_df.repartitionByRange(n_batches, order_col).write.mode("overwrite").parquet(
        src_dir
    )

    stream = (
        spark.readStream.schema(source_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    if watermark is not None:
        stream = stream.withWatermark(*watermark)

    out = transform(stream)
    sink_name = f"mfs_sink_{uuid.uuid4().hex[:12]}"
    query = (
        out.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(sink_name)
