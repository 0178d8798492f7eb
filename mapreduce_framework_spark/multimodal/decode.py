"""Binary decode / feature-extraction stages over multimodal columns.

Batch shape: each ``mapInPandas`` batch is a pandas DataFrame with a
``payload`` (bytes) column; output adds typed metadata columns.  At
scale, payload partitions are sized by ``maxPartitionBytes`` so a batch
of decoded frames fits executor memory; CPU-heavy codecs get
``spark.task.cpus`` > 1 rather than bigger batches.

The real codec path is stubbed (container has no PIL/ffmpeg — see
package docstring); ``fake_image_meta`` is the deterministic stand-in
keeping every seam (schema, Arrow transfer, batching) real.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, format string"
)


def decode_image_real(payload: bytes) -> dict:
    """Real image decode — requires an imaging library not present in
    this container.  STUB: plug PIL/torchvision here in production."""
    raise NotImplementedError(
        "image codec not available in this environment; use fake_image_meta"
    )


def make_fake_decoder():
    """Deterministic fake decode, built as a closure (pickles by value
    → executors don't need this package).  'Decodes' a payload into
    (width, height) = (n % 256, n // 256 + 1) purely from byte length."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "width": (n % 256).astype("int32"),
                    "height": (n // 256 + 1).astype("int32"),
                    "format": "fake/raw",
                }
            )

    return decode_batches


def decode_images(payloads: DataFrame) -> DataFrame:
    """payloads(doc_id long, payload binary) → typed image metadata via
    Arrow-batched mapInPandas."""
    return payloads.mapInPandas(make_fake_decoder(), schema=IMAGE_META_SCHEMA)
