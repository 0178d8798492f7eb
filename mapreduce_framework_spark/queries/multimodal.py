"""Multimodal plumbing query: binary payload → mapInPandas decode →
typed metadata.  The payloads are synthesized from documents.text
(UTF-8 bytes) since the corpus ships no real images; the decode stage is
the deterministic fake documented in multimodal/decode.py, so the whole
path — binary column, Arrow batches, schema — is oracle-checkable."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_framework_spark.io import table
from mapreduce_framework_spark.multimodal.decode import decode_images
from mapreduce_framework_spark.registry import register


@register(
    "multimodal_decode",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       CAST(octet_length(encode(text)) % 256 AS INTEGER) AS width,
       CAST(octet_length(encode(text)) // 256 + 1 AS INTEGER) AS height,
       'fake/raw' AS format
FROM documents
""".strip(),
    tags=("multimodal",),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload column → Arrow-batched decode → typed metadata."""
    payloads = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return decode_images(payloads)


@register(
    "multimodal_frame_sample",
    oracle="""
SELECT doc_id,
       CAST(unnest(range(least(octet_length(encode(text)) // 1000 + 1, 5))) AS INTEGER) AS frame_idx,
       unnest(range(least(octet_length(encode(text)) // 1000 + 1, 5))) * 40 AS ts_ms,
       octet_length(encode(text)) AS frame_bytes
FROM documents
""".strip(),
    tags=("multimodal",),
    bench=True,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style 1→N frame sampling through mapInPandas: one binary
    payload row expands to one row per sampled frame."""
    from mapreduce_framework_spark.multimodal.decode import sample_frames

    payloads = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return sample_frames(payloads)


@register(
    "multimodal_audio_features",
    # The float array itself is unhashable for the driver canonicalizer,
    # so the query serializes it to its exact integer grid (features are
    # (n>>k & 255)/255 in the deterministic fake): the UDF still emits
    # the real array<float>, the check constrains every element.
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) * 8 AS duration_ms,
       concat_ws(',',
         (octet_length(encode(text)) >> 0) & 255,
         (octet_length(encode(text)) >> 1) & 255,
         (octet_length(encode(text)) >> 2) & 255,
         (octet_length(encode(text)) >> 3) & 255,
         (octet_length(encode(text)) >> 4) & 255,
         (octet_length(encode(text)) >> 5) & 255,
         (octet_length(encode(text)) >> 6) & 255,
         (octet_length(encode(text)) >> 7) & 255) AS features_csv
FROM documents
""".strip(),
    tags=("multimodal",),
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style feature extraction: binary payload → fixed-width
    float vector (array<float>), the input shape for the ANN/similarity
    stage.  For the hash check the vector is serialized losslessly back
    to its integer grid (×255, round, int) — float-format-free, so both
    engines canonicalize identically; tests/test_multimodal.py checks
    the raw array."""
    from mapreduce_framework_spark.multimodal.decode import extract_audio_features

    payloads = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    feats = extract_audio_features(payloads)
    return feats.select(
        "doc_id",
        "duration_ms",
        F.concat_ws(
            ",",
            F.transform(
                F.col("features"),
                lambda x: F.round(x * 255).cast("int").cast("string"),
            ),
        ).alias("features_csv"),
    )


@register(
    "multimodal_resize",
    oracle="""
WITH p AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n,
         CAST(octet_length(encode(text)) % 256 AS INTEGER) AS width,
         CAST(octet_length(encode(text)) // 256 + 1 AS INTEGER) AS height
  FROM documents
),
r AS (
  SELECT doc_id, n, width, height,
         CAST(greatest((width * 64) // greatest(width, height), 1) AS INTEGER) AS out_width,
         CAST(greatest((height * 64) // greatest(width, height), 1) AS INTEGER) AS out_height
  FROM p
  WHERE greatest(width, height) > 64
)
SELECT doc_id, width, height, out_width, out_height,
       CAST(least(out_width * out_height, n) AS INTEGER) AS thumb_bytes
FROM r
""".strip(),
    tags=("multimodal",),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize plumbing (binary in → binary thumbnail out).  The
    hash-checked projection covers the computed dimensions; the binary
    thumb column itself is exercised by tests (oracle SQL cannot express
    the byte slice portably)."""
    from mapreduce_framework_spark.multimodal.decode import resize_images

    payloads = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    resized = resize_images(payloads)
    return resized.where(F.greatest("width", "height") > 64).select(
        "doc_id",
        "width",
        "height",
        "out_width",
        "out_height",
        F.length("thumb").cast("int").alias("thumb_bytes"),
    )


@register(
    "multimodal_payload_dedup",
    # 60-bit md5 prefix matches DuckDB's identical arithmetic (same
    # convention as operators/simhash.py md5_prefix60); text is ASCII
    # so md5(text) == md5 of its UTF-8 payload bytes.
    oracle="""
SELECT CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) AS fp60,
       min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
""".strip(),
    tags=("multimodal", "dedup"),
    bench=True,
)
def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate detection over the BINARY lane: payload bytes →
    Arrow-batched fingerprint stage (mapInPandas; the seam where a real
    perceptual hash plugs in) → hash-groupBy fingerprint groups with a
    canonical owner (n_copies counts exact payload duplicates; this
    fixture corpus has none, so every group is a singleton — the dup
    filter is the caller's one-line WHERE).  This is dedup_exact's plan running on opaque
    blobs instead of text columns — at 100 TB image/audio dedup
    shuffles one (fp60, doc_id) pair per payload, never the bytes; the
    fingerprint stage is the only part that touches payload bytes and
    it is embarrassingly parallel."""
    from mapreduce_framework_spark.multimodal.decode import fingerprint_payloads

    payloads = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    fps = fingerprint_payloads(payloads)
    return (
        fps.groupBy("fp60")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


@register(
    "multimodal_wav_real_decode",
    # The fixture signal is an exact integer function of doc_id, so the
    # oracle reconstructs every decoded feature analytically — per-row
    # sample expansion via unnest(range(n)).
    oracle="""
WITH s AS (
  SELECT doc_id, unnest(range(1000 + doc_id % 500)) AS i FROM documents
)
SELECT doc_id,
       8000 AS sample_rate,
       count(*) AS n_samples,
       count(*) * 1000 // 8000 AS duration_ms,
       CAST(max(abs((doc_id + i) % 199 - 99)) AS BIGINT) AS peak,
       CAST(SUM(((doc_id + i) % 199 - 99) * ((doc_id + i) % 199 - 99))
            AS BIGINT) AS energy
FROM s GROUP BY doc_id
""".strip(),
    tags=("multimodal", "udf"),
)
def multimodal_wav_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, no external library (round-9 upgrade of the
    family's documented jpeg/mp4 stub seam): stage 1 synthesizes a
    spec-compliant RIFF/WAVE 16-bit PCM payload per document (writer
    proven against the stdlib ``wave`` parser in tests), stage 2 —
    the product under test — struct-parses the RIFF header with
    magic/chunk/size validation and computes exact integer audio
    features (duration, peak, Σ-squares energy) from the raw PCM with
    numpy.  Both stages are Arrow-batched mapInPandas lanes over a
    true binary column — the exact shape a 100 TB audio pipeline has,
    with only the codec call swapped for real corpora.  Malformed
    payloads raise per-row (fail loudly, never emit garbage metadata)."""
    import pandas as pd
    from pyspark import cloudpickle

    from mapreduce_framework_spark.multimodal import codecs
    from mapreduce_framework_spark.multimodal.codecs import (
        parse_wav,
        synth_wav_bytes,
    )

    # The lanes reference module-level codec functions; ship the module
    # BY VALUE so executors need no package on their import path (the
    # driver contract may run from any cwd — same policy as the
    # locally-defined stateful UDFs, streaming/stateful.py).
    cloudpickle.register_pickle_by_value(codecs)

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [synth_wav_bytes(int(d)) for d in pdf["doc_id"]],
                }
            )

    payloads = docs.mapInPandas(synth, "doc_id long, payload binary")

    def decode(batches):
        for pdf in batches:
            out = [
                {"doc_id": int(d), **parse_wav(bytes(p))}
                for d, p in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        decode,
        "doc_id long, sample_rate int, n_samples long, duration_ms long, "
        "peak long, energy long",
    )


@register(
    "multimodal_bmp_real_decode",
    oracle="""
SELECT doc_id,
       CAST(1 + doc_id % 64 AS INT) AS width,
       CAST(1 + doc_id % 48 AS INT) AS height,
       24 AS bpp,
       CAST(((1 + doc_id % 64) * 3 + 3) // 4 * 4 AS BIGINT) AS row_stride,
       CAST(((1 + doc_id % 64) * 3 + 3) // 4 * 4 * (1 + doc_id % 48)
            AS BIGINT) AS n_pixel_bytes
FROM documents
""".strip(),
    tags=("multimodal", "udf"),
)
def multimodal_bmp_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-container decode, no external library: synthesizes a
    complete 24-bpp bottom-up BMP per document (BITMAPFILEHEADER +
    BITMAPINFOHEADER + 4-byte-padded pixel rows), then struct-parses it
    back — magic, header sizes, and the padded-row arithmetic must
    account for every byte in the file or the row fails loudly.  The
    oracle checks the parser's output (width/height/bpp/stride/pixel
    bytes) against the analytic derivation.  Same Arrow-batched binary
    lane as the WAV key; the compressed-codec seam
    (multimodal/decode.py) remains the documented stub for formats
    that genuinely need external libraries."""
    import pandas as pd
    from pyspark import cloudpickle

    from mapreduce_framework_spark.multimodal import codecs
    from mapreduce_framework_spark.multimodal.codecs import (
        parse_bmp,
        synth_bmp_bytes,
    )

    cloudpickle.register_pickle_by_value(codecs)  # see the WAV key

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def synth(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [synth_bmp_bytes(int(d)) for d in pdf["doc_id"]],
                }
            )

    payloads = docs.mapInPandas(synth, "doc_id long, payload binary")

    def decode(batches):
        for pdf in batches:
            out = [
                {"doc_id": int(d), **parse_bmp(bytes(p))}
                for d, p in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(out)

    return payloads.mapInPandas(
        decode,
        "doc_id long, width int, height int, bpp int, "
        "row_stride long, n_pixel_bytes long",
    )
