"""Multimodal plumbing: schema, batching, and 1→N expansion seams are
real even though the codecs are deterministic fakes (container ships no
imaging/audio libs — multimodal/decode.py documents the production
swap-in points)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _payloads(spark):
    from mapreduce_framework_spark.io import table

    return table(spark, SF_DIR, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


def test_frame_sample_expands_rows(spark):
    from mapreduce_framework_spark.multimodal.decode import sample_frames

    src = _payloads(spark)
    frames = sample_frames(src)
    n_docs = src.count()
    assert frames.count() >= n_docs  # ≥1 frame per payload
    one = frames.where(F.col("frame_idx") == 0).count()
    assert one == n_docs  # every payload has frame 0
    assert frames.schema.simpleString() == (
        "struct<doc_id:bigint,frame_idx:int,ts_ms:bigint,frame_bytes:bigint>"
    )


def test_audio_features_fixed_width_and_deterministic(spark):
    from mapreduce_framework_spark.multimodal.decode import extract_audio_features

    a = extract_audio_features(_payloads(spark))
    rows = {r.doc_id: (r.duration_ms, tuple(r.features)) for r in a.collect()}
    b = extract_audio_features(_payloads(spark))
    rows2 = {r.doc_id: (r.duration_ms, tuple(r.features)) for r in b.collect()}
    assert rows == rows2  # deterministic across runs
    assert all(len(v[1]) == 8 for v in rows.values())


def test_real_decoder_is_explicit_stub():
    import pytest

    from mapreduce_framework_spark.multimodal.decode import decode_image_real

    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")
