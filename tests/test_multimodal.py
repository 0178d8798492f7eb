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


def test_real_decoder_raises_cleanly_without_codec():
    """Without an imaging library the real path must fail loudly
    (ImportError), never return fake data pretending to be a decode."""
    import pytest

    from mapreduce_framework_spark.multimodal.decode import (
        decode_image_real,
        pil_available,
    )

    if pil_available():
        pytest.skip("imaging library present; real path covered below")
    with pytest.raises(ImportError):
        decode_image_real(b"\x89PNG")


def test_codec_auto_detect_seam(spark):
    """'auto' resolves to the fake in a codec-less container and to PIL
    when present; the PIL branch is exercised whenever the environment
    allows (skipped otherwise, never silently faked)."""
    import pandas as pd
    import pytest

    from mapreduce_framework_spark.multimodal.decode import (
        decode_images,
        pil_available,
    )

    payloads = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [b"not-an-image"]})
    )
    out = decode_images(payloads, codec="auto").collect()[0]
    if not pil_available():
        assert out.format == "fake/raw"  # auto fell back to the fake
        pytest.skip("no imaging library in this environment")
    # PIL present: undecodable payloads degrade per-row, decodable ones
    # get real dimensions.
    assert out.format == "undecodable"
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (5, 7)).save(buf, format="PNG")
    real = spark.createDataFrame(
        pd.DataFrame({"doc_id": [2], "payload": [buf.getvalue()]})
    )
    row = decode_images(real, codec="auto").collect()[0]
    assert (row.width, row.height, row.format) == (5, 7, "png")


def test_wav_writer_is_spec_compliant_per_stdlib():
    """The WAV fixture writer must emit bytes an INDEPENDENT parser
    accepts: the stdlib `wave` module reads every synthesized payload
    and agrees with our parser on rate/channels/width/frames."""
    import io
    import wave

    from mapreduce_framework_spark.multimodal.codecs import (
        SAMPLE_RATE,
        parse_wav,
        synth_pcm,
        synth_wav_bytes,
    )

    for d in (0, 1, 63, 499, 1999, 123456):
        payload = synth_wav_bytes(d)
        wf = wave.open(io.BytesIO(payload))
        meta = parse_wav(payload)
        assert wf.getframerate() == SAMPLE_RATE == meta["sample_rate"]
        assert wf.getnchannels() == 1 and wf.getsampwidth() == 2
        assert wf.getnframes() == meta["n_samples"] == len(synth_pcm(d))
        pcm = synth_pcm(d)
        assert meta["peak"] == max(abs(x) for x in pcm)
        assert meta["energy"] == sum(x * x for x in pcm)


def test_codec_parsers_reject_malformed_payloads():
    """A 100 TB decode stage must fail loudly per row: truncated,
    wrong-magic, and size-mismatched payloads all raise."""
    import pytest

    from mapreduce_framework_spark.multimodal.codecs import (
        parse_bmp,
        parse_wav,
        synth_bmp_bytes,
        synth_wav_bytes,
    )

    wav, bmp = synth_wav_bytes(7), synth_bmp_bytes(7)
    for bad in (b"", b"RIFF", wav[:43], b"XXXX" + wav[4:], wav[:-2]):
        with pytest.raises(ValueError):
            parse_wav(bad)
    for bad in (b"", b"BM", bmp[:53], b"XX" + bmp[2:], bmp[:-1]):
        with pytest.raises(ValueError):
            parse_bmp(bad)


def test_bmp_roundtrip_dimensions():
    from mapreduce_framework_spark.multimodal.codecs import (
        parse_bmp,
        synth_bmp_bytes,
    )

    for d in (0, 1, 63, 47, 64 * 48 - 1, 987654):
        meta = parse_bmp(synth_bmp_bytes(d))
        assert meta["width"] == 1 + d % 64
        assert meta["height"] == 1 + d % 48
        assert meta["bpp"] == 24
        assert meta["row_stride"] % 4 == 0
