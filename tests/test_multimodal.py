"""Multimodal plumbing: mapInPandas decode/feature kernels (deterministic
fakes; real codecs absent by design), Arrow-only plans, frame-sample shape."""

import pytest
from pyspark.sql import functions as F

from datax_spark.functions import multimodal as MM
from datax_spark.plans import checks


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    return MM.attach_fake_binary(df, "text")


def test_attach_binary_schema(docs):
    assert dict((f.name, f.dataType.simpleString()) for f in docs.schema.fields)[
        "payload"
    ] == "binary"
    meta = docs.select("meta.*").columns
    assert meta == ["mime", "width", "height", "duration_ms"]


def test_fake_decode_meta_matches_payload(docs):
    out = MM.fake_decode_meta(docs).collect()
    src = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert len(out) == 50
    for r in out:
        raw = src[r.doc_id].encode("utf-8")
        assert r.n_bytes == len(raw)
        assert r.checksum == sum(raw)
        assert r.mime == "application/x-fake"


def test_feature_extract_is_normalized_histogram(docs):
    out = MM.fake_feature_extract(docs, dims=8).collect()
    for r in out:
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-6


def test_kernels_are_arrow_not_row_python(docs):
    plan = checks.physical_plan(MM.fake_feature_extract(docs))
    # mapInPandas shows as MapInPandas (Arrow exchange); never BatchEvalPython
    assert "MapInPandas" in plan
    checks.assert_no_python_row_udf(MM.fake_decode_meta(docs))


def test_non_bmp_decode_is_gated(docs):
    """Compressed formats still need PIL (absent here): a non-BMP payload
    fails loudly inside the kernel rather than guessing."""
    from pyspark.errors import PythonException

    with pytest.raises(PythonException, match="PIL|codec"):
        MM.decode_image(docs).collect()


# --------------------------------------------------------- real BMP codec
def test_bmp_round_trip_with_stride_padding():
    """width=3 → 9 pixel bytes/row but 12-byte file stride: the decoder
    must honor the 4-byte row padding and the bottom-up BGR layout."""
    import numpy as np

    raw = bytes(range(3 * 3 * 5))  # 3 wide, 5 tall
    payload = MM.bmp_encode(raw, width=3)
    px = MM.bmp_decode(payload)
    assert px.shape == (5, 3, 3)
    assert px.reshape(-1).tobytes() == raw
    assert isinstance(px, np.ndarray)


def test_bmp_decode_top_down_variant():
    """Negative biHeight = top-down row order — a real-world variant the
    parser must handle (struct round trip built by hand)."""
    import struct

    raw = bytes(range(3 * 2 * 2))
    payload = bytearray(MM.bmp_encode(raw, width=2))
    # flip to top-down: negate height and reverse the stored row order
    (h,) = struct.unpack_from("<i", payload, 22)
    struct.pack_into("<i", payload, 22, -h)
    stride = 8  # width 2 → 6 pixel bytes → padded to 8
    rows = [payload[54 + i * stride: 54 + (i + 1) * stride] for i in range(h)]
    payload[54:] = b"".join(reversed(rows))
    assert MM.bmp_decode(bytes(payload)).reshape(-1).tobytes() == raw


def test_bmp_decode_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="magic|truncated"):
        MM.bmp_decode(b"JUNK" * 20)
    with pytest.raises(ValueError, match="truncated"):
        MM.bmp_decode(b"BM")
    # 8-bit palette BMP: unsupported variant, loud error
    import struct

    p = bytearray(MM.bmp_encode(bytes(12), width=2))
    struct.pack_into("<H", p, 28, 8)
    with pytest.raises(ValueError, match="unsupported"):
        MM.bmp_decode(bytes(p))


def test_decode_image_end_to_end_matches_text_bytes(spark):
    """attach_bmp_binary → decode_image recovers (8, ceil(n/24), channel
    sums of the zero-padded utf-8 bytes) — the exact oracle contract."""
    df = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(40)
    out = {r.doc_id: r for r in
           MM.decode_image(MM.attach_bmp_binary(df, "text")).collect()}
    src = {r.doc_id: r.text for r in df.select("doc_id", "text").collect()}
    assert len(out) == len(src)
    for did, text in src.items():
        raw = (text or "").encode("utf-8")
        h = max(1, -(-len(raw) // 24))
        padded = raw.ljust(24 * h, b"\x00")
        r = out[did]
        assert (r.width, r.height) == (8, h)
        assert r.sum_r == sum(padded[0::3])
        assert r.sum_g == sum(padded[1::3])
        assert r.sum_b == sum(padded[2::3])


def test_frame_sample_plan_counts(docs):
    sampled = MM.frame_sample_plan(docs, every_ms=1000)
    row = sampled.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("meta.duration_ms").alias("d"),
    ).collect()
    for r in row:
        assert r.n == (max(r.d - 1, 0) // 1000) + 1

def test_wav_roundtrip_and_chunk_walk(spark):
    import struct

    import numpy as np

    from datax_spark.functions.multimodal import wav_decode, wav_encode

    pcm = np.array([0, 1, -1, 32767, -32768, 12345], dtype=np.int16)
    rate, ch, got = wav_decode(wav_encode(pcm, sample_rate=16000))
    assert (rate, ch) == (16000, 1)
    assert np.array_equal(got, pcm)

    # a real encoder may interleave extra chunks (LIST) before data and
    # pad odd-sized chunks to even offsets — the walker must skip them
    payload = wav_encode(pcm, sample_rate=8000)
    fmt_chunk = payload[12:36]
    data_chunk = payload[36:]
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"  # odd+pad
    body = fmt_chunk + extra + data_chunk
    rebuilt = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, ch, got = wav_decode(rebuilt)
    assert rate == 8000 and np.array_equal(got, pcm)


def test_wav_decode_rejects_non_pcm(spark):
    import pytest as _pytest

    from datax_spark.functions.multimodal import wav_decode

    with _pytest.raises(ValueError, match="not a WAV"):
        wav_decode(b"OggS" + b"\x00" * 40)
    with _pytest.raises(ValueError, match="missing fmt/data"):
        wav_decode(b"RIFF\x04\x00\x00\x00WAVE")


def test_decode_audio_end_to_end(spark):
    from pyspark.sql import Row

    from datax_spark.functions.multimodal import (
        attach_wav_binary,
        decode_audio,
    )

    df = spark.createDataFrame([
        Row(doc_id=1, text="abc"),
        Row(doc_id=2, text=""),
        Row(doc_id=3, text="é"),  # multi-byte utf-8
    ])
    out = {r["doc_id"]: r for r in
           decode_audio(attach_wav_binary(df)).collect()}
    # 'abc' = bytes 97,98,99 → samples (b-128)*256
    assert out[1]["n_samples"] == 3
    assert out[1]["sum_abs"] == (31 + 30 + 29) * 256
    assert out[1]["peak"] == 31 * 256
    assert out[2]["n_samples"] == 0 and out[2]["sum_abs"] == 0
    assert out[3]["n_samples"] == 2  # é = 0xC3 0xA9
    assert out[3]["peak"] == (0xC3 - 128) * 256
    assert all(r["sample_rate"] == 8000 and r["channels"] == 1
               for r in out.values())


def test_decode_audio_rejects_unknown_codec(spark):
    from pyspark.sql import Row

    from datax_spark.functions.multimodal import decode_audio

    df = spark.createDataFrame([Row(doc_id=1, payload=bytearray(b"ID3junk"))])
    import pytest as _pytest
    with _pytest.raises(Exception, match="NotImplementedError|codec"):
        decode_audio(df).collect()


def test_avi_roundtrip(spark):
    import numpy as np

    from datax_spark.functions.multimodal import avi_decode, avi_encode

    w, h = 8, 2
    f1 = bytes(range(w * h * 3))
    f2 = bytes(reversed(range(w * h * 3)))
    fps, frames = avi_decode(avi_encode([f1, f2], w, h, fps=24))
    assert fps == 24 and len(frames) == 2
    assert np.array_equal(
        frames[0], np.frombuffer(f1, np.uint8).reshape(h, w, 3))
    assert np.array_equal(
        frames[1], np.frombuffer(f2, np.uint8).reshape(h, w, 3))
    # odd widths exercise DIB stride padding
    fps, frames = avi_decode(avi_encode([bytes(5 * 3 * 2)], 5, 2, fps=10))
    assert frames[0].shape == (2, 5, 3)


def test_avi_decode_rejects_unknown(spark):
    import pytest as _pytest

    from datax_spark.functions.multimodal import avi_decode

    with _pytest.raises(ValueError, match="not an AVI"):
        avi_decode(b"RIFF\x04\x00\x00\x00WAVE")
    with _pytest.raises(ValueError, match="no strf"):
        avi_decode(b"RIFF\x04\x00\x00\x00AVI ")


def test_decode_video_sampling_end_to_end(spark):
    from pyspark.sql import Row

    from datax_spark.functions.multimodal import (
        attach_avi_binary,
        decode_video,
    )

    # 100 'a' bytes → 3 frames of 48 (zero-padded); sampled = frames 0, 2
    df = spark.createDataFrame([Row(doc_id=1, text="a" * 100)])
    r = decode_video(attach_avi_binary(df)).collect()[0]
    assert (r["fps"], r["width"], r["height"]) == (10, 8, 2)
    assert r["n_frames"] == 3 and r["n_sampled"] == 2
    # sampled bytes: frame0 = 48×97, frame2 = 4×97 + 44×0 → per channel
    total = 48 * 97 + 4 * 97
    assert r["sum_r"] + r["sum_g"] + r["sum_b"] == total
    assert r["sum_r"] == (16 + 2) * 97  # byte idx ≡ 0 (mod 3) in both frames
