"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Convention: a modality is an opaque ``binary`` payload column plus a typed
metadata struct — the lakehouse-native shape (no codec dependency in the
table format).  Heavy per-item work (decode, resize, feature-extract,
frame-sample) runs as Arrow-batched ``mapInPandas`` — the batch boundary is
the Arrow record batch, so one Python invocation amortizes over thousands
of items and the plan stays vectorized (never per-row Python).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernels are gated behind import-try and raise NotImplementedError;
``fake_decode_meta`` is the deterministic stand-in the tests drive the
plumbing with (schema, partitioning, UDF signature, batch shape are real).

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


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Real decode path — requires PIL; absent in this container."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL; this environment ships no codecs — "
            "use fake_decode_meta for plumbing tests"
        )
    raise NotImplementedError("PIL decode kernel intentionally not shipped yet")


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
