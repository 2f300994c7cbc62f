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


def test_real_decode_is_gated(docs):
    with pytest.raises(NotImplementedError, match="PIL|codec"):
        MM.decode_image(docs)


def test_frame_sample_plan_counts(docs):
    sampled = MM.frame_sample_plan(docs, every_ms=1000)
    row = sampled.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("meta.duration_ms").alias("d"),
    ).collect()
    for r in row:
        assert r.n == (max(r.d - 1, 0) // 1000) + 1