"""Deterministic sampling + sequence packing (functions/sampling.py)."""

import pytest
from pyspark.sql import functions as F

from datax_spark.functions import sampling as SMP

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"


def _docs(spark):
    return spark.read.parquet(SF_DOCS)


def test_hash_sample_deterministic_and_partition_independent(spark):
    docs = _docs(spark)
    a = {r.doc_id for r in
         SMP.hash_sample(docs, ["doc_id"], 0.3).select("doc_id").collect()}
    # same sample from a differently-partitioned input
    b = {r.doc_id for r in
         SMP.hash_sample(docs.repartition(13), ["doc_id"], 0.3)
         .select("doc_id").collect()}
    assert a == b and 0 < len(a) < docs.count()
    # monotone: a smaller fraction is a subset of a larger one
    c = {r.doc_id for r in
         SMP.hash_sample(docs, ["doc_id"], 0.1).select("doc_id").collect()}
    assert c <= a
    # a different salt draws a different set
    d = {r.doc_id for r in
         SMP.hash_sample(docs, ["doc_id"], 0.3, salt="x")
         .select("doc_id").collect()}
    assert d != a


def test_hash_sample_fraction_accuracy(spark):
    docs = _docs(spark)
    n = docs.count()
    kept = SMP.hash_sample(docs, ["doc_id"], 0.5).count()
    assert abs(kept / n - 0.5) < 0.12  # 500 docs; loose statistical bound


def test_stratified_fractions_respected(spark):
    docs = _docs(spark)
    out = SMP.stratified_hash_sample(
        docs, "lang", {"zh": 1.0, "en": 0.0}, key_cols=["doc_id"],
        default=0.5,
    )
    by = dict(out.groupBy("lang").count().collect())
    totals = dict(docs.groupBy("lang").count().collect())
    assert by.get("zh") == totals["zh"]      # keep-all stratum
    assert "en" not in by                     # drop-all stratum
    for lang in ("fr", "de", "es"):           # default strata: strict subset
        assert 0 < by[lang] < totals[lang]


def test_sampling_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="fraction"):
        SMP.hash_sample(docs, ["doc_id"], 1.5)
    with pytest.raises(ValueError, match="fraction"):
        SMP.stratified_hash_sample(docs, "lang", {"en": -0.1},
                                   key_cols=["doc_id"])


def test_pack_sequences_budget_and_order(spark):
    docs = _docs(spark)
    budget = 512
    packed = SMP.pack_sequences(
        docs, SMP.token_count("text"), budget=budget,
        order_col="doc_id", strata_cols=["lang"],
    ).select("doc_id", "lang", "__tokens", "__cum", "pack_id").collect()
    assert len(packed) == docs.count()
    by_pack: dict = {}
    for r in packed:
        by_pack.setdefault((r.lang, r.pack_id), []).append(r)
    for (_, _), rows in by_pack.items():
        rows.sort(key=lambda r: r.doc_id)
        total = sum(r["__tokens"] for r in rows)
        # a pack only overflows via its LAST doc (greedy rule)
        assert total - rows[-1]["__tokens"] < budget
        # packs are contiguous in doc order: cum within a pack is monotone
        cums = [r["__cum"] for r in rows]
        assert cums == sorted(cums)
    # pack ids are dense-ish and start at 0 per stratum
    langs = {r.lang for r in packed}
    for lang in langs:
        ids = sorted({r.pack_id for r in packed if r.lang == lang})
        assert ids[0] == 0


def test_pack_sequences_requires_strata(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError, match="strata_cols"):
        SMP.pack_sequences(docs, SMP.token_count("text"), 512,
                           order_col="doc_id", strata_cols=[])
