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


def test_hash_split_disjoint_exhaustive_stable(spark):
    docs = _docs(spark)
    out = SMP.hash_split(docs, ["doc_id"],
                         {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = dict(out.groupBy("split").count().collect())
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()  # exhaustive
    assert counts["train"] > counts.get("val", 0)
    # stability: repartitioned input yields the identical assignment
    a = {(r.doc_id, r.split) for r in out.select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in
         SMP.hash_split(docs.repartition(7), ["doc_id"],
                        {"train": 0.8, "val": 0.1, "test": 0.1})
         .select("doc_id", "split").collect()}
    assert a == b
    with pytest.raises(ValueError, match="sum to 1"):
        SMP.hash_split(docs, ["doc_id"], {"a": 0.5, "b": 0.4})


def test_chunk_documents_overlap_and_coverage(spark):
    docs = _docs(spark)
    out = SMP.chunk_documents(docs, "text", chunk_tokens=64, overlap=16,
                              keep_cols=["doc_id"]).collect()
    toks = {r.doc_id: r.n for r in
            docs.select("doc_id",
                        SMP.token_count("text").alias("n")).collect()}
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_ix)
        n = toks[doc_id]
        # every chunk except possibly the last is exactly chunk_tokens long
        for r in rows[:-1]:
            assert r.chunk_tokens == 64
        assert 1 <= rows[-1].chunk_tokens <= 64
        # step-48 starts cover all tokens: total unique coverage == n
        assert 48 * (len(rows) - 1) + rows[-1].chunk_tokens == n
        # consecutive chunks share exactly the 16-token overlap
        if len(rows) > 1:
            w0 = rows[0].chunk.split(" ")
            w1 = rows[1].chunk.split(" ")
            assert w0[-16:] == w1[:16]
    # empty/whitespace docs yield no chunks; all non-empty docs appear
    assert set(by_doc) == {d for d, n in toks.items() if n > 0}
    with pytest.raises(ValueError, match="overlap"):
        SMP.chunk_documents(docs, "text", chunk_tokens=10, overlap=10)


def test_scaled_documents_shape_and_structure(spark):
    """scaled_documents: copies× rows, ids shifted by c·1e9, within-copy
    texts perturbed identically (near-dup structure preserved), cross-copy
    texts share only non-replaced windows, boilerplate prepends."""
    from datax_spark import fixtures

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(20)
    base = {r.doc_id: r.text for r in docs.collect()}
    out = fixtures.scaled_documents(spark, docs, 3, boilerplate="hdr x")
    rows = {r.doc_id: r.text for r in out.collect()}
    assert len(rows) == 3 * len(base)
    for did, text in base.items():
        for c in range(3):
            t = rows[did + c * 1_000_000_000]
            assert t.startswith("hdr x ")
            words = t.split()[2:]  # strip boilerplate
            orig = text.split()
            assert len(words) == len(orig)
            for i, w in enumerate(words):
                if i % 4 == 0:
                    assert w == f"c{c}w{i}"
                else:
                    assert w == orig[i]
    # determinism
    again = {r.doc_id: r.text
             for r in fixtures.scaled_documents(
                 spark, docs, 3, boilerplate="hdr x").collect()}
    assert again == rows


def test_weighted_topk_deterministic_and_weighted(spark):
    """weighted_sample_topk: selection is a pure function of
    (salt, key, weight) — repartitioning must not change it; higher-weight
    rows are favored; non-positive/NULL weights never sampled; k bound
    holds per stratum."""
    from datax_spark.functions.sampling import weighted_sample_topk

    rows = [(i, "a" if i % 2 == 0 else "b",
             10_000 if i < 40 else 1,
             ) for i in range(400)]
    rows.append((9991, "a", 0))      # w = 0: never kept
    rows.append((9992, "a", -5))     # w < 0: never kept
    rows.append((9993, "a", None))   # NULL: never kept
    df = spark.createDataFrame(rows, "id long, s string, w long")
    out = weighted_sample_topk(df, ["id"], "w", 10, ["s"], salt="t")
    got = out.select("id", "s", "es_key").collect()
    per = {}
    for r in got:
        per.setdefault(r.s, []).append(r.id)
    assert all(len(v) == 10 for v in per.values())
    assert not {9991, 9992, 9993} & {r.id for r in got}
    # heavy rows (w=10000, ids<40) should dominate the selection
    heavy = sum(1 for r in got if r.id < 40)
    assert heavy >= 15, heavy
    # partitioning-independence: identical selection at any layout
    again = weighted_sample_topk(
        df.repartition(13), ["id"], "w", 10, ["s"], salt="t"
    ).select("id", "s", "es_key").collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, got))
    # different salt: an independent draw
    other = weighted_sample_topk(df, ["id"], "w", 10, ["s"], salt="u")
    assert {r.id for r in other.collect()} != {r.id for r in got}


def test_weighted_topk_validation(spark):
    from datax_spark.functions.sampling import weighted_sample_topk
    import pytest

    df = spark.createDataFrame([(1, "x", 2)], "id long, s string, w long")
    with pytest.raises(ValueError):
        weighted_sample_topk(df, ["id"], "w", 0, ["s"])
    with pytest.raises(ValueError):
        weighted_sample_topk(df, ["id"], "w", 5, [])
