"""Trained-IVF (deterministic k-means) contracts beyond the suite oracle:
bit-exact determinism across runs, nprobe=k degrades to exact search, and
the whole path stays JVM-side (no row Python)."""

import os

import pytest
from pyspark.sql import functions as F

from datax_spark.functions import similarity as SIM
from datax_spark.plans.checks import assert_no_python_row_udf

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


def test_kmeans_lite_bit_deterministic(emb):
    # integer fixed-point sums make centroids independent of shuffle order:
    # two full trainings (fresh jobs, fresh partitionings) must agree to the
    # last bit, not just approximately
    a = SIM.kmeans_lite(emb, k=8, n_iters=2)
    b = SIM.kmeans_lite(emb.repartition(7), k=8, n_iters=2)
    assert [cid for cid, _ in a] == [cid for cid, _ in b]
    for (_, va), (_, vb) in zip(a, b):
        assert va == vb  # exact float equality, intentionally


def test_kmeans_assign_covers_all_vectors(emb):
    cents = SIM.kmeans_lite(emb, k=8, n_iters=2)
    assigned = SIM.kmeans_assign(emb, cents)
    assert assigned.count() == emb.count()
    clusters = {r.cluster for r in assigned.select("cluster").distinct().collect()}
    assert clusters <= {cid for cid, _ in cents}


def test_ivf_nprobe_full_equals_exact(emb):
    # probing every centroid makes IVF an exact search: results must equal
    # brute-force cosine_topk (the recall-vs-nprobe contract's endpoint)
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.q, r.rank): r.neighbor
        for r in SIM.cosine_topk(emb, queries, k=3).collect()
    }
    ivf = {
        (r.q, r.rank): r.neighbor
        for r in SIM.ivf_topk(
            emb, queries, k=3, n_centroids=8, n_iters=1, nprobe=8
        ).collect()
    }
    assert ivf == exact


def test_ivf_topk_no_row_python(emb):
    df = SIM.ivf_topk(emb, emb.filter(F.col("vec_id") < 3), k=2, n_iters=1)
    assert_no_python_row_udf(df)


def test_pandas_scoring_agrees_with_expression_path(emb):
    """Same centroids, same assignments: the batched-BLAS argmin must agree
    with the bit-exact expression tree everywhere the scores aren't
    degenerate (separated centroids → 1e-15 fold-order noise can't flip)."""
    cents = SIM.kmeans_lite(emb, k=8, n_iters=2)
    a = {r.vec_id: r.cluster
         for r in SIM.kmeans_assign(emb, cents, method="expr").collect()}
    b = {r.vec_id: r.cluster
         for r in SIM.kmeans_assign(emb, cents, method="pandas").collect()}
    assert a == b


def test_large_k_trains_and_probes_beyond_expression_cap(emb):
    """k=128 > _EXPR_ARGMIN_MAX_K: auto routes to the pandas path; training
    completes, every vector lands in a real cluster, and nprobe=2 IVF
    reaches a sane recall floor vs brute force."""
    k = 128
    cents = SIM.kmeans_lite(emb, k=k, n_iters=1)
    assert len(cents) <= k  # empty clusters drop out
    assigned = SIM.kmeans_assign(emb, cents)
    assert assigned.count() == emb.count()
    assert assigned.filter(F.col("cluster").isNull()).count() == 0

    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r.q, r.neighbor)
        for r in SIM.cosine_topk(emb, queries, k=3).collect()
    }
    got = {
        (r.q, r.neighbor)
        for r in SIM.ivf_topk(
            emb, queries, k=3, nprobe=2, centroids=cents
        ).collect()
    }
    # ANN contract: nprobe=2 of 128 lists still recalls a meaningful share
    recall = len(got & exact) / len(exact)
    assert recall >= 0.3, recall
    # and nprobe = n_lists is exact even on the pandas path
    full = {
        (r.q, r.neighbor)
        for r in SIM.ivf_topk(
            emb, queries, k=3, nprobe=len(cents), centroids=cents
        ).collect()
    }
    assert full == exact


def test_method_validation():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown centroid-scoring"):
        SIM._pick_method("bogus", [(0, [0.0])])


def test_quantize_dequantize_roundtrip(emb):
    """int8 quantization: values in [-127,127], max_abs positive, and the
    dequantized vectors' cosine similarity to the originals stays >0.999
    (the error is bounded by the per-dim step)."""
    import math

    q = SIM.quantize_embeddings(emb)
    rows = {r.vec_id: r for r in q.collect()}
    orig = {r.vec_id: [float(x) for x in r.embedding]
            for r in emb.collect()}
    assert set(rows) == set(orig)
    for vid, r in rows.items():
        assert r.max_abs > 0
        assert all(-127 <= v <= 127 for v in r.q_vec)
    deq = {r.vec_id: r.embedding
           for r in SIM.dequantize_embeddings(q).collect()}
    for vid, v in orig.items():
        w = deq[vid]
        dot = sum(a * b for a, b in zip(v, w))
        nv = math.sqrt(sum(a * a for a in v))
        nw = math.sqrt(sum(b * b for b in w))
        if nv > 0 and nw > 0:
            assert dot / (nv * nw) > 0.999, vid


def test_quantize_plan_stays_jvm(emb):
    from datax_spark.plans import checks

    checks.assert_no_python_row_udf(SIM.quantize_embeddings(emb))
