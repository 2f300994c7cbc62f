"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline; the scale path buckets
vectors first (sign-pattern LSH / IVF-style) so each query only scans one
bucket.  All arithmetic is native Column expressions in float64
(``zip_with`` dot product — JVM codegen, no Python); the small query side
is broadcast so the corpus never shuffles.

At 100 TB the corpus side stays partitioned (bucketed by signature);
queries are broadcast to it — the join reads each corpus partition once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> F.Column:
    return F.sqrt(dot(a, a))


def with_unit_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Precompute the L2 norm once per vector (amortized across queries)."""
    v = _as_double(vec_col)
    return df.withColumn("__vec", v).withColumn("__norm", norm(F.col("__vec")))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self excluded).

    queries ⨝ corpus is a broadcast of the (small) query side against the
    (huge) corpus side; ranking is a per-query window on the joined frame.
    Returns (q, neighbor, rank, cosine)."""
    c = with_unit_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor"), "__vec", "__norm"
    )
    q = with_unit_norm(queries, vec_col).select(
        F.col(id_col).alias("q"),
        F.col("__vec").alias("__qvec"),
        F.col("__norm").alias("__qnorm"),
    )
    joined = c.join(F.broadcast(q), F.col("q") != F.col("neighbor"))
    sim = joined.withColumn(
        "cosine",
        dot(F.col("__qvec"), F.col("__vec")) / (F.col("__qnorm") * F.col("__norm")),
    )
    w = Window.partitionBy("q").orderBy(F.col("cosine").desc(), F.col("neighbor"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q", "neighbor", "rank", F.round("cosine", 6).alias("cosine"))
    )


def sign_bucket(vec_col, nbits: int = 8) -> F.Column:
    """IVF/LSH-style bucket id: sign bits of the first ``nbits`` dimensions.

    A deterministic, SQL-matchable stand-in for trained IVF centroids: the
    partition function that lets ANN scan one bucket instead of the corpus."""
    v = _as_double(vec_col)
    bits = F.transform(
        F.sequence(F.lit(0), F.lit(nbits - 1)),
        lambda j: F.when(F.element_at(v, j + 1) > 0, F.pow(F.lit(2.0), j).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)


def ann_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    nbits: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign-bucket.

    The corpus is bucketed once by ``sign_bucket``; each query joins only
    its bucket (equi-join on bucket id → hash-partitioned probe, ~1/2^nbits
    of the corpus per query).  Recall < 1 by construction — the documented
    ANN trade-off; exact path = cosine_topk."""
    c = with_unit_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor"),
        sign_bucket(vec_col, nbits).alias("bucket"),
        "__vec",
        "__norm",
    )
    q = with_unit_norm(queries, vec_col).select(
        F.col(id_col).alias("q"),
        sign_bucket(vec_col, nbits).alias("bucket"),
        F.col("__vec").alias("__qvec"),
        F.col("__norm").alias("__qnorm"),
    )
    joined = c.join(F.broadcast(q), "bucket").filter(F.col("q") != F.col("neighbor"))
    sim = joined.withColumn(
        "cosine",
        dot(F.col("__qvec"), F.col("__vec")) / (F.col("__qnorm") * F.col("__norm")),
    )
    w = Window.partitionBy("q").orderBy(F.col("cosine").desc(), F.col("neighbor"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q", "bucket", "neighbor", "rank", F.round("cosine", 6).alias("cosine"))
    )


# ------------------------------------------------------- trained IVF (k-means)
def _score_structs(vec_dbl, centroids: list[tuple[int, list[float]]]) -> F.Column:
    """Array of (squared-distance-score, cid) structs, one per centroid.

    score = |c|^2 - 2 v.c (argmin-equivalent to ||v-c||^2; |v|^2 is constant
    per row).  |c|^2 is folded in Python with the same sequential order the
    engines use, so scores are bit-identical across Spark / DuckDB / Python
    and the argmin can never flip cross-engine."""
    structs = []
    for cid, cv in centroids:
        carr = F.array(*[F.lit(float(x)) for x in cv])
        cc = 0.0
        for x in cv:
            cc += float(x) * float(x)
        score = F.lit(cc) - F.lit(2.0) * dot(vec_dbl, carr)
        structs.append(
            F.struct(
                score.alias("score"), F.lit(int(cid)).cast("long").alias("cid")
            )
        )
    return F.array(*structs)


def nearest_centroid(vec_dbl, centroids) -> F.Column:
    """cid of the nearest centroid (ties broken by lowest cid — struct
    ordering is (score, cid) lexicographic)."""
    return F.array_min(_score_structs(vec_dbl, centroids))["cid"]


def probe_centroids(vec_dbl, centroids, nprobe: int) -> F.Column:
    """The ``nprobe`` nearest centroid ids (IVF probe list)."""
    ranked = F.slice(F.sort_array(_score_structs(vec_dbl, centroids)), 1, nprobe)
    return F.transform(ranked, lambda s: s["cid"])


# expression-tree argmin is O(k*dim) literals in the plan — fine to here;
# beyond it the vectorized pandas path (one BLAS matmul per Arrow batch)
# scores centroids without bloating the plan
_EXPR_ARGMIN_MAX_K = 64


def _centroid_matrix(centroids: list[tuple[int, list[float]]]):
    cids = np.array([c for c, _ in centroids], dtype=np.int64)
    cmat = np.array([v for _, v in centroids], dtype=np.float64)
    cc = (cmat * cmat).sum(axis=1)
    return cids, cmat, cc


def nearest_centroid_pandas(vec_col, centroids) -> F.Column:
    """Large-k argmin as a vectorized pandas UDF: per Arrow batch, stack the
    vectors into an (n, dim) float64 matrix and score every centroid with
    one BLAS matmul (score = |c|^2 - 2 v.c, same argmin as the expression
    path).  Ties break to the lowest cid (np.argmin keeps the first
    minimum and centroids are cid-ordered).  Scores differ from the
    sequential-fold expression path only by float64 summation order
    (~1e-15) — irrelevant for ANN partitioning, which is why the
    ORACLE-verified small-k path keeps the bit-exact expression tree."""
    from pyspark.sql.functions import pandas_udf

    cids, cmat, cc = _centroid_matrix(centroids)

    @pandas_udf("long")
    def _argmin(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype="int64")
        mat = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        scores = cc[None, :] - 2.0 * (mat @ cmat.T)
        return pd.Series(cids[np.argmin(scores, axis=1)])

    return _argmin(vec_col if not isinstance(vec_col, str) else F.col(vec_col))


def probe_centroids_pandas(vec_col, centroids, nprobe: int) -> F.Column:
    """Large-k probe list (nprobe nearest cids) via the same batched matmul;
    stable argsort keeps ties in cid order like the expression path."""
    from pyspark.sql.functions import pandas_udf

    cids, cmat, cc = _centroid_matrix(centroids)

    @pandas_udf("array<long>")
    def _probe(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype="object")
        mat = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        scores = cc[None, :] - 2.0 * (mat @ cmat.T)
        idx = np.argsort(scores, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([cids[row].tolist() for row in idx])

    return _probe(vec_col if not isinstance(vec_col, str) else F.col(vec_col))


def _pick_method(method: str, centroids) -> str:
    if method == "auto":
        return "expr" if len(centroids) <= _EXPR_ARGMIN_MAX_K else "pandas"
    if method not in ("expr", "pandas"):
        raise ValueError(f"unknown centroid-scoring method {method!r}")
    return method


def _nearest(vec_dbl, centroids, method: str) -> F.Column:
    if _pick_method(method, centroids) == "expr":
        return nearest_centroid(vec_dbl, centroids)
    return nearest_centroid_pandas(vec_dbl, centroids)


def _probe_list(vec_dbl, centroids, nprobe: int, method: str) -> F.Column:
    if _pick_method(method, centroids) == "expr":
        return probe_centroids(vec_dbl, centroids, nprobe)
    return probe_centroids_pandas(vec_dbl, centroids, nprobe)


def kmeans_lite(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iters: int = 2,
    scale: int = 1_000_000,
    method: str = "auto",
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd's k-means over an embedding column — the trained
    partition function for IVF ANN (upgrade over ``sign_bucket``).

    Determinism across engines/runs, the part plain k-means lacks:
    - init = the k lowest-id vectors (data-defined, seedless);
    - per-cluster element sums are INTEGER fixed-point (round(x*scale) as
      long) — exact and accumulation-order-independent, so the shuffle
      order of a distributed sum cannot perturb centroids;
    - centroid element = (sum/n)/scale, two IEEE divisions identical in
      Python, Spark, and DuckDB.

    Scale shape: each iteration is one hash-agg over posexplode(dim) —
    shuffle of k*dim longs per partition after map-side partials — plus a
    driver collect of k*dim stats (bounded planning data, like bucket ids
    in merge.py).  Centroids travel back as literals / a closure constant
    (broadcast by plan), so the corpus is scanned, never shuffled by row.
    ``method``: "expr" = bit-exact expression-tree argmin (the
    oracle-matchable path, plans O(k*dim) literals — capped at
    ``_EXPR_ARGMIN_MAX_K``); "pandas" = batched-BLAS argmin for large k;
    "auto" (default) picks by k.
    """
    v = _as_double(vec_col)
    init = (
        df.select(F.col(id_col).alias("__id"), v.alias("__v"))
        .orderBy("__id")
        .limit(k)
        .collect()
    )
    centroids = [(i, [float(x) for x in r["__v"]]) for i, r in enumerate(init)]
    base = df.select(
        v.alias("__v"),
        F.transform(v, lambda x: F.round(x * scale, 0).cast("long")).alias("__fv"),
    )
    for _ in range(n_iters):
        stats = (
            base.withColumn("__cluster",
                            _nearest(F.col("__v"), centroids, method))
            .select("__cluster", F.posexplode("__fv").alias("pos", "val"))
            .groupBy("__cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cid: dict[int, list[tuple[int, int, int]]] = {}
        for r in stats:
            by_cid.setdefault(int(r["__cluster"]), []).append(
                (int(r["pos"]), int(r["s"]), int(r["n"]))
            )
        centroids = [
            (cid, [(s / n) / float(scale) for _, s, n in sorted(elems)])
            for cid, elems in sorted(by_cid.items())
        ]
    return centroids


def kmeans_assign(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
) -> DataFrame:
    """(id, cluster) assignment of every vector to its nearest centroid."""
    return df.select(
        F.col(id_col),
        _nearest(_as_double(vec_col), centroids, method).alias("cluster"),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_centroids: int = 8,
    n_iters: int = 2,
    nprobe: int = 1,
    centroids: list[tuple[int, list[float]]] | None = None,
    method: str = "auto",
) -> DataFrame:
    """Approximate top-k with TRAINED IVF partitions (vs ``ann_bucketed_topk``
    whose buckets are untrained sign bits).

    The corpus is assigned once to its nearest centroid (the inverted
    lists); each query probes its ``nprobe`` nearest centroids and ranks
    exact cosine inside those lists only — ~nprobe/k of the corpus per
    query.  Recall grows with nprobe; nprobe=k is exact search.
    ``method``: centroid scoring — "expr" (bit-exact, k ≤ 64) / "pandas"
    (batched BLAS, any k) / "auto"."""
    if centroids is None:
        centroids = kmeans_lite(corpus, id_col, vec_col, n_centroids,
                                n_iters, method=method)
    c = with_unit_norm(corpus, vec_col).select(
        F.col(id_col).alias("neighbor"),
        _nearest(F.col("__vec"), centroids, method).alias("cluster"),
        "__vec",
        "__norm",
    )
    q = with_unit_norm(queries, vec_col).select(
        F.col(id_col).alias("q"),
        F.explode(
            _probe_list(F.col("__vec"), centroids, nprobe, method)
        ).alias("cluster"),
        F.col("__vec").alias("__qvec"),
        F.col("__norm").alias("__qnorm"),
    )
    joined = c.join(F.broadcast(q), "cluster").filter(
        F.col("q") != F.col("neighbor")
    )
    sim = joined.withColumn(
        "cosine",
        dot(F.col("__qvec"), F.col("__vec")) / (F.col("__qnorm") * F.col("__norm")),
    )
    w = Window.partitionBy("q").orderBy(F.col("cosine").desc(), F.col("neighbor"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q", "cluster", "neighbor", "rank", F.round("cosine", 6).alias("cosine")
        )
    )


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    nbits: int = 4,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold, bucketed join.

    Same-bucket restriction keeps the self-join from being O(n²); with a
    high threshold true near-dups almost always share sign patterns."""
    side = with_unit_norm(df, vec_col).select(
        F.col(id_col), sign_bucket(vec_col, nbits).alias("bucket"), "__vec", "__norm"
    )
    a = side.select(
        F.col(id_col).alias("a"), "bucket",
        F.col("__vec").alias("__va"), F.col("__norm").alias("__na"),
    )
    b = side.select(
        F.col(id_col).alias("b"), "bucket",
        F.col("__vec").alias("__vb"), F.col("__norm").alias("__nb"),
    )
    pairs = a.join(b, "bucket").filter(F.col("a") < F.col("b"))
    sim = pairs.withColumn(
        "cosine", dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    )
    return sim.filter(F.col("cosine") >= threshold).select(
        "a", "b", F.round("cosine", 6).alias("cosine")
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the standard 4× storage cut
    a vector corpus takes before ANN indexing (q = round(127·x/max|x|),
    dequantize x̂ = q·max_abs/127; cosine error bounded by the per-dim
    quantization step).

    Returns (id, max_abs double, q_vec array<int> in [-127, 127]).
    Rounding is floor(x+0.5) — HALF-UP for negatives too, chosen over
    round() because Spark (HALF_UP) and DuckDB (banker's in some builds)
    disagree on .5 ties while floor is IEEE-exact everywhere, which keeps
    the value oracle bit-identical.  Pure column expressions
    (transform/aggregate) — no Python, no shuffle; zero vectors quantize
    to zeros via the 1e-30 floor."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    max_abs = F.greatest(
        F.aggregate(v, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x))),
        F.lit(1e-30),
    )
    q = F.transform(
        v, lambda x: F.floor(x * F.lit(127.0) / F.col("__max_abs") + F.lit(0.5))
        .cast("int")
    )
    return (
        df.withColumn("__max_abs", max_abs)
        .select(
            F.col(id_col),
            F.col("__max_abs").alias("max_abs"),
            q.alias("q_vec"),
        )
    )


def dequantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    qvec_col: str = "q_vec",
    scale_col: str = "max_abs",
) -> DataFrame:
    """Inverse of ``quantize_embeddings``: x̂ = q·max_abs/127 as
    array<double> — feed straight back into cosine_topk/ivf_topk."""
    return df.select(
        F.col(id_col),
        F.transform(
            F.col(qvec_col),
            lambda q: q.cast("double") * F.col(scale_col) / F.lit(127.0),
        ).alias("embedding"),
    )
