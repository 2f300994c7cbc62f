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
