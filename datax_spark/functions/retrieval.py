"""Lexical retrieval over a document corpus: BM25 scoring + top-k.

The training-data-curation staple (quality filtering by query relevance,
targeted corpus slicing, eval-set mining).  Everything is native Column
expressions over one tokenize pass — document frequencies, lengths and
the BM25 fold are hash-aggregates and broadcast joins; no Python rows,
no cartesian products.

Scale shape: the corpus tokenizes ONCE into (doc, term, tf) — O(tokens)
rows, shuffled once on term to meet the (tiny, broadcast) query-term
frame; per-term partial scores then hash-agg back to docs.  The df/avgdl
statistics are corpus-level aggregates (map-side partials).  A 10^9-doc
corpus never materializes per-pair anything: work is O(postings of the
query's terms) after the term join — the classic inverted-index cost,
expressed relationally.

Okapi BM25 (k1=1.2, b=0.75 defaults), idf = ln(1 + (N - df + ½)/(df + ½))
— the Robertson–Spärck-Jones form with the +1 that keeps idf positive.
The suite oracle recomputes it in DuckDB SQL; scores are rounded to 6
decimals on BOTH sides before comparison (same discipline as the jaccard
oracles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datax_spark.functions import text as TX


def doc_term_freqs(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, term, tf) postings + per-doc length: one tokenize + explode +
    hash-agg.  Lower-cased whitespace terms (text.tokens)."""
    toks = df.select(
        F.col(id_col),
        F.explode(TX.tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    return toks.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k docs for a query string by BM25: (doc_id, score) with
    deterministic ties (score desc, doc_id asc).

    The query-term frame is a handful of literals (broadcast); the corpus
    side shuffles once on term.  ``score`` is rounded to 6 decimals — the
    cross-engine comparison grain, and more precision than ranking needs.
    """
    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        raise ValueError("bm25_topk: empty query")
    postings = doc_term_freqs(df, id_col, text_col)
    dl = postings.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    # integer sum + one double division: bit-identical avgdl in any
    # engine (a float running average would depend on summation order)
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).first()
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["sum_dl"]) / float(n_docs)
    qdf = df.sparkSession.createDataFrame(
        [(t,) for t in terms], "term string"
    )
    idf = (
        postings.join(F.broadcast(qdf), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
    )
    contrib = (
        postings.join(F.broadcast(qdf), "term")
        .join(F.broadcast(idf), "term")
        .join(dl, id_col)
        .withColumn(
            "part",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b)
                   + F.lit(b) * F.col("dl") / F.lit(avgdl))
            ),
        )
    )
    return (
        contrib.groupBy(id_col)
        .agg(F.round(F.sum("part"), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )
