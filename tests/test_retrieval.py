"""BM25 retrieval (functions/retrieval.py): scoring semantics + plan."""

import math

import pytest
from pyspark.sql import Row

from datax_spark.functions import retrieval as R
from datax_spark.plans import checks


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([
        Row(doc_id=1, text="spark merge table"),
        Row(doc_id=2, text="merge merge merge conflict"),
        Row(doc_id=3, text="table scan table scan table"),
        Row(doc_id=4, text="unrelated words entirely here"),
        Row(doc_id=5, text=""),
    ])


def test_bm25_matches_hand_fold(corpus):
    got = {r.doc_id: r.score
           for r in R.bm25_topk(corpus, "merge table", k=10).collect()}
    # hand-computed reference fold (same formula, pure python)
    docs = {1: ["spark", "merge", "table"],
            2: ["merge"] * 3 + ["conflict"],
            3: ["table", "scan"] * 2 + ["table"],
            4: ["unrelated", "words", "entirely", "here"]}
    n, avgdl = 4, sum(map(len, docs.values())) / 4.0
    df = {"merge": 2, "table": 2}

    def idf(t):
        return math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))

    want = {}
    for d, toks in docs.items():
        s = 0.0
        for t in ("merge", "table"):
            tf = toks.count(t)
            if tf:
                s += idf(t) * tf * 2.2 / (
                    tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
        if s:
            want[d] = round(s, 6)
    assert got == want
    # doc 4 (no query terms) and doc 5 (empty) are absent
    assert 4 not in got and 5 not in got


def test_bm25_deterministic_tiebreak(corpus):
    rows = R.bm25_topk(corpus, "merge table scan", k=3).collect()
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_bm25_rejects_empty_query(corpus):
    with pytest.raises(ValueError, match="empty query"):
        R.bm25_topk(corpus, "   ")


def test_bm25_plan_stays_jvm(corpus):
    checks.assert_no_python_row_udf(R.bm25_topk(corpus, "merge", k=2))
