"""BPE-ish pre-tokenizer + paragraph-dedup tests (functions/text.py,
functions/dedup.py)."""

import duckdb
from pyspark.sql import Row
from pyspark.sql import functions as F

from datax_spark.functions.dedup import paragraph_dedup
from datax_spark.functions.text import (
    BPE_TOKEN_PATTERN,
    bpe_token_count,
    bpe_tokens,
)

SAMPLES = [
    "it's a well-known fact, isn't it?  42 items cost $3.50 each!",
    "hello   world\ttabs\nnewlines",
    "café naïve 中文 123abc",
    "",
    "   ",
    "don't we'll they're I'm you've he'd",
    "o'brien 'quoted' x''y",
]


def test_bpe_tokens_matches_re2(spark):
    """The pattern stays in the Java∩RE2 subset: Spark's Java regex and
    DuckDB's RE2 must produce the IDENTICAL token stream — the invariant
    the text_token_stats oracle rests on."""
    df = spark.createDataFrame([(s,) for s in SAMPLES], "text string")
    got = [list(r["t"]) for r in
           df.select(bpe_tokens("text").alias("t")).collect()]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT regexp_extract_all(?, ?)", [s, BPE_TOKEN_PATTERN]
        ).fetchone()[0]
        for s in SAMPLES
    ]
    assert got == want


def test_bpe_token_count_semantics(spark):
    df = spark.createDataFrame([Row(t="it's 42 cats!"), Row(t=None)])
    rows = df.select(bpe_token_count("t").alias("n")).collect()
    # it / 's / ' 42' / ' cats' / '!'
    assert rows[0]["n"] == 5
    assert rows[1]["n"] == 0


def test_paragraph_dedup_keeps_first_occurrence(spark):
    # 3-word paragraphs; "a b c" appears in doc 1 (pos 0), doc 2 (pos 1)
    # and again inside doc 1 (pos 2) — only doc 1 pos 0 survives.
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b c x y z a b c"),
        Row(doc_id=2, text="p q r a b c tail"),
        Row(doc_id=3, text=""),
    ])
    out = {r["doc_id"]: r for r in
           paragraph_dedup(df, "doc_id", "text", para_words=3).collect()}
    assert out[1]["clean_text"] == "a b c x y z"
    assert (out[1]["n_paras"], out[1]["n_kept"]) == (3, 2)
    # doc 2 keeps "p q r" and the short tail paragraph, loses "a b c"
    assert out[2]["clean_text"] == "p q r tail"
    assert (out[2]["n_paras"], out[2]["n_kept"]) == (3, 2)
    # empty doc survives with zero paragraphs
    assert out[3]["clean_text"] == ""
    assert (out[3]["n_paras"], out[3]["n_kept"]) == (0, 0)


def test_paragraph_dedup_no_python_udf(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    plan = paragraph_dedup(df, "doc_id", "text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
