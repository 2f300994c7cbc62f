"""PII scrubbing + repetition-signal tests (functions/scrub.py)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from datax_spark.functions.scrub import (
    pii_counts,
    pii_scrub,
    repetition_features,
)


def test_pii_scrub_all_categories(spark):
    df = spark.createDataFrame([Row(
        t="mail a.b+c@sub.example.org or 192.168.0.1 call +44 123-4567 end"
    )])
    r = df.select(pii_scrub("t").alias("s")).first()
    assert r["s"] == "mail <EMAIL> or <IP> call <PHONE> end"


def test_pii_counts_progressive(spark):
    # the IP inside the email must not double-count after email redaction
    df = spark.createDataFrame([Row(
        t="x 1.2.3.4@h.io and 5.6.7.8 plus u@v.co +1 555-0100"
    )])
    counts = pii_counts("t")
    r = df.select(*[c.alias(n) for n, c in counts.items()]).first()
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (2, 1, 1)


def test_pii_scrub_null_and_clean(spark):
    df = spark.createDataFrame(
        [Row(t=None), Row(t="no pii here at all")]
    )
    rows = df.select(
        pii_scrub("t").alias("s"),
        *[c.alias(n) for n, c in pii_counts("t").items()],
    ).collect()
    assert rows[0]["s"] == "" and rows[0]["n_email"] == 0
    assert rows[1]["s"] == "no pii here at all"
    assert rows[1]["n_email"] + rows[1]["n_ipv4"] + rows[1]["n_phone"] == 0


def test_repetition_features_values(spark):
    df = spark.createDataFrame([
        Row(doc_id=1, text="a b a b c"),   # bigrams: ab ba ab bc → top 2/4
        Row(doc_id=2, text="x"),           # no bigrams
        Row(doc_id=3, text="q q q q"),     # qq ×3
    ])
    got = {r["doc_id"]: r for r in repetition_features(df).collect()}
    assert (got[1]["n_tokens"], got[1]["n_distinct_tokens"]) == (5, 3)
    assert (got[1]["top_bigram_n"], got[1]["n_bigrams"]) == (2, 4)
    assert (got[2]["top_bigram_n"], got[2]["n_bigrams"]) == (0, 0)
    assert (got[3]["n_distinct_tokens"], got[3]["top_bigram_n"]) == (1, 3)


def test_repetition_no_python_in_plan(spark):
    from datax_spark.plans.checks import assert_no_python_row_udf

    df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    out = repetition_features(df).select(
        "doc_id", F.col("top_bigram_n") / F.col("n_bigrams")
    )
    assert_no_python_row_udf(out)


def test_normalize_text_cases(spark):
    from datax_spark.functions.scrub import normalize_text

    vals = [
        ("cafe\u0301", "caf\u00e9"),             # NFC composes
        ("  a   b  ", "a b"),                 # space runs + trim
        ("a \n b\n\nc", "a\nb\n\nc"),         # newlines survive, tidied
        ("ctl\x07\x01here", "ctl here"),      # control chars → space
        ("tab\tsep", "tab sep"),
        ("", ""),
        (None, None),                          # nulls propagate
    ]
    df = spark.createDataFrame([(v,) for v, _ in vals], "t string")
    got = [r["n"] for r in df.select(normalize_text("t").alias("n")).collect()]
    assert got == [w for _, w in vals]


def test_normalize_text_arrow_not_row_udf(spark):
    from datax_spark.functions.scrub import normalize_text
    from datax_spark.plans import checks

    df = spark.createDataFrame([("x",)], "t string").select(
        normalize_text("t").alias("n")
    )
    checks.assert_no_python_row_udf(df)  # ArrowEvalPython is sanctioned


def test_contamination_report_counts_shared_shingles(spark):
    from datax_spark.functions.scrub import contamination_report

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text about spark engines here"),
            (3, "quick brown fox jumps high"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "a quick brown fox jumps away")], "doc_id long, text string"
    )
    out = {
        (r.doc_id, r.eval_id): (r.shared_shingles, r.n_shingles)
        for r in contamination_report(
            corpus, ev, "doc_id", "text", n=3, min_shared=1
        ).collect()
    }
    # eval 3-shingles: {a quick brown, quick brown fox, brown fox jumps,
    # fox jumps away}; doc1 shares 2 ("quick brown fox", "brown fox jumps")
    # of its 7; doc3 shares the same 2 of its 3; doc2 shares none
    assert out == {(1, 100): (2, 7), (3, 100): (2, 3)}
