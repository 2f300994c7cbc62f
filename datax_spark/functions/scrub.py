"""PII scrubbing and repetition-quality signals for training corpora —
native Column expressions / DataFrame aggregations (no Python in the path).

Extends the reference's scalar transformers (dx_replace et al.,
core/.../transport/transformer/ReplaceTransformer.java) with the two
redaction/quality passes every public web-scale corpus pipeline runs
before training (C4, Gopher/MassiveText rules — public literature):

- ``pii_scrub`` / ``pii_counts``: regex redaction of emails, IPv4
  addresses and international-format phone numbers, with per-category
  match counts.  Patterns are kept to the regex subset Java's engine and
  RE2 (DuckDB) interpret identically, so the DuckDB oracle reproduces the
  redacted text byte-for-byte.
- ``repetition_features``: Gopher-style repetition signals — duplicate
  word mass and the share of the most frequent 2-gram — as exact integer
  numerators/denominators (hash-stable across engines; callers divide).

Design notes for scale:
- ``pii_scrub``/``pii_counts`` are per-row Column expressions: no shuffle,
  whole-stage codegen, filter/projection pushdown unaffected.
- ``repetition_features`` shuffles by (doc_id, gram) then doc_id — both
  aggregations are map-side combinable hash-aggs keyed by the document,
  so they partition evenly at any corpus size (no hot keys: a document's
  grams all live in its own key space).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Redaction order matters (an email body can contain digit runs): emails
# first, then IPv4, then phone numbers.  Keep every construct inside the
# Java-regex ∩ RE2 common subset: char classes, bounded repeats,
# alternation, non-capturing groups — no backrefs, no lookaround.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+\d{1,3}[- ]\d{3}[- ]\d{4}\b", "<PHONE>"),
}


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_scrub(col) -> Column:
    """Redact emails → IPv4 → phones in order; returns the scrubbed text."""
    out = F.coalesce(_c(col), F.lit(""))
    for pat, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out


def pii_counts(col) -> dict[str, Column]:
    """Per-category match counts (BIGINT), measured BEFORE redaction —
    counted against the same progressively-scrubbed text the replacement
    sees, so an IP inside an already-redacted email is not double-counted."""
    cur = F.coalesce(_c(col), F.lit(""))
    counts: dict[str, Column] = {}
    for name, (pat, token) in PII_PATTERNS.items():
        counts[f"n_{name}"] = F.regexp_count(cur, F.lit(pat)).cast("long")
        cur = F.regexp_replace(cur, pat, token)
    return counts


def nfc(col) -> Column:
    """Unicode NFC normalization as an Arrow-batched pandas UDF (Spark has
    no built-in normalizer).  This is one of the few sanctioned Python
    hops: per-row work with no JVM equivalent, vectorized through Arrow
    (``Series.str.normalize``), nulls propagate."""
    import pandas as pd  # noqa: F401 (signature typing)

    @F.pandas_udf("string")
    def _nfc(s):
        return s.str.normalize("NFC")

    return _nfc(_c(col))


def normalize_text(col) -> Column:
    """The standard pre-training text-canonicalization pass (public
    C4/CCNet-style cleanup): Unicode NFC, control characters (C0 except
    newline, plus DEL) replaced with spaces, space runs collapsed, ends
    trimmed.  Newlines survive — paragraph structure is meaningful to
    downstream dedup/chunking.  NFC runs through :func:`nfc` (Arrow); the
    character passes stay native ``regexp_replace`` (JVM, codegen).  The
    regexes live in the Java∩RE2 subset, so DuckDB's ``nfc_normalize`` +
    the same replacements reproduce the output byte-for-byte."""
    x = nfc(col)
    x = F.regexp_replace(x, r"[\x00-\x09\x0B-\x1F\x7F]", " ")
    x = F.regexp_replace(x, r" {2,}", " ")
    # trim spaces around newlines so "a \n b" canonicalizes to "a\nb"
    x = F.regexp_replace(x, r" ?\n ?", "\n")
    return F.btrim(x)


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition signals per document, as exact integers:

    - ``n_tokens`` / ``n_distinct_tokens``: duplicate word mass is
      ``1 - distinct/total`` (callers divide; integers keep the value
      oracle byte-exact across engines).
    - ``n_bigrams`` / ``top_bigram_n``: the most frequent 2-gram's count
      over all (non-distinct) consecutive 2-grams — the "fraction of
      characters in the most common n-gram" rule family from the Gopher
      quality filters, in token units.

    Documents with fewer than 2 tokens report 0 bigrams (top = 0).
    Two map-side-combinable hash-aggs keyed by the document — scale-safe.
    """
    from datax_spark.functions.text import tokens

    w = tokens(_c(text_col))
    k = F.greatest(F.size(w) - F.lit(1), F.lit(0))
    bigrams = F.zip_with(  # NON-distinct consecutive 2-grams
        F.slice(w, 1, k), F.slice(w, 2, k),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    base = df.select(
        F.col(id_col),
        F.size(w).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(w)).cast("long").alias("n_distinct_tokens"),
        bigrams.alias("__bg"),
    )
    per_gram = (
        base.select(id_col, F.explode_outer("__bg").alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tops = per_gram.groupBy(id_col).agg(
        F.coalesce(
            F.max(F.when(F.col("g").isNotNull(), F.col("c"))), F.lit(0)
        ).cast("long").alias("top_bigram_n"),
        F.coalesce(
            F.sum(F.when(F.col("g").isNotNull(), F.col("c"))), F.lit(0)
        ).cast("long").alias("n_bigrams"),
    )
    return base.drop("__bg").join(tops, id_col)


def contamination_report(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    eval_id_col: str | None = None,
    n: int = 3,
    min_shared: int = 1,
) -> DataFrame:
    """Benchmark-contamination check: for every corpus document sharing at
    least ``min_shared`` distinct word n-grams with some eval-set document,
    one row ``(id, eval_id, shared_shingles, n_shingles)`` — the standard
    pre-training hygiene pass (n-gram-overlap decontamination against held-
    out benchmarks, as published for GPT-3 §4 / PaLM app. / Llama-2; public
    literature).  ``shared_shingles / n_shingles`` is the caller's
    contamination ratio; exact integers keep the result hash-stable across
    engines.

    Scale shape: the EVAL side (benchmarks are small — thousands of docs)
    is collected to distinct hashed shingles and BROADCAST; the corpus side
    shingles stream through a broadcast hash join without ever shuffling
    the text, and only matching (corpus_id, eval_id, shingle) rows reach
    the count aggregation — O(corpus shingles) map-side work plus a
    shuffle of the hit subset.  No all-pairs, no hub-key skew (a shingle's
    join group is bounded by the eval set's size)."""
    from datax_spark.functions import dedup as DD

    eval_id = eval_id_col or id_col
    ev = (
        DD.shingle_sets(eval_df, eval_id, text_col, n, hashed=True)
        .select(F.col(eval_id).alias("__eval_id"), "shingle")
        .distinct()
    )
    cs = DD.shingle_sets(corpus, id_col, text_col, n, hashed=True)
    # shingle rows are distinct per (doc, shingle) on both sides, so the
    # per-pair row count IS the distinct shared-shingle count
    return (
        cs.join(F.broadcast(ev), "shingle")
        .groupBy(F.col(id_col), F.col("__eval_id"))
        .agg(
            F.count(F.lit(1)).alias("shared_shingles"),
            F.max("n_shingles").cast("long").alias("n_shingles"),
        )
        .filter(F.col("shared_shingles") >= min_shared)
        .select(
            id_col,
            F.col("__eval_id").alias("eval_id"),
            "shared_shingles",
            "n_shingles",
        )
    )
