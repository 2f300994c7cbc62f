"""Deterministic synthetic fixtures: repo snapshot + binlog-shaped change feed.

Modeled on DataX's ``streamreader`` synthetic generator (streamreader/src/main/
java/com/alibaba/datax/plugin/reader/streamreader/StreamReader.java:96-117) but
fully deterministic (seeded hashes, no RNG state) and generated WITH Spark
(``spark.range`` + Column expressions) so the same code produces 10^4 rows for
pytest and 10^8+ rows for bench without a driver-side loop.

Shapes follow FIXTURES.md:
- ``repo_files(repo, path, commit, lang, content)``  — the base snapshot; key
  ``(repo, path, commit)``; repo popularity is power-law skewed (hot repos).
- ``change_events(lsn, shard, ts, op, repo, path, commit, lang, content, size)``
  — the WAL/binlog feed; ~70% insert / 25% update / 5% delete; repeated
  touches of the same key within a window; delete-then-reinsert present by
  construction (ops are key-independent, the fold defines truth).
- v2 variant adds ``stars:int`` and widens ``size`` to long (schema evolution).

The test oracle (`expected_state`) is a pure-Python fold over the feed ordered
by ``lsn`` — the engine must converge to exactly this state (per-row
sha256(content) parity, BASELINE.json input_hint).
"""

from __future__ import annotations

import hashlib

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "java", "go", "rust", "js", "md", "yaml", "other"]
OPS = ["insert", "update", "delete"]
BASE_TS = "2026-01-01 00:00:00"  # fixed epoch start — no wall-clock anywhere


def _u(col, seed: int, lo: int = 0, hi: int = 1_000_000):
    """Deterministic uniform int in [lo, hi) from a column + seed (xxhash64)."""
    return (F.pmod(F.xxhash64(col, F.lit(seed)), F.lit(hi - lo)) + F.lit(lo))


def _key_cols(key_id, n_repos: int, seed: int):
    """(repo, path, commit) derived from a key id; repo is power-law skewed.

    Skew: repo_idx = floor(n_repos * (u/1e6)^3) concentrates ~50% of keys in
    the bottom ~20% of repo ids — the hot-repo fixture (FIXTURES.md §1 Zipf).
    """
    u = _u(key_id, seed + 1).cast("double") / F.lit(1_000_000.0)
    repo_idx = F.floor(F.lit(n_repos) * F.pow(u, F.lit(3.0))).cast("long")
    org = F.pmod(repo_idx, F.lit(97))
    repo = F.concat(F.lit("org"), org, F.lit("/repo"), repo_idx)
    depth = (_u(key_id, seed + 2, 1, 5)).cast("int")
    seg = F.lower(F.substring(F.hex(F.xxhash64(key_id, F.lit(seed + 3))), 1, 6))
    ext = F.element_at(
        F.array(*[F.lit(x) for x in ["py", "java", "go", "rs", "js", "md", "yaml", "txt"]]),
        (_u(key_id, seed + 4, 1, 9)).cast("int"),
    )
    path = F.concat(
        F.lit("src/"), F.repeat(F.lit("d/"), depth), F.lit("f_"), seg, F.lit("."), ext
    )
    commit = F.lower(
        F.substring(
            F.concat(
                F.sha2(F.conv(key_id.cast("string"), 10, 16), 256)
            ),
            1,
            40,
        )
    )
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]), (_u(key_id, seed + 5, 1, 9)).cast("int")
    )
    return repo, path, commit, lang


def _content(key_id, version, seed: int, avg_len: int):
    """Deterministic pseudo-source text, variable length ~U(0.25·avg, 1.75·avg)."""
    block = F.sha2(
        F.concat_ws("-", key_id.cast("string"), version.cast("string"), F.lit(seed)),
        256,
    )  # 64 hex chars
    reps = (
        _u(key_id + version * F.lit(7919), seed + 6, avg_len // 4, avg_len * 7 // 4)
        / F.lit(64)
        + F.lit(1)
    ).cast("int")
    return F.substring(
        F.repeat(block, reps),
        1,
        _u(key_id * F.lit(31) + version, seed + 7, avg_len // 4, avg_len * 7 // 4).cast("int"),
    )


def change_events(
    spark: SparkSession,
    n_events: int,
    n_keys: int | None = None,
    n_repos: int = 500,
    n_shards: int = 8,
    seed: int = 42,
    avg_content_len: int = 256,
    schema_v2_from_lsn: int | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """The binlog/WAL-shaped change feed (FIXTURES.md §2/§3)."""
    n_keys = n_keys or max(1, n_events // 3)
    rng = spark.range(0, n_events, 1, partitions or max(8, n_events // 250_000))
    lsn = F.col("id")
    key_id = _u(lsn, seed, 0, n_keys)
    op_u = _u(lsn, seed + 10, 0, 100)
    op = (
        F.when(op_u < 70, F.lit("insert"))
        .when(op_u < 95, F.lit("update"))
        .otherwise(F.lit("delete"))
    )
    repo, path, commit, lang = _key_cols(key_id, n_repos, seed)
    version = _u(lsn, seed + 11, 0, 1 << 30)
    content = _content(key_id, version, seed, avg_content_len)
    is_del = op == "delete"
    df = rng.select(
        lsn.alias("lsn"),
        F.pmod(F.xxhash64(key_id, F.lit(seed + 12)), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        (F.to_timestamp(F.lit(BASE_TS)) + F.make_dt_interval(secs=lsn.cast("double")))
        .alias("ts"),
        op.alias("op"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        F.when(is_del, F.lit(None)).otherwise(lang).alias("lang"),
        F.when(is_del, F.lit(None)).otherwise(content).alias("content"),
    )
    del_row = F.col("op") == "delete"  # resolve against the selected frame
    df = df.withColumn(
        "size",
        F.when(del_row, F.lit(None)).otherwise(F.length("content")).cast("int"),
    )
    if schema_v2_from_lsn is not None:
        # schema-evolution variant: stars column appears, size widens to long
        df = df.filter(F.col("lsn") >= schema_v2_from_lsn).select(
            "lsn", "shard", "ts", "op", "repo", "path", "commit", "lang", "content",
            F.col("size").cast("long").alias("size"),
            F.when(del_row, F.lit(None))
            .otherwise(_u(F.col("lsn"), seed + 13, 0, 10_000))
            .cast("int")
            .alias("stars"),
        )
    return df


def repo_files(
    spark: SparkSession,
    n_rows: int,
    n_repos: int = 500,
    seed: int = 42,
    avg_content_len: int = 256,
) -> DataFrame:
    """Base snapshot table (FIXTURES.md §1) — the initial full-sync input."""
    rng = spark.range(0, n_rows, 1, max(8, n_rows // 250_000))
    key_id = F.col("id")
    repo, path, commit, lang = _key_cols(key_id, n_repos, seed + 100)
    content = _content(key_id, F.lit(0), seed + 100, avg_content_len)
    return rng.select(
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


# --------------------------------------------------------------------- oracle
def expected_state(events_parquet_dir: str) -> dict[tuple, dict]:
    """Pure-Python fold of the feed by ascending LSN (the correctness oracle).

    upsert semantics: insert/update both set the row (update on a missing key
    inserts — MERGE semantics); delete removes; later LSN wins.
    Returns {(repo,path,commit): {lang, content, sha256, ...extra cols}}.
    """
    table = pq.read_table(events_parquet_dir)
    cols = table.column_names
    rows = table.to_pylist()
    rows.sort(key=lambda r: r["lsn"])
    state: dict[tuple, dict] = {}
    extra = [c for c in cols if c not in
             ("lsn", "shard", "ts", "op", "repo", "path", "commit", "lang", "content")]
    for r in rows:
        k = (r["repo"], r["path"], r["commit"])
        if r["op"] == "delete":
            state.pop(k, None)
        else:
            content = r["content"]
            state[k] = {
                "lang": r["lang"],
                "content": content,
                "sha256": hashlib.sha256(
                    (content or "").encode("utf-8")
                ).hexdigest(),
                **{c: r.get(c) for c in extra},
            }
    return state


def scaled_documents(
    spark: SparkSession,
    documents: DataFrame,
    copies: int,
    every: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    boilerplate: str | None = None,
) -> DataFrame:
    """Deterministically scale a documents table ``copies``× for dedup
    crossover benches — the boilerplate/template regime where the exact
    shingle self-join goes quadratic while LSH-then-verify stays linear.

    Copy ``c`` of a doc replaces every ``every``-th word with a
    copy-unique token (``c<c>w<pos>``): within a copy the original
    near-dup structure is preserved exactly (both sides perturbed
    identically), while across ANY two copies the shared 3-shingles are
    only the windows containing no replaced position — at every=4 that is
    windows starting at 1 (mod 4), 1/4 of all shingles, so cross-copy
    Jaccard is 0.25/(2-0.25) ≈ 0.143 (below typical thresholds) yet those
    shared shingles' document frequency grows ``copies``× — the quadratic
    join-mass driver.  ``boilerplate`` prepends a constant phrase to every
    doc (shingle df = corpus size — the uncapped-exact killer).

    One plan for any ``copies`` (explode over a copy sequence, transform
    with the copy column); pure column expressions; ids shift by c·10^9.
    """
    c = F.col("__copy")
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    perturbed = F.array_join(
        F.transform(
            words,
            lambda w, i: F.when(
                i % F.lit(every) == 0,
                F.concat(F.lit("c"), c.cast("string"), F.lit("w"),
                         i.cast("string")),
            ).otherwise(w),
        ),
        " ",
    )
    if boilerplate:
        perturbed = F.concat(F.lit(boilerplate + " "), perturbed)
    return (
        documents.select(
            id_col, text_col,
            F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("__copy"),
        )
        .select(
            (F.col(id_col) + c.cast("long") * F.lit(1_000_000_000))
            .alias(id_col),
            perturbed.alias(text_col),
        )
    )
