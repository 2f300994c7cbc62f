"""Fused dedup+bucketed-write: the in-batch last-writer-wins dedup rides
the bucketed delta write's own exchange (LakeTable._bucketed_lww_frame),
so the full-featured MOR ingest config costs ONE full-batch shuffle per
micro-batch instead of two.  Reference semantics mirrored: DataX channel
FIFO + PK-overwrite ordering (SURVEY.md §2.4) — last event per key wins.

Covers: plan shape (exactly one exchange), state parity with the
unfused/reconstruction paths, deletes inside the fused batch, the salted
files_per_bucket>1 variant, and the bucket_col∉key_cols fallback.
"""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark import fixtures
from datax_spark.cdc.runner import create_repo_table, run_incremental
from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LSN_COL, LakeTable

N_EVENTS = 3000


def _feed(spark, tmp_path):
    path = str(tmp_path / "feed")
    fixtures.change_events(spark, N_EVENTS, n_keys=600, seed=42) \
        .write.mode("overwrite").parquet(path)
    return spark.read.parquet(path), path


def _state(table):
    return {
        (r.repo, r.path, r.commit): r.sha
        for r in table.read()
        .select("repo", "path", "commit",
                F.sha2(F.coalesce("content", F.lit("")), 256).alias("sha"))
        .collect()
    }


def test_fused_frame_plans_single_exchange(spark, tmp_path):
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    m = t.manifest()
    batch = spark.range(2000).select(
        F.concat(F.lit("r"), (F.col("id") % 40).cast("string")).alias("repo"),
        F.concat(F.lit("p"), (F.col("id") % 400).cast("string")).alias("path"),
        F.lit("c").alias("commit"),
        F.lit("py").alias("lang"),
        F.col("id").cast("string").alias("content"),
        F.col("id").alias(LSN_COL),
        F.lit(False).alias("__deleted"),
    )
    for fpb in (1, 2):
        fused = t._bucketed_lww_frame(batch, m, files_per_bucket=fpb)
        plan = fused._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange")
        assert n_exchanges == 1, f"fpb={fpb}: expected 1 exchange:\n{plan}"
        # 400 distinct (repo, path) keys, each collapsed to its max-LSN row
        rows = fused.collect()
        assert len(rows) == 400
        assert {int(r.content) for r in rows} == set(range(1600, 2000))


def test_fused_bucketed_ingest_matches_fold(spark, tmp_path):
    feed, feed_path = _feed(spark, tmp_path)
    t = create_repo_table(spark, str(tmp_path / "fused"), num_buckets=8)
    run_incremental(t, feed, batch_lsns=1000, mode="mor",
                    auto_compact=None, dedup_batch=True, bucket_deltas=True)

    expected = fixtures.expected_state(feed_path)
    got = _state(t)
    assert set(got) == set(expected)
    for k, sha in got.items():
        assert sha == expected[k]["sha256"]

    # deltas landed bucketed (no L0), at most one file per bucket per
    # batch — the fused write preserved placement
    stats = t.file_stats()
    assert stats["delta_files"] > 0
    m = t.manifest()
    assert "L0" not in m.files
    n_batches = (N_EVENTS + 999) // 1000
    for bucket, files in m.files.items():
        assert len(files) <= n_batches


def test_fused_dedup_keeps_last_event_and_applies_deletes(spark, tmp_path):
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=4)
    rows = [
        # key A (repo,path,commit): insert then update — update wins
        ("r1", "a", "c1", "py", "v1", 1, "insert"),
        ("r1", "a", "c1", "py", "v2", 2, "update"),
        # key B: insert then delete — key absent
        ("r1", "b", "c1", "py", "v1", 3, "insert"),
        ("r1", "b", "c1", "py", None, 4, "delete"),
        # key C: delete then re-insert (higher LSN) — re-insert wins
        ("r2", "c", "c1", "py", None, 5, "delete"),
        ("r2", "c", "c1", "py", "v3", 6, "insert"),
    ]
    batch = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string, lsn long, op string")
    merge_into(t, batch, op_col="op", order_col="lsn", mode="mor",
               dedup_batch=True, bucket_deltas=True,
               lineage={"batch_id": "b1", "rows": len(rows)})
    got = {(r.repo, r.path): r.content for r in t.read().collect()}
    assert got == {("r1", "a"): "v2", ("r2", "c"): "v3"}
    # the fused write physically collapsed the batch: 4 stored rows max
    # (A's winner, B's tombstone, C's winner) — not the 6 raw events
    stored = sum(f[4] for fs in t.manifest().files.values() for f in fs)
    assert stored == 3


def test_bucket_col_outside_keys_falls_back(spark, tmp_path):
    # bucket_col=lang is NOT key-functional: the fused path must not be
    # taken (it would split a key across groups); the standalone dedup
    # fallback still yields correct state
    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "t"), schema,
                         key_cols=["repo", "path"], bucket_col="lang",
                         num_buckets=4)
    batch = spark.createDataFrame(
        [("r1", "a", "py", "v1", 1, "insert"),
         ("r1", "a", "py", "v2", 2, "update"),
         ("r1", "b", "go", "v1", 3, "insert")],
        "repo string, path string, lang string, content string, "
        "lsn long, op string")
    merge_into(t, batch, op_col="op", order_col="lsn", mode="mor",
               dedup_batch=True, bucket_deltas=True,
               lineage={"batch_id": "b1", "rows": 3})
    got = {(r.repo, r.path): r.content for r in t.read().collect()}
    assert got == {("r1", "a"): "v2", ("r1", "b"): "v1"}
    stored = sum(f[4] for fs in t.manifest().files.values() for f in fs)
    assert stored == 2  # dedup still happened, just not fused


def test_fused_write_dirs_carry_no_helper_columns(spark, tmp_path):
    import pyarrow.parquet as pq

    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=4)
    batch = spark.createDataFrame(
        [("r1", "a", "c1", "py", "v1", 1, "insert")],
        "repo string, path string, commit string, lang string, "
        "content string, lsn long, op string")
    merge_into(t, batch, op_col="op", order_col="lsn", mode="mor",
               dedup_batch=True, bucket_deltas=True,
               lineage={"batch_id": "b1", "rows": 1})
    m = t.manifest()
    f = next(iter(m.files.values()))[0][0]
    cols = set(pq.read_schema(os.path.join(t.location, f)).names)
    assert "__dx_bucket" not in cols and "__dx_salt" not in cols
    assert {"repo", "path", "content", "__lsn", "__deleted"} <= cols
