"""Structured-Streaming runner: drain parity, checkpoint resume, and
out-of-order delivery semantics."""

import os
import random

from pyspark.sql import functions as F

from datax_spark import fixtures
from datax_spark.cdc.runner import create_repo_table
from datax_spark.streaming.runner import run_available_now, write_feed_ordered

N = 2000


def _feed(spark, tmp_path, n_files=4):
    feed = fixtures.change_events(spark, N, n_keys=400, seed=42)
    path = str(tmp_path / "feed")
    write_feed_ordered(feed, path, n_files=n_files)
    return path


def _parity(table, feed_path):
    expected = fixtures.expected_state(feed_path)
    got = {
        (r.repo, r.path, r.commit): r.sha
        for r in table.read()
        .select("repo", "path", "commit",
                F.sha2(F.coalesce("content", F.lit("")), 256).alias("sha"))
        .collect()
    }
    assert set(got) == set(expected)
    for k, e in expected.items():
        assert got[k] == e["sha256"]


def test_stream_drain_parity(spark, tmp_path):
    feed_path = _feed(spark, tmp_path)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    applied = run_available_now(spark, feed_path, t, max_files_per_trigger=1)
    assert sum(l["rows"] for l in applied) == N
    _parity(t, feed_path)


def test_stream_resume_from_checkpoint_no_double_apply(spark, tmp_path):
    feed_path = _feed(spark, tmp_path, n_files=4)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    ckpt = str(tmp_path / "ckpt")
    # run 1 drains everything
    a1 = run_available_now(
        spark, feed_path, t, checkpoint_dir=ckpt, max_files_per_trigger=2
    )
    v = t.current_version()
    # run 2 with the same checkpoint: nothing new
    a2 = run_available_now(
        spark, feed_path, t, checkpoint_dir=ckpt, max_files_per_trigger=2
    )
    assert a2 == []
    assert t.current_version() == v
    # run 3 with a FRESH checkpoint (checkpoint loss): the source replays
    # from scratch; batch-id guard + LSN watermark make it a no-op
    a3 = run_available_now(
        spark, feed_path, t,
        checkpoint_dir=str(tmp_path / "ckpt2"), max_files_per_trigger=3,
    )
    assert sum(l["rows"] for l in a3) == 0 or a3 == []
    _parity(t, feed_path)
    assert sum(l["rows"] for l in a1) == N


def test_stream_unordered_delivery_converges_without_watermark(spark, tmp_path):
    """Files delivered in scrambled order (adversarial mtimes): with the
    watermark filter off, MOR LSN reconstruction still converges."""
    feed_path = _feed(spark, tmp_path, n_files=6)
    parts = sorted(f for f in os.listdir(feed_path) if f.endswith(".parquet"))
    rng = random.Random(7)
    order = list(range(len(parts)))
    rng.shuffle(order)
    base = int(os.path.getmtime(os.path.join(feed_path, parts[0])))
    for rank, idx in enumerate(order):
        p = os.path.join(feed_path, parts[idx])
        os.utime(p, (base + rank, base + rank))
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    applied = run_available_now(
        spark, feed_path, t, max_files_per_trigger=1, filter_watermark=False
    )
    assert sum(l["rows"] for l in applied) == N
    _parity(t, feed_path)