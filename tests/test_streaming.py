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

# ------------------------------------------------- byte-rate cap + watchdog
def test_files_per_trigger_for_bytes(tmp_path):
    from datax_spark.streaming.runner import files_per_trigger_for_bytes

    d = tmp_path / "sized"
    d.mkdir()
    # 6 files of 100 bytes, ascending mtimes
    for i in range(6):
        p = d / f"part-{i}.parquet"
        p.write_bytes(b"x" * 100)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))
    f = files_per_trigger_for_bytes
    assert f(str(d), 100) == 1
    assert f(str(d), 250) == 2
    assert f(str(d), 1000) == 6
    # cap below the smallest file still admits one file per batch
    assert f(str(d), 10) == 1
    # empty dir
    e = tmp_path / "empty"
    e.mkdir()
    assert f(str(e), 100) == 1


def test_stream_byte_cap_bounds_batches(spark, tmp_path):
    feed_path = _feed(spark, tmp_path, n_files=6)
    sizes = sorted(
        os.path.getsize(os.path.join(feed_path, f))
        for f in os.listdir(feed_path) if f.endswith(".parquet")
    )
    cap = sizes[-1] * 2  # admits ~2 files per batch
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    applied = run_available_now(
        spark, feed_path, t, max_bytes_per_trigger=cap
    )
    assert sum(l["rows"] for l in applied) == N
    assert len(applied) == 3  # 6 files / 2 per batch
    _parity(t, feed_path)


def test_files_per_trigger_for_rows(tmp_path):
    """Record-rate admission reads parquet FOOTER row counts (no data
    read) in mtime order, mirroring the byte pre-scan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datax_spark.streaming.runner import files_per_trigger_for_rows

    d = tmp_path / "rowed"
    d.mkdir()
    # 6 files of 50 rows each, ascending mtimes
    for i in range(6):
        p = str(d / f"part-{i}.parquet")
        pq.write_table(pa.table({"a": list(range(50))}), p)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))
    f = files_per_trigger_for_rows
    assert f(str(d), 50) == 1
    assert f(str(d), 120) == 2
    assert f(str(d), 1000) == 6
    # cap below the smallest file still admits one file per batch
    assert f(str(d), 10) == 1
    e = tmp_path / "empty_r"
    e.mkdir()
    assert f(str(e), 100) == 1


def test_stream_row_cap_bounds_batches(spark, tmp_path):
    """max_rows_per_trigger: every micro-batch's applied row total stays
    within the cap (the tps half of the reference's channel throttle)."""
    feed_path = _feed(spark, tmp_path, n_files=6)
    per_file = N // 6
    cap = per_file * 2 + 10  # admits exactly 2 files per batch
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    applied = run_available_now(
        spark, feed_path, t, max_rows_per_trigger=cap
    )
    assert sum(l["rows"] for l in applied) == N
    assert len(applied) == 3  # 6 files / 2 per batch
    assert all(l["rows"] <= cap for l in applied)
    _parity(t, feed_path)


def test_stream_row_and_byte_caps_stricter_wins(spark, tmp_path):
    """Both caps given: the stricter derived file count governs."""
    feed_path = _feed(spark, tmp_path, n_files=6)
    per_file = N // 6
    sizes = sorted(
        os.path.getsize(os.path.join(feed_path, f))
        for f in os.listdir(feed_path) if f.endswith(".parquet")
    )
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    applied = run_available_now(
        spark, feed_path, t,
        max_bytes_per_trigger=sizes[-1] * 6,   # permissive: all 6 at once
        max_rows_per_trigger=per_file + 5,     # strict: 1 file per batch
    )
    assert sum(l["rows"] for l in applied) == N
    assert len(applied) == 6
    _parity(t, feed_path)


def test_stall_watchdog_fires_on_hung_batch(spark, tmp_path):
    import time as _time

    import pytest as _pytest

    feed_path = _feed(spark, tmp_path, n_files=4)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)

    def hang(df):
        _time.sleep(15)
        return df

    with _pytest.raises(TimeoutError, match="no progress"):
        run_available_now(
            spark, feed_path, t,
            max_files_per_trigger=1,
            stall_timeout_sec=3,
            transform=hang,
        )
    # a healthy drain with the watchdog armed is unaffected
    t2 = create_repo_table(spark, str(tmp_path / "t2"), num_buckets=8)
    applied = run_available_now(
        spark, feed_path, t2, max_files_per_trigger=2, stall_timeout_sec=120
    )
    assert sum(l["rows"] for l in applied) == N


def _split_feed(spark, tmp_path, n_files=6):
    """Full feed staged as lsn-ordered files; returns (staging, live, parts)
    where ``live`` starts EMPTY and parts are copied in as the tail runs."""
    import shutil

    staging = str(tmp_path / "staging")
    feed = fixtures.change_events(spark, N, n_keys=400, seed=42)
    write_feed_ordered(feed, staging, n_files=n_files)
    live = str(tmp_path / "live")
    os.makedirs(live)
    parts = sorted(f for f in os.listdir(staging) if f.endswith(".parquet"))
    return staging, live, parts


def _copy_parts(staging, live, parts, mtime_base):
    import shutil

    for i, fn in enumerate(parts):
        dst = os.path.join(live, fn)
        shutil.copy(os.path.join(staging, fn), dst)
        os.utime(dst, (mtime_base + i, mtime_base + i))


def test_continuous_tail_applies_late_files(spark, tmp_path):
    """run_continuous keeps applying files that land AFTER the query
    started — the live binlog-tail shape run_available_now cannot cover."""
    import time as _time

    from datax_spark.streaming.runner import run_continuous

    staging, live, parts = _split_feed(spark, tmp_path, n_files=6)
    schema = spark.read.parquet(staging).schema
    now = int(_time.time())
    _copy_parts(staging, live, parts[:3], now - 100)
    first_rows = sum(
        spark.read.parquet(os.path.join(staging, f)).count()
        for f in parts[:3]
    )
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    tail = run_continuous(
        spark, live, t, feed_schema=schema, stall_timeout_sec=120
    )
    try:
        tail.wait_for_rows(first_rows, timeout_sec=120)
        # late arrivals: the rest of the log lands while the query is live
        _copy_parts(staging, live, parts[3:], now)
        tail.wait_for_rows(N, timeout_sec=120)
    finally:
        applied = tail.stop()
    assert sum(l["rows"] for l in applied) == N
    assert not tail.is_active
    _parity(t, live)


def test_continuous_tail_stop_resume_exactly_once(spark, tmp_path):
    """Stopping the tail and restarting on the same checkpoint resumes
    without double-applying; files added while DOWN are picked up."""
    import time as _time

    from datax_spark.streaming.runner import run_continuous

    staging, live, parts = _split_feed(spark, tmp_path, n_files=6)
    schema = spark.read.parquet(staging).schema
    now = int(_time.time())
    _copy_parts(staging, live, parts[:4], now - 100)
    first_rows = sum(
        spark.read.parquet(os.path.join(staging, f)).count()
        for f in parts[:4]
    )
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    ckpt = str(tmp_path / "ckpt")
    tail = run_continuous(
        spark, live, t, feed_schema=schema, checkpoint_dir=ckpt,
        stall_timeout_sec=120,
    )
    tail.wait_for_rows(first_rows, timeout_sec=120)
    a1 = tail.stop()
    v = t.current_version()

    _copy_parts(staging, live, parts[4:], now)  # lands while the tail is down
    tail2 = run_continuous(
        spark, live, t, feed_schema=schema, checkpoint_dir=ckpt,
        stall_timeout_sec=120,
    )
    try:
        tail2.wait_for_rows(N - first_rows, timeout_sec=120)
    finally:
        a2 = tail2.stop()
    # resume applied ONLY the new files: no replayed batch ids, no
    # re-application of already-committed rows
    assert sum(l["rows"] for l in a1) == first_rows
    assert sum(l["rows"] for l in a2) == N - first_rows
    assert {l["batch_id"] for l in a1}.isdisjoint(
        {l["batch_id"] for l in a2}
    )
    assert t.current_version() > v
    _parity(t, live)


def test_continuous_tail_survives_concurrent_compaction(spark, tmp_path):
    """Out-of-band maintenance racing the live tail: compaction commits
    between micro-batches force the MOR merge's optimistic-concurrency
    rebase (CommitConflict retry), and the folded state stays exact."""
    import time as _time

    from datax_spark.streaming.runner import run_continuous

    staging, live, parts = _split_feed(spark, tmp_path, n_files=6)
    schema = spark.read.parquet(staging).schema
    now = int(_time.time())
    _copy_parts(staging, live, parts[:2], now - 100)
    rows_of = [
        spark.read.parquet(os.path.join(staging, f)).count() for f in parts
    ]
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    tail = run_continuous(
        spark, live, t, feed_schema=schema, stall_timeout_sec=120,
        auto_compact=None,
    )
    try:
        tail.wait_for_rows(sum(rows_of[:2]), timeout_sec=120)
        t.compact()  # maintenance commit races the live applier
        _copy_parts(staging, live, parts[2:4], now)
        tail.wait_for_rows(sum(rows_of[:4]), timeout_sec=120)
        t.compact()
        _copy_parts(staging, live, parts[4:], now + 10)
        tail.wait_for_rows(N, timeout_sec=120)
    finally:
        applied = tail.stop()
    assert sum(l["rows"] for l in applied) == N
    _parity(t, live)
    # compaction commits interleave with the stream's merge commits
    ops = [t.manifest(v).operation for v in range(1, t.current_version() + 1)]
    assert ops.count("compact") == 2
