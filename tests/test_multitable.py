"""Multi-table transactional apply: one mixed feed, per-table exactly-once
MERGEs, and the consistent-epoch ledger (cdc/multitable.py)."""

import os

import pytest
from pyspark.sql import functions as F

from datax_spark import fixtures
from datax_spark.cdc.multitable import MultiTableApplier
from datax_spark.cdc.runner import create_repo_table
from datax_spark.lake import hashing
from datax_spark.streaming.runner import run_available_now, write_feed_ordered

N = 1500


def _route_spark(col):
    return F.when(F.pmod(F.hash(col), F.lit(2)) == 0, F.lit("a")).otherwise(
        F.lit("b")
    )


def _route_py(repo: str) -> str:
    return "a" if hashing.hash_string(repo) % 2 == 0 else "b"


def _mixed_feed(spark, tmp_path, n_files=3):
    feed = fixtures.change_events(spark, N, n_keys=300, seed=42).withColumn(
        "tbl", _route_spark(F.col("repo"))
    )
    path = str(tmp_path / "feed")
    write_feed_ordered(feed, path, n_files=n_files)
    return path


def _tables(spark, tmp_path):
    return {
        "a": create_repo_table(spark, str(tmp_path / "ta"), num_buckets=4),
        "b": create_repo_table(spark, str(tmp_path / "tb"), num_buckets=4),
    }


def _sha_map(df):
    return {
        (r.repo, r.path, r.commit): r.sha
        for r in df.select(
            "repo", "path", "commit",
            F.sha2(F.coalesce("content", F.lit("")), 256).alias("sha"),
        ).collect()
    }


def _assert_parity(tables, feed_path):
    expected = fixtures.expected_state(feed_path)
    for name, t in tables.items():
        want = {
            k: v["sha256"] for k, v in expected.items()
            if _route_py(k[0]) == name
        }
        got = _sha_map(t.read())
        assert set(got) == set(want), f"table {name} key set diverged"
        assert got == want, f"table {name} content diverged"


def test_multitable_stream_drain_parity_and_epochs(spark, tmp_path):
    feed_path = _mixed_feed(spark, tmp_path, n_files=3)
    tables = _tables(spark, tmp_path)
    ap = MultiTableApplier(
        tables, table_col="tbl",
        ledger_dir=str(tmp_path / "ledger"),
    )
    applied = run_available_now(
        spark, feed_path, ap, max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert sum(l["rows"] for l in applied) == N
    assert all(set(l["tables"]) == {"a", "b"} for l in applied)
    _assert_parity(tables, feed_path)
    # one epoch marker per micro-batch; consistent cut == current state
    markers = [f for f in os.listdir(ap.location) if f.startswith("epoch-")]
    assert len(markers) == 3
    vs = ap.consistent_versions()
    assert vs == {n: t.current_version() for n, t in tables.items()}
    got = _sha_map(ap.read_consistent("a"))
    assert got == _sha_map(tables["a"].read())


def test_multitable_crash_midway_keeps_consistent_cut_then_converges(
    spark, tmp_path
):
    feed = fixtures.change_events(spark, N, n_keys=300, seed=42).withColumn(
        "tbl", _route_spark(F.col("repo"))
    )
    half = feed.filter(F.col("lsn") < N // 2)
    rest = feed.filter(F.col("lsn") >= N // 2)
    tables = _tables(spark, tmp_path)
    ap = MultiTableApplier(
        tables, table_col="tbl", ledger_dir=str(tmp_path / "ledger")
    )
    assert ap.apply_batch(half, 0) is not None
    cut0 = ap.consistent_versions()
    a_rows_after_b0 = _sha_map(tables["a"].read())

    # crash mid-batch-1: table "a" (first in sorted order) commits, then
    # the apply dies before "b" — no epoch marker may appear
    real = ap.appliers["b"].apply_batch
    ap.appliers["b"].apply_batch = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("injected crash before table b")
    )
    with pytest.raises(RuntimeError, match="injected"):
        ap.apply_batch(rest, 1)
    ap.appliers["b"].apply_batch = real

    # a's DIRECT readers see batch 1; the CONSISTENT cut does not move
    assert ap.consistent_versions() == cut0
    assert _sha_map(ap.read_consistent("a")) == a_rows_after_b0
    assert _sha_map(tables["a"].read()) != a_rows_after_b0

    # replay batch 1: a no-ops (already applied), b applies, marker lands
    ln = ap.apply_batch(rest, 1)
    assert ln is not None
    assert ln["tables"]["a"] is None  # replay guard
    assert ln["tables"]["b"] is not None
    assert ap.consistent_versions() != cut0
    # final state = pure fold of the whole feed, per routed table
    work = str(tmp_path / "wholefeed")
    write_feed_ordered(feed, work, n_files=1)
    _assert_parity(tables, work)
    # full replay of a published batch: every table no-ops, marker stays
    assert ap.apply_batch(rest, 1) is None


def test_multitable_unknown_table_errors(spark, tmp_path):
    feed = fixtures.change_events(spark, 50, n_keys=10, seed=1).withColumn(
        "tbl", F.lit("ghost")
    )
    tables = _tables(spark, tmp_path)
    ap = MultiTableApplier(
        tables, table_col="tbl", ledger_dir=str(tmp_path / "ledger")
    )
    with pytest.raises(ValueError, match="ghost"):
        ap.apply_batch(feed, 0)
    # and ignore mode routes nothing but succeeds
    ap2 = MultiTableApplier(
        tables, table_col="tbl", on_unknown="ignore",
        ledger_dir=str(tmp_path / "ledger2"),
    )
    assert ap2.apply_batch(feed, 0) is None
