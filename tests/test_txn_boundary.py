"""Transaction-boundary (txn-consistent) streaming apply
(streaming/runner.py txn_boundary): a transaction split across
micro-batches is never half-applied — its events are held under the
checkpoint until the commit marker arrives, then applied; auto-commit
(NULL-txid) rows pass straight through; the final state equals the plain
fold; held state survives a fresh drain invocation (same checkpoint)."""

import os

from pyspark.sql import functions as F

from datax_spark import fixtures
from datax_spark.cdc.runner import create_repo_table
from datax_spark.streaming.runner import run_available_now

N = 1200


def _txn_feed(spark, n=N):
    """change_events + synthetic transactions: 5 consecutive LSNs share a
    txn, commit flag on the last; every 11th txn is NULL-txid autocommit
    rows instead."""
    feed = fixtures.change_events(spark, n, n_keys=300, seed=42)
    txid = (F.col("lsn") / 5).cast("long")
    auto = (txid % 11) == 0
    return feed.withColumn(
        "txn_id", F.when(auto, F.lit(None).cast("long")).otherwise(txid)
    ).withColumn(
        "txn_commit",
        F.when(auto, F.lit(None).cast("boolean"))
        .otherwise((F.col("lsn") % 5 == 4) | (F.col("lsn") == n - 1)),
    )


def _write_file(df, path, name):
    """One parquet feed file with a deterministic mtime ordinal."""
    tmp = path + f".__tmp_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    os.makedirs(path, exist_ok=True)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    dst = os.path.join(path, f"{name}.parquet")
    os.rename(os.path.join(tmp, part), dst)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.utime(dst, (1_000_000 + int(name), 1_000_000 + int(name)))
    return dst


def _parity(table, feed_path_df, spark):
    import tempfile

    loc = tempfile.mkdtemp(prefix="dx_txn_exp_")
    feed_path_df.write.mode("overwrite").parquet(loc)
    expected = fixtures.expected_state(loc)
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


def test_txn_split_across_batches_holds_then_applies(spark, tmp_path):
    feed = _txn_feed(spark).persist()
    cut = 522  # mid-transaction (522 % 5 != 0): txn 104 spans the cut
    first, rest = feed.filter(F.col("lsn") < cut), feed.filter(
        F.col("lsn") >= cut)
    path = str(tmp_path / "feed")
    _write_file(first, path, "0")
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    ckpt = str(tmp_path / "ckpt")

    a1 = run_available_now(
        spark, path, t, checkpoint_dir=ckpt, txn_boundary=("txn_id", "txn_commit"),
    )
    # the open transaction's events are held, not applied
    assert sum(l.get("txn_held", 0) for l in a1) > 0
    open_txn_lsns = {520, 521}  # txn 104's delivered half
    applied_lsns = {
        int(r.lsn) for r in feed.filter(F.col("lsn") < cut).collect()
    } - open_txn_lsns
    assert sum(l["rows"] for l in a1) == len(applied_lsns)
    # the txn columns never reach the table
    assert "txn_id" not in t.read().columns
    assert "txn_commit" not in t.read().columns

    # completion lands: a second drain on the SAME checkpoint applies the
    # held half together with the rest
    _write_file(rest, path, "1")
    a2 = run_available_now(
        spark, path, t, checkpoint_dir=ckpt, txn_boundary=("txn_id", "txn_commit"),
    )
    assert sum(l["rows"] for l in a2) == N - len(applied_lsns)
    assert sum(l.get("txn_held", 0) for l in a2[-1:]) == 0
    _parity(t, feed, spark)
    feed.unpersist()


def test_txn_boundary_single_batch_no_holds(spark, tmp_path):
    """Everything in one batch: all commit markers present, nothing held,
    plain fold parity."""
    feed = _txn_feed(spark, n=600).persist()
    path = str(tmp_path / "feed")
    _write_file(feed, path, "0")
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    a = run_available_now(
        spark, path, t, checkpoint_dir=str(tmp_path / "ckpt"),
        txn_boundary=("txn_id", "txn_commit"),
    )
    assert sum(l["rows"] for l in a) == 600
    assert all(l.get("txn_held", 0) == 0 for l in a)
    _parity(t, feed, spark)
    feed.unpersist()
