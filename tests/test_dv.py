"""Deletion-vector merge mode (Iceberg v2 positional deletes): the COW/MOR
middle ground — updates/deletes mask base rows by (file, position) in tiny
dv files; inserts append base files; no bucket rewrite, no read-time per-key
aggregation."""

import pytest
from pyspark.sql import functions as F

from datax_spark import fixtures
from datax_spark.cdc.runner import create_repo_table, run_incremental
from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable


def _feed(spark, tmp_path, n=3000, keys=600):
    p = str(tmp_path / "feed")
    fixtures.change_events(spark, n, n_keys=keys, seed=42).write.parquet(p)
    return spark.read.parquet(p), p


def _hashes(t, version=None):
    return {
        (r.repo, r.path, r.commit): r.h
        for r in t.read(version=version).select(
            "repo", "path", "commit",
            F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("h"),
        ).collect()
    }


def test_dv_mode_full_parity(spark, tmp_path):
    feed, feed_path = _feed(spark, tmp_path)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    run_incremental(t, feed, batch_lsns=1000, mode="dv", auto_compact=None)
    expected = fixtures.expected_state(feed_path)
    got = _hashes(t)
    assert set(got) == set(expected)
    assert all(got[k] == v["sha256"] for k, v in expected.items())
    stats = t.file_stats()
    assert stats["dv_files"] > 0 and stats["delta_files"] == 0


def test_dv_equals_cow_and_mor_state(spark, tmp_path):
    feed, _ = _feed(spark, tmp_path, n=2000, keys=400)
    states = {}
    for mode in ("cow", "mor", "dv"):
        t = create_repo_table(
            spark, str(tmp_path / f"t_{mode}"), num_buckets=8
        )
        run_incremental(t, feed, batch_lsns=500, mode=mode, auto_compact=None)
        states[mode] = _hashes(t)
    assert states["dv"] == states["cow"] == states["mor"]


def test_dv_positions_not_relisted(spark, tmp_path):
    # key updated in two consecutive batches: the second dv batch must mask
    # the FIRST batch's appended row, not the original (already-dead) one —
    # i.e. the position scan is dv-aware and each dv file stays minimal
    feed, _ = _feed(spark, tmp_path, n=1500, keys=100)  # heavy re-update
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=4)
    run_incremental(t, feed, batch_lsns=300, mode="dv", auto_compact=None)
    m = t.manifest()
    live_rows = t.read().count()
    base_rows = sum(
        int(e[4]) for v in m.files.values() for e in v
        if len(e) > 2 and e[2] == "base"
    )
    dv_rows = sum(
        int(e[4]) for v in m.files.values() for e in v
        if len(e) > 2 and e[2] == "dv"
    )
    # every dead base row is masked exactly once
    assert base_rows - dv_rows == live_rows


def test_dv_compact_clears_vectors(spark, tmp_path):
    feed, feed_path = _feed(spark, tmp_path, n=2000, keys=400)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    run_incremental(t, feed, batch_lsns=500, mode="dv", auto_compact=None)
    before = _hashes(t)
    t.compact()
    assert t.file_stats()["dv_files"] == 0
    assert _hashes(t) == before


def test_dv_time_travel(spark, tmp_path):
    feed, _ = _feed(spark, tmp_path, n=2000, keys=400)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    run_incremental(t, feed.filter("lsn < 1000"), batch_lsns=1000,
                    mode="dv", auto_compact=None)
    v1 = t.current_version()
    s1 = _hashes(t)
    run_incremental(t, feed.filter("lsn >= 1000"), batch_lsns=1000,
                    mode="dv", auto_compact=None)
    assert _hashes(t, version=v1) == s1


def test_dv_refuses_mor_deltas(spark, tmp_path):
    feed, _ = _feed(spark, tmp_path, n=1000, keys=200)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=4)
    run_incremental(t, feed.filter("lsn < 500"), batch_lsns=500,
                    mode="mor", auto_compact=None)
    assert t.file_stats()["delta_files"] > 0
    with pytest.raises(ValueError, match="delta-free"):
        merge_into(
            t,
            feed.filter("lsn >= 500").withColumnRenamed("lsn", "xlsn")
            .withColumn("lsn", F.col("xlsn")).drop("xlsn")
            .select("op", "lsn", "repo", "path", "commit", "lang", "content"),
            op_col="op", order_col="lsn", mode="dv",
        )
