"""CDC end-to-end: feed → MERGE apply → sha256 parity vs pure-Python fold,
exactly-once replay, resume-from-older-offset, schema evolution mid-stream."""

import hashlib

from pyspark.sql import functions as F

from datax_spark import fixtures
from datax_spark.cdc.apply import CdcApplier
from datax_spark.cdc.runner import create_repo_table, full_sync, run_incremental

N_EVENTS = 4000


def _feed(spark, tmp_path, **kw):
    path = str(tmp_path / "feed")
    fixtures.change_events(spark, N_EVENTS, n_keys=800, seed=42, **kw) \
        .write.mode("overwrite").parquet(path)
    return spark.read.parquet(path), path


def _assert_parity(table, feed_path):
    """Per-row sha256(content) equality vs the oracle fold (BASELINE.json)."""
    expected = fixtures.expected_state(feed_path)
    got = {
        (r.repo, r.path, r.commit): r.sha
        for r in table.read()
        .select("repo", "path", "commit", F.sha2("content", 256).alias("sha"))
        .collect()
    }
    assert set(got) == set(expected)
    for k, sha in got.items():
        assert sha == expected[k]["sha256"], k


def test_incremental_apply_matches_fold(spark, tmp_path):
    feed, feed_path = _feed(spark, tmp_path)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    lineages = run_incremental(t, feed, batch_lsns=1000)
    assert len(lineages) == 4
    _assert_parity(t, feed_path)
    # lineage totals == feed size; per-shard last_lsn monotone & recorded
    assert sum(l["rows"] for l in lineages) == N_EVENTS
    assert t.last_lsn() == N_EVENTS - 1


def test_exactly_once_replay_batches(spark, tmp_path):
    feed, feed_path = _feed(spark, tmp_path)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    # crash after 2 batches, then restart from scratch (replays batch 0,1)
    run_incremental(t, feed, batch_lsns=1000, max_batches=2)
    v_mid = t.current_version()
    lineages = run_incremental(t, feed, batch_lsns=1000)
    # replayed ids were skipped: only 2 new commits, not 4
    assert t.current_version() == v_mid + 2
    assert [l["batch_id"] for l in lineages] == [2, 3]
    _assert_parity(t, feed_path)


def test_resume_from_older_offset_filtered_by_lsn(spark, tmp_path):
    feed, feed_path = _feed(spark, tmp_path)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    run_incremental(t, feed, batch_lsns=1000)
    applier = CdcApplier(t)
    # a source that rewinds to lsn 0: every event is at-or-below the shard
    # watermark → filtered out, nothing to apply
    assert applier.filter_already_applied(feed).count() == 0
    # re-running the whole feed with DIFFERENT batch boundaries is also a no-op
    lineages = run_incremental(t, feed, batch_lsns=700, start_batch_id=1000)
    assert lineages == []
    _assert_parity(t, feed_path)


def test_full_sync_then_incremental(spark, tmp_path):
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    snap = fixtures.repo_files(spark, 500, seed=42)
    full_sync(t, snap)
    assert t.read().count() == snap.distinct().count()
    feed, feed_path = _feed(spark, tmp_path)
    run_incremental(t, feed, batch_lsns=2000)
    # final state = snapshot keys not touched by feed + fold(feed)
    expected = fixtures.expected_state(feed_path)
    got = {(r.repo, r.path, r.commit) for r in t.read().select("repo", "path", "commit").collect()}
    snap_keys = {(r.repo, r.path, r.commit) for r in snap.collect()}
    feed_keys = set()
    import pyarrow.parquet as pq
    for r in pq.read_table(feed_path).select(["repo", "path", "commit"]).to_pylist():
        feed_keys.add((r["repo"], r["path"], r["commit"]))
    assert got == (snap_keys - feed_keys) | set(expected)


def test_schema_evolution_mid_stream(spark, tmp_path):
    feed, feed_path = _feed(spark, tmp_path)
    v2 = fixtures.change_events(
        spark, N_EVENTS * 2, n_keys=800, seed=42, schema_v2_from_lsn=N_EVENTS
    )
    v2_path = str(tmp_path / "feed_v2")
    v2.write.mode("overwrite").parquet(v2_path)
    v2 = spark.read.parquet(v2_path)

    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    run_incremental(t, feed, batch_lsns=2000)
    assert "stars" not in t.read().columns
    assert dict((f.name, f.dataType.typeName()) for f in t.schema().fields)["size"] == "integer"
    run_incremental(t, v2, batch_lsns=2000)
    sch = dict((f.name, f.dataType.typeName()) for f in t.schema().fields)
    assert sch["stars"] == "integer" and sch["size"] == "long"  # add + widen
    # value parity on the union feed
    import pyarrow.parquet as pq  # noqa: F401
    merged = str(tmp_path / "merged_feed")
    feed.unionByName(v2, allowMissingColumns=True).write.mode("overwrite").parquet(merged)
    expected = fixtures.expected_state(merged)
    rows = {
        (r.repo, r.path, r.commit): r
        for r in t.read().collect()
    }
    assert set(rows) == set(expected)
    for k, e in expected.items():
        r = rows[k]
        assert hashlib.sha256((r.content or "").encode()).hexdigest() == e["sha256"]
        assert r.stars == e.get("stars")


def test_lineage_df_shape(spark, tmp_path):
    feed, _ = _feed(spark, tmp_path)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    run_incremental(t, feed, batch_lsns=2000)
    ldf = t.lineage_df()
    assert ldf.columns == [
        "batch_id", "source", "seq", "partition_id",
        "last_lsn", "rows", "bytes", "wall_ms",
    ]
    assert {r.source for r in ldf.select("source").distinct().collect()} == {"batch"}
    agg = ldf.groupBy("partition_id").agg(F.sum("rows").alias("n")).collect()
    assert sum(r.n for r in agg) == N_EVENTS
    # last_lsn monotone per partition across commit order
    import itertools
    rows = sorted(ldf.collect(), key=lambda r: (r.partition_id, r.seq))
    for _, grp in itertools.groupby(rows, key=lambda r: r.partition_id):
        lsns = [r.last_lsn for r in grp]
        assert lsns == sorted(lsns)
