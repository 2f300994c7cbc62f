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


def _run_with_fusion(monkeypatch, spark, tmp_path, sub, min_bytes=0):
    """run_incremental with the fused shards-detail path forced on
    (FUSED_MIN_BYTES=0 → every post-discovery batch fuses)."""
    import datax_spark.cdc.apply as AP

    monkeypatch.setattr(AP, "FUSED_MIN_BYTES", min_bytes)
    feed, feed_path = _feed(spark, tmp_path)
    t = create_repo_table(spark, str(tmp_path / sub), num_buckets=8)
    lineages = run_incremental(t, feed, batch_lsns=1000)
    return t, feed_path, lineages


def test_fused_shard_lineage_matches_agg_exactly(spark, tmp_path, monkeypatch):
    """lineage_detail="shards" fused path (metrics riding the write job via
    observe) must produce BIT-IDENTICAL lineage to the dedicated
    aggregation pass — per-shard rows, bytes, last_lsn, and table state."""
    t_f, feed_path, lin_f = _run_with_fusion(monkeypatch, spark, tmp_path, "tf")
    import datax_spark.cdc.apply as AP

    monkeypatch.setattr(AP, "FUSED_MIN_BYTES", 1 << 60)  # never fuse
    feed, _ = _feed(spark, tmp_path)
    t_a = create_repo_table(spark, str(tmp_path / "ta"), num_buckets=8)
    lin_a = run_incremental(t_a, feed, batch_lsns=1000)

    def norm(ls):
        return [
            {
                "batch_id": l["batch_id"], "rows": l["rows"],
                "bytes": l["bytes"], "shard_lsns": l["shard_lsns"],
                "partitions": sorted(
                    (tuple(sorted(p.items())) for p in l["partitions"]),
                ),
            }
            for l in ls
        ]

    assert norm(lin_f) == norm(lin_a)
    _assert_parity(t_f, feed_path)
    # manifests carry the same per-shard watermarks (and no _est_ leakage)
    assert t_f.manifest().shard_lsns == t_a.manifest().shard_lsns
    for info in t_f.manifest().applied_batches.values():
        assert not any(k.startswith("_") for k in info)


def test_fused_path_discovers_new_shard_mid_run(spark, tmp_path, monkeypatch):
    """A shard that first appears AFTER discovery (split) is back-filled by
    the unknown-shard guard: its watermark and metrics are exact."""
    import datax_spark.cdc.apply as AP

    monkeypatch.setattr(AP, "FUSED_MIN_BYTES", 0)
    feed, feed_path = _feed(spark, tmp_path)
    # shard 9 exists only in the last LSN quarter — absent from batch 0
    late = feed.filter(F.col("lsn") >= 3000).limit(50) \
        .withColumn("shard", F.lit(9))
    feed2 = feed.unionByName(late)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    lineages = run_incremental(t, feed2, batch_lsns=1000)
    last = lineages[-1]
    assert 9 in last["shard_lsns"]
    expect_rows = late.count()
    got = [p for p in last["partitions"] if p["partition_id"] == 9]
    assert got and got[0]["rows"] == expect_rows
    assert t.manifest().shard_lsns.get("9") is not None


def test_fused_path_replay_is_noop(spark, tmp_path, monkeypatch):
    import datax_spark.cdc.apply as AP

    monkeypatch.setattr(AP, "FUSED_MIN_BYTES", 0)
    feed, feed_path = _feed(spark, tmp_path)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    run_incremental(t, feed, batch_lsns=1000, max_batches=3)
    v_mid = t.current_version()
    lineages = run_incremental(t, feed, batch_lsns=1000)
    assert t.current_version() == v_mid + 1
    assert [l["batch_id"] for l in lineages] == [3]
    _assert_parity(t, feed_path)
