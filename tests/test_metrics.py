"""Metrics layer: streaming progress listener + lineage-derived job report."""

from datax_spark import fixtures, metrics
from datax_spark.cdc.runner import create_repo_table, run_incremental
from datax_spark.streaming.runner import run_available_now, write_feed_ordered

N = 1500


def test_job_report_totals(spark, tmp_path):
    feed = fixtures.change_events(spark, N, n_keys=300, seed=42)
    fp = str(tmp_path / "feed")
    feed.write.parquet(fp)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    run_incremental(t, spark.read.parquet(fp), batch_lsns=500)
    rep = metrics.job_report(t)
    assert rep["batches"] == 3
    assert rep["total_rows"] == N
    assert rep["total_bytes"] > 0
    assert rep["rows_per_sec"] is None or rep["rows_per_sec"] > 0
    # per-partition totals sum to the whole
    assert sum(p["rows"] for p in rep["partitions"].values()) == N
    lsns = [p["last_lsn"] for p in rep["partitions"].values()]
    assert max(lsns) == N - 1


def test_streaming_progress_listener(spark, tmp_path):
    feed = fixtures.change_events(spark, N, n_keys=300, seed=42)
    fp = str(tmp_path / "feed")
    write_feed_ordered(feed, fp, n_files=3)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    collector = metrics.ProgressCollector().attach(spark)
    try:
        # global lineage = single source scan per batch, so the listener's
        # numInputRows equals the feed size exactly (shards mode scans the
        # source twice per batch: stats pass + merge pass → 2N)
        run_available_now(
            spark, fp, t, max_files_per_trigger=1,
            lineage_detail="global", dedup_batch=False,
        )
        # listener delivery is async; progress may lag the query end
        import time
        from collections import defaultdict

        by_query = defaultdict(int)
        for _ in range(20):
            by_query.clear()
            for b in collector.batches:
                by_query[b.query_id] += b.num_input_rows
            if N in by_query.values():
                break
            time.sleep(0.5)
    finally:
        collector.detach(spark)
    # exactly one query (ours) saw all N rows across its micro-batches
    assert N in by_query.values(), dict(by_query)
    assert all(b.duration_ms >= 0 for b in collector.batches)