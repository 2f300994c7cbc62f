"""Observation-fused global lineage (lineage_detail='global'): single-job
apply, correct watermark semantics, replay still exactly-once."""

from pyspark.sql import functions as F

from datax_spark import fixtures
from datax_spark.cdc.apply import CdcApplier
from datax_spark.cdc.runner import create_repo_table, run_incremental

N = 3000


def _feed(spark, tmp_path):
    p = str(tmp_path / "feed")
    fixtures.change_events(spark, N, n_keys=600, seed=42) \
        .write.mode("overwrite").parquet(p)
    return spark.read.parquet(p), p


def test_global_lineage_parity_and_watermark(spark, tmp_path):
    feed, feed_path = _feed(spark, tmp_path)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    lineages = run_incremental(
        t, feed, batch_lsns=1000, lineage_detail="global", dedup_batch=False
    )
    assert sum(l["rows"] for l in lineages) == N
    assert all(l["partitions"][0]["partition_id"] == -1 for l in lineages)
    assert t.last_lsn() == N - 1

    expected = fixtures.expected_state(feed_path)
    got = {
        (r.repo, r.path, r.commit): r.sha
        for r in t.read().select(
            "repo", "path", "commit",
            F.sha2(F.coalesce("content", F.lit("")), 256).alias("sha"),
        ).collect()
    }
    assert set(got) == set(expected)
    for k, e in expected.items():
        assert got[k] == e["sha256"]

    # global watermark filters a rewound feed entirely
    applier = CdcApplier(t, lineage_detail="global")
    assert applier.filter_already_applied(feed).count() == 0
    # replay with different batch boundaries is a no-op
    assert run_incremental(
        t, feed, batch_lsns=777, start_batch_id=500, lineage_detail="global"
    ) == []


def test_global_empty_batch_is_noop(spark, tmp_path):
    feed, _ = _feed(spark, tmp_path)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    applier = CdcApplier(t, lineage_detail="global")
    v0 = t.current_version()
    out = applier.apply_batch(feed.filter(F.col("lsn") < 0), 99)
    assert out is None
    assert t.current_version() == v0
    assert not t.is_batch_applied(99)