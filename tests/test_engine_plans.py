"""Physical-plan contracts on the ENGINE's own hot paths: no per-row
Python anywhere, reconstruction stays in codegen, bucket pruning reaches
the file selection (SURVEY.md §7.4 risk 4)."""

from datax_spark import fixtures
from datax_spark.cdc.runner import create_repo_table, run_incremental
from datax_spark.plans import checks


def test_mor_read_plan_is_jvm_only(spark, tmp_path):
    feed = fixtures.change_events(spark, 2000, n_keys=400, seed=42)
    fp = str(tmp_path / "feed")
    feed.write.parquet(fp)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    run_incremental(t, spark.read.parquet(fp), batch_lsns=1000,
                    auto_compact=None)
    df = t.read()
    checks.assert_no_python_row_udf(df)
    checks.assert_whole_stage_codegen(df)
    # bucket pruning: a single-bucket read scans fewer files than the full
    # snapshot (manifest-level pruning, the Iceberg partition-prune analogue)
    full_files = sum(len(v) for v in t.manifest().files.values())
    pruned_plan = checks.physical_plan(t.read(buckets=[0]))
    assert pruned_plan.count(".parquet") < full_files or full_files <= 2


def test_feed_normalization_plan_is_jvm_only(spark, tmp_path):
    feed = fixtures.change_events(spark, 500, n_keys=100, seed=42)
    checks.assert_no_python_row_udf(feed)
    from datax_spark.lake.merge import dedup_last_per_key

    checks.assert_no_python_row_udf(
        dedup_last_per_key(feed, ["repo", "path", "commit"], "lsn")
    )

def test_cow_anti_join_broadcast_guard(spark):
    """merge_into broadcasts the batch-key side only under the size
    threshold; above it the join is AQE-planned (no broadcast hint) — a
    10^8-key backfill batch must never be collected to the driver."""
    from pyspark.sql import functions as F

    from datax_spark.lake.merge import anti_join_batch_keys

    current = spark.range(1000).select(
        F.col("id").alias("k"), F.lit("v").alias("v")
    )
    batch = spark.range(100).select(F.col("id").alias("k"))
    small = anti_join_batch_keys(current, batch, ["k"], broadcast=True)
    assert "BroadcastHashJoin" in checks.physical_plan(small)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable size-based auto-broadcast so the hint is the only way
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        large = anti_join_batch_keys(current, batch, ["k"], broadcast=False)
        plan = checks.physical_plan(large)
        assert "BroadcastHashJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # both shapes produce the identical anti-join result
    assert small.count() == 900
    assert large.count() == 900
