"""Dirty records routed to quarantine inside the streaming path; clean
events still converge to the fold."""

from pyspark.sql import functions as F

from datax_spark import fixtures
from datax_spark.cdc import quarantine as Q
from datax_spark.cdc.runner import create_repo_table
from datax_spark.streaming.runner import run_available_now, write_feed_ordered


def test_stream_with_quarantine(spark, tmp_path):
    feed = fixtures.change_events(spark, 1200, n_keys=240, seed=42)
    # poison some events: op mangled for lsn % 97 == 0
    poisoned = feed.withColumn(
        "op",
        F.when(F.pmod("lsn", F.lit(97)) == 0, F.lit("mangled")).otherwise(
            F.col("op")
        ),
    )
    fp = str(tmp_path / "feed")
    write_feed_ordered(poisoned, fp, n_files=3)

    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    qpath = str(tmp_path / "quarantine")
    applied = run_available_now(
        spark, fp, t, max_files_per_trigger=1,
        quarantine_rules=Q.envelope_rules(["repo", "path", "commit"]),
        quarantine_path=qpath,
        error_limits=Q.ErrorLimits(percentage=0.05),
    )
    n_dirty = spark.read.parquet(qpath).count()
    assert n_dirty == 13  # lsn 0, 97, ..., 1164
    assert sum(l["rows"] for l in applied) == 1200 - n_dirty
    dirty = spark.read.parquet(qpath)
    assert {r[Q.ERROR_COL] for r in dirty.collect()} == {"bad_op"}