"""schema_policy='strict': the schema-contract guard — divergent batches
fail loudly BEFORE any write; 'evolve' (default) keeps following the feed."""

import pytest
from pyspark.sql import functions as F

from datax_spark import fixtures
from datax_spark.cdc.apply import CdcApplier, SchemaPolicyViolation
from datax_spark.cdc.runner import create_repo_table, run_incremental


def _feed(spark, n=200):
    return fixtures.change_events(spark, n, n_keys=40, seed=17)


def test_strict_accepts_matching_schema(spark, tmp_path):
    feed = _feed(spark)
    t = create_repo_table(
        spark, str(tmp_path / "a"), num_buckets=4,
        schema=feed.drop("lsn", "shard", "ts", "op").schema,
    )
    lin = run_incremental(t, feed, batch_lsns=100, schema_policy="strict")
    assert lin and t.read().count() > 0


def test_strict_rejects_new_column_before_any_write(spark, tmp_path):
    t = create_repo_table(spark, str(tmp_path / "b"), num_buckets=4)
    ap = CdcApplier(t, schema_policy="strict")
    bad = _feed(spark).withColumn("surprise", F.lit(1))
    v0 = t.current_version()
    with pytest.raises(SchemaPolicyViolation, match="surprise"):
        ap.apply_batch(bad, 0)
    assert t.current_version() == v0  # nothing written


def test_strict_rejects_type_widen_and_missing(spark, tmp_path):
    t = create_repo_table(spark, str(tmp_path / "c"), num_buckets=4)
    ap = CdcApplier(t, schema_policy="strict")
    widened = _feed(spark).withColumn(
        "lang", F.col("lsn").cast("int"))  # string -> int
    with pytest.raises(SchemaPolicyViolation, match="lang"):
        ap.apply_batch(widened, 0)
    with pytest.raises(SchemaPolicyViolation, match="missing"):
        ap.apply_batch(_feed(spark).drop("content"), 0)


def test_evolve_still_follows_the_feed(spark, tmp_path):
    t = create_repo_table(spark, str(tmp_path / "d"), num_buckets=4)
    ap = CdcApplier(t)  # default evolve
    ap.apply_batch(_feed(spark).withColumn("extra", F.lit("x")), 0)
    assert "extra" in t.read().columns


def test_unknown_policy_rejected(spark, tmp_path):
    t = create_repo_table(spark, str(tmp_path / "e"), num_buckets=4)
    with pytest.raises(ValueError, match="schema_policy"):
        CdcApplier(t, schema_policy="yolo")


def test_jobspec_strict_policy(spark, tmp_path):
    from datax_spark.jobspec import JobSpec, run_job

    _feed(spark).write.parquet(str(tmp_path / "feed"))
    d = {
        "source": {"path": str(tmp_path / "feed")},
        "target": {"location": str(tmp_path / "lake"),
                   "key_cols": ["repo", "path", "commit"]},
        "merge": {"schema_policy": "strict"},
        "run": {"kind": "incremental", "batch_lsns": 100},
    }
    spec = JobSpec.from_dict(d)
    assert spec.pre_check(spark) == []
    run_job(spark, spec)  # matching schema: fine
    # feed gains a column → the next strict run fails before writing
    _feed(spark, 100).withColumn("lsn", F.col("lsn") + 1000) \
        .withColumn("oops", F.lit(1)).write.mode(
        "overwrite").parquet(str(tmp_path / "feed2"))
    d2 = dict(d, source={"path": str(tmp_path / "feed2")})
    with pytest.raises(SchemaPolicyViolation, match="oops"):
        run_job(spark, JobSpec.from_dict(d2))
    bad = dict(d, merge={"schema_policy": "frozen"})
    probs = JobSpec.from_dict(bad).pre_check(spark)
    assert any("unknown schema_policy" in p for p in probs)
