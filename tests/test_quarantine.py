"""Dirty-record quarantine + error limits (FIXTURES.md §5)."""

import pytest
from pyspark.sql import functions as F

from datax_spark.cdc import quarantine as Q


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame(
        [
            (0, "insert", "r1", "42"),
            (1, "update", "r2", "x9"),      # uncastable size
            (2, "drop", "r3", "7"),         # bad op
            (None, "insert", "r4", "1"),    # null lsn
            (4, "delete", None, None),      # null key
            (5, "insert", "r5", None),      # null size is fine
        ],
        "lsn long, op string, repo string, size string",
    )


def _rules():
    # built lazily — Column exprs need an active SparkContext
    return Q.envelope_rules(["repo"]) + [Q.try_cast_rule("size", "int")]


def test_split_reasons(sdf):
    clean, dirty = Q.split_dirty(sdf, _rules())
    assert {r.lsn for r in clean.collect()} == {0, 5}
    reasons = {r.lsn: r[Q.ERROR_COL] for r in dirty.collect()}
    assert reasons[1] == "uncastable:size->int"
    assert reasons[2] == "bad_op"
    assert reasons[None] == "null_lsn"
    assert reasons[4] == "null_key:repo"


def test_quarantine_writes_and_passes_within_limits(spark, sdf, tmp_path):
    qpath = str(tmp_path / "quarantine")
    clean = Q.quarantine(
        sdf, _rules(), quarantine_path=qpath,
        limits=Q.ErrorLimits(record=10),
    )
    assert clean.count() == 2
    saved = spark.read.parquet(qpath)
    assert saved.count() == 4
    assert Q.ERROR_COL in saved.columns


def test_error_limit_record_exceeded(sdf):
    with pytest.raises(Q.DirtyLimitExceeded, match="errorLimit.record"):
        Q.quarantine(sdf, _rules(), limits=Q.ErrorLimits(record=2))


def test_error_limit_percentage_exceeded(sdf):
    with pytest.raises(Q.DirtyLimitExceeded, match="percentage"):
        Q.quarantine(sdf, _rules(), limits=Q.ErrorLimits(percentage=0.5))
    # 4/6 dirty ≤ 0.7 passes
    assert Q.quarantine(sdf, _rules(), limits=Q.ErrorLimits(percentage=0.7)).count() == 2