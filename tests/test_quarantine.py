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

# ------------------------------------------------------------- DLQ replay
def _mk_table(spark, tmp_path, name="t"):
    from pyspark.sql import types as T

    from datax_spark.lake.table import LakeTable

    schema = T.StructType([
        T.StructField("repo", T.StringType()),
        T.StructField("size", T.StringType()),
    ])
    return LakeTable.create(
        spark, str(tmp_path / name), schema=schema, key_cols=["repo"],
        bucket_col="repo", num_buckets=2,
    )


def test_replay_fix_merge_and_dead_split(spark, sdf, tmp_path):
    import os

    qpath = str(tmp_path / "q")
    t = _mk_table(spark, tmp_path)
    clean = Q.quarantine(sdf, _rules(), quarantine_path=qpath)
    from datax_spark.lake.merge import merge_into

    merge_into(t, clean.select("repo", "size", "op", "lsn"),
               op_col="op", order_col="lsn", mode="mor")
    # the fix repairs the bad op and the uncastable size; null lsn/key stay
    fix = lambda df: df.withColumn(
        "op", F.when(F.col("op") == "drop", F.lit("delete"))
               .otherwise(F.col("op"))
    ).withColumn(
        "size", F.when(F.col("size") == "x9", F.lit("9"))
                 .otherwise(F.col("size"))
    )
    res = Q.replay_quarantine(spark, qpath, t, _rules(), fix=fix)
    assert res["replayed"] == 2          # lsn 1 (fixed size), 2 (fixed op)
    assert res["still_dirty"] == 2       # null lsn, null key
    state = {r.repo: r.size for r in t.read().collect()}
    # lsn2's repaired op is delete → r3 absent; lsn1's fix landed
    assert state == {"r1": "42", "r2": "9", "r5": None}
    # consumed files archived; dead rows parked under _dead
    assert not [f for f in os.listdir(qpath) if f.endswith(".parquet")]
    token_dirs = os.listdir(os.path.join(qpath, "_dead"))
    assert len(token_dirs) == 1
    dead = spark.read.parquet(os.path.join(qpath, "_dead", token_dirs[0]))
    assert dead.count() == 2
    # second replay: nothing to do
    res2 = Q.replay_quarantine(spark, qpath, t, _rules(), fix=fix)
    assert res2 == {"replayed": 0, "still_dirty": 0, "token": None,
                    "files": 0}


def test_replay_token_replay_guard(spark, sdf, tmp_path):
    """Same DLQ file set → same batch token → the merge no-ops (the crash-
    between-merge-and-archive window)."""
    import os
    import shutil

    qpath = str(tmp_path / "q2")
    t = _mk_table(spark, tmp_path, "t2")
    Q.quarantine(sdf, _rules(), quarantine_path=qpath)
    snapshot = str(tmp_path / "snap")
    shutil.copytree(qpath, snapshot)
    fix = lambda df: df.withColumn("op", F.lit("insert")).withColumn(
        "size", F.coalesce(F.col("size"), F.lit("0")))
    r1 = Q.replay_quarantine(spark, qpath, t, _rules(), fix=fix)
    v1 = t.current_version()
    # simulate the crash: restore the source files and replay again
    for f in os.listdir(snapshot):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(snapshot, f), os.path.join(qpath, f))
    r2 = Q.replay_quarantine(spark, qpath, t, _rules(), fix=fix)
    assert r2["token"] == r1["token"]
    assert t.current_version() == v1  # lineage guard: no second commit


def test_replay_lww_never_regresses_newer_rows(spark, tmp_path):
    """A repaired event OLDER than the key's current row must lose the
    fold — replaying stale dirt cannot roll state back."""
    from datax_spark.lake.merge import merge_into

    t = _mk_table(spark, tmp_path, "t3")
    qpath = str(tmp_path / "q3")
    old = spark.createDataFrame(
        [(5, "zzz", "r1", "1")], "lsn long, op string, repo string, size string")
    Q.quarantine(old, _rules(), quarantine_path=qpath)  # bad op → DLQ
    newer = spark.createDataFrame(
        [(9, "insert", "r1", "2")],
        "lsn long, op string, repo string, size string")
    merge_into(t, newer.select("repo", "size", "op", "lsn"),
               op_col="op", order_col="lsn", mode="mor")
    fix = lambda df: df.withColumn("op", F.lit("insert"))
    res = Q.replay_quarantine(spark, qpath, t, _rules(), fix=fix)
    assert res["replayed"] == 1
    assert [(r.repo, r.size) for r in t.read().collect()] == [("r1", "2")]


def test_replay_missing_columns_loud(spark, sdf, tmp_path):
    qpath = str(tmp_path / "q4")
    t = _mk_table(spark, tmp_path, "t4")
    Q.quarantine(sdf, _rules(), quarantine_path=qpath)
    with pytest.raises(ValueError, match="missing"):
        Q.replay_quarantine(spark, qpath, t, _rules(),
                            fix=lambda df: df.drop("size"))
