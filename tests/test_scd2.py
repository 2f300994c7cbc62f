"""SCD2 history maintenance (lake/scd.py): batch-boundary invariance,
delete/reinsert intervals, no-op suppression, replay idempotence, and
as-of reconstruction parity with the plain CDC fold."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake import scd

SRC = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("city", T.StringType()),
])
ENV = T.StructType([
    *SRC.fields,
    T.StructField("op", T.StringType()),
    T.StructField("lsn", T.LongType()),
])


def _feed(spark, rows):
    return spark.createDataFrame(
        [(k, n, c, op, lsn) for (k, n, c, op, lsn) in rows], ENV
    )


def _hist(table):
    return sorted(
        (r.k, r.name, r.city, r.valid_from, r.valid_to, r.is_current)
        for r in table.read().collect()
    )


BASE_ROWS = [
    (1, "ann", "rome", "insert", 1),
    (2, "bob", "oslo", "insert", 2),
    (1, "ann", "lima", "update", 5),   # move city
    (2, None, None, "delete", 6),      # bob leaves
    (2, "bob", "bern", "insert", 8),   # bob returns
    (1, "anne", "lima", "update", 11),  # rename
]
EXPECT = [
    (1, "ann", "lima", 5, 11, False),
    (1, "ann", "rome", 1, 5, False),
    (1, "anne", "lima", 11, None, True),
    (2, "bob", "bern", 8, None, True),
    (2, "bob", "oslo", 2, 6, False),
]


def _mk(spark, tmp_path, name="h"):
    return scd.scd2_create(
        spark, str(tmp_path / name), schema=SRC, key_cols=["k"],
        num_buckets=2,
    )


def test_single_batch_fold(spark, tmp_path):
    t = _mk(spark, tmp_path)
    scd.scd2_apply(t, _feed(spark, BASE_ROWS), batch_id=0)
    assert _hist(t) == EXPECT
    cur = sorted((r.k, r.name, r.city)
                 for r in scd.scd2_current(t).collect())
    assert cur == [(1, "anne", "lima"), (2, "bob", "bern")]


@pytest.mark.parametrize("batch_lsns", [1, 3, 100])
def test_batch_boundary_invariance(spark, tmp_path, batch_lsns):
    """Any micro-batch slicing of the same feed yields the same history."""
    t = _mk(spark, tmp_path, f"h{batch_lsns}")
    scd.scd2_run_incremental(t, _feed(spark, BASE_ROWS), batch_lsns)
    assert _hist(t) == EXPECT


def test_replay_is_idempotent(spark, tmp_path):
    t = _mk(spark, tmp_path)
    feed = _feed(spark, BASE_ROWS)
    scd.scd2_run_incremental(t, feed, batch_lsns=4)
    v = t.current_version()
    # replaying the whole feed reuses the same deterministic batch ids
    assert scd.scd2_run_incremental(t, feed, batch_lsns=4) == []
    assert t.current_version() == v
    assert _hist(t) == EXPECT


def test_as_of_matches_fold(spark, tmp_path):
    t = _mk(spark, tmp_path)
    scd.scd2_run_incremental(t, _feed(spark, BASE_ROWS), batch_lsns=3)
    asof = {
        4: [(1, "ann", "rome"), (2, "bob", "oslo")],
        5: [(1, "ann", "lima"), (2, "bob", "oslo")],
        6: [(1, "ann", "lima")],            # bob deleted
        7: [(1, "ann", "lima")],
        8: [(1, "ann", "lima"), (2, "bob", "bern")],
    }
    for lsn, want in asof.items():
        got = sorted((r.k, r.name, r.city)
                     for r in scd.scd2_as_of(t, lsn).collect())
        assert got == want, f"as_of({lsn})"


def test_suppress_unchanged(spark, tmp_path):
    rows = [
        (1, "ann", "rome", "insert", 1),
        (1, "ann", "rome", "update", 3),   # no-op touch: suppressed
        (1, "ann", "lima", "update", 5),
        (1, "ann", "lima", "update", 6),   # no-op again
        (2, None, None, "delete", 7),      # delete of unseen key: no-op
        (3, "cat", None, "insert", 8),
        (3, "cat", None, "delete", 9),
        (3, "cat", None, "delete", 10),    # double delete: second no-op
    ]
    t = _mk(spark, tmp_path)
    scd.scd2_apply(t, _feed(spark, rows), batch_id=0,
                   suppress_unchanged=True)
    assert _hist(t) == [
        (1, "ann", "lima", 5, None, True),
        (1, "ann", "rome", 1, 5, False),
        (3, "cat", None, 8, 9, False),
    ]


def test_suppress_unchanged_across_batches(spark, tmp_path):
    """The stored open row seeds the comparison: an update in a LATER
    batch equal to the current row opens no interval, and the eventual
    real change closes the original interval at the right LSN."""
    t = _mk(spark, tmp_path)
    scd.scd2_apply(t, _feed(spark, [(1, "ann", "rome", "insert", 1)]),
                   batch_id=0, suppress_unchanged=True)
    v1 = t.current_version()
    # a batch that is ENTIRELY no-ops must leave the table untouched
    scd.scd2_apply(t, _feed(spark, [(1, "ann", "rome", "update", 4)]),
                   batch_id=1, suppress_unchanged=True)
    assert _hist(t) == [(1, "ann", "rome", 1, None, True)]
    scd.scd2_apply(t, _feed(spark, [(1, "ann", "rome", "update", 7),
                                    (1, "ann", "lima", "update", 9)]),
                   batch_id=2, suppress_unchanged=True)
    assert _hist(t) == [
        (1, "ann", "lima", 9, None, True),
        (1, "ann", "rome", 1, 9, False),
    ]
    assert t.current_version() > v1


def test_fold_matches_current_state_fold(spark):
    """scd2_fold's is_current slice == the engine's last-event-wins fold
    (deletes applied) on any feed — the two state definitions agree."""
    from datax_spark import fixtures
    from datax_spark.lake.merge import dedup_last_per_key

    feed = fixtures.change_events(spark, 800, n_keys=120, seed=3)
    payload = [c for c in feed.columns
               if c not in ("lsn", "shard", "ts", "op")]
    hist = scd.scd2_fold(feed, ["repo", "path", "commit"], payload,
                         order_col="lsn", op_col="op")
    cur = sorted(
        tuple(r[c] for c in payload)
        for r in hist.filter("is_current").collect()
    )
    folded = dedup_last_per_key(feed, ["repo", "path", "commit"], "lsn")
    want = sorted(
        tuple(r[c] for c in payload)
        for r in folded.filter(F.col("op") != "delete").collect()
    )
    assert cur == want


def test_jobspec_scd2_run(spark, tmp_path):
    """job.json target.scd2 drives the history build end to end —
    create, incremental apply, idempotent rerun — through the same
    surface as every other job."""
    from datax_spark import fixtures
    from datax_spark.jobspec import JobSpec, run_job
    from datax_spark.lake.table import LakeTable

    fixtures.change_events(spark, 600, n_keys=90, seed=5).write.parquet(
        str(tmp_path / "feed")
    )
    spec = JobSpec.from_dict({
        "source": {"path": str(tmp_path / "feed")},
        "target": {
            "location": str(tmp_path / "hist"),
            "key_cols": ["repo", "path", "commit"],
            "scd2": True,
            "suppress_unchanged": True,
        },
        "run": {"kind": "incremental", "batch_lsns": 200},
    })
    assert spec.pre_check(spark) == []
    s1 = run_job(spark, spec)
    assert s1["batches"] >= 3
    t = LakeTable(spark, str(tmp_path / "hist"))
    hist = t.read()
    assert {"valid_from", "valid_to", "is_current"} <= set(hist.columns)
    # the current slice equals the plain fold of the feed
    from datax_spark.lake.merge import dedup_last_per_key

    feed = spark.read.parquet(str(tmp_path / "feed"))
    folded = dedup_last_per_key(
        feed, ["repo", "path", "commit"], "lsn"
    ).filter(F.col("op") != "delete")
    assert hist.filter("is_current").count() == folded.count()
    s2 = run_job(spark, spec)  # replay: nothing applied
    assert s2["batches"] == 0


def test_jobspec_scd2_precheck_rejections(spark, tmp_path):
    from datax_spark import fixtures
    from datax_spark.jobspec import JobSpec

    fixtures.change_events(spark, 50, n_keys=10, seed=5).write.parquet(
        str(tmp_path / "feed")
    )
    base = {
        "source": {"path": str(tmp_path / "feed")},
        "target": {"location": str(tmp_path / "h"),
                   "key_cols": ["repo", "path", "commit"], "scd2": True},
        "run": {"kind": "full"},
    }
    probs = JobSpec.from_dict(base).pre_check(spark)
    assert any("scd2 cannot run kind='full'" in p for p in probs)
    base["run"] = {"kind": "incremental"}
    base["target"]["scd2"] = False
    base["target"]["suppress_unchanged"] = True
    probs = JobSpec.from_dict(base).pre_check(spark)
    assert any("requires target.scd2" in p for p in probs)


def test_run_incremental_granularity_guard(spark, tmp_path):
    t = _mk(spark, tmp_path)
    scd.scd2_run_incremental(t, _feed(spark, BASE_ROWS[:2]), batch_lsns=4)
    with pytest.raises(ValueError, match="granularity"):
        scd.scd2_run_incremental(t, _feed(spark, BASE_ROWS), batch_lsns=7)


def test_reserved_columns_rejected(spark, tmp_path):
    bad = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("valid_from", T.LongType()),
    ])
    with pytest.raises(ValueError, match="reserved"):
        scd.scd2_create(spark, str(tmp_path / "bad"), schema=bad,
                        key_cols=["k"])


def test_missing_columns_rejected(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="missing"):
        scd.scd2_apply(t, _feed(spark, BASE_ROWS).drop("op"), batch_id=0)


def test_streaming_scd2_applier_drain_and_resume(spark, tmp_path):
    """Scd2Applier through the checkpointed AvailableNow drain: half the
    feed, drain, then the rest, drain again on the SAME checkpoint —
    history equals the single-batch fold; re-drain applies nothing."""
    from datax_spark import fixtures
    from datax_spark.streaming.runner import (
        run_available_now,
        write_feed_ordered,
    )

    feed = fixtures.change_events(spark, 900, n_keys=140, seed=21)
    payload = [c for c in feed.columns
               if c not in ("lsn", "shard", "ts", "op")]
    t = scd.scd2_create(
        spark, str(tmp_path / "hist"),
        schema=feed.drop("lsn", "shard", "ts", "op").schema,
        key_cols=["repo", "path", "commit"], num_buckets=4,
    )
    ap = scd.Scd2Applier(t, suppress_unchanged=False)
    import os
    import shutil
    import time as _time

    staging = str(tmp_path / "staging")
    write_feed_ordered(feed, staging, n_files=6)
    fdir, ck = str(tmp_path / "feed"), str(tmp_path / "ck")
    os.makedirs(fdir)
    parts = sorted(f for f in os.listdir(staging)
                   if f.endswith(".parquet"))
    base = _time.time() - 600
    for i, fn in enumerate(parts[:3]):
        shutil.copy(os.path.join(staging, fn), os.path.join(fdir, fn))
        os.utime(os.path.join(fdir, fn), (base + i, base + i))
    l1 = run_available_now(spark, fdir, ap, checkpoint_dir=ck)
    assert l1
    for i, fn in enumerate(parts[3:]):
        shutil.copy(os.path.join(staging, fn), os.path.join(fdir, fn))
        os.utime(os.path.join(fdir, fn),
                 (base + 100 + i, base + 100 + i))
    l2 = run_available_now(spark, fdir, ap, checkpoint_dir=ck)
    assert l2
    assert sum(x["rows"] for x in (*l1, *l2)) == 900
    want = scd.scd2_fold(feed, ["repo", "path", "commit"], payload)
    got = t.read()
    cols = [*want.columns]
    assert sorted(map(tuple, got.select(*cols).collect())) == \
        sorted(map(tuple, want.collect()))
    # third drain: nothing new
    assert run_available_now(spark, fdir, ap, checkpoint_dir=ck) == []
    # shard watermarks recorded → a rewound feed (fresh checkpoint, same
    # files) re-applies nothing
    l4 = run_available_now(spark, fdir, ap,
                           checkpoint_dir=str(tmp_path / "ck2"))
    assert sum(x["rows"] for x in l4 or []) == 0 or l4 == []
    assert sorted(map(tuple, t.read().select(*cols).collect())) == \
        sorted(map(tuple, want.collect()))


def test_jobspec_scd2_tail_kind(spark, tmp_path):
    """job.json run.kind='tail' + target.scd2: the live tail maintains
    the history table."""
    from datax_spark import fixtures
    from datax_spark.jobspec import JobSpec, run_job
    from datax_spark.lake.table import LakeTable
    from datax_spark.streaming.runner import write_feed_ordered

    feed = fixtures.change_events(spark, 400, n_keys=60, seed=8)
    fdir = str(tmp_path / "feed")
    write_feed_ordered(feed, fdir, n_files=2)
    spec = JobSpec.from_dict({
        "source": {"path": fdir},
        "target": {"location": str(tmp_path / "hist"),
                   "key_cols": ["repo", "path", "commit"],
                   "scd2": True},
        "run": {"kind": "tail", "tail_idle_stop_sec": 3,
                "tail_duration_sec": 60},
    })
    assert spec.pre_check(spark) == []
    s = run_job(spark, spec)
    assert s["rows"] == 400
    t = LakeTable(spark, str(tmp_path / "hist"))
    payload = [c for c in feed.columns
               if c not in ("lsn", "shard", "ts", "op")]
    want = scd.scd2_fold(feed, ["repo", "path", "commit"], payload)
    assert sorted(map(tuple, t.read().select(*want.columns).collect())) \
        == sorted(map(tuple, want.collect()))


def test_scd2_strict_schema_policy(spark, tmp_path):
    """strict scd2 targets reject diverging batches BEFORE any write —
    under the default 'evolve' a new feed column is silently dropped
    (history tables don't auto-evolve), which strict turns into a stop."""
    from datax_spark.cdc.apply import SchemaPolicyViolation

    t = _mk(spark, tmp_path)
    good = _feed(spark, BASE_ROWS[:2])
    scd.scd2_apply(t, good, batch_id=0, schema_policy="strict")
    v = t.current_version()
    bad = _feed(spark, BASE_ROWS[2:4]).withColumn("extra", F.lit(1))
    with pytest.raises(SchemaPolicyViolation, match="extra"):
        scd.scd2_apply(t, bad, batch_id=1, schema_policy="strict")
    assert t.current_version() == v
    with pytest.raises(SchemaPolicyViolation, match="missing"):
        scd.scd2_apply(t, _feed(spark, BASE_ROWS[2:4]).drop("city"),
                       batch_id=1, schema_policy="strict")
    # evolve (default) drops the surprise column without failing
    scd.scd2_apply(t, bad, batch_id=1)
    assert "extra" not in t.read().columns


def test_scd2_rejects_payload_bucket_col(spark, tmp_path):
    with pytest.raises(ValueError, match="natural key"):
        scd.scd2_create(spark, str(tmp_path / "pb"), schema=SRC,
                        key_cols=["k"], bucket_col="city")
