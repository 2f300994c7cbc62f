"""Job-spec driven runs + preCheck dry-run (≈ DataX job.json lifecycle)."""

import json

from pyspark.sql import functions as F

from datax_spark import fixtures
from datax_spark.jobspec import JobSpec, run_job


def _spec_dict(tmp_path, kind="incremental"):
    return {
        "source": {"path": str(tmp_path / "feed")},
        "target": {
            "location": str(tmp_path / "lake"),
            "key_cols": ["repo", "path", "commit"],
            "bucket_col": "repo",
            "num_buckets": 8,
        },
        "merge": {"mode": "mor", "auto_compact": 4},
        "run": {"kind": kind, "batch_lsns": 1000},
        "error_limit": {"record": 0, "percentage": None},
    }


def test_precheck_catches_problems(spark, tmp_path):
    spec = JobSpec.from_dict(_spec_dict(tmp_path))
    assert any("missing" in p for p in spec.pre_check(spark))  # no source yet

    fixtures.change_events(spark, 500, n_keys=100, seed=42).drop("op") \
        .write.parquet(str(tmp_path / "feed"))
    probs = spec.pre_check(spark)
    assert probs == ["feed missing envelope column: op"]


def test_run_incremental_from_spec(spark, tmp_path):
    fixtures.change_events(spark, 2000, n_keys=400, seed=42) \
        .write.parquet(str(tmp_path / "feed"))
    spec = JobSpec.from_dict(_spec_dict(tmp_path))
    assert spec.pre_check(spark) == []
    summary = run_job(spark, spec)
    assert summary["rows"] == 2000
    assert summary["batches"] == 2
    expected = fixtures.expected_state(str(tmp_path / "feed"))
    from datax_spark.lake.table import LakeTable
    t = LakeTable(spark, spec.target.location)
    got = {
        (r.repo, r.path, r.commit)
        for r in t.read().select("repo", "path", "commit").collect()
    }
    assert got == set(expected)
    # idempotent rerun: replayed batches are no-ops
    summary2 = run_job(spark, spec)
    assert summary2["batches"] == 0


def test_agg_views_declared_in_spec(spark, tmp_path):
    """A job.json can declare rollups: created on first run, incrementally
    refreshed on later runs, always equal to the direct aggregate."""
    from datax_spark.lake.table import LakeTable

    fixtures.change_events(spark, 2000, n_keys=400, seed=42) \
        .write.parquet(str(tmp_path / "feed"))
    d = _spec_dict(tmp_path)
    d["agg_views"] = [{"location": str(tmp_path / "vw"), "dims": ["lang"]}]
    spec = JobSpec.from_dict(d)
    assert spec.pre_check(spark) == []

    def direct():
        t = LakeTable(spark, spec.target.location)
        return {
            r["lang"]: r["n"]
            for r in t.read().groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n")).collect()
        }

    def view_state():
        v = LakeTable(spark, str(tmp_path / "vw"))
        return {r["lang"]: r["n_rows"] for r in v.read().collect()}

    s1 = run_job(spark, spec)
    assert s1["agg_views"][0]["created"]
    assert view_state() == direct()

    s2 = run_job(spark, spec)  # no new data
    av = s2["agg_views"][0]
    assert not av["created"] and not av["applied"]

    # feed grows (same seed → same prefix); the view follows incrementally
    fixtures.change_events(spark, 3000, n_keys=400, seed=42) \
        .write.mode("overwrite").parquet(str(tmp_path / "feed"))
    s3 = run_job(spark, spec)
    assert s3["agg_views"][0]["applied"]
    assert view_state() == direct()

    # precheck rejects malformed view specs
    bad = JobSpec.from_dict({**d, "agg_views": [
        {"location": str(tmp_path / "v2")},
        {"location": str(tmp_path / "v3"), "dims": ["lsn"]},
        {"location": str(tmp_path / "v4"), "dims": ["nope"]},
    ]})
    probs = bad.pre_check(spark)
    assert any("missing dims" in p for p in probs)
    assert any("envelope column" in p for p in probs)
    assert any("not in feed" in p for p in probs)

    # ... and configurations whose commits are not changelog-readable
    # (the refresh would fail AFTER the data commit, on every run)
    cow = JobSpec.from_dict({**d, "merge": {"mode": "cow"}})
    assert any("merge.mode='mor'" in p for p in cow.pre_check(spark))
    full = JobSpec.from_dict({**d, "run": {"kind": "full"}})
    assert any("run.kind='full'" in p for p in full.pre_check(spark))
    part = JobSpec.from_dict(
        {**d, "merge": {"mode": "mor", "partial_update": True}})
    assert any("partial_update" in p for p in part.pre_check(spark))


def test_spec_json_roundtrip(tmp_path):
    d = _spec_dict(tmp_path)
    p = tmp_path / "job.json"
    p.write_text(json.dumps(d))
    spec = JobSpec.from_json(str(p))
    assert spec.to_dict()["target"]["num_buckets"] == 8
    assert spec.merge.auto_compact == 4


def test_stream_kind_from_spec(spark, tmp_path):
    from datax_spark.streaming.runner import write_feed_ordered

    feed = fixtures.change_events(spark, 1500, n_keys=300, seed=42)
    write_feed_ordered(feed, str(tmp_path / "feed"), n_files=4)
    d = _spec_dict(tmp_path, kind="stream")
    d["run"]["max_files_per_trigger"] = 2
    spec = JobSpec.from_dict(d)
    summary = run_job(spark, spec)
    assert summary["rows"] == 1500
    expected = fixtures.expected_state(str(tmp_path / "feed"))
    from pyspark.sql import functions as FF
    from datax_spark.lake.table import LakeTable
    t = LakeTable(spark, spec.target.location)
    got = {
        (r.repo, r.path, r.commit): r.sha
        for r in t.read().select(
            "repo", "path", "commit",
            FF.sha2(FF.coalesce("content", F.lit("")), 256).alias("sha"),
        ).collect()
    }
    assert set(got) == set(expected)
    for k, e in expected.items():
        assert got[k] == e["sha256"]


def test_tail_kind_from_spec(spark, tmp_path):
    """run.kind='tail' drives the LIVE continuous tail bounded by
    idle-stop; a rerun resumes from the checkpoint and applies nothing."""
    from datax_spark.streaming.runner import write_feed_ordered

    feed = fixtures.change_events(spark, 1500, n_keys=300, seed=42)
    write_feed_ordered(feed, str(tmp_path / "feed"), n_files=4)
    d = _spec_dict(tmp_path, kind="tail")
    spec = JobSpec.from_dict(d)
    # unbounded tail refused at pre-check
    assert any("tail_duration_sec" in p for p in spec.pre_check(spark))
    d["run"]["tail_idle_stop_sec"] = 3
    d["run"]["tail_trigger"] = "250 milliseconds"
    spec = JobSpec.from_dict(d)
    assert spec.pre_check(spark) == []
    summary = run_job(spark, spec)
    assert summary["rows"] == 1500
    # exactly-once rerun: checkpoint resume, nothing new to apply
    summary2 = run_job(spark, JobSpec.from_dict(d))
    assert summary2["batches"] == 0 and summary2["rows"] == 0
    expected = fixtures.expected_state(str(tmp_path / "feed"))
    from pyspark.sql import functions as FF

    from datax_spark.lake.table import LakeTable
    t = LakeTable(spark, spec.target.location)
    got = {
        (r.repo, r.path, r.commit): r.sha
        for r in t.read().select(
            "repo", "path", "commit",
            FF.sha2(FF.coalesce("content", F.lit("")), 256).alias("sha"),
        ).collect()
    }
    assert set(got) == set(expected)
    for k, e in expected.items():
        assert got[k] == e["sha256"]

# ----------------------------------------------- pre/post SQL + hook SPI
def test_job_pre_post_sql_views(spark, tmp_path):
    fixtures.change_events(spark, 1000, n_keys=200, seed=42) \
        .write.parquet(str(tmp_path / "feed"))
    d = _spec_dict(tmp_path)
    # preSql validates the feed; postSql asserts over the committed target
    d["pre_sql"] = ["SELECT assert_true(count(*) > 0) FROM source"]
    d["post_sql"] = ["SELECT assert_true(count(*) > 0) FROM target"]
    spec = JobSpec.from_dict(d)
    out = run_job(spark, spec)
    assert out["rows"] == 1000

    # failing preSql aborts before any write
    d2 = _spec_dict(tmp_path)
    d2["target"]["location"] = str(tmp_path / "lake2")
    d2["pre_sql"] = ["SELECT assert_true(count(*) = 0) FROM source"]
    import pytest as _pytest

    from datax_spark.lake.table import LakeTable
    with _pytest.raises(Exception):
        run_job(spark, JobSpec.from_dict(d2))
    assert not LakeTable.exists(str(tmp_path / "lake2"))


def test_job_hooks_invoked_and_errors_recorded(spark, tmp_path):
    from datax_spark import jobspec as J

    fixtures.change_events(spark, 500, n_keys=100, seed=42) \
        .write.parquet(str(tmp_path / "feed"))
    calls = []

    @J.register_hook("t_audit")
    def _audit(spec, summary):
        calls.append(("audit", summary["rows"]))

    @J.register_hook("t_boom")
    def _boom(spec, summary):
        raise RuntimeError("pager down")

    d = _spec_dict(tmp_path)
    d["hooks"] = ["t_audit", "t_boom"]
    spec = JobSpec.from_dict(d)
    assert spec.pre_check(spark) == []  # both hooks known
    out = run_job(spark, spec)
    # job succeeded; audit ran with final metrics; failure recorded not raised
    assert calls == [("audit", 500)]
    assert out["hook_errors"] == {"t_boom": "pager down"}

    d["hooks"] = ["nope"]
    assert JobSpec.from_dict(d).pre_check(spark) == ["unknown hook: nope"]


def test_stream_spec_forwards_merge_and_error_limits(spark, tmp_path):
    from datax_spark.streaming.runner import write_feed_ordered

    feed = fixtures.change_events(spark, 1000, n_keys=200, seed=42)
    write_feed_ordered(feed, str(tmp_path / "feed"), n_files=4)
    d = _spec_dict(tmp_path, kind="stream")
    d["run"] = {"kind": "stream", "max_files_per_trigger": 2}
    d["merge"] = {"mode": "mor", "auto_compact": None, "dedup_batch": False}
    out = run_job(spark, JobSpec.from_dict(d))
    assert out["rows"] == 1000 and out["batches"] == 2
    from datax_spark.lake.table import LakeTable
    t = LakeTable(spark, d["target"]["location"])
    # dedup_batch=False + auto_compact=None leaves every delta in place:
    # proof the merge spec actually reached the streaming applier
    assert t.file_stats()["delta_files"] > 0


def test_stream_spec_byte_cap(spark, tmp_path):
    import os as _os

    from datax_spark.streaming.runner import write_feed_ordered

    feed = fixtures.change_events(spark, 1000, n_keys=200, seed=42)
    fp = str(tmp_path / "feed")
    write_feed_ordered(feed, fp, n_files=4)
    biggest = max(
        _os.path.getsize(_os.path.join(fp, f))
        for f in _os.listdir(fp) if f.endswith(".parquet")
    )
    d = _spec_dict(tmp_path, kind="stream")
    d["run"] = {"kind": "stream", "max_bytes_per_trigger": biggest * 2,
                "stall_timeout_sec": 120}
    out = run_job(spark, JobSpec.from_dict(d))
    assert out["rows"] == 1000 and out["batches"] == 2  # 4 files / 2 per batch


def _cli(capsys, *argv):
    from datax_spark import cli

    rc = cli.main([str(a) for a in argv])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_cli_relay_bootstrap_sync_idempotent(spark, tmp_path, capsys):
    """`relay` bootstraps an absent mirror, then incremental syncs are
    exactly-once (rerun applies nothing)."""
    from pyspark.sql import Row

    from datax_spark.lake.merge import merge_into
    from datax_spark.lake.table import LakeTable
    from tests.test_mirror import SCHEMA

    up = LakeTable.create(
        spark, str(tmp_path / "up"), schema=SCHEMA, key_cols=["k"],
        bucket_col="k", num_buckets=4,
    )

    def bump(rows, lsn0):
        df = spark.createDataFrame(
            [Row(k=k, v=v, op=op, lsn=lsn0 + i)
             for i, (k, v, op) in enumerate(rows)]
        )
        merge_into(up, df, op_col="op", order_col="lsn", mode="mor",
                   auto_compact=None)

    bump([(1, 10, "insert"), (2, 20, "insert")], 0)
    mir = tmp_path / "mir"
    rc, out = _cli(capsys, "relay", tmp_path / "up", mir, "--cores", 4)
    assert rc == 0 and out["bootstrapped"] and not out["applied"]

    bump([(1, 11, "insert"), (2, 0, "delete"), (3, 30, "insert")], 10)
    rc, out = _cli(capsys, "relay", tmp_path / "up", mir, "--cores", 4)
    assert rc == 0 and not out["bootstrapped"]
    assert out["applied"] and out["rows"] == 3

    m = LakeTable(spark, str(mir))
    assert sorted((r.k, r.v) for r in m.read().collect()) == [(1, 11), (3, 30)]

    rc, out = _cli(capsys, "relay", tmp_path / "up", mir, "--cores", 4)
    assert not out["applied"] and out["rows"] == 0  # exactly-once

    # --lag reports staleness without syncing
    bump([(4, 40, "insert")], 20)
    rc, out = _cli(capsys, "relay", tmp_path / "up", mir, "--lag",
                   "--cores", 4)
    assert rc == 0 and out["lag"]["versions_behind"] == 1


def test_cli_aggview_create_refresh_idempotent(spark, tmp_path, capsys):
    """`aggview` creates the rollup on first call (with --dims), then
    incremental refreshes are exactly-once (rerun applies nothing)."""
    from pyspark.sql import Row

    from datax_spark.lake.merge import merge_into
    from datax_spark.lake.table import LakeTable
    from tests.test_aggview import SCHEMA

    up = LakeTable.create(
        spark, str(tmp_path / "up"), schema=SCHEMA, key_cols=["k"],
        bucket_col="k", num_buckets=4,
    )

    def bump(rows, lsn0):
        df = spark.createDataFrame(
            [Row(k=k, grp=g, v=v, op=op, lsn=lsn0 + i)
             for i, (k, g, v, op) in enumerate(rows)],
            "k long, grp string, v long, op string, lsn long",
        )
        merge_into(up, df, op_col="op", order_col="lsn", mode="mor",
                   auto_compact=None)

    bump([(1, "a", 10, "insert"), (2, "a", 20, "insert")], 0)
    vw = tmp_path / "vw"
    rc, out = _cli(capsys, "aggview", tmp_path / "up", vw,
                   "--dims", "grp", "--sums", "v", "--cores", 4)
    assert rc == 0 and out["created"] and not out["applied"]

    bump([(2, "b", 21, "insert"), (1, "a", 0, "delete")], 10)
    rc, out = _cli(capsys, "aggview", tmp_path / "up", vw, "--cores", 4)
    assert rc == 0 and not out["created"] and out["applied"]

    v = LakeTable(spark, str(vw))
    got = {(r.grp): (r.n_rows, r.sum_v) for r in v.read().collect()}
    assert got == {"b": (1, 21)}  # group a emptied and deleted

    rc, out = _cli(capsys, "aggview", tmp_path / "up", vw, "--cores", 4)
    assert not out["applied"] and out["groups"] == 0  # exactly-once

    # --lag reports staleness without refreshing
    bump([(3, "c", 9, "insert")], 20)
    rc, out = _cli(capsys, "aggview", tmp_path / "up", vw, "--lag",
                   "--cores", 4)
    assert rc == 0 and out["lag"]["versions_behind"] == 1

    # creating without --dims is a clean CLI error, not a stack trace
    rc, out = _cli(capsys, "aggview", tmp_path / "up", tmp_path / "vw2",
                   "--cores", 4)
    assert rc == 2 and not out["ok"]
    # ... and so is a bad column name
    rc, out = _cli(capsys, "aggview", tmp_path / "up", tmp_path / "vw3",
                   "--dims", "nosuchcol", "--cores", 4)
    assert rc == 2 and not out["ok"] and "nosuchcol" in out["error"]


def test_cli_maintain_tag_and_rollback(spark, tmp_path, capsys):
    fixtures.change_events(spark, 1000, n_keys=200, seed=42) \
        .write.parquet(str(tmp_path / "feed"))
    spec = JobSpec.from_dict(_spec_dict(tmp_path))
    run_job(spark, spec)
    loc = spec.target.location
    from datax_spark.lake.table import LakeTable

    t = LakeTable(spark, loc)
    good = t.read().count()

    rc, out = _cli(capsys, "maintain", loc, "--tag", "good", "--cores", 4)
    assert rc == 0 and "good" in out["tagged"]

    t.overwrite(t.read().limit(0))  # wipe everything (the "bad" job)
    assert t.read().count() == 0

    rc, out = _cli(capsys, "maintain", loc, "--rollback-tag", "good",
                   "--cores", 4)
    assert rc == 0 and out["rolled_back_to"] == "good"
    assert LakeTable(spark, loc).read().count() == good


def test_package_zip_importable(tmp_path):
    """python -m datax_spark.package builds the --py-files artifact; the
    zip alone must be importable (what spark-submit ships to executors)."""
    import subprocess
    import sys

    from datax_spark import package

    out = package.build()
    code = (
        f"import sys; sys.path.insert(0, {out!r}); "
        "import datax_spark, datax_spark.suite, datax_spark.lake.merge; "
        "print('OK')"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin"},
    )
    assert r.stdout.strip() == "OK", r.stderr[-500:]


def test_session_respects_submitted_master(monkeypatch):
    """get_session must not override a spark-submit-provided master: when
    spark.master is already in the launcher conf, no .master() is set."""
    from unittest import mock

    from datax_spark import session as S

    class FakeConf:
        def __init__(self, loadDefaults=True):
            pass

        def contains(self, k):
            return k == "spark.master"

    class FakeBuilder:
        def __init__(self):
            self.master_called = False

        def appName(self, n):
            return self

        def master(self, m):
            self.master_called = True
            return self

        def config(self, k, v):
            return self

        def getOrCreate(self):
            return "session"

    fb = FakeBuilder()
    with mock.patch.object(S, "SparkSession") as MS, \
            mock.patch("pyspark.SparkConf", FakeConf):
        MS.builder = fb
        assert S.get_session(cores=4) == "session"
    assert fb.master_called is False


def test_tail_live_agg_views(spark, tmp_path):
    """tail_live_agg_views folds every micro-batch into the declared
    rollups INSIDE the batch — by the time the tail stops, the post-run
    refresh has nothing left to do."""
    from datax_spark.lake.table import LakeTable
    from datax_spark.streaming.runner import write_feed_ordered

    feed = fixtures.change_events(spark, 1500, n_keys=300, seed=42)
    write_feed_ordered(feed, str(tmp_path / "feed"), n_files=4)
    vloc = str(tmp_path / "vw")
    d = _spec_dict(tmp_path, kind="tail")
    d["run"]["tail_idle_stop_sec"] = 3
    d["run"]["tail_trigger"] = "250 milliseconds"
    d["run"]["max_files_per_trigger"] = 2  # force >= 2 micro-batches
    d["run"]["tail_live_agg_views"] = True
    d["agg_views"] = [{"location": vloc, "dims": ["lang"]}]
    spec = JobSpec.from_dict(d)
    assert spec.pre_check(spark) == []
    summary = run_job(spark, spec)
    assert summary["rows"] == 1500 and summary["batches"] >= 2
    # live refreshes left the watermark current: post-run refresh no-ops
    assert summary["agg_views"][0].get("error") is None
    assert summary["agg_views"][0]["applied"] is False
    view = LakeTable(spark, vloc)
    ops = [view.manifest(v).operation
           for v in range(1, view.current_version() + 1)]
    # bootstrap + at least one LIVE refresh commit (a refresh commits as
    # merge-* incrementally or overwrite on recompute; a batch whose group
    # deltas all net to zero advances only the watermark — no commit)
    refreshes = sum(
        op == "overwrite" or op.startswith("merge") for op in ops
    )
    assert refreshes >= 2
    t = LakeTable(spark, spec.target.location)
    expected = {
        (r.lang,): r.n for r in
        t.read().groupBy("lang").count().withColumnRenamed("count", "n")
        .collect()
    }
    got = {(r.lang,): r.n_rows for r in view.read().collect()}
    assert got == expected


def test_wire_format_source_through_stream_job(spark, tmp_path):
    """job.json can point straight at a connector JSON dump:
    source.format='maxwell-json' + payload DDL normalizes at read and the
    stream drain syncs the lake table; pre-check guards the footguns."""
    import json as _json

    from datax_spark.lake.table import LakeTable

    src = tmp_path / "feed"
    src.mkdir()

    def mx(type_, ts, xid, xoff, data):
        return _json.dumps({"database": "d", "table": "t", "type": type_,
                            "ts": ts, "xid": xid, "xoffset": xoff,
                            "commit": True, "data": data, "old": None})

    (src / "a.jsonl").write_text("\n".join([
        mx("insert", 1700000100, 1, 0, {"k": 1, "v": "one"}),
        mx("insert", 1700000100, 1, 1, {"k": 2, "v": "two"}),
        mx("update", 1700000101, 2, 0, {"k": 1, "v": "one-upd"}),
        mx("delete", 1700000102, 3, 0, {"k": 2, "v": "two"}),
    ]))
    d = {
        "source": {"path": str(src), "format": "maxwell-json",
                   "payload": "k long, v string"},
        "target": {"location": str(tmp_path / "lake"), "key_cols": ["k"],
                   "bucket_col": "k", "num_buckets": 4},
        "merge": {"mode": "mor", "auto_compact": 4},
        "run": {"kind": "stream"},
    }
    # footguns: payload required; incremental kind refused; row cap refused
    probs = JobSpec.from_dict(
        {**d, "source": {"path": str(src), "format": "maxwell-json"}}
    ).pre_check(spark)
    assert any("source.payload" in p for p in probs)
    probs = JobSpec.from_dict(
        {**d, "run": {"kind": "incremental"}}
    ).pre_check(spark)
    assert any("never terminates" in p for p in probs)
    probs = JobSpec.from_dict(
        {**d, "run": {"kind": "stream", "max_rows_per_trigger": 10}}
    ).pre_check(spark)
    assert any("do not apply to JSON wire feeds" in p for p in probs)

    spec = JobSpec.from_dict(d)
    assert spec.pre_check(spark) == []
    summary = run_job(spark, spec)
    assert summary["rows"] == 4
    t = LakeTable(spark, spec.target.location)
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {1: "one-upd"}
    # exactly-once rerun over the same checkpoint
    summary2 = run_job(spark, JobSpec.from_dict(d))
    assert summary2["batches"] == 0


def test_txn_boundary_spec_validation_and_stream_run(spark, tmp_path):
    """run.txn_boundary: pre_check rejects wrong kinds/shapes/columns;
    a stream job.json with the knob holds open transactions and still
    converges to the fold."""
    from datax_spark.streaming.runner import write_feed_ordered

    feed = fixtures.change_events(spark, 1000, n_keys=200, seed=42)
    txid = (F.col("lsn") / 5).cast("long")
    feed = feed.withColumn("txn_id", txid).withColumn(
        "txn_commit", (F.col("lsn") % 5 == 4) | (F.col("lsn") == 999))
    write_feed_ordered(feed, str(tmp_path / "feed"), n_files=4)

    d = _spec_dict(tmp_path, kind="stream")
    d["run"]["txn_boundary"] = ["txn_id", "txn_commit"]
    d["run"]["max_files_per_trigger"] = 1
    spec = JobSpec.from_dict(d)
    assert spec.pre_check(spark) == []

    bad = _spec_dict(tmp_path)  # incremental kind
    bad["run"]["txn_boundary"] = ["txn_id", "txn_commit"]
    assert any("stream/tail" in p
               for p in JobSpec.from_dict(bad).pre_check(spark))
    bad2 = _spec_dict(tmp_path, kind="stream")
    bad2["run"]["txn_boundary"] = ["txn_id"]
    assert any("txid_col, commit_col" in p
               for p in JobSpec.from_dict(bad2).pre_check(spark))
    bad3 = _spec_dict(tmp_path, kind="stream")
    bad3["run"]["txn_boundary"] = ["nope", "txn_commit"]
    assert any("missing txn_boundary column" in p
               for p in JobSpec.from_dict(bad3).pre_check(spark))

    summary = run_job(spark, spec)
    assert summary["rows"] == 1000
    expected = fixtures.expected_state(str(tmp_path / "feed"))
    from datax_spark.lake.table import LakeTable

    t = LakeTable(spark, spec.target.location)
    got = {
        (r.repo, r.path, r.commit)
        for r in t.read().select("repo", "path", "commit").collect()
    }
    assert got == set(expected)
    assert "txn_id" not in t.read().columns


def test_enrich_lookup_join_and_precheck(spark, tmp_path):
    """job.json `enrich`: broadcast dimension columns land on every event
    before the MERGE; pre_check catches bad paths/columns/collisions."""
    from datax_spark.jobspec import JobSpec, run_job
    from datax_spark.lake.table import LakeTable

    fixtures.change_events(spark, 300, n_keys=50, seed=13).write.parquet(
        str(tmp_path / "feed"))
    spark.createDataFrame(
        [("org0/repo0", "team-a"), ("org1/repo1", "team-b")],
        "repo string, owner string"
    ).write.parquet(str(tmp_path / "dim"))
    d = {
        "source": {"path": str(tmp_path / "feed")},
        "target": {"location": str(tmp_path / "lake"),
                   "key_cols": ["repo", "path", "commit"]},
        "run": {"kind": "incremental", "batch_lsns": 150},
        "enrich": [{"path": str(tmp_path / "dim"), "on": ["repo"],
                    "cols": ["owner"]}],
    }
    spec = JobSpec.from_dict(d)
    assert spec.pre_check(spark) == []
    run_job(spark, spec)
    t = LakeTable(spark, str(tmp_path / "lake"))
    rows = t.read().select("repo", "owner").distinct().collect()
    got = {r.repo: r.owner for r in rows}
    assert got.get("org0/repo0") == "team-a"
    assert got.get("org1/repo1") == "team-b"
    # keys beyond the dim stay NULL under how=left
    assert all(v is None for k, v in got.items()
               if k not in ("org0/repo0", "org1/repo1"))

    bad = dict(d, enrich=[{"path": str(tmp_path / "dim"),
                           "on": ["ghost"], "cols": ["owner"]}])
    probs = JobSpec.from_dict(bad).pre_check(spark)
    assert any("feed missing join column ghost" in p for p in probs)
    bad = dict(d, enrich=[{"path": str(tmp_path / "dim"), "on": ["repo"],
                           "cols": ["content"]}])
    probs = JobSpec.from_dict(bad).pre_check(spark)
    assert any("dimension missing column content" in p for p in probs)
    bad = dict(d, enrich=[{"path": str(tmp_path / "dim"), "on": ["repo"],
                           "cols": ["owner"], "how": "cross"}])
    probs = JobSpec.from_dict(bad).pre_check(spark)
    assert any("how must be" in p for p in probs)
    # collision: enriching a column the feed already has
    spark.createDataFrame(
        [("org0/repo0", "x")], "repo string, content string"
    ).write.parquet(str(tmp_path / "dim2"))
    bad = dict(d, enrich=[{"path": str(tmp_path / "dim2"), "on": ["repo"],
                           "cols": ["content"]}])
    probs = JobSpec.from_dict(bad).pre_check(spark)
    assert any("collides with the feed" in p for p in probs)


def test_enrich_through_stream_run(spark, tmp_path):
    """The same enrich spec rides the streaming drain's per-batch hook."""
    from datax_spark.jobspec import JobSpec, run_job
    from datax_spark.lake.table import LakeTable
    from datax_spark.streaming.runner import write_feed_ordered

    feed = fixtures.change_events(spark, 300, n_keys=50, seed=14)
    write_feed_ordered(feed, str(tmp_path / "feed"), n_files=2)
    spark.createDataFrame(
        [("org0/repo0", "team-a")], "repo string, owner string"
    ).write.parquet(str(tmp_path / "dim"))
    spec = JobSpec.from_dict({
        "source": {"path": str(tmp_path / "feed")},
        "target": {"location": str(tmp_path / "lake"),
                   "key_cols": ["repo", "path", "commit"]},
        "run": {"kind": "stream"},
        "enrich": [{"path": str(tmp_path / "dim"), "on": ["repo"],
                    "cols": ["owner"]}],
    })
    assert spec.pre_check(spark) == []
    s = run_job(spark, spec)
    assert s["rows"] == 300
    t = LakeTable(spark, str(tmp_path / "lake"))
    assert "owner" in t.read().columns
    got = {r.repo: r.owner
           for r in t.read().select("repo", "owner").distinct().collect()}
    assert got.get("org0/repo0") == "team-a"
