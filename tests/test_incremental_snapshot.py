"""Incremental (chunked) snapshot bootstrap — the DBLog / Debezium
incremental-snapshot shape: PK-range chunks published INTERLEAVED with
live commits, consumer converges through the ordinary sentinel-LSN fold
with zero new consumer machinery (sources/debezium.py module comment
carries the convergence argument).  Reference analogue: DataX's
splitPk-chunked full sync (SingleTableSplitUtil.java) running
concurrently with an incremental job instead of before it."""

import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable
from datax_spark.sources import debezium as DBZ
from datax_spark.streaming.runner import run_available_now

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, op string, lsn long")


def _mk_src(spark, tmp_path, name="src"):
    t = LakeTable.create(
        spark, str(tmp_path / name), schema=SCHEMA, key_cols=["k"],
        bucket_col="k", num_buckets=4,
    )
    # pre-snapshot history the wire never carries (truncated binlog):
    # 40 inserts, one delete, one update
    merge_into(t, _ev(spark, [(i, f"a{i}", "insert", i) for i in range(1, 41)]),
               op_col="op", order_col="lsn", mode="mor")
    merge_into(t, _ev(spark, [(5, None, "delete", 100),
                              (6, "b6", "insert", 101)]),
               op_col="op", order_col="lsn", mode="mor")
    return t


def _state(table):
    return {r.k: r.v for r in table.read().collect()}


def test_interleaved_bootstrap_converges(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    out = str(tmp_path / "wire")
    r = DBZ.emit_incremental_snapshot(src, out, chunk_rows=10, max_chunks=1,
                                      db="d", name="t")
    assert r["emitted_chunks"] == [0] and not r["done"]
    # live traffic lands between every chunk: updates to already-snapshotted
    # keys, deletes of not-yet-snapshotted keys, and brand-new keys
    lsn = 200
    while not r["done"]:
        merge_into(src, _ev(spark, [
            (2, f"live{lsn}", "insert", lsn),        # chunk 0 key, updated
            (39, None, "delete", lsn + 1),           # tail-chunk key
            (1000 + lsn, "new", "insert", lsn + 2),  # outside the snapshot
        ]), op_col="op", order_col="lsn", mode="mor")
        lsn += 10
        DBZ.emit_table_changes(src, out, db="d", name="t")
        r = DBZ.emit_incremental_snapshot(src, out, max_chunks=1)
    # a final live commit after the snapshot completes
    merge_into(src, _ev(spark, [(3, "post", "insert", lsn)]),
               op_col="op", order_col="lsn", mode="mor")
    DBZ.emit_table_changes(src, out, db="d", name="t")

    tgt = LakeTable.create(spark, str(tmp_path / "tgt"), schema=SCHEMA,
                           key_cols=["k"], bucket_col="k", num_buckets=4)
    tgt.set_properties(bootstrap_active=True)
    # small trigger cap → chunks and commits mix across many micro-batches
    run_available_now(
        spark, DBZ.snapshot_feed_glob(out), tgt,
        feed_format="debezium-json", payload="k long, v string",
        filter_watermark=False, dedup_batch=False, auto_compact=None,
        max_files_per_trigger=3,
    )
    tgt.set_properties(bootstrap_active=None)
    assert _state(tgt) == _state(src)
    # key 5: deleted BEFORE the snapshot, never on the wire — stays absent
    assert 5 not in _state(tgt)


def test_watermark_set_so_changes_resume_after_snapshot_start(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    out = str(tmp_path / "wire")
    v0 = src.current_version()
    DBZ.emit_incremental_snapshot(src, out, chunk_rows=100, max_chunks=0)
    # the snapshot stands in for history <= v0: emit_table_changes must
    # NOT republish old commits
    res = DBZ.emit_table_changes(src, out)
    assert res["from_version"] == v0 and res["emitted_versions"] == []
    merge_into(src, _ev(spark, [(7, "x", "insert", 300)]),
               op_col="op", order_col="lsn", mode="mor")
    res = DBZ.emit_table_changes(src, out)
    assert res["emitted_versions"] == [v0 + 1]


def test_crash_resume_skips_published_chunks(spark, tmp_path):
    src = _mk_src(spark, tmp_path)
    out = str(tmp_path / "wire")
    DBZ.emit_incremental_snapshot(src, out, chunk_rows=10, max_chunks=2)
    published = sorted(d for d in os.listdir(out)
                       if d.startswith("_snapshot_chunk="))
    assert published == ["_snapshot_chunk=000000", "_snapshot_chunk=000001"]
    mtimes = {d: os.stat(os.path.join(out, d)).st_mtime_ns
              for d in published}
    # "crash" = a fresh call; plan is persisted, done chunks untouched
    r = DBZ.emit_incremental_snapshot(src, out)
    assert r["done"] and r["emitted_chunks"][0] == 2
    for d in published:
        assert os.stat(os.path.join(out, d)).st_mtime_ns == mtimes[d]
    # chunks partition the keyspace: every live row appears exactly once
    rows = []
    import json
    for d in sorted(os.listdir(out)):
        if not d.startswith("_snapshot_chunk="):
            continue
        for fn in os.listdir(os.path.join(out, d)):
            if fn.endswith(".txt"):
                with open(os.path.join(out, d, fn)) as f:
                    rows += [json.loads(ln) for ln in f if ln.strip()]
    keys = [r_["after"]["k"] for r_ in rows]
    assert sorted(keys) == sorted(set(keys))
    assert set(keys) == set(_state(src))
    assert {r_["op"] for r_ in rows} == {"r"}
    assert {r_["source"]["lsn"] for r_ in rows} == {-1}


def test_empty_table_snapshot_completes_immediately(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "empty"), schema=SCHEMA,
                         key_cols=["k"], bucket_col="k", num_buckets=2)
    out = str(tmp_path / "wire")
    r = DBZ.emit_incremental_snapshot(t, out)
    assert r["done"] and r["emitted_chunks"] == []


def test_non_integral_split_key_raises(spark, tmp_path):
    sch = T.StructType([T.StructField("k", T.StringType()),
                        T.StructField("v", T.StringType())])
    t = LakeTable.create(spark, str(tmp_path / "s"), schema=sch,
                         key_cols=["k"], bucket_col="k", num_buckets=2)
    t.overwrite(spark.createDataFrame([("a", "1")], sch))
    with pytest.raises(ValueError, match="non-integral"):
        DBZ.emit_incremental_snapshot(t, str(tmp_path / "w"))


def test_bootstrap_property_guards_compaction(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "g"), schema=SCHEMA,
                         key_cols=["k"], bucket_col="k", num_buckets=2)
    merge_into(t, _ev(spark, [(1, "a", "insert", 1), (2, "b", "insert", 2)]),
               op_col="op", order_col="lsn", mode="mor")
    t.set_properties(bootstrap_active=True)
    with pytest.raises(RuntimeError, match="bootstrap_active"):
        t.compact()
    with pytest.raises(RuntimeError, match="bootstrap_active"):
        t.rebucket(num_buckets=4)
    # merge-path auto-compaction DEFERS instead of raising: aggressive
    # thresholds that would certainly compact leave the deltas in place
    merge_into(t, _ev(spark, [(3, "c", "insert", 3)]), op_col="op",
               order_col="lsn", mode="mor", auto_compact=1)
    m = t.manifest()
    assert any(len(e) > 2 and e[2] == "delta"
               for es in m.files.values() for e in es), "deltas must survive"
    # clearing the property restores normal operation
    t.set_properties(bootstrap_active=None)
    assert t.compact() is not None
    assert _state(t) == {1: "a", 2: "b", 3: "c"}


def test_cli_cdcout_incremental_snapshot(spark, tmp_path, capsys):
    import json

    from datax_spark import cli

    src = _mk_src(spark, tmp_path, name="clisrc")
    out = str(tmp_path / "cliwire")
    rc = cli.main([
        "cdcout", str(tmp_path / "clisrc"), out,
        "--incremental-snapshot", "--snapshot-chunks", "2",
        "--snapshot-chunk-rows", "10", "--db", "d", "--cores", "4",
    ])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and res["ok"]
    assert res["snapshot"]["emitted_chunks"] == [0, 1]
    assert not res["snapshot"]["done"]
    # a live commit + rerun: chunk plan resumes, changes pass publishes
    merge_into(src, _ev(spark, [(50, "live", "insert", 500)]),
               op_col="op", order_col="lsn", mode="mor")
    rc = cli.main([
        "cdcout", str(tmp_path / "clisrc"), out,
        "--incremental-snapshot", "--db", "d", "--cores", "4",
    ])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and res["snapshot"]["done"]
    assert res["emitted_versions"], "the interleaved changes pass publishes"


def test_jobspec_declarative_bootstrap(spark, tmp_path):
    """run.bootstrap end-to-end: the consumer job.json tails commits +
    chunks through the widened glob, holds bootstrap_active across
    invocations while the producer is mid-plan, and clears it on the
    first run that STARTS after the chunk plan completed."""
    import json

    from datax_spark.jobspec import JobSpec, run_job

    src = _mk_src(spark, tmp_path, name="jsrc")
    out = str(tmp_path / "jwire")
    DBZ.emit_incremental_snapshot(src, out, chunk_rows=15, max_chunks=2,
                                  db="d", name="t")
    spec = JobSpec.from_dict({
        "source": {"path": out, "format": "debezium-json",
                   "payload": "k long, v string"},
        "target": {"location": str(tmp_path / "jlake"), "key_cols": ["k"],
                   "bucket_col": "k", "num_buckets": 4},
        "merge": {"mode": "mor", "auto_compact": 2},
        "run": {"kind": "stream", "bootstrap": True,
                "filter_watermark": False},
    })
    assert spec.pre_check(spark) == []
    s1 = run_job(spark, spec)
    assert s1["bootstrap_complete"] is False
    tgt = LakeTable(spark, str(tmp_path / "jlake"))
    assert tgt.manifest().properties.get("bootstrap_active")

    # producer finishes + a live commit lands; next run drains and clears
    merge_into(src, _ev(spark, [(2, "live", "insert", 500)]),
               op_col="op", order_col="lsn", mode="mor")
    DBZ.emit_table_changes(src, out, db="d", name="t")
    DBZ.emit_incremental_snapshot(src, out)
    s2 = run_job(spark, spec)
    assert s2["bootstrap_complete"] is True
    assert not tgt.manifest().properties.get("bootstrap_active")
    assert _state(tgt) == _state(src)
    # post-bootstrap maintenance works again
    assert tgt.compact() is not None
    assert _state(tgt) == _state(src)


def test_jobspec_bootstrap_precheck_contracts(spark, tmp_path):
    from datax_spark.jobspec import JobSpec

    src = _mk_src(spark, tmp_path, name="pcsrc")
    out = str(tmp_path / "pcwire")
    DBZ.emit_incremental_snapshot(src, out, chunk_rows=100, max_chunks=1)
    base = {
        "source": {"path": out, "format": "debezium-json",
                   "payload": "k long, v string"},
        "target": {"location": str(tmp_path / "pclake"), "key_cols": ["k"],
                   "num_buckets": 4},
        "run": {"kind": "stream", "bootstrap": True},
    }
    probs = JobSpec.from_dict({**base, "merge": {"mode": "cow"}}) \
        .pre_check(spark)
    assert any("merge.mode='mor'" in p for p in probs)
    probs = JobSpec.from_dict(
        {**base, "run": {"kind": "incremental", "bootstrap": True}}
    ).pre_check(spark)
    assert any("stream/tail" in p for p in probs)
    probs = JobSpec.from_dict(
        {**base, "target": {**base["target"], "scd2": True}}
    ).pre_check(spark)
    assert any("scd2" in p for p in probs)
