"""Debezium-envelope normalization → engine apply parity."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.cdc.apply import CdcApplier
from datax_spark.lake.table import LakeTable
from datax_spark.sources import debezium as DBZ

PAYLOAD = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _event(op, lsn, k, v=None, before=None):
    return json.dumps(
        {
            "op": op,
            "before": before,
            "after": {"k": k, "v": v} if op != "d" else None,
            "source": {"lsn": lsn, "ts_ms": 1700000000000 + lsn,
                       "db": "d", "table": "t"},
            "ts_ms": 1700000000500 + lsn,
        }
    )


EVENTS = [
    _event("r", 0, 1, "snap1"),
    _event("c", 1, 2, "two"),
    _event("u", 2, 1, "one-upd"),
    _event("d", 3, 2, before={"k": 2, "v": "two"}),
    _event("c", 4, 3, "three"),
    _event("u", 5, 9, "upsert-missing"),  # update to absent key → insert
    "not json at all",                      # dirty line → dropped by parse
    _event("d", 6, 9, before={"k": 9, "v": "upsert-missing"}),
    _event("c", 7, 9, "reborn"),            # delete-then-reinsert
]


def test_json_lines_to_final_state(spark, tmp_path):
    src = tmp_path / "dbz"
    src.mkdir()
    (src / "part-000.jsonl").write_text("\n".join(EVENTS))

    feed = DBZ.from_json_lines(spark, str(src), PAYLOAD, n_shards=4)
    assert set(feed.columns) == {"lsn", "shard", "ts", "op", "k", "v"}
    rows = {r.lsn: r for r in feed.collect()}
    assert len(rows) == 8  # dirty line dropped
    assert rows[0].op == "insert" and rows[0].v == "snap1"
    assert rows[3].op == "delete" and rows[3].k == 2  # key from before-image
    assert rows[3].v == "two"
    assert rows[0].ts.year == 2023  # source.ts_ms preferred

    table = LakeTable.create(
        spark, str(tmp_path / "t"), schema=PAYLOAD, key_cols=["k"], num_buckets=4
    )
    CdcApplier(table).apply_batch(feed, 0)
    state = {r.k: r.v for r in table.read().collect()}
    assert state == {1: "one-upd", 3: "three", 9: "reborn"}


def test_kafka_value_column_shape(spark):
    df = spark.createDataFrame(
        [(e.encode("utf-8"),) for e in EVENTS], "value binary"
    )
    feed = DBZ.from_value_column(df, PAYLOAD)
    assert feed.count() == 8
    ops = {r["op"] for r in feed.select("op").distinct().collect()}
    assert ops == {"insert", "update", "delete"}
    # stays JVM-side: from_json, no Python eval nodes
    from datax_spark.plans import checks

    checks.assert_no_python_row_udf(feed)


def test_shard_is_stable_per_key(spark, tmp_path):
    src = tmp_path / "dbz"
    src.mkdir()
    (src / "a.jsonl").write_text("\n".join(EVENTS))
    feed = DBZ.from_json_lines(spark, str(src), PAYLOAD, n_shards=4)
    per_key = feed.groupBy("k").agg(F.countDistinct("shard").alias("n")).collect()
    assert all(r.n == 1 for r in per_key)

# ------------------------------------------------------------- CDC OUT
def _mk_table_with_history(spark, tmp_path):
    """insert → update → delete history across three commits."""
    from datax_spark.lake.merge import merge_into

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "cdcout"), schema=schema, key_cols=["k"],
        num_buckets=4,
    )

    def batch(rows):
        return spark.createDataFrame(rows, "k long, v string, op string, lsn long")

    merge_into(t, batch([(1, "a", "insert", 1), (2, "b", "insert", 2)]),
               op_col="op", order_col="lsn", mode="mor")
    merge_into(t, batch([(1, "a2", "insert", 3), (3, "c", "insert", 4)]),
               op_col="op", order_col="lsn", mode="mor")
    merge_into(t, batch([(2, "b", "delete", 5)]),
               op_col="op", order_col="lsn", mode="mor")
    return t, schema


def test_to_debezium_values_roundtrip(spark, tmp_path):
    t, schema = _mk_table_with_history(spark, tmp_path)
    vals = DBZ.from_table_changes(t, 0, db="testdb", name="cdcout")
    rows = [json.loads(r["value"]) for r in vals.collect()]
    by = {}
    for r in rows:
        key = (r.get("after") or r.get("before"))["k"]
        by.setdefault(key, []).append(r)

    ops1 = sorted(r["op"] for r in by[1])
    assert ops1 == ["c", "u"]  # insert then a COMBINED update record
    u1 = next(r for r in by[1] if r["op"] == "u")
    assert u1["before"]["v"] == "a" and u1["after"]["v"] == "a2"
    assert u1["source"]["lsn"] == 3
    assert u1["source"]["db"] == "testdb" and u1["source"]["table"] == "cdcout"
    assert isinstance(u1["source"]["ts_ms"], int)

    d2 = next(r for r in by[2] if r["op"] == "d")
    assert d2["before"]["v"] == "b" and "after" not in d2  # null omitted

    # parse back through the inbound path: final fold == table state
    feed = DBZ.from_value_column(vals, schema, n_shards=2)
    assert feed.count() == 5  # c,c,u(x1 combined),c,d
    # stays JVM-side
    from datax_spark.plans import checks

    checks.assert_no_python_row_udf(vals)


def test_write_json_lines_partitioned_by_commit(spark, tmp_path):
    t, schema = _mk_table_with_history(spark, tmp_path)
    out = str(tmp_path / "out")
    DBZ.write_json_lines(DBZ.from_table_changes(t, 0), out)
    import os

    parts = sorted(d for d in os.listdir(out) if d.startswith("_commit_version="))
    assert parts == [
        "_commit_version=1", "_commit_version=2", "_commit_version=3"
    ]
    # each commit dir is a valid json-lines feed of that commit only
    feed = DBZ.from_json_lines(
        spark, os.path.join(out, "_commit_version=3"), schema, n_shards=2
    )
    got = feed.collect()
    assert len(got) == 1 and got[0]["op"] == "delete" and got[0]["k"] == 2


def test_emit_table_changes_resumable(spark, tmp_path):
    from datax_spark.lake.merge import merge_into

    t, schema = _mk_table_with_history(spark, tmp_path)
    out = str(tmp_path / "emit")
    res1 = DBZ.emit_table_changes(t, out, db="d", name="t")
    assert res1["emitted_versions"] == [1, 2, 3]
    # idempotent rerun: nothing new
    res2 = DBZ.emit_table_changes(t, out)
    assert res2["emitted_versions"] == [] and res2["from_version"] == 3
    # a new commit emits exactly one more dir
    batch = spark.createDataFrame([(7, "z", "insert", 9)],
                                  "k long, v string, op string, lsn long")
    merge_into(t, batch, op_col="op", order_col="lsn", mode="mor")
    res3 = DBZ.emit_table_changes(t, out)
    assert res3["emitted_versions"] == [4]
    # the published feed replays to the table's final state
    feed = DBZ.from_json_lines(spark, out + "/_commit_version=*", schema,
                               n_shards=2)
    assert feed.count() >= 5


def test_emit_skips_rewrites_when_asked(spark, tmp_path):
    from datax_spark.lake.merge import merge_into

    t, schema = _mk_table_with_history(spark, tmp_path)
    t.compact()  # physical rewrite: always transparent to the changelog
    merge_into(
        t,
        spark.createDataFrame([(4, "d", "insert", 6)],
                              "k long, v string, op string, lsn long"),
        op_col="op", order_col="lsn", mode="cow",
    )  # state rewrite: NOT changelog-readable → loud by default
    out = str(tmp_path / "emit2")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        DBZ.emit_table_changes(t, out)
    assert not [d for d in (tmp_path / "emit2").iterdir()
                if d.name.startswith("_commit_version=")]  # nothing published
    res = DBZ.emit_table_changes(t, out, on_rewrite="skip")
    # MOR commits 1-3 emitted; compact (4) and cow (5) dirs skipped
    assert res["emitted_versions"] == [1, 2, 3]
    assert res["to_version"] == 5
    # resumable watermark advanced past the skipped commits
    res2 = DBZ.emit_table_changes(t, out, on_rewrite="skip")
    assert res2["emitted_versions"] == []


def _maxwell(type_, ts, xid, xoff, data, old=None):
    return json.dumps(
        {
            "database": "d", "table": "t", "type": type_, "ts": ts,
            "xid": xid, "xoffset": xoff, "commit": xoff is None,
            "data": data, "old": old,
        }
    )


MAXWELL_EVENTS = [
    _maxwell("bootstrap-insert", 1700000100, None, None, {"k": 1, "v": "snap1"}),
    _maxwell("insert", 1700000101, 7, 0, {"k": 2, "v": "two"}),
    # same transaction, two rows: xoffset orders them
    _maxwell("update", 1700000102, 9, 0, {"k": 1, "v": "one-mid"}, {"v": "snap1"}),
    _maxwell("update", 1700000102, 9, 1, {"k": 1, "v": "one-upd"}, {"v": "one-mid"}),
    _maxwell("delete", 1700000103, 11, 0, {"k": 2, "v": "two"}),
    _maxwell("table-create", 1700000104, None, None, None),  # ddl → dropped
    "junk line",                                       # dirty → dropped
    _maxwell("insert", 1700000105, 12, 0, {"k": 3, "v": "three"}),
]


def test_maxwell_lines_to_final_state(spark, tmp_path):
    src = tmp_path / "mx"
    src.mkdir()
    (src / "part-000.jsonl").write_text("\n".join(MAXWELL_EVENTS))

    feed = DBZ.from_maxwell_json_lines(spark, str(src), PAYLOAD, n_shards=4)
    rows = sorted(feed.collect(), key=lambda r: r.lsn)
    assert len(rows) == 6  # ddl + dirty dropped
    assert [r.op for r in rows] == [
        "insert", "insert", "update", "update", "delete", "insert"
    ]
    # same-second same-xid rows order by xoffset
    upd = [r for r in rows if r.op == "update"]
    assert upd[0].v == "one-mid" and upd[1].v == "one-upd"
    assert upd[0].lsn < upd[1].lsn
    assert rows[0].ts.year == 2023  # ts carried (epoch-sec grain)

    table = LakeTable.create(
        spark, str(tmp_path / "lk"), schema=PAYLOAD, key_cols=["k"],
        num_buckets=4,
    )
    CdcApplier(table).apply_batch(feed, "mx0")
    got = {r.k: r.v for r in table.read().collect()}
    assert got == {1: "one-upd", 3: "three"}  # 2 deleted; LWW inside xid

    # plan stays JVM-side
    from datax_spark.plans import checks
    checks.assert_no_python_row_udf(feed)


def _canal(type_, es, id_, data, is_ddl=False, old=None):
    return json.dumps(
        {
            "database": "d", "table": "t", "type": type_,
            "es": es, "ts": es + 500, "id": id_, "isDdl": is_ddl,
            "data": data, "old": old,
        }
    )


CANAL_EVENTS = [
    # one message, TWO rows: position orders them within the message
    _canal("INSERT", 1700000100000, 1,
           [{"k": "1", "v": "one"}, {"k": "2", "v": "two"}]),
    _canal("UPDATE", 1700000101000, 2, [{"k": "1", "v": "one-upd"}],
           old=[{"v": "one"}]),
    _canal("DELETE", 1700000102000, 3, [{"k": "2", "v": "two"}]),
    _canal("CREATE", 1700000103000, 4, None, is_ddl=True),  # ddl → dropped
    "not json",                                              # dirty → dropped
    _canal("INSERT", 1700000104000, 5, [{"k": "3", "v": "three"}]),
]


def test_canal_lines_to_final_state(spark, tmp_path):
    src = tmp_path / "cn"
    src.mkdir()
    (src / "part-000.jsonl").write_text("\n".join(CANAL_EVENTS))

    feed = DBZ.from_canal_json_lines(spark, str(src), PAYLOAD, n_shards=4)
    rows = sorted(feed.collect(), key=lambda r: r.lsn)
    assert len(rows) == 5  # ddl + dirty dropped; first message = 2 events
    assert [r.op for r in rows] == [
        "insert", "insert", "update", "delete", "insert"
    ]
    assert rows[0].k == 1 and rows[1].k == 2  # intra-message order kept
    assert rows[0].lsn < rows[1].lsn
    assert isinstance(rows[0].k, int)  # stringly values cast to payload type
    assert rows[0].ts.year == 2023

    table = LakeTable.create(
        spark, str(tmp_path / "lk"), schema=PAYLOAD, key_cols=["k"],
        num_buckets=4,
    )
    CdcApplier(table).apply_batch(feed, "cn0")
    got = {r.k: r.v for r in table.read().collect()}
    assert got == {1: "one-upd", 3: "three"}

    from datax_spark.plans import checks
    checks.assert_no_python_row_udf(feed)


def test_snapshot_bootstrap_then_follow(spark, tmp_path):
    """emit_table_snapshot publishes op:'r' records and sets the watermark
    so emit_table_changes follows from the next commit; replaying the
    whole directory converges to the live table."""
    from datax_spark.lake.merge import merge_into

    t, schema = _mk_table_with_history(spark, tmp_path)
    out = str(tmp_path / "boot")
    res = DBZ.emit_table_snapshot(t, out, db="d", name="t")
    assert res["snapshot_version"] == 3
    # bootstrap must be first: refuse on a dirty dir (other versions)
    import pytest as _pytest

    merge_into(t, spark.createDataFrame([(9, "nine", "insert", 8)],
                                        "k long, v string, op string, lsn long"),
               op_col="op", order_col="lsn", mode="mor")
    follow = DBZ.emit_table_changes(t, out)
    assert follow["emitted_versions"] == [4]
    with _pytest.raises(ValueError, match="FIRST publication"):
        DBZ.emit_table_snapshot(t, out)

    # snapshot rows are op:"r" with the table image
    import json as _json
    import os as _os

    snap_dir = _os.path.join(out, "_commit_version=3")
    rows = []
    for fn in _os.listdir(snap_dir):
        if fn.endswith(".txt"):
            with open(_os.path.join(snap_dir, fn)) as f:
                rows += [_json.loads(line) for line in f if line.strip()]
    assert {r["op"] for r in rows} == {"r"}
    assert {r["after"]["k"] for r in rows} == {1, 3}

    # full replay (bootstrap + follow) == live table state
    feed = DBZ.from_json_lines(spark, out + "/_commit_version=*", schema,
                               n_shards=2)
    tgt = LakeTable.create(spark, str(tmp_path / "tgt"), schema=schema,
                           key_cols=["k"], num_buckets=4)
    CdcApplier(tgt, dedup_batch=False).apply_batch(feed, "replay")
    assert ({r.k: r.v for r in tgt.read().collect()}
            == {r.k: r.v for r in t.read().collect()})


def test_cdcout_to_cdcin_replication_loop(spark, tmp_path):
    """The full interchange loop: table A's changelog published as
    Debezium JSON (cdc-out), tailed back through the streaming drain's
    wire-format reader (cdc-in) into table B — B converges to A, and a
    later commit flows through the same checkpointed pipe."""
    from datax_spark.lake.merge import merge_into
    from datax_spark.streaming.runner import run_available_now

    t, schema = _mk_table_with_history(spark, tmp_path)
    out = str(tmp_path / "wire")
    DBZ.emit_table_changes(t, out, db="d", name="t")

    tgt = LakeTable.create(spark, str(tmp_path / "replica"), schema=schema,
                           key_cols=["k"], num_buckets=4)
    # commit dirs publish with near-identical mtimes → no cross-batch
    # order guarantee; MOR reconstruction converges without the watermark
    run_available_now(
        spark, out + "/_commit_version=*", tgt,
        feed_format="debezium-json", payload="k long, v string",
        filter_watermark=False, dedup_batch=False,
    )
    state = lambda table: {r.k: r.v for r in table.read().collect()}
    assert state(tgt) == state(t)

    # live follow: a new upstream commit rides the same pipe
    merge_into(t, spark.createDataFrame([(8, "h", "insert", 9)],
                                        "k long, v string, op string, lsn long"),
               op_col="op", order_col="lsn", mode="mor")
    DBZ.emit_table_changes(t, out)
    run_available_now(
        spark, out + "/_commit_version=*", tgt,
        feed_format="debezium-json", payload="k long, v string",
        filter_watermark=False, dedup_batch=False,
    )
    assert state(tgt) == state(t)


# ---------------------------------------------------- sentinel LSN semantics
# Round-3 advisory (high): snapshot rows carry lsn = -1; consumed through
# the wire path across SEVERAL micro-batches, batch 1 used to set the
# shard watermark to -1 and `lsn > -1` silently dropped the rest of the
# snapshot.  Sentinel (lsn<0) rows now neither advance a watermark nor
# compare against one.

def test_multi_batch_snapshot_survives_watermark_filter(spark, tmp_path):
    import glob
    import os

    from datax_spark.streaming.runner import run_available_now

    t = LakeTable.create(
        spark, str(tmp_path / "src"), schema=PAYLOAD, key_cols=["k"],
        num_buckets=4,
    )
    t.overwrite(spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "k long, v string"))
    out = str(tmp_path / "boot")
    DBZ.emit_table_snapshot(t, out, db="d", name="t")
    nfiles = len(glob.glob(os.path.join(out, "_commit_version=*", "*.txt")))
    assert nfiles > 1, "repro needs a snapshot spanning several part files"

    tgt = LakeTable.create(
        spark, str(tmp_path / "tgt"), schema=PAYLOAD, key_cols=["k"],
        num_buckets=4,
    )
    # one file per micro-batch, watermark filter at its DEFAULT (True):
    # before the fix batch 1 poisoned the watermark and later batches lost
    # every row
    run_available_now(
        spark, out + "/_commit_version=*", tgt,
        feed_format="debezium-json", payload="k long, v string",
        max_files_per_trigger=1, dedup_batch=False,
    )
    assert ({r.k: r.v for r in tgt.read().collect()}
            == {r.k: r.v for r in t.read().collect()})
    # sentinel rows never advanced any shard watermark
    assert tgt.manifest().shard_lsns == {}


def test_sentinel_rows_never_advance_or_hit_watermark(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "lk"), schema=PAYLOAD, key_cols=["k"],
        num_buckets=4,
    )
    ap = CdcApplier(t, dedup_batch=False, lineage_detail="shards")
    env = "lsn long, shard int, ts timestamp, op string, k long, v string"
    snap = spark.createDataFrame(
        [(-1, 0, None, "insert", 1, "s1"), (-1, 1, None, "insert", 2, "s2")],
        env,
    )
    lin = ap.apply_batch(snap, "snap0")
    assert lin["rows"] == 2
    assert lin["shard_lsns"] == {}          # sentinels advance nothing
    assert t.manifest().shard_lsns == {}

    real = spark.createDataFrame(
        [(5, 0, None, "update", 1, "live")], env)
    ap.apply_batch(real, "live1")
    assert t.manifest().shard_lsns == {"0": 5}

    # filter: stale real row dropped, newer real row and sentinel both pass
    mix = spark.createDataFrame(
        [(3, 0, None, "update", 1, "stale"),
         (7, 0, None, "update", 1, "new"),
         (-1, 0, None, "insert", 9, "snap-late")],
        env,
    )
    kept = {(r.lsn, r.v) for r in ap.filter_already_applied(mix).collect()}
    assert kept == {(7, "new"), (-1, "snap-late")}


def test_maxwell_bootstrap_sentinel_and_xoffset_wrap(spark, tmp_path):
    import pytest as _pytest

    src = tmp_path / "mx2"
    src.mkdir()
    lines = [
        _maxwell("bootstrap-insert", 1700000100, None, None,
                 {"k": 1, "v": "s1"}),
        _maxwell("bootstrap-insert", 1700000100, None, None,
                 {"k": 2, "v": "s2"}),
        _maxwell("insert", 1700000101, 7, 0, {"k": 3, "v": "live"}),
    ]
    (src / "a.jsonl").write_text("\n".join(lines))
    feed = DBZ.from_maxwell_json_lines(spark, str(src), PAYLOAD, n_shards=4)
    rows = {r.k: r for r in feed.collect()}
    # bootstrap rows: SENTINEL lsn, not same-second colliding packed LSNs
    assert rows[1].lsn == -1 and rows[2].lsn == -1
    assert rows[3].lsn > 0

    # an xoffset beyond the LSN's 19 row bits fails LOUDLY (a silent
    # mod-wrap would be dropped by the watermark filter, not reordered)
    src2 = tmp_path / "mx3"
    src2.mkdir()
    (src2 / "a.jsonl").write_text(
        _maxwell("insert", 1700000101, 7, 1 << 19, {"k": 9, "v": "big"}))
    bad = DBZ.from_maxwell_json_lines(spark, str(src2), PAYLOAD, n_shards=4)
    with _pytest.raises(Exception, match="xoffset"):
        bad.collect()


def test_replication_loop_with_default_watermark_filter(spark, tmp_path):
    """The cdcout→cdcin loop with run defaults (filter_watermark=True):
    append-commit rows serialize as sentinel lsn=-1 and must still land
    (round-3 advisory, low)."""
    from datax_spark.lake.merge import merge_into
    from datax_spark.streaming.runner import run_available_now

    t, schema = _mk_table_with_history(spark, tmp_path)
    out = str(tmp_path / "wire-default")
    DBZ.emit_table_changes(t, out, db="d", name="t")

    tgt = LakeTable.create(
        spark, str(tmp_path / "replica-default"), schema=schema,
        key_cols=["k"], num_buckets=4,
    )
    run_available_now(
        spark, out + "/_commit_version=*", tgt,
        feed_format="debezium-json", payload="k long, v string",
        dedup_batch=False,  # filter_watermark left at its True default
    )
    state = lambda table: {r.k: r.v for r in table.read().collect()}  # noqa: E731
    assert state(tgt) == state(t)

    # a follow-up commit rides the same checkpointed pipe, still defaults
    merge_into(t, spark.createDataFrame(
        [(8, "h", "insert", 9)], "k long, v string, op string, lsn long"),
        op_col="op", order_col="lsn", mode="mor")
    DBZ.emit_table_changes(t, out)
    run_available_now(
        spark, out + "/_commit_version=*", tgt,
        feed_format="debezium-json", payload="k long, v string",
        dedup_batch=False,
    )
    assert state(tgt) == state(t)
