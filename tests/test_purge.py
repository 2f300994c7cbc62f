"""History-reaching key purge (lake/purge.py): the purged key must be
gone from the CURRENT snapshot and from EVERY retained historical
snapshot (time travel, tags, changelog), while every other row — and the
shape of history itself (versions, operations) — survives untouched.
"""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.merge import merge_into
from datax_spark.lake.purge import PURGE_AUDIT_PROP, purge_rows
from datax_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _mk(spark, loc, **kw):
    return LakeTable.create(
        spark, loc, schema=SCHEMA, key_cols=["k"], bucket_col="k",
        num_buckets=4, **kw,
    )


def _merge(t, rows, lsn0):
    df = t.spark.createDataFrame(
        [Row(k=k, v=v, op=op, lsn=lsn0 + i)
         for i, (k, v, op) in enumerate(rows)],
        "k long, v string, op string, lsn long",
    )
    merge_into(t, df, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None)


def _hist(spark, tmp_path):
    """Three commits of history touching keys 1..6 (updates + a delete)."""
    t = _mk(spark, str(tmp_path / "t"))
    _merge(t, [(k, f"a{k}", "insert") for k in range(1, 7)], lsn0=0)
    _merge(t, [(1, "b1", "insert"), (2, "b2", "insert"),
               (3, "", "delete")], lsn0=10)
    _merge(t, [(1, "c1", "insert"), (3, "c3", "insert")], lsn0=20)
    return t


def _keys_at(t, version=None):
    return sorted(r.k for r in t.read(version=version).collect())


def test_purge_reaches_every_snapshot(spark, tmp_path):
    t = _hist(spark, tmp_path)
    vs = t.catalog.list_versions()
    before = {v: _keys_at(t, v) for v in vs if v > 0}
    t.create_tag("pre", version=t.current_version())

    out = purge_rows(t, [("k", "=", 1)])
    assert out["rows_purged"] == 3  # one row per commit carried k=1
    assert out["versions_rewritten"] >= 3

    # key 1 gone from every retained snapshot; everything else untouched
    for v, keys in before.items():
        assert _keys_at(t, v) == [k for k in keys if k != 1]
    # tag still resolves, also purged (it points into the same history)
    assert 1 not in set(
        r.k for r in t.read(version=t.tag_version("pre")).collect()
    )
    # non-purged values byte-identical
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {2: "b2", 3: "c3", 4: "a4", 5: "a5", 6: "a6"}
    # changelog no longer emits the purged key either
    ch = t.read_changes(0, on_rewrite="skip")
    assert 1 not in {r.k for r in ch.collect()}
    # audit marker recorded; history shape preserved (same version count)
    assert t.manifest().properties[PURGE_AUDIT_PROP]["rows_purged"] == 3
    assert t.verify_files() == []


def test_purge_is_idempotent_and_prunes(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    # key-clustered files: each bucket file covers a narrow k range after
    # compaction, so the purge's zone-map prune must skip most files
    _merge(t, [(k, f"v{k}", "insert") for k in range(200)], lsn0=0)
    t.compact(sort_cols=["k"])
    n_files = sum(len(es) for es in t.manifest().files.values())
    out = purge_rows(t, [("k", "=", 7)])
    assert out["rows_purged"] >= 1
    assert out["files_scanned"] < n_files  # non-vacuous pruning
    again = purge_rows(t, [("k", "=", 7)])
    assert again["rows_purged"] == 0 and again["files_rewritten"] == 0
    assert 7 not in _keys_at(t)


def test_purge_with_blooms_recomputes_bitmaps(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.set_bloom_filters(["k"])
    _merge(t, [(k, f"v{k}", "insert") for k in range(50)], lsn0=0)
    out = purge_rows(t, [("k", "in", [3, 4])])
    assert out["rows_purged"] == 2
    # rewritten entries keep their bloom element and it no longer admits
    # the purged keys (scan_plan bloom-skips the probe)
    plan = t.scan_plan(where=[("k", "=", 3)])
    assert plan["files_kept"] == 0 or plan["bloom_skipped"] >= 1
    assert _keys_at(t) == [k for k in range(50) if k not in (3, 4)]


def test_purge_contract_errors(spark, tmp_path):
    t = _hist(spark, tmp_path)
    with pytest.raises(ValueError, match="key columns only"):
        purge_rows(t, [("v", "=", "a1")])
    with pytest.raises(ValueError, match="at least one predicate"):
        purge_rows(t, [])


def test_purge_refuses_dv_history(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    df = t.spark.createDataFrame(
        [Row(k=k, v=f"v{k}", op="insert", lsn=k) for k in range(10)],
        "k long, v string, op string, lsn long",
    )
    merge_into(t, df, op_col="op", order_col="lsn", mode="cow",
               auto_compact=None)
    upd = t.spark.createDataFrame(
        [Row(k=1, v="x", op="insert", lsn=100)],
        "k long, v string, op string, lsn long",
    )
    merge_into(t, upd, op_col="op", order_col="lsn", mode="dv",
               auto_compact=None)
    with pytest.raises(ValueError, match="deletion-vector"):
        purge_rows(t, [("k", "=", 1)])


def test_purge_then_vacuum_keeps_live_files(spark, tmp_path):
    t = _hist(spark, tmp_path)
    purge_rows(t, [("k", "=", 2)])
    t.vacuum(keep_versions=10)
    assert t.verify_files() == []
    assert 2 not in _keys_at(t)
    # and the table still merges normally afterwards
    _merge(t, [(2, "back", "insert")], lsn0=100)
    assert {r.v for r in t.read().filter(F.col("k") == 2).collect()} == {
        "back"
    }


def test_purge_on_memory_catalog_backend(spark, tmp_path):
    from datax_spark.lake.catalog import MemoryCatalog

    loc = str(tmp_path / "mem")
    MemoryCatalog.drop(loc)
    t = _mk(spark, loc, catalog=MemoryCatalog(loc))
    _merge(t, [(k, f"v{k}", "insert") for k in range(10)], lsn0=0)
    _merge(t, [(1, "u1", "insert")], lsn0=100)
    out = purge_rows(t, [("k", "=", 1)])
    assert out["rows_purged"] == 2
    for v in t.catalog.list_versions():
        if v > 0:
            assert 1 not in _keys_at(t, v)
    MemoryCatalog.drop(loc)


def test_cli_maintain_purge(spark, tmp_path, capsys):
    import json as _json

    from datax_spark import cli

    t = _hist(spark, tmp_path)
    rc = cli.main(["maintain", str(tmp_path / "t"), "--purge", "k=1", "k=4",
                   "--cores", "4"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["purge"]["rows_purged"] == 4  # 3x k=1 + 1x k=4
    assert _keys_at(t) == [2, 3, 5, 6]
    for v in t.catalog.list_versions():
        if v > 0:
            assert not {1, 4} & set(_keys_at(t, v))
    # non-key purge surfaces as a clean error payload
    rc = cli.main(["maintain", str(tmp_path / "t"), "--purge", "v=a1",
                   "--cores", "4"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2 and "key columns only" in out["error"]


def test_cli_purge_value_coercion(spark, tmp_path, capsys):
    """Boolean key values coerce ('true'/'false'/'1'/'0'); unsupported
    key types (date/decimal/…) and unparsable numerics surface as clean
    JSON contract errors, never comparison TypeErrors (round-4 advisor
    finding, cli.py coerce())."""
    import json as _json

    from datax_spark import cli

    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("flag", T.BooleanType()),
        T.StructField("d", T.DateType()),
        T.StructField("v", T.StringType()),
    ])
    t = LakeTable.create(
        spark, str(tmp_path / "b"), schema=schema,
        key_cols=["k", "flag", "d"], bucket_col="k", num_buckets=2,
    )
    import datetime

    df = spark.createDataFrame(
        [Row(k=k, flag=(k % 2 == 0), d=datetime.date(2026, 1, 1),
             v=f"v{k}", op="insert", lsn=k)
         for k in range(1, 7)],
        "k long, flag boolean, d date, v string, op string, lsn long",
    )
    merge_into(t, df, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None)

    rc = cli.main(["maintain", str(tmp_path / "b"), "--purge", "flag=true",
                   "--cores", "4"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["purge"]["rows_purged"] == 3  # k=2,4,6
    assert sorted(r.k for r in t.read().collect()) == [1, 3, 5]

    rc = cli.main(["maintain", str(tmp_path / "b"), "--purge", "flag=maybe",
                   "--cores", "4"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2 and "true/false" in out["error"]

    rc = cli.main(["maintain", str(tmp_path / "b"),
                   "--purge", "d=2026-01-01", "--cores", "4"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2 and "not supported from the CLI" in out["error"]

    rc = cli.main(["maintain", str(tmp_path / "b"), "--purge", "k=abc",
                   "--cores", "4"])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2  # int('abc') → clean JSON error, not a traceback


def test_purge_fences_commits_landing_mid_purge(spark, tmp_path, monkeypatch):
    """A commit racing the purge (attempted after the fence, before
    originals are deleted) would reference pre-purge files the purge is
    about to delete — the purge_active fence refuses it at the commit
    point (PurgeActive), and the fence drops with the audit commit so the
    writer succeeds on retry."""
    from datax_spark.lake.table import PurgeActive

    t = _hist(spark, tmp_path)
    raced = {"refused": False}
    orig_replace = t.catalog.replace_manifest

    def racing_replace(version, text):
        orig_replace(version, text)
        if not raced["refused"]:
            raced["refused"] = True
            with pytest.raises(PurgeActive):
                _merge(t, [(9, "raced", "insert")], lsn0=500)

    monkeypatch.setattr(t.catalog, "replace_manifest", racing_replace)
    out = purge_rows(t, [("k", "=", 1)])
    assert raced["refused"] and out["rows_purged"] == 3
    # every retained snapshot readable, no dangling file references
    assert t.verify_files() == []
    for v in t.catalog.list_versions():
        if v > 0:
            assert 1 not in _keys_at(t, v)
    assert 9 not in _keys_at(t)  # the raced commit never landed
    # fence is down: the writer's retry goes through
    _merge(t, [(9, "after", "insert")], lsn0=600)
    assert 9 in _keys_at(t)
    assert t.verify_files() == []


def test_purge_fence_clears_on_refusal_and_blocks_until_done(
    spark, tmp_path, monkeypatch
):
    """(a) A REFUSED purge (dv history) must not leave writers fenced.
    (b) While a purge is in flight the fence survives a crash (simulated:
    exception injected after the first manifest rewrite is NOT cleared by
    the crashed process... re-running purge completes and clears it)."""
    from datax_spark.lake.merge import merge_into as mi
    from datax_spark.lake.table import PURGE_ACTIVE_PROP, PurgeActive

    # (a) refusal path: dv history → ValueError, fence cleared
    t = _mk(spark, str(tmp_path / "dv"))
    _merge(t, [(1, "a1", "insert"), (2, "a2", "insert")], lsn0=0)
    t.compact()
    df = spark.createDataFrame(
        [Row(k=1, v="b1", op="insert", lsn=100)],
        "k long, v string, op string, lsn long",
    )
    mi(t, df, op_col="op", order_col="lsn", mode="dv", auto_compact=None)
    with pytest.raises(ValueError, match="deletion-vector"):
        purge_rows(t, [("k", "=", 1)])
    assert not t.manifest().properties.get(PURGE_ACTIVE_PROP)
    _merge(t, [(3, "c3", "insert")], lsn0=200)  # writers not fenced

    # (b) crash mid-purge: fence stays up, re-run finishes and clears
    t2 = _hist(spark, tmp_path)
    calls = {"n": 0}
    orig_replace = t2.catalog.replace_manifest

    def crashing_replace(version, text):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("injected crash")
        orig_replace(version, text)

    monkeypatch.setattr(t2.catalog, "replace_manifest", crashing_replace)
    with pytest.raises(OSError, match="injected crash"):
        purge_rows(t2, [("k", "=", 1)])
    monkeypatch.setattr(t2.catalog, "replace_manifest", orig_replace)
    # NOTE the exception path clears the fence (process still alive — a
    # partial purge is valid); simulate a REAL crash by re-fencing
    t2.set_properties(**{PURGE_ACTIVE_PROP: {"at": 0, "where": []}})
    with pytest.raises(PurgeActive):
        _merge(t2, [(8, "x", "insert")], lsn0=400)
    out = purge_rows(t2, [("k", "=", 1)])  # resume under existing fence
    assert out["rows_purged"] >= 0
    assert not t2.manifest().properties.get(PURGE_ACTIVE_PROP)
    assert t2.verify_files() == []
    for v in t2.catalog.list_versions():
        if v > 0:
            assert 1 not in _keys_at(t2, v)
    _merge(t2, [(8, "x", "insert")], lsn0=500)  # fence down
    assert 8 in _keys_at(t2)


def test_purge_tolerates_prestats_manifest_entries(spark, tmp_path):
    """Manifests written before per-file stats existed hold short
    [path, schema_id] entries; the rewrite swap must pad them instead of
    crashing mid-purge (round-4 advisor finding, purge.py rewrite())."""
    t = _hist(spark, tmp_path)
    # truncate every entry of version 1's manifest to the pre-stats shape
    m = t.manifest(1)
    m.files = {b: [e[:2] for e in es] for b, es in m.files.items()}
    t.catalog.replace_manifest(1, m.to_json())
    out = purge_rows(t, [("k", "=", 1)])
    assert out["rows_purged"] == 3
    for v in t.catalog.list_versions():
        if v > 0:
            assert 1 not in _keys_at(t, v)
    assert t.verify_files() == []


def test_purge_cascades_to_derived_views(spark, tmp_path):
    """Purge bypasses the changelog (history is rewritten in place), so a
    derived view never hears about it through refresh — the operator
    purges each fact-keyed view with the SAME key predicate.  Views are
    ordinary LakeTables whose keys include the doc/fact key, so
    purge_rows applies verbatim; afterwards ordinary refreshes keep
    working."""
    from datax_spark.lake.indexview import (
        create_index_view,
        refresh_index_view,
    )
    from datax_spark.lake.joinview import (
        create_join_view,
        refresh_join_view,
    )

    docs = LakeTable.create(
        spark, str(tmp_path / "docs"),
        schema=T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("fk", T.LongType()),
            T.StructField("body", T.StringType()),
        ]),
        key_cols=["doc_id"], bucket_col="doc_id", num_buckets=4,
    )
    dim = LakeTable.create(
        spark, str(tmp_path / "dim"),
        schema=T.StructType([
            T.StructField("dk", T.LongType()),
            T.StructField("seg", T.StringType()),
        ]),
        key_cols=["dk"], bucket_col="dk", num_buckets=2,
    )

    def merge_docs(rows, lsn0):
        df = spark.createDataFrame(
            [Row(doc_id=d, fk=fk, body=b, op=op, lsn=lsn0 + i)
             for i, (d, fk, b, op) in enumerate(rows)],
            "doc_id long, fk long, body string, op string, lsn long",
        )
        merge_into(docs, df, op_col="op", order_col="lsn", mode="mor",
                   auto_compact=None)

    dimdf = spark.createDataFrame(
        [Row(dk=1, seg="A", op="insert", lsn=0),
         Row(dk=2, seg="B", op="insert", lsn=1)],
        "dk long, seg string, op string, lsn long",
    )
    merge_into(dim, dimdf, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None)
    merge_docs([(1, 1, "secret user data", "insert"),
                (2, 2, "public info", "insert"),
                (3, 1, "more text", "insert")], lsn0=0)
    ix = create_index_view(docs, str(tmp_path / "ix"), "body",
                           num_buckets=4)
    jv = create_join_view(docs, dim, str(tmp_path / "jv"),
                          on={"fk": "dk"}, num_buckets=2)

    # right-to-be-forgotten for doc 1: base + every fact-keyed view,
    # same predicate (doc_id is a key column of all three tables)
    pred = [("doc_id", "=", 1)]
    assert purge_rows(docs, pred)["rows_purged"] == 1
    assert purge_rows(ix, pred)["rows_purged"] == 3  # secret/user/data
    assert purge_rows(jv, pred)["rows_purged"] == 1

    assert 1 not in {r.doc_id for r in docs.read().collect()}
    assert not [r for r in ix.read().collect() if r.doc_id == 1]
    assert "secret" not in {r.token for r in ix.read().collect()}
    assert 1 not in {r.doc_id for r in jv.read().collect()}

    # the pipeline keeps working after the purge
    merge_docs([(4, 2, "fresh doc", "insert")], lsn0=100)
    assert refresh_index_view(docs, ix)["applied"]
    assert refresh_join_view(docs, dim, jv)["applied"]
    toks = {(r.token, r.doc_id) for r in ix.read().collect()}
    assert ("fresh", 4) in toks and not [t for t in toks if t[1] == 1]
    assert {r.doc_id for r in jv.read().collect()} == {2, 3, 4}
