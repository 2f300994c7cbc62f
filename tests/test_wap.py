"""Write-Audit-Publish (lake/wap.py): staged MOR commits are invisible
until published, auditable via read_staged, rebase onto concurrent commits,
and abort cleanly."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable
from datax_spark.lake.wap import (
    abort_staged,
    list_staged,
    publish_staged,
    read_staged,
    stage_merge,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
    ]
)


def _mk(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema=SCHEMA, key_cols=["k"],
        bucket_col="k", num_buckets=4,
    )
    t.overwrite(spark.createDataFrame([Row(k=1, v=10), Row(k=2, v=20)]))
    return t


def _batch(spark, rows, lsn0=0):
    return spark.createDataFrame(
        [Row(k=k, v=v, op=op, lsn=lsn0 + i) for i, (k, v, op) in enumerate(rows)]
    )


def _state(t):
    return sorted((r["k"], r["v"]) for r in t.read().collect())


def test_stage_is_invisible_until_publish(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v0 = t.current_version()
    wid = stage_merge(
        t, _batch(spark, [(1, 11, "insert"), (3, 30, "insert")]),
        op_col="op", order_col="lsn",
        lineage={"batch_id": "wap1", "rows": 2, "bytes": 0},
    )
    assert wid in list_staged(t)
    assert t.current_version() == v0          # nothing committed
    assert _state(t) == [(1, 10), (2, 20)]    # visible state unchanged
    # the audit surface shows the would-be state
    preview = sorted((r["k"], r["v"]) for r in read_staged(t, wid).collect())
    assert preview == [(1, 11), (2, 20), (3, 30)]
    m = publish_staged(t, wid)
    assert m is not None and t.current_version() == v0 + 1
    assert _state(t) == [(1, 11), (2, 20), (3, 30)]
    assert list_staged(t) == []


def test_publish_rebases_over_concurrent_commit(spark, tmp_path):
    t = _mk(spark, tmp_path)
    wid = stage_merge(
        t, _batch(spark, [(3, 30, "insert")], lsn0=0),
        op_col="op", order_col="lsn",
        lineage={"batch_id": "wapA", "rows": 1, "bytes": 0},
    )
    # another writer lands AFTER staging, BEFORE publish
    merge_into(t, _batch(spark, [(2, 0, "delete")], lsn0=10),
               op_col="op", order_col="lsn", mode="mor", auto_compact=None)
    publish_staged(t, wid)
    assert _state(t) == [(1, 10), (3, 30)]  # both effects present


def test_double_publish_is_noop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    wid = stage_merge(
        t, _batch(spark, [(3, 30, "insert")]), op_col="op", order_col="lsn",
        lineage={"batch_id": "wapX", "rows": 1, "bytes": 0},
    )
    assert publish_staged(t, wid) is not None
    # replaying the SAME batch id through a fresh stage: refused at publish
    wid2 = stage_merge(
        t, _batch(spark, [(3, 31, "insert")]), op_col="op", order_col="lsn",
        lineage={"batch_id": "wapX", "rows": 1, "bytes": 0},
    )
    assert wid2 is None  # replay guard fires at stage time already
    assert _state(t) == [(1, 10), (2, 20), (3, 30)]


def test_abort_deletes_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    v0 = t.current_version()
    wid = stage_merge(
        t, _batch(spark, [(9, 90, "insert")]), op_col="op", order_col="lsn",
    )
    removed = abort_staged(t, wid)
    assert removed >= 1
    assert list_staged(t) == []
    assert t.current_version() == v0
    assert _state(t) == [(1, 10), (2, 20)]
    with pytest.raises(FileNotFoundError):
        read_staged(t, wid)


def test_vacuum_keeps_staged_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    wid = stage_merge(
        t, _batch(spark, [(5, 50, "insert")]), op_col="op", order_col="lsn",
        lineage={"batch_id": "wapV", "rows": 1, "bytes": 0},
    )
    t.vacuum(keep_versions=1)
    # staged files survived maintenance: publish still works
    publish_staged(t, wid)
    assert (5, 50) in _state(t)


def test_staged_schema_evolution_after_base_evolved(spark, tmp_path):
    """Stage a widening batch, then evolve the base DIFFERENTLY before
    publish — the wap-<id> schema key keeps the staged files readable and
    publish merges both widenings."""
    t = _mk(spark, tmp_path)
    wid = stage_merge(
        t,
        spark.createDataFrame([Row(k=3, v=30, extra="x", op="insert", lsn=0)]),
        op_col="op", order_col="lsn",
        lineage={"batch_id": "wapS", "rows": 1, "bytes": 0},
    )
    merge_into(
        t, spark.createDataFrame([Row(k=4, v=40, other=7, op="insert", lsn=5)]),
        op_col="op", order_col="lsn", mode="mor", auto_compact=None,
    )
    publish_staged(t, wid)
    cols = {f.name for f in t.manifest().schema.fields}
    assert {"k", "v", "extra", "other"} <= cols
    got = {r["k"]: (r["v"], r["extra"], r["other"])
           for r in t.read().collect()}
    assert got[3] == (30, "x", None)
    assert got[4] == (40, None, 7)
    # published wap files remain inventoried with their string schema key
    keys = {r["schema_id"] for r in t.files_df().collect()}
    assert f"wap-{wid}" in keys
    # compaction folds everything back to plain numeric-schema base files
    t.compact()
    assert got == {r["k"]: (r["v"], r["extra"], r["other"])
                   for r in t.read().collect()}


def test_stage_requires_order_col(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="order_col"):
        stage_merge(t, _batch(spark, [(1, 1, "insert")]), op_col="op")
