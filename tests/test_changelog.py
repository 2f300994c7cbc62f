"""Changelog (incremental/CDC-out) reads: LakeTable.read_changes.

A downstream consumer reads the table AS a change feed — the analogue of
Iceberg's incremental append scan, extended with MOR delta semantics
(upserts + tombstones carrying the LSN).  Physical rewrites (compact /
rebucket) emit nothing; state-rewriting commits (overwrite / merge-cow /
merge-dv) are not a change stream and raise unless skipped.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
    ]
)


def _mk(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "t"), schema=SCHEMA, key_cols=["k"],
        bucket_col="k", num_buckets=4,
    )


def _batch(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, v=v, lsn=lsn, op=op) for (k, v, lsn, op) in rows]
    )


def test_changes_from_mor_batches(spark, tmp_path):
    t = _mk(spark, tmp_path)
    merge_into(t, _batch(spark, [(1, 10, 1, "insert"), (2, 20, 2, "insert")]),
               op_col="op", order_col="lsn", mode="mor")
    v1 = t.current_version()
    merge_into(t, _batch(spark, [(1, 11, 3, "insert"), (2, 0, 4, "delete")]),
               op_col="op", order_col="lsn", mode="mor")
    v2 = t.current_version()

    all_changes = t.read_changes(0)
    got = sorted(
        (r["k"], r["v"], r["_change_type"], r["_change_lsn"],
         r["_commit_version"])
        for r in all_changes.collect()
    )
    assert got == [
        (1, 10, "upsert", 1, v1),
        (1, 11, "upsert", 3, v2),
        (2, 0, "delete", 4, v2),
        (2, 20, "upsert", 2, v1),
    ]
    # bounded range: only the second batch
    second = t.read_changes(v1, v2)
    assert sorted(r["_change_lsn"] for r in second.collect()) == [3, 4]
    # folding the change stream reproduces the snapshot
    state = {r["k"]: r["v"] for r in t.read().collect()}
    assert state == {1: 11}


def test_compact_and_properties_commits_emit_nothing(spark, tmp_path):
    t = _mk(spark, tmp_path)
    merge_into(t, _batch(spark, [(1, 10, 1, "insert")]),
               op_col="op", order_col="lsn", mode="mor")
    v_merge = t.current_version()
    t.set_properties(note="x")
    t.compact()
    v_after = t.current_version()
    assert v_after > v_merge
    assert t.read_changes(v_merge, v_after).count() == 0
    # the full range still reports exactly the one logical change
    assert t.read_changes(0).count() == 1


def test_append_commits_are_inserts(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append(spark.createDataFrame([Row(k=5, v=50)], SCHEMA))
    rows = t.read_changes(0).collect()
    assert [(r["k"], r["_change_type"], r["_change_lsn"]) for r in rows] == [
        (5, "insert", None)
    ]


def test_rewrite_commits_raise_or_skip(spark, tmp_path):
    t = _mk(spark, tmp_path)
    merge_into(t, _batch(spark, [(1, 10, 1, "insert")]),
               op_col="op", order_col="lsn", mode="cow")
    with pytest.raises(ValueError, match="merge-cow"):
        t.read_changes(0)
    assert t.read_changes(0, on_rewrite="skip").count() == 0
    merge_into(t, _batch(spark, [(2, 20, 2, "insert")]),
               op_col="op", order_col="lsn", mode="mor")
    # skip mode surfaces the MOR batch while ignoring the COW one
    assert t.read_changes(0, on_rewrite="skip").count() == 1


def test_changes_cast_to_current_schema(spark, tmp_path):
    """A column added mid-stream: earlier change files are padded with null
    on read, exactly like snapshot scans."""
    t = _mk(spark, tmp_path)
    merge_into(t, _batch(spark, [(1, 10, 1, "insert")]),
               op_col="op", order_col="lsn", mode="mor")
    wide = spark.createDataFrame([Row(k=2, v=20, w="x", lsn=2, op="insert")])
    merge_into(t, wide, op_col="op", order_col="lsn", mode="mor")
    rows = {r["k"]: r for r in t.read_changes(0).collect()}
    assert rows[1]["w"] is None
    assert rows[2]["w"] == "x"


def test_empty_range_empty_frame_with_schema(spark, tmp_path):
    t = _mk(spark, tmp_path)
    df = t.read_changes(0)
    assert df.count() == 0
    assert df.columns == ["k", "v", "_change_type", "_change_lsn",
                          "_commit_version"]


def test_changes_with_before_images(spark, tmp_path):
    """Iceberg changelog-view shape: insert / update_before+update_after /
    delete-with-before-values, net per commit."""
    t = _mk(spark, tmp_path)
    merge_into(t, _batch(spark, [(1, 10, 1, "insert"), (2, 20, 2, "insert")]),
               op_col="op", order_col="lsn", mode="mor")
    v1 = t.current_version()
    # intra-commit churn on k=1 (two events, dedup off) → net change only;
    # k=2 deleted; k=3 fresh insert; k=9 delete of a key that never existed
    merge_into(
        t,
        _batch(spark, [(1, 11, 3, "insert"), (1, 12, 5, "insert"),
                       (2, 0, 4, "delete"), (3, 30, 6, "insert"),
                       (9, 0, 7, "delete")]),
        op_col="op", order_col="lsn", mode="mor", dedup_batch=False,
    )
    v2 = t.current_version()

    got = sorted(
        (r["_commit_version"], r["k"], r["_change_type"], r["v"],
         r["_change_lsn"])
        for r in t.read_changes_with_images(0).collect()
    )
    assert got == [
        (v1, 1, "insert", 10, 1),
        (v1, 2, "insert", 20, 2),
        (v2, 1, "update_after", 12, 5),   # net of the two events
        (v2, 1, "update_before", 10, 5),  # old value, paired by lsn
        (v2, 2, "delete", 20, 4),         # before image, not the tombstone
        (v2, 3, "insert", 30, 6),
        # k=9: delete of a non-existent key emits nothing
    ]
    # incremental consumption: only the second commit
    second = {r["_change_type"] for r in
              t.read_changes_with_images(v1, v2).collect()}
    assert second == {"update_before", "update_after", "delete", "insert"}
