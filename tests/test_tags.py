"""Snapshot tags (Iceberg tag analogue): named pins into version history
that survive expire_snapshots/vacuum."""

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
    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema=SCHEMA, key_cols=["k"],
        bucket_col="k", num_buckets=4,
    )
    t.overwrite(spark.createDataFrame([Row(k=1, v=10)]))
    return t


def _bump(t, k, v, lsn):
    merge_into(
        t, t.spark.createDataFrame([Row(k=k, v=v, op="insert", lsn=lsn)]),
        op_col="op", order_col="lsn", mode="mor", auto_compact=None,
    )


def test_tag_read_and_lifecycle(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create_tag("after-load")
    tagged_v = t.tag_version("after-load")
    _bump(t, 1, 11, lsn=5)
    # current moved on; the tag still reads the pinned state
    assert t.read().collect()[0]["v"] == 11
    assert t.read(version=tagged_v).collect()[0]["v"] == 10
    assert t.tags() == {"after-load": tagged_v}
    with pytest.raises(ValueError, match="already exists"):
        t.create_tag("after-load")
    t.drop_tag("after-load")
    assert t.tags() == {}
    with pytest.raises(KeyError):
        t.tag_version("after-load")


def test_tag_survives_expiry_and_vacuum(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create_tag("pin")
    pin_v = t.tag_version("pin")
    for i in range(4):
        _bump(t, 1, 20 + i, lsn=10 + i)
    t.compact()  # rewrites data files: the pinned version's files become old
    t.expire_snapshots(keep_versions=1)
    t.vacuum(keep_versions=1)
    # pinned manifest AND its data files survived both sweeps
    assert t.read(version=pin_v).collect()[0]["v"] == 10
    # untagged history really was expired
    with pytest.raises(FileNotFoundError):
        t.manifest(pin_v + 1)


def test_tag_requires_existing_snapshot(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(FileNotFoundError):
        t.create_tag("nope", version=99)


def test_rollback_restores_state_and_replay_guards(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.create_tag("good")
    _bump(t, 1, 666, lsn=50)   # the "bad" commit
    assert t.read().collect()[0]["v"] == 666
    m = t.rollback(tag="good")
    assert m.operation == "rollback"
    assert t.read().collect()[0]["v"] == 10
    # bad version still time-travelable (history preserved)
    assert t.read(version=m.version - 1).collect()[0]["v"] == 666
    # watermarks reverted: the rolled-back batch re-applies cleanly
    _bump(t, 1, 11, lsn=50)
    assert t.read().collect()[0]["v"] == 11


def test_rollback_arg_validation_and_vacuum_guard(spark, tmp_path):
    t = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="exactly one"):
        t.rollback()
    with pytest.raises(ValueError, match="exactly one"):
        t.rollback(version=0, tag="x")
    v_old = t.current_version()
    _bump(t, 1, 20, lsn=5)
    t.compact()  # rewrites files; old version's files become unreferenced
    t.expire_snapshots(keep_versions=10)  # keep manifests
    t.vacuum(keep_versions=1)             # but drop old data files
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        t.rollback(version=v_old)
