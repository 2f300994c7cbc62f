"""CDC relay (lake/mirror.py): a downstream LakeTable maintained from an
upstream table's changelog.

Contract under test: after every sync, mirror state == upstream state
(row-for-row), the watermark advances atomically with the merge, and
re-running a completed sync is a no-op (exactly-once).
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.merge import merge_into
from datax_spark.lake.mirror import (
    WATERMARK_PROP,
    bootstrap_mirror,
    sync_mirror,
)
from datax_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
    ]
)


def _mk_upstream(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "up"), schema=SCHEMA, key_cols=["k"],
        bucket_col="k", num_buckets=4,
    )


def _merge(t, rows, lsn0):
    df = t.spark.createDataFrame(
        [Row(k=k, v=v, op=op, lsn=lsn0 + i) for i, (k, v, op) in enumerate(rows)]
    )
    merge_into(t, df, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None)


def _state(t):
    return sorted((r["k"], r["v"]) for r in t.read().collect())


def test_mirror_tracks_upstream(spark, tmp_path):
    up = _mk_upstream(spark, tmp_path)
    _merge(up, [(1, 10, "insert"), (2, 20, "insert")], lsn0=0)
    mirror = bootstrap_mirror(up, str(tmp_path / "mir"))
    assert _state(mirror) == _state(up)
    assert mirror.manifest().properties[WATERMARK_PROP] == up.current_version()

    # upstream evolves: update, delete, fresh insert across two commits
    _merge(up, [(1, 11, "insert"), (2, 0, "delete")], lsn0=10)
    _merge(up, [(3, 30, "insert")], lsn0=20)
    out = sync_mirror(up, mirror)
    assert out["applied"] and out["rows"] == 3
    assert _state(mirror) == _state(up) == [(1, 11), (3, 30)]
    assert mirror.manifest().properties[WATERMARK_PROP] == up.current_version()


def test_sync_is_idempotent_and_incremental(spark, tmp_path):
    up = _mk_upstream(spark, tmp_path)
    mirror = bootstrap_mirror(up, str(tmp_path / "mir"))
    _merge(up, [(1, 10, "insert")], lsn0=0)
    first = sync_mirror(up, mirror)
    assert first["applied"] and first["rows"] == 1
    # nothing new upstream → no-op, watermark stable
    again = sync_mirror(up, mirror)
    assert again["rows"] == 0 and not again["applied"]
    assert again["from_version"] == again["to_version"]
    # next delta applies only the new commits
    _merge(up, [(1, 12, "insert")], lsn0=5)
    nxt = sync_mirror(up, mirror)
    assert nxt["rows"] == 1 and nxt["from_version"] == first["to_version"]
    assert _state(mirror) == [(1, 12)]


def test_bootstrap_from_zero_replays_whole_changelog(spark, tmp_path):
    up = _mk_upstream(spark, tmp_path)
    _merge(up, [(1, 10, "insert"), (2, 20, "insert")], lsn0=0)
    _merge(up, [(2, 0, "delete"), (1, 11, "insert")], lsn0=10)
    mirror = bootstrap_mirror(up, str(tmp_path / "mir"), version=0)
    assert _state(mirror) == []  # empty start
    sync_mirror(up, mirror)
    assert _state(mirror) == _state(up) == [(1, 11)]


def test_compact_commits_pass_through(spark, tmp_path):
    up = _mk_upstream(spark, tmp_path)
    mirror = bootstrap_mirror(up, str(tmp_path / "mir"))
    _merge(up, [(1, 10, "insert"), (2, 20, "insert")], lsn0=0)
    up.compact()  # physical rewrite: no logical change
    out = sync_mirror(up, mirror)
    assert out["rows"] == 2  # only the merge commit's rows
    assert _state(mirror) == _state(up)
    # a compact-only range advances the watermark without a merge
    up.compact(sort_cols=["k"])
    out2 = sync_mirror(up, mirror)
    assert out2["rows"] == 0 and not out2["applied"]
    assert mirror.manifest().properties[WATERMARK_PROP] == up.current_version()


def test_rewrite_commit_raises_unless_skipped(spark, tmp_path):
    up = _mk_upstream(spark, tmp_path)
    mirror = bootstrap_mirror(up, str(tmp_path / "mir"))
    df = spark.createDataFrame([Row(k=1, v=10, op="insert", lsn=0)])
    merge_into(up, df, op_col="op", order_col="lsn", mode="cow")
    with pytest.raises(ValueError, match="state rewrite"):
        sync_mirror(up, mirror)
    out = sync_mirror(up, mirror, on_rewrite="skip")
    assert out["rows"] == 0  # cow commit skipped — mirror may diverge, loudly


def test_watermark_requires_bootstrap(spark, tmp_path):
    up = _mk_upstream(spark, tmp_path)
    plain = LakeTable.create(
        spark, str(tmp_path / "m2"), schema=SCHEMA, key_cols=["k"],
        bucket_col="k", num_buckets=4,
    )
    with pytest.raises(ValueError, match="bootstrap_mirror"):
        sync_mirror(up, plain)


def test_schema_evolution_propagates(spark, tmp_path):
    up = _mk_upstream(spark, tmp_path)
    mirror = bootstrap_mirror(up, str(tmp_path / "mir"))
    _merge(up, [(1, 10, "insert")], lsn0=0)
    wide = spark.createDataFrame(
        [Row(k=2, v=20, extra="x", op="insert", lsn=10)]
    )
    merge_into(up, wide, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None)
    sync_mirror(up, mirror)
    assert "extra" in [f.name for f in mirror.manifest().schema.fields]
    got = {r["k"]: (r["v"], r["extra"]) for r in mirror.read().collect()}
    assert got == {1: (10, None), 2: (20, "x")}


def test_reinsert_after_upstream_compact_outranks_retained_tombstone(
    spark, tmp_path
):
    """MOR delete(k) upstream → mirror syncs the tombstone → upstream
    compacts (tombstone folded away, skipped by the changelog) → upstream
    appends k as a fresh key.  The mirror's retained tombstone carries a
    real LSN while the append carries none — ordering by commit version
    makes the later commit's insert win; raw-LSN ordering would leave k
    silently deleted in the mirror while live upstream."""
    up = _mk_upstream(spark, tmp_path)
    _merge(up, [(1, 10, "insert"), (2, 20, "insert")], lsn0=0)
    mirror = bootstrap_mirror(up, str(tmp_path / "mir"), version=0)
    _merge(up, [(1, 0, "delete")], lsn0=100)  # tombstone at a real LSN
    sync_mirror(up, mirror)  # mirror retains the tombstone in its MOR delta
    assert _state(mirror) == _state(up) == [(2, 20)]
    up.compact()  # folds the tombstone away upstream
    up.append(spark.createDataFrame([Row(k=1, v=99)], SCHEMA))
    sync_mirror(up, mirror)
    assert _state(mirror) == _state(up) == [(1, 99), (2, 20)]


def test_mirror_winner_spans_commits_in_one_sync(spark, tmp_path):
    """A sync range covering several commits must apply each key's single
    (commit, LSN)-max winner — including a later-commit delete overriding
    an earlier-commit insert, and vice versa."""
    up = _mk_upstream(spark, tmp_path)
    mirror = bootstrap_mirror(up, str(tmp_path / "mir"))
    _merge(up, [(1, 10, "insert"), (2, 20, "insert")], lsn0=0)
    _merge(up, [(1, 0, "delete"), (3, 30, "insert")], lsn0=10)
    _merge(up, [(2, 22, "insert")], lsn0=20)
    out = sync_mirror(up, mirror)
    assert out["applied"]
    assert _state(mirror) == _state(up) == [(2, 22), (3, 30)]
