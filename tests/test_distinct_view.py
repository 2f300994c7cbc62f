"""Incremental exact COUNT(DISTINCT) views (lake/aggview.py
create_distinct_view / refresh_distinct_view): support-multiplicity
composition, ±1 transition fold, NULL semantics, group emptying, and
parity with a full recompute after every refresh."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.aggview import (
    create_distinct_view,
    refresh_distinct_view,
)
from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("g", T.StringType()),
    T.StructField("v", T.StringType()),
])


def _upstream(spark, tmp_path, rows):
    t = LakeTable.create(
        spark, str(tmp_path / "up"), schema=SCHEMA, key_cols=["k"],
        bucket_col="k", num_buckets=4,
    )
    t.overwrite(spark.createDataFrame(rows, SCHEMA))
    return t


def _apply(t, rows, lsn0):
    df = t.spark.createDataFrame(
        [(k, g, v, op, lsn0 + i) for i, (k, g, v, op) in enumerate(rows)],
        "k long, g string, v string, op string, lsn long",
    )
    merge_into(t, df, op_col="op", order_col="lsn", mode="mor",
               lineage={"batch_id": f"b{lsn0}", "rows": len(rows),
                        "bytes": 0, "shard_lsns": {0: lsn0 + len(rows)}})


def _expected(t):
    return {
        (r.g,): r.nd
        for r in t.read().filter(F.col("v").isNotNull())
        .groupBy("g").agg(F.count_distinct("v").alias("nd")).collect()
    }


def _view_state(view):
    return {(r.g,): r.n_distinct_v for r in view.read().collect()}


def test_distinct_view_transitions(spark, tmp_path):
    # ballast keeps the support churn ratio low so the cost-based refresh
    # provably takes the INCREMENTAL (changelog ±1) path
    ballast = [(100 + i, "c", f"c{i}") for i in range(40)]
    up = _upstream(spark, tmp_path, [
        (1, "a", "x"), (2, "a", "y"), (3, "a", "x"),   # a: {x,y} = 2
        (4, "b", "z"), (5, "b", None),                  # b: {z} = 1 (NULL out)
        *ballast,
    ])
    view = create_distinct_view(up, str(tmp_path / "dv"), ["g"], "v",
                                num_buckets=4)
    assert _view_state(view) == {("a",): 2, ("b",): 1, ("c",): 40}

    # +new value, duplicate value (no-op), retract non-last copy (no-op)
    _apply(up, [
        (6, "a", "w", "insert"),     # a gains w -> 3
        (7, "b", "z", "insert"),     # duplicate z -> still 1
        (1, None, None, "delete"),   # a loses ONE x copy (k=3 keeps it)
    ], lsn0=100)
    r = refresh_distinct_view(up, view)
    assert r["applied"] and r.get("mode") != "recompute"
    assert r["support"]["mode"] == "incremental"
    assert _view_state(view) == _expected(up) == {
        ("a",): 3, ("b",): 1, ("c",): 40}

    # retract LAST copy, value-change update, group emptying
    _apply(up, [
        (3, None, None, "delete"),   # last x gone -> a loses x
        (2, "a", "w", "insert"),     # y -> w (dup): a loses y
        (4, None, None, "delete"),   # z gone...
        (7, None, None, "delete"),   # ...fully: b has only the NULL row
    ], lsn0=200)
    refresh_distinct_view(up, view)
    assert _view_state(view) == _expected(up) == {("a",): 1, ("c",): 40}
    assert ("b",) not in _view_state(view)  # emptied group row deleted

    # NULL -> value: b reappears
    _apply(up, [(5, "b", "q", "insert")], lsn0=300)
    refresh_distinct_view(up, view)
    assert _view_state(view) == _expected(up) == {
        ("a",): 1, ("b",): 1, ("c",): 40}


def test_distinct_view_recompute_fallback(spark, tmp_path):
    """Total-churn batches push the SUPPORT refresh into its recompute
    regime (an overwrite commit with no changelog) — the distinct view
    must mirror the decision and recompute from support state."""
    up = _upstream(spark, tmp_path, [(1, "a", "x"), (2, "a", "y")])
    view = create_distinct_view(up, str(tmp_path / "dv"), ["g"], "v")
    _apply(up, [
        (1, "a", "z", "insert"), (2, "b", "z", "insert"),
        (3, "b", "w", "insert"),
    ], lsn0=100)
    r = refresh_distinct_view(up, view)
    assert r["applied"] and r["mode"] == "recompute"
    assert _view_state(view) == _expected(up) == {("a",): 1, ("b",): 2}


def test_distinct_view_noop_and_watermark(spark, tmp_path):
    up = _upstream(spark, tmp_path, [(1, "a", "x")])
    view = create_distinct_view(up, str(tmp_path / "dv"), ["g"], "v")
    r0 = refresh_distinct_view(up, view)
    assert not r0["applied"]  # nothing new anywhere

    # an upstream change with NO distinct transition (duplicate value):
    # the merge is empty but the watermark must still advance
    _apply(up, [(9, "a", "x", "insert")], lsn0=100)
    r1 = refresh_distinct_view(up, view)
    assert r1["applied"] and r1.get("groups", 0) == 0
    assert _view_state(view) == {("a",): 1}
    r2 = refresh_distinct_view(up, view)
    assert not r2["applied"]  # watermark advanced despite the empty merge


def test_distinct_view_validation(spark, tmp_path):
    up = _upstream(spark, tmp_path, [(1, "a", "x")])
    with pytest.raises(ValueError, match="both a dim"):
        create_distinct_view(up, str(tmp_path / "dv"), ["v"], "v")
    view = create_distinct_view(up, str(tmp_path / "dv2"), ["g"], "v")
    with pytest.raises(ValueError, match="no distinct-view spec"):
        refresh_distinct_view(up, up)
    with pytest.raises(FileExistsError):
        create_distinct_view(up, str(tmp_path / "dv2"), ["g"], "v")
    assert view.manifest().properties.get("distinctview_spec")
