"""MergeBuilder — Delta/Iceberg-style WHEN-clause MERGE on LakeTable
(lake/merge.py).  Covers clause semantics (first-match-wins, conditions
over s./t. namespaces), defaults (update-all / insert-source), validation,
source-uniqueness enforcement, and state parity with a hand fold."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.merge import merge_builder
from datax_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("qty", T.LongType()),
    T.StructField("note", T.StringType()),
])


def _table(spark, tmp_path, rows):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema=SCHEMA, key_cols=["k"],
        bucket_col="k", num_buckets=4,
    )
    t.overwrite(spark.createDataFrame(rows, SCHEMA))
    return t


def _state(t):
    return {r.k: (r.qty, r.note) for r in t.read().collect()}


def test_merge_builder_full_clause_mix(spark, tmp_path):
    t = _table(spark, tmp_path, [
        (1, 10, "a"), (2, 20, "b"), (3, 30, "c"), (4, 40, "d"),
    ])
    src = spark.createDataFrame(
        [(1, 5, "add"), (2, 0, "del"), (5, 7, "add"), (6, 1, "del"),
         (4, 99, "noop")],
        "k long, amount long, op string",
    )
    n = (
        merge_builder(t, src)
        .when_matched_update(
            set={"qty": "t.qty + s.amount", "note": F.lit("upd")},
            condition="s.op = 'add'")
        .when_matched_delete(condition="s.op = 'del'")
        .when_not_matched_insert(
            values={"qty": "s.amount"}, condition="s.op <> 'del'")
        .execute()
    )
    # 1 update + 1 delete + 1 insert; k=6 fails the insert condition and
    # k=4 matches no clause (op='noop') — both untouched
    assert n == 3
    assert _state(t) == {
        1: (15, "upd"),       # updated: qty += amount, note set
        3: (30, "c"),         # untouched (not in source)
        4: (40, "d"),         # matched, no clause applied
        5: (7, None),         # inserted: qty from values, note NULL
    }


def test_merge_builder_defaults_and_order(spark, tmp_path):
    t = _table(spark, tmp_path, [(1, 10, "a")])
    # whole-row update default + source-columns insert default; clause
    # ORDER matters: the unconditional update shadows the later delete
    src = spark.createDataFrame([(1, 77, "x"), (2, 88, "y")],
                                "k long, qty long, note string")
    n = (
        merge_builder(t, src)
        .when_matched_update()
        .when_matched_delete()
        .when_not_matched_insert()
        .execute()
    )
    assert n == 2
    assert _state(t) == {1: (77, "x"), 2: (88, "y")}
    # reversed priority: delete first wins
    src2 = spark.createDataFrame([(1, 0, "z")], "k long, qty long, note string")
    (
        merge_builder(t, src2)
        .when_matched_delete()
        .when_matched_update()
        .execute()
    )
    assert 1 not in _state(t)


def test_merge_builder_validation(spark, tmp_path):
    t = _table(spark, tmp_path, [(1, 10, "a")])
    src = spark.createDataFrame([(1, 1)], "k long, amount long")
    with pytest.raises(ValueError, match="no WHEN clauses"):
        merge_builder(t, src).execute()
    with pytest.raises(ValueError, match="unknown columns"):
        merge_builder(t, src).when_matched_update(set={"nope": F.lit(1)})
    with pytest.raises(ValueError, match="key columns"):
        merge_builder(t, src).when_matched_update(set={"k": F.lit(1)})
    with pytest.raises(ValueError, match="unknown columns"):
        merge_builder(t, src).when_not_matched_insert(values={"zz": F.lit(1)})
    with pytest.raises(ValueError, match="lacks key columns"):
        merge_builder(t, spark.createDataFrame([(1,)], "x long"))


def test_merge_builder_rejects_dup_source(spark, tmp_path):
    t = _table(spark, tmp_path, [(1, 10, "a")])
    dup = spark.createDataFrame([(1, 1), (1, 2)], "k long, amount long")
    with pytest.raises(ValueError, match="multiple rows per key"):
        merge_builder(t, dup).when_matched_update(
            set={"qty": "s.amount"}).execute()


def test_merge_builder_empty_and_noop(spark, tmp_path):
    t = _table(spark, tmp_path, [(1, 10, "a")])
    v0 = t.current_version()
    empty = spark.createDataFrame([], "k long, amount long")
    n = merge_builder(t, empty).when_matched_delete().execute()
    assert n == 0 and t.current_version() == v0
    # all source rows fail their clause conditions → no commit
    src = spark.createDataFrame([(1, 1)], "k long, amount long")
    n = merge_builder(t, src).when_matched_delete(
        condition=F.lit(False)).execute()
    assert n == 0 and t.current_version() == v0


def test_merge_builder_null_key_matches_null_safe(spark, tmp_path):
    t = _table(spark, tmp_path, [(None, 10, "nul"), (1, 1, "a")])
    src = spark.createDataFrame([(None, 5)], "k long, amount long")
    n = (
        merge_builder(t, src)
        .when_matched_update(set={"qty": "t.qty + s.amount"})
        .execute()
    )
    assert n == 1
    assert _state(t)[None] == (15, "nul")
