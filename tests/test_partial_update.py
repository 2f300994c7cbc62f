"""partial_update merges — DataX writeMode=update semantics
(WriterUtil.java:110-167: `INSERT … ON DUPLICATE KEY UPDATE
col=VALUES(col)` over the job's mapped column subset).

Contract: a partial batch SETS the columns it carries (explicit NULLs win)
and preserves the rest; a delete wipes the whole row, so later partial
events rebuild it from only their columns.  All three merge modes must
agree with each other and with a pure-Python fold.
"""

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("c", T.LongType()),
    ]
)
COLS = ["a", "b", "c"]


def _mk(spark, tmp_path, name="t"):
    return LakeTable.create(
        spark, str(tmp_path / name), schema=SCHEMA, key_cols=["k"],
        bucket_col="k", num_buckets=4,
    )


def _apply(table, events, mode, batch_slices, partial=True, **kw):
    """events: list of (k, {col: val} | None(delete), lsn); batch_slices:
    list of (lo, hi) lsn windows, one merge per window."""
    for i, (lo, hi) in enumerate(batch_slices):
        window = [e for e in events if lo <= e[2] <= hi]
        if not window:
            continue
        cols = sorted({c for _, vals, _ in window if vals for c in vals})
        rows = [
            Row(
                k=k,
                **{c: (vals or {}).get(c) for c in cols},
                op="delete" if vals is None else "upsert",
                lsn=lsn,
                present=sorted(vals) if vals is not None else None,
            )
            for k, vals, lsn in window
        ]
        fields = [T.StructField("k", T.LongType())] + [
            SCHEMA[c] for c in cols
        ] + [
            T.StructField("op", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("present", T.ArrayType(T.StringType())),
        ]
        df = table.spark.createDataFrame(rows, T.StructType(fields))
        merge_into(
            table, df, op_col="op", order_col="lsn",
            lineage={"batch_id": i, "rows": len(rows), "bytes": 0},
            mode=mode, auto_compact=None, partial_update=partial,
            present_col="present", **kw,
        )


def _fold(events):
    """Pure-Python oracle for the partial fold."""
    state: dict = {}
    for k, vals, _ in sorted(events, key=lambda e: e[2]):
        if vals is None:
            state.pop(k, None)
        else:
            row = state.setdefault(k, {c: None for c in COLS})
            row.update(vals)
    return {
        k: tuple(row[c] for c in COLS) for k, row in state.items()
    }


def _state(table):
    return {
        r.k: (r.a, r.b, r.c) for r in table.read().collect()
    }


EVENTS = [
    # full insert, then partial updates on disjoint subsets
    (1, {"a": 1, "b": "x", "c": 10}, 0),
    (1, {"a": 2}, 5),              # preserves b, c
    (1, {"b": None}, 6),           # explicit NULL wins for b; a, c kept
    # delete then partial rebuild: uncovered columns must stay NULL
    (2, {"a": 7, "b": "y", "c": 70}, 1),
    (2, None, 8),
    (2, {"c": 99}, 9),             # row = (None, None, 99)
    # delete as the LAST event: key gone
    (3, {"a": 3, "b": "z", "c": 30}, 2),
    (3, None, 12),
    # key created by a partial insert (never saw a full row)
    (4, {"b": "new"}, 3),
    # untouched key
    (5, {"a": 5, "b": "five", "c": 50}, 4),
]


@pytest.mark.parametrize("mode", ["mor", "cow", "dv"])
def test_partial_update_fold_all_modes(spark, tmp_path, mode):
    t = _mk(spark, tmp_path, mode)
    # batch boundaries chosen so delete-then-rebuild crosses AND shares
    # batches (k=2's delete+rebuild share a batch; k=3's delete is alone)
    _apply(t, EVENTS, mode, [(0, 4), (5, 9), (10, 12)])
    assert _state(t) == _fold(EVENTS)


def test_partial_mor_compaction_folds_and_clears_pdelta(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply(t, EVENTS, "mor", [(0, 4), (5, 9), (10, 12)])
    assert t.file_stats()["delta_files"] > 0
    before = _state(t)
    t.compact()
    assert t.file_stats()["delta_files"] == 0
    assert _state(t) == before == _fold(EVENTS)


def test_partial_and_whole_row_batches_interleave(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # whole-row insert (replace semantics), then a partial update
    full = spark.createDataFrame(
        [Row(k=1, a=1, b="x", c=10, op="upsert", lsn=0)]
    )
    merge_into(t, full, op_col="op", order_col="lsn",
               lineage={"batch_id": 100, "rows": 1, "bytes": 0}, mode="mor",
               auto_compact=None)
    part = spark.createDataFrame([Row(k=1, a=2, op="upsert", lsn=1)])
    merge_into(t, part, op_col="op", order_col="lsn",
               lineage={"batch_id": 101, "rows": 1, "bytes": 0}, mode="mor",
               auto_compact=None, partial_update=True)
    assert _state(t) == {1: (2, "x", 10)}
    # a later WHOLE-row upsert replaces everything (default semantics kept)
    full2 = spark.createDataFrame([Row(k=1, a=9, op="upsert", lsn=2)])
    merge_into(t, full2, op_col="op", order_col="lsn",
               lineage={"batch_id": 102, "rows": 1, "bytes": 0}, mode="mor",
               auto_compact=None)
    assert _state(t) == {1: (9, None, None)}


def test_partial_schema_evolution_adds_column(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply(t, [(1, {"a": 1, "b": "x", "c": 10}, 0)], "mor", [(0, 0)])
    new = spark.createDataFrame([Row(k=1, d=5, op="upsert", lsn=1)])
    merge_into(t, new, op_col="op", order_col="lsn",
               lineage={"batch_id": 7, "rows": 1, "bytes": 0}, mode="mor",
               auto_compact=None, partial_update=True)
    row = t.read().collect()[0]
    assert (row.a, row.b, row.c, row.d) == (1, "x", 10, 5)


def test_partial_requires_order_col(spark, tmp_path):
    t = _mk(spark, tmp_path)
    df = spark.createDataFrame([Row(k=1, a=1, op="upsert")])
    with pytest.raises(ValueError, match="partial_update requires"):
        merge_into(t, df, op_col="op", order_col=None, mode="cow",
                   partial_update=True)


def test_changelog_refuses_pdelta_commits(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _apply(t, [(1, {"a": 1}, 0)], "mor", [(0, 0)])
    with pytest.raises(ValueError, match="partial-update"):
        t.read_changes(0).count()
    assert t.read_changes(0, on_rewrite="skip").count() == 0
    t.compact()  # folds to whole rows; changelog works past the rewrite...
    with pytest.raises(ValueError):
        t.read_changes(0)  # ...but the pdelta commit still blocks "error"


def test_partial_randomized_vs_python_fold(spark, tmp_path):
    rng = random.Random(7)
    events = []
    for lsn in range(120):
        k = rng.randrange(8)
        if rng.random() < 0.15:
            events.append((k, None, lsn))
        else:
            vals = {
                c: (rng.randrange(100) if c != "b" else f"s{rng.randrange(9)}")
                for c in rng.sample(COLS, rng.randrange(1, 4))
            }
            if rng.random() < 0.2:
                vals[rng.choice(list(vals))] = None  # explicit NULL set
            events.append((k, vals, lsn))
    slices = [(0, 39), (40, 79), (80, 119)]
    t_mor = _mk(spark, tmp_path, "rmor")
    _apply(t_mor, events, "mor", slices)
    t_cow = _mk(spark, tmp_path, "rcow")
    _apply(t_cow, events, "cow", slices)
    expected = _fold(events)
    assert _state(t_mor) == expected
    assert _state(t_cow) == expected


def test_partial_update_through_streaming(spark, tmp_path):
    """partial_update + present_col flow through the streaming runner's
    applier_opts — the Structured Streaming face of writeMode=update."""
    from datax_spark.streaming.runner import run_available_now, write_feed_ordered

    t = _mk(spark, tmp_path, "st")
    # envelope shape the applier expects: lsn, shard, ts, op + payload
    full = [
        Row(lsn=0, shard=0, ts=0.0, op="insert", k=1, a=1, b="x", c=10,
            present=None),
        Row(lsn=1, shard=0, ts=1.0, op="insert", k=2, a=2, b="y", c=20,
            present=None),
    ]
    patch = [
        Row(lsn=2, shard=0, ts=2.0, op="insert", k=1, a=5, b=None, c=None,
            present=["a"]),
        Row(lsn=3, shard=0, ts=3.0, op="delete", k=2, a=None, b=None,
            c=None, present=None),
    ]
    fields = T.StructType(
        [
            T.StructField("lsn", T.LongType()),
            T.StructField("shard", T.LongType()),
            T.StructField("ts", T.DoubleType()),
            T.StructField("op", T.StringType()),
            T.StructField("k", T.LongType()),
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.LongType()),
            T.StructField("present", T.ArrayType(T.StringType())),
        ]
    )
    feed = spark.createDataFrame(full + patch, fields)
    fp = str(tmp_path / "feed")
    write_feed_ordered(feed, fp, n_files=2)
    applied = run_available_now(
        spark, fp, t, max_files_per_trigger=1, auto_compact=None,
        partial_update=True, present_col="present",
    )
    assert sum(l["rows"] for l in applied) == 4
    assert _state(t) == {1: (5, "x", 10)}  # patched a, preserved b/c; k=2 gone
