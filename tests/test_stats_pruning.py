"""File-level zone maps + manifest predicate pruning (Iceberg
lower_bounds/upper_bounds + data-skipping analogue).

Correctness contract under test: read(where=...) ALWAYS equals
read().filter(pred) — pruning may only skip files whose min/max prove no
match.  MOR rule: key predicates skip any file; non-key predicates skip
BASE files (base rows always lose LWW to deltas) but never DELTA files
(skipping the file with a key's newest version would resurrect stale
state), and pdelta selections restrict to key predicates entirely (the
column-wise fold preserves values from base rows).
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import (
    LakeTable,
    _file_may_match,
    _trunc_lower,
    _trunc_upper,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
        T.StructField("s", T.StringType()),
    ]
)


def _mk(spark, tmp_path, rows, num_buckets=4):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema=SCHEMA, key_cols=["k"],
        bucket_col="k", num_buckets=num_buckets,
    )
    t.overwrite(spark.createDataFrame([Row(**r) for r in rows], SCHEMA))
    return t


# ------------------------------------------------------------- unit: bounds
def test_trunc_lower_and_upper():
    assert _trunc_lower("abc", 64) == "abc"
    long = "a" * 100
    assert _trunc_lower(long, 64) == "a" * 64
    up = _trunc_upper(long, 64)
    assert up == "a" * 63 + "b"
    assert up > long  # a valid upper bound for the full string
    assert _trunc_upper("xyz", 64) == "xyz"
    # un-incrementable prefix → unbounded above
    assert _trunc_upper(chr(0x10FFFF) * 70, 64) is None


@pytest.mark.parametrize(
    "stats,preds,keep",
    [
        ({"k": [10, 20]}, [("k", "=", 15)], True),
        ({"k": [10, 20]}, [("k", "=", 21)], False),
        ({"k": [10, 20]}, [("k", "<", 10)], False),
        ({"k": [10, 20]}, [("k", "<=", 10)], True),
        ({"k": [10, 20]}, [("k", ">", 20)], False),
        ({"k": [10, 20]}, [("k", ">=", 20)], True),
        ({"k": [10, 20]}, [("k", "in", [1, 2, 15])], True),
        ({"k": [10, 20]}, [("k", "in", [1, 2])], False),
        ({"k": [10, 20]}, [("k", "between", (21, 30))], False),
        ({"k": [10, 20]}, [("k", "between", (20, 30))], True),
        # conjunction: any disproved side kills the file
        ({"k": [10, 20], "v": [0, 5]}, [("k", "=", 15), ("v", ">", 5)], False),
        # missing column stats → keep
        ({"k": [10, 20]}, [("v", "=", 99)], True),
        (None, [("k", "=", 1)], True),
        # half-open bounds (None = unbounded)
        ({"s": ["a", None]}, [("s", ">", "zzz")], True),
        ({"s": ["a", None]}, [("s", "<", "a")], False),
        ({"s": [None, "m"]}, [("s", ">", "m")], False),
        # cross-type comparison falls back to keep
        ({"k": ["a", "b"]}, [("k", "=", 5)], True),
    ],
)
def test_file_may_match(stats, preds, keep):
    assert _file_may_match(stats, preds) is keep


# ------------------------------------------------- stats recorded at commit
def test_stats_recorded_in_manifest(spark, tmp_path):
    rows = [{"k": i, "v": i * 10, "s": f"s{i:03d}"} for i in range(100)]
    t = _mk(spark, tmp_path, rows)
    m = t.manifest()
    entries = [e for es in m.files.values() for e in es]
    assert entries
    for e in entries:
        assert len(e) > 5, "entry missing stats element"
        st = e[5]
        assert set(st) >= {"k", "v", "s"}
        lo, hi = st["k"]
        assert 0 <= lo <= hi <= 99
    # global min/max across files must cover the data
    los = [e[5]["k"][0] for e in entries]
    his = [e[5]["k"][1] for e in entries]
    assert min(los) == 0 and max(his) == 99


def test_stats_survive_json_roundtrip(spark, tmp_path):
    t = _mk(spark, tmp_path, [{"k": 1, "v": 2, "s": "x" * 200}])
    m = t.manifest()  # re-read from disk: JSON round trip
    e = [e for es in m.files.values() for e in es][0]
    lo, hi = e[5]["s"]
    assert lo == "x" * 64
    assert hi == "x" * 63 + "y"


# ----------------------------------------------------- pruning: plan + value
def test_scan_plan_skips_files(spark, tmp_path):
    # one file per bucket, keys 0..99 → a point lookup keeps few files
    rows = [{"k": i, "v": i, "s": str(i)} for i in range(100)]
    t = _mk(spark, tmp_path, rows, num_buckets=8)
    plan = t.scan_plan(where=[("k", "=", 7)])
    # k is the bucket column: driver-side bucket derivation confines the
    # candidate set to one bucket before zone maps even run
    assert plan["buckets_derived"] is not None
    assert plan["files_total"] == 1
    assert plan["files_kept"] == 1
    # a range predicate can't derive buckets — zone maps do the skipping
    plan = t.scan_plan(where=[("k", "between", (7, 9))])
    assert plan["buckets_derived"] is None
    assert plan["files_total"] == 8
    assert plan["files_skipped"] > 0
    assert plan["files_kept"] >= 1
    # unfiltered plan keeps everything
    assert t.scan_plan()["files_kept"] == 8


def test_read_where_equals_filter(spark, tmp_path):
    rows = [{"k": i, "v": i % 7, "s": f"s{i:02d}"} for i in range(60)]
    t = _mk(spark, tmp_path, rows, num_buckets=8)
    for where, expr in [
        ([("k", "between", (10, 20))], F.col("k").between(10, 20)),
        ([("v", "=", 3)], F.col("v") == 3),
        ([("s", ">=", "s50")], F.col("s") >= "s50"),
        ([("k", "in", [1, 2, 59])], F.col("k").isin([1, 2, 59])),
    ]:
        got = sorted(tuple(r) for r in t.read(where=where).collect())
        want = sorted(tuple(r) for r in t.read().filter(expr).collect())
        assert got == want, where


def test_mor_nonkey_pruning_skips_base_never_deltas(spark, tmp_path):
    """Refined MOR pruning rule (Iceberg's: data predicates prune data
    files, never delete files).  Base rows always lose the LWW
    reconstruction to any delta row of their key (__lsn=-1), so non-key
    predicates may skip BASE files; DELTA files are never non-key-skipped.
    The stale-resurrection trap stays closed: base has (k=1, v=100), a MOR
    delta updates it to v=999 — read(where v=100) must be empty."""
    t = _mk(spark, tmp_path, [{"k": 1, "v": 100, "s": "a"},
                              {"k": 2, "v": 200, "s": "b"}])
    upd = t.spark.createDataFrame(
        [Row(k=1, v=999, s="a2", lsn=10, op="insert")],
    )
    merge_into(t, upd, op_col="op", order_col="lsn", mode="mor",
               bucket_deltas=True)
    m = t.manifest()
    n_delta = sum(1 for es in m.files.values() for e in es
                  if len(e) > 2 and e[2] == "delta")
    assert n_delta >= 1
    plan = t.scan_plan(where=[("v", "=", 100)])
    assert plan["any_delta"] is True
    assert plan["preds_used"] == 1
    # the (k=2, v=200) base file is skipped; every delta file is kept
    assert plan["files_skipped"] >= 1
    assert plan["files_kept"] >= n_delta + 1  # deltas + the v=100 base file
    assert t.read(where=[("v", "=", 100)]).count() == 0  # no resurrection
    # key predicates still prune with deltas live, and stay exact
    assert t.read(where=[("k", "=", 1)]).collect()[0]["v"] == 999
    # after compaction the non-key predicate both prunes and is exact
    t.compact()
    plan2 = t.scan_plan(where=[("v", "=", 100)])
    assert plan2["any_delta"] is False
    assert plan2["preds_used"] == 1
    assert t.read(where=[("v", "=", 100)]).count() == 0
    assert t.read(where=[("v", "=", 999)]).collect()[0]["k"] == 1


def test_mor_multi_delta_stale_trap_stays_closed(spark, tmp_path):
    """The trap the delta rule exists for: two delta versions of one key —
    lsn 5 sets v=100, lsn 10 sets v=999.  Pruning with v=100 must keep the
    lsn-10 delta file (else reconstruction resurrects the lsn-5 row)."""
    t = _mk(spark, tmp_path, [{"k": 1, "v": 1, "s": "a"}])
    for lsn, v in ((5, 100), (10, 999)):
        merge_into(
            t,
            t.spark.createDataFrame([Row(k=1, v=v, s="x", lsn=lsn,
                                         op="insert")]),
            op_col="op", order_col="lsn", mode="mor", bucket_deltas=True,
        )
    assert t.read(where=[("v", "=", 100)]).count() == 0
    assert t.read(where=[("v", "=", 999)]).collect()[0]["k"] == 1


def test_pdelta_blocks_nonkey_base_pruning(spark, tmp_path):
    """Partial-update (pdelta) folds COLUMN-WISE from the base row, so base
    files are LWW-sensitive there: only key predicates may skip.  Base has
    (k=1, v=100, s='a'); a pdelta patches only s.  Pruning v=999 must not
    skip the base file — the fold needs its preserved v."""
    t = _mk(spark, tmp_path, [{"k": 1, "v": 100, "s": "a"},
                              {"k": 2, "v": 200, "s": "b"}])
    patch = t.spark.createDataFrame([Row(k=1, s="patched", lsn=10,
                                         op="insert")])
    merge_into(t, patch, op_col="op", order_col="lsn", mode="mor",
               partial_update=True, bucket_deltas=True)
    plan = t.scan_plan(where=[("v", "=", 100)])
    assert plan["preds_used"] == 0  # non-key pred unusable with pdelta live
    assert plan["files_skipped"] == 0
    row = t.read(where=[("v", "=", 100)]).collect()
    assert len(row) == 1 and row[0]["s"] == "patched"


def test_where_validates_ops(spark, tmp_path):
    t = _mk(spark, tmp_path, [{"k": 1, "v": 1, "s": "a"}])
    with pytest.raises(ValueError, match="unsupported predicate op"):
        t.read(where=[("k", "!=", 1)])


def test_sorted_compaction_clusters_files(spark, tmp_path):
    """compact(sort_cols=...) (Iceberg rewrite with SORT ORDER) produces
    range-clustered files whose zone maps make key-range predicates
    selective — hash-bucketed layout alone cannot (every bucket spans the
    whole key range)."""
    rows = [{"k": i, "v": i * 10, "s": f"s{i}"} for i in range(400)]
    t = _mk(spark, tmp_path, rows, num_buckets=4)
    # unsorted layout: a narrow k-range prunes nothing (each bucket file
    # holds hash-scattered keys spanning ~the whole range)
    base_plan = t.scan_plan(where=[("k", "between", (10, 30))])
    assert base_plan["files_skipped"] == 0
    t.compact(files_per_bucket=4, sort_cols=["k"])
    m = t.manifest()
    assert m.operation == "compact"
    plan = t.scan_plan(where=[("k", "between", (10, 30))])
    assert plan["files_skipped"] > 0
    # pruned read stays exact
    got = sorted(
        r["k"] for r in t.read(where=[("k", "between", (10, 30))]).collect()
    )
    assert got == list(range(10, 31))
    # rows survive the rewrite intact
    assert t.read().count() == 400


def test_zorder_compaction_prunes_on_both_columns(spark, tmp_path):
    """compact(zorder_cols=[a,b]) (Iceberg/Delta ZORDER analogue):
    interleaved-bit clustering keeps BOTH columns' zone maps narrow, so a
    predicate on either column alone skips files — lexicographic sort on
    [k, v] would leave v spanning its whole domain in every file."""
    import random
    rng = random.Random(7)
    rows = [
        {"k": i, "v": rng.randrange(0, 1000), "s": f"s{i}"}
        for i in range(800)
    ]
    t = _mk(spark, tmp_path, rows, num_buckets=4)
    t.compact(files_per_bucket=8, zorder_cols=["k", "v"])
    assert t.manifest().operation == "compact"
    plan_k = t.scan_plan(where=[("k", "between", (100, 160))])
    plan_v = t.scan_plan(where=[("v", "between", (100, 160))])
    assert plan_k["files_skipped"] > 0, plan_k
    assert plan_v["files_skipped"] > 0, plan_v
    # pruned reads stay exact (residual filter applied after skipping)
    got_k = sorted(
        r["k"] for r in t.read(where=[("k", "between", (100, 160))]).collect()
    )
    assert got_k == list(range(100, 161))
    expect_v = sorted(r["k"] for r in rows if 100 <= r["v"] <= 160)
    got_v = sorted(
        r["k"] for r in t.read(where=[("v", "between", (100, 160))]).collect()
    )
    assert got_v == expect_v
    assert t.read().count() == 800


def test_zorder_string_column_equality_locality(spark, tmp_path):
    """String columns rank by hash in the z-key: equal values co-locate, so
    equality predicates benefit; exactness is unconditional."""
    rows = [
        {"k": i, "v": i, "s": f"cat{i % 5}"} for i in range(400)
    ]
    t = _mk(spark, tmp_path, rows, num_buckets=4)
    t.compact(files_per_bucket=8, zorder_cols=["k", "s"])
    got = sorted(
        r["k"] for r in t.read(where=[("s", "=", "cat3")]).collect()
    )
    assert got == [i for i in range(400) if i % 5 == 3]


def test_compact_rejects_sort_and_zorder_together(spark, tmp_path):
    t = _mk(spark, tmp_path, [{"k": 1, "v": 1, "s": "a"}])
    with pytest.raises(ValueError, match="not both"):
        t.compact(sort_cols=["k"], zorder_cols=["v"])
