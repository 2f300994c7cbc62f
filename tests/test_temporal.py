"""asof_join / range_join vs brute-force non-equi reference joins.

The reference implementation inside each test is the naive formulation the
operators exist to avoid (per-key max-time subquery / full inequality
join) — Spark executes it as BroadcastNestedLoopJoin, which is fine at
test scale and gives an independent ground truth.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest

from pyspark.sql import functions as F

from datax_spark.functions.temporal import asof_join, range_join

T0 = dt.datetime(2024, 1, 1)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def frames(spark):
    rnd = random.Random(7)
    probes = [
        (i, rnd.randrange(6), _ts(rnd.uniform(0, 3600)))
        for i in range(300)
    ]
    builds = [
        (1000 + i, rnd.randrange(6), _ts(rnd.uniform(-300, 3600)), float(i))
        for i in range(200)
    ]
    left = spark.createDataFrame(probes, "pid long, k long, t timestamp")
    right = spark.createDataFrame(builds, "rid long, k long, t timestamp, v double")
    return left, right


def _brute_asof(left, right, direction="backward", tolerance=None):
    lt, rt = left.alias("l"), right.alias("r")
    if direction == "backward":
        cond = (F.col("l.k") == F.col("r.k")) & (F.col("l.t") >= F.col("r.t"))
        pick = F.max(F.struct("r.t", "r.rid")).alias("m")
    else:
        cond = (F.col("l.k") == F.col("r.k")) & (F.col("l.t") <= F.col("r.t"))
        pick = F.min(F.struct("r.t", "r.rid")).alias("m")
    if tolerance is not None:
        d = F.unix_micros(F.col("l.t")) - F.unix_micros(F.col("r.t"))
        d = d if direction == "backward" else -d
        cond = cond & (d <= int(tolerance * 1_000_000))
    j = lt.join(rt, cond, "left").groupBy("l.pid").agg(pick)
    return {r["pid"]: (r["m"]["rid"] if r["m"] else None) for r in j.collect()}


def test_asof_backward_matches_bruteforce(frames):
    left, right = frames
    got = {
        r["pid"]: r["rid_r"]
        for r in asof_join(
            left, right, on=["k"], left_time="t", right_time="t",
            right_order="rid",
        ).collect()
    }
    assert got == _brute_asof(left, right, "backward")
    assert set(got) == {r["pid"] for r in left.collect()}  # left join: all probes


def test_asof_forward_matches_bruteforce(frames):
    left, right = frames
    got = {
        r["pid"]: r["rid_r"]
        for r in asof_join(
            left, right, on=["k"], left_time="t", right_time="t",
            direction="forward", right_order="rid",
        ).collect()
    }
    assert got == _brute_asof(left, right, "forward")


def test_asof_tolerance_and_inner(frames):
    left, right = frames
    res = asof_join(
        left, right, on=["k"], left_time="t", right_time="t",
        how="inner", tolerance=120.0, right_order="rid",
    ).collect()
    want = {
        p: r
        for p, r in _brute_asof(left, right, "backward", tolerance=120.0).items()
        if r is not None
    }
    assert {r["pid"]: r["rid_r"] for r in res} == want
    for r in res:  # tolerance actually enforced on emitted rows
        assert (r["t"] - r["t_r"]).total_seconds() <= 120.0


def test_asof_equal_timestamp_matches(spark):
    t = _ts(100)
    left = spark.createDataFrame([(1, 0, t)], "pid long, k long, t timestamp")
    right = spark.createDataFrame(
        [(10, 0, t, 1.0), (11, 0, t, 2.0)], "rid long, k long, t timestamp, v double"
    )
    row = asof_join(
        left, right, on=["k"], left_time="t", right_time="t", right_order="rid"
    ).collect()[0]
    assert row["rid_r"] == 11  # backward tie → max (t, right_order)
    fwd = asof_join(
        left, right, on=["k"], left_time="t", right_time="t",
        direction="forward", right_order="rid",
    ).collect()[0]
    assert fwd["rid_r"] == 10  # forward tie → min (t, right_order)


def test_asof_no_python_rows(frames):
    left, right = frames
    plan = asof_join(
        left, right, on=["k"], left_time="t", right_time="t"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


@pytest.fixture(scope="module")
def interval_frames(spark):
    rnd = random.Random(11)
    points = [(i, rnd.randrange(3), _ts(rnd.uniform(0, 3600))) for i in range(400)]
    ivs = []
    for i in range(120):
        s = rnd.uniform(-100, 3500)
        ivs.append((2000 + i, rnd.randrange(3), _ts(s), _ts(s + rnd.uniform(1, 900))))
    left = spark.createDataFrame(points, "pid long, k long, t timestamp")
    right = spark.createDataFrame(ivs, "iid long, k long, s timestamp, e timestamp")
    return left, right


def _brute_range(left, right, on_k: bool, closed="left"):
    lt, rt = left.alias("l"), right.alias("r")
    upper = (
        F.col("l.t") <= F.col("r.e") if closed == "both" else F.col("l.t") < F.col("r.e")
    )
    cond = (F.col("l.t") >= F.col("r.s")) & upper
    if on_k:
        cond = cond & (F.col("l.k") == F.col("r.k"))
    return {
        (r["pid"], r["iid"])
        for r in lt.join(rt, cond, "inner").select("l.pid", "r.iid").collect()
    }


@pytest.mark.parametrize("band", [30.0, 300.0, 5000.0])
def test_range_join_matches_bruteforce_over_band_widths(interval_frames, band):
    left, right = interval_frames
    got = {
        (r["pid"], r["iid"])
        for r in range_join(
            left, right, "t", "s", "e", on=["k"], band_width=band
        ).collect()
    }
    assert got == _brute_range(left, right, on_k=True)


def test_range_join_no_keys_and_left_outer(interval_frames):
    left, right = interval_frames
    want = _brute_range(left, right, on_k=False)
    rows = range_join(left, right, "t", "s", "e", band_width=600.0, how="left").collect()
    got = {(r["pid"], r["iid"]) for r in rows if r["iid"] is not None}
    assert got == want
    matched_pids = {p for p, _ in want}
    unmatched = {r["pid"] for r in rows if r["iid"] is None}
    assert unmatched == {r["pid"] for r in left.collect()} - matched_pids


def test_range_join_closed_both_boundary(spark):
    left = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(10)), (3, _ts(5))], "pid long, t timestamp"
    )
    right = spark.createDataFrame([(7, _ts(0), _ts(10))], "iid long, s timestamp, e timestamp")
    inner = range_join(left, right, "t", "s", "e", band_width=4.0)
    assert {r["pid"] for r in inner.collect()} == {1, 3}  # end exclusive
    both = range_join(left, right, "t", "s", "e", band_width=4.0, closed="both")
    assert {r["pid"] for r in both.collect()} == {1, 2, 3}


def test_range_join_numeric_columns(spark):
    left = spark.createDataFrame([(1, 5.0), (2, 17.0)], "pid long, x double")
    right = spark.createDataFrame(
        [(7, 0.0, 10.0), (8, 15.0, 16.0)], "iid long, s double, e double"
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(left, right, "x", "s", "e", band_width=3.0).collect()
    }
    assert got == {(1, 7)}


def test_temporal_table_join_against_lake_history(spark, tmp_path):
    """Facts see the dimension state as of their LSN at commit granularity:
    earlier commits' winners, deletes → NULL values, unmatched → no row
    history."""
    from pyspark.sql import Row
    from pyspark.sql import types as T

    from datax_spark.functions.temporal import temporal_table_join
    from datax_spark.lake.merge import merge_into
    from datax_spark.lake.table import LakeTable

    dim = LakeTable.create(
        spark, str(tmp_path / "dim"),
        schema=T.StructType([T.StructField("k", T.LongType()),
                             T.StructField("name", T.StringType())]),
        key_cols=["k"], bucket_col="k", num_buckets=4,
    )

    def bump(rows):
        df = spark.createDataFrame(
            [Row(k=k, name=n, lsn=lsn, op=op) for (k, n, lsn, op) in rows],
            "k long, name string, lsn long, op string",
        )
        merge_into(dim, df, op_col="op", order_col="lsn", mode="mor",
                   auto_compact=None)

    bump([(1, "x", 5, "insert"), (2, "y", 6, "insert")])
    bump([(1, "x2", 10, "insert"), (2, None, 12, "delete")])
    bump([(2, "z", 20, "insert")])

    facts = spark.createDataFrame(
        [(100, 1, 4), (101, 1, 5), (102, 1, 9), (103, 1, 15),
         (104, 2, 11), (105, 2, 13), (106, 2, 25), (107, 3, 9)],
        "fid long, k long, at long",
    )
    got = {
        r["fid"]: (r["name_dim"], r["_asof_lsn"], r["_asof_live"])
        for r in temporal_table_join(facts, dim, on=["k"], fact_order="at")
        .collect()
    }
    assert got == {
        100: (None, None, False),      # before any history
        101: ("x", 5, True),           # equal LSN matches
        102: ("x", 5, True),           # next commit's winner is at 10 > 9
        103: ("x2", 10, True),
        104: ("y", 6, True),
        105: (None, 12, False),        # deleted as of 12 — matched, not live
        106: ("z", 20, True),
        107: (None, None, False),      # key never existed
    }
    inner = temporal_table_join(facts, dim, on=["k"], fact_order="at",
                                how="inner")
    assert {r["fid"] for r in inner.collect()} == {101, 102, 103, 104, 105, 106}

    # from_version > 0: the snapshot seeds base state at LSN -1, so keys
    # unchanged since then still enrich (instead of reading never-existed)
    seeded = {
        r["fid"]: (r["name_dim"], r["_asof_lsn"], r["_asof_live"])
        for r in temporal_table_join(
            facts, dim, on=["k"], fact_order="at", from_version=2,
        ).collect()
    }
    # at v2 the snapshot is {1: x2, 2: deleted}; only commit 3 (k=2→z at
    # lsn 20) remains as changelog history
    assert seeded[100] == ("x2", -1, True)   # base state, even pre-history
    assert seeded[103] == ("x2", -1, True)
    assert seeded[106] == ("z", 20, True)
    assert seeded[104] == (None, None, False)  # k=2 absent from v2 base


def test_range_join_rejects_bad_args(interval_frames):
    left, right = interval_frames
    with pytest.raises(ValueError):
        range_join(left, right, "t", "s", "e")  # no band width
    with pytest.raises(ValueError):
        range_join(left, right, "t", "s", "e", band_width=600.0, how="full")


def test_asof_tie_break_keeps_native_type(spark):
    """String and >2^53 int64 right_order columns must break ties in their
    native type — the old double cast nulled strings (arbitrary winner)
    and rounded big longs."""
    t = _ts(100)
    left = spark.createDataFrame([(1, 0, t)], "pid long, k long, t timestamp")
    big = 2**60
    right_str = spark.createDataFrame(
        [("alpha", 0, t), ("beta", 0, t)], "tag string, k long, t timestamp"
    )
    row = asof_join(
        left, right_str, on=["k"], left_time="t", right_time="t",
        right_order="tag",
    ).collect()[0]
    assert row["tag_r"] == "beta"  # lexicographic max, not arbitrary
    right_big = spark.createDataFrame(
        [(big + 1, 0, t), (big + 2, 0, t)], "rid long, k long, t timestamp"
    )
    row = asof_join(
        left, right_big, on=["k"], left_time="t", right_time="t",
        right_order="rid",
    ).collect()[0]
    assert row["rid_r"] == big + 2  # exact — double would collapse the tie


def test_asof_non_orderable_right_order_raises(spark):
    t = _ts(100)
    left = spark.createDataFrame([(1, 0, t)], "pid long, k long, t timestamp")
    right = spark.createDataFrame(
        [([1, 2], 0, t)], "arr array<long>, k long, t timestamp"
    )
    with pytest.raises(ValueError, match="non-orderable"):
        asof_join(left, right, on=["k"], left_time="t", right_time="t",
                  right_order="arr")
