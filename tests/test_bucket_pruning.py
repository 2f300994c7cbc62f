"""Driver-side bucket derivation for point lookups (Iceberg bucket-transform
partition-pruning analogue).

Two contracts:
1. lake/hashing.py is BIT-IDENTICAL to Spark's F.hash() for int/long/string
   (including NULL and multi-byte UTF-8) — pinned here against the JVM.
2. read(where=[(bucket_col, "=", v)]) equals read().filter(...) while
   scan_plan shows the scan confined to the derived bucket (plus L0), and
   every unsafe case (non-key bucket col, widened bucket-col type,
   unmirrored type) falls back to no derivation.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake import hashing
from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("v", T.LongType()),
    ]
)


# ------------------------------------------------------- murmur3 JVM parity
@pytest.mark.parametrize(
    "values,dtype,spark_type",
    [
        (
            ["", "a", "hello", "naïve", "日本語テキスト", "🎉emoji🎉",
             "x" * 100, "repo/some/path.py", "tab\tnew\nline", None],
            "string", T.StringType(),
        ),
        (
            [0, 1, -1, 42, 2**62, -(2**62), 2**63 - 1, -(2**63), None],
            "bigint", T.LongType(),
        ),
        (
            [0, 1, -1, 2**31 - 1, -(2**31), 12345, None],
            "int", T.IntegerType(),
        ),
    ],
)
def test_spark_hash_parity(spark, values, dtype, spark_type):
    df = spark.createDataFrame(
        [(v,) for v in values],
        T.StructType([T.StructField("c", spark_type)]),
    )
    got = {r["c"]: r["h"] for r in df.select("c", F.hash("c").alias("h")).collect()}
    for v in values:
        assert hashing.spark_hash(v, dtype) == got[v], (v, dtype)


def test_bucket_of_matches_bucket_expr(spark):
    vals = [f"repo-{i}" for i in range(64)]
    df = spark.createDataFrame([(v,) for v in vals], ["c"])
    got = {
        r["c"]: r["b"]
        for r in df.select(
            "c", F.pmod(F.hash("c"), F.lit(16)).cast("int").alias("b")
        ).collect()
    }
    for v in vals:
        assert hashing.bucket_of(v, "string", 16) == got[v]


def test_unmirrored_type_returns_none():
    assert hashing.spark_hash(1.5, "double") is None
    assert hashing.bucket_of(1.5, "double", 16) is None


# ------------------------------------------------------- pruning behavior
def _mk(spark, tmp_path, num_buckets=8, bucket_col="k", key_cols=None):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema=SCHEMA,
        key_cols=key_cols or ["k"], bucket_col=bucket_col,
        num_buckets=num_buckets,
    )
    rows = [Row(k=f"key-{i}", n=i, v=i * 10) for i in range(200)]
    t.overwrite(spark.createDataFrame(rows, SCHEMA))
    return t


def test_point_lookup_prunes_and_matches(spark, tmp_path):
    t = _mk(spark, tmp_path)
    plan = t.scan_plan(where=[("k", "=", "key-17")])
    b = hashing.bucket_of("key-17", "string", 8)
    assert plan["buckets_derived"] == [b]
    # bucket pruning confines the candidate set before zone maps even run
    full = t.scan_plan()
    assert plan["files_total"] < full["files_total"]
    got = t.read(where=[("k", "=", "key-17")]).collect()
    assert [(r.k, r.n, r.v) for r in got] == [("key-17", 17, 170)]


def test_in_lookup_derives_bucket_union(spark, tmp_path):
    t = _mk(spark, tmp_path)
    keys = ["key-3", "key-99", "key-150"]
    plan = t.scan_plan(where=[("k", "in", keys)])
    want = sorted({hashing.bucket_of(k, "string", 8) for k in keys})
    assert plan["buckets_derived"] == want
    got = sorted(r.k for r in t.read(where=[("k", "in", keys)]).collect())
    assert got == sorted(keys)


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "k string, n long, v long, op string, lsn long"
    )


def test_lookup_sees_l0_delta_updates(spark, tmp_path):
    """The derived-bucket scan must keep L0 deltas: an un-compacted MOR
    update to the looked-up key must win LWW in the lookup result."""
    t = _mk(spark, tmp_path)
    merge_into(t, _batch(spark, [("key-17", 17, 9999, "insert", 1)]),
               op_col="op", order_col="lsn", mode="mor", bucket_deltas=False)
    got = t.read(where=[("k", "=", "key-17")]).collect()
    assert [(r.k, r.v) for r in got] == [("key-17", 9999)]
    # and a key deleted in L0 must not resurrect through the pruned read
    merge_into(t, _batch(spark, [("key-42", 42, 0, "delete", 2)]),
               op_col="op", order_col="lsn", mode="mor", bucket_deltas=False)
    assert t.read(where=[("k", "=", "key-42")]).count() == 0


def test_lookup_sees_bucketed_delta_updates(spark, tmp_path):
    t = _mk(spark, tmp_path)
    merge_into(t, _batch(spark, [("key-17", 17, 7777, "insert", 1)]),
               op_col="op", order_col="lsn", mode="mor", bucket_deltas=True)
    got = t.read(where=[("k", "=", "key-17")]).collect()
    assert [(r.k, r.v) for r in got] == [("key-17", 7777)]


def test_null_value_derives_empty_bucket_set(spark, tmp_path):
    t = _mk(spark, tmp_path)
    plan = t.scan_plan(where=[("k", "=", None)])
    assert plan["buckets_derived"] == []
    assert t.read(where=[("k", "=", None)]).count() == 0  # 3VL: no match


def test_non_key_bucket_col_skips_derivation(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t2"), schema=SCHEMA, key_cols=["k"],
        bucket_col="n", num_buckets=8,
    )
    t.overwrite(
        spark.createDataFrame(
            [Row(k=f"k{i}", n=i, v=i) for i in range(50)], SCHEMA
        )
    )
    plan = t.scan_plan(where=[("n", "=", 7)])
    assert plan["buckets_derived"] is None


def test_widened_bucket_col_type_skips_derivation(spark, tmp_path):
    narrow = T.StructType(
        [T.StructField("k", T.IntegerType()), T.StructField("v", T.LongType())]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "t3"), schema=narrow, key_cols=["k"],
        bucket_col="k", num_buckets=4,
    )
    t.overwrite(
        spark.createDataFrame([Row(k=i, v=i) for i in range(20)], narrow)
    )
    batch = spark.createDataFrame(
        [(2**40, 1, "insert", 1)], "k long, v long, op string, lsn long"
    )
    merge_into(t, batch, op_col="op", order_col="lsn", mode="mor")
    assert t.manifest().schema["k"].dataType.simpleString() == "bigint"
    plan = t.scan_plan(where=[("k", "=", 5)])
    assert plan["buckets_derived"] is None  # old files hashed as int
    got = t.read(where=[("k", "=", 5)]).collect()
    assert [(r.k, r.v) for r in got] == [(5, 5)]


def test_explicit_buckets_win_over_derivation(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = hashing.bucket_of("key-17", "string", 8)
    other = (b + 1) % 8
    plan = t.scan_plan(where=[("k", "=", "key-17")], buckets=[other])
    assert plan["buckets_derived"] is None  # caller's selection respected
