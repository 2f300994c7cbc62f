"""Property-based CDC correctness: random op sequences (hypothesis) applied
through the real engine must equal the pure-Python fold — including
adversarial patterns (delete-then-reinsert, repeated touches, updates to
deleted keys, arbitrary batch boundaries)."""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.cdc.apply import CdcApplier
from datax_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("op", T.StringType()),
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)

ops_strategy = st.lists(
    st.tuples(
        st.sampled_from(["insert", "update", "delete"]),
        st.integers(0, 6),               # key — small domain forces collisions
        st.text(min_size=0, max_size=8),  # value
    ),
    min_size=1,
    max_size=40,
)


def pure_fold(events):
    state = {}
    for lsn, (op, k, v) in enumerate(events):
        if op == "delete":
            state.pop(k, None)
        else:
            state[k] = v
    return state


@given(events=ops_strategy, batch_size=st.integers(1, 15))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
def test_engine_matches_fold_for_random_sequences(
    spark, tmp_path_factory, events, batch_size
):
    tmp = tmp_path_factory.mktemp("prop")
    rows = [
        (lsn, k % 3, None, op, k, v) for lsn, (op, k, v) in enumerate(events)
    ]
    feed = spark.createDataFrame(rows, SCHEMA)
    table = LakeTable.create(
        spark, str(tmp / "t"),
        schema=T.StructType(
            [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
        ),
        key_cols=["k"],
        num_buckets=4,
    )
    applier = CdcApplier(table, dedup_batch=False, auto_compact=2)
    for b in range(0, len(rows), batch_size):
        batch = feed.filter(
            (F.col("lsn") >= b) & (F.col("lsn") < b + batch_size)
        )
        applier.apply_batch(batch, b)

    expected = pure_fold(events)
    got = {r.k: r.v for r in table.read().collect()}
    assert got == expected
    # sha-level parity (the BASELINE invariant, on the tiny domain)
    for k, v in expected.items():
        assert hashlib.sha256((got[k] or "").encode()).hexdigest() == \
            hashlib.sha256((v or "").encode()).hexdigest()

@given(events=ops_strategy, batch_size=st.integers(1, 15))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
def test_cow_file_scoping_matches_fold_on_clustered_table(
    spark, tmp_path_factory, events, batch_size
):
    """Random op sequences through COW merges over a table kept
    sort-CLUSTERED between batches (multi-file buckets with narrow key
    ranges — the regime where the file-scoped rewrite actually keeps
    files).  String keys exercise the truncated string zone maps."""
    from datax_spark.lake.merge import merge_into

    tmp = tmp_path_factory.mktemp("propc")
    # string keys, single bucket, several files per bucket: the keep pass
    # decides purely on zone maps
    table = LakeTable.create(
        spark, str(tmp / "t"),
        schema=T.StructType(
            [T.StructField("k", T.StringType()),
             T.StructField("v", T.StringType())]
        ),
        key_cols=["k"],
        num_buckets=1,
    )
    # a wide pre-existing key space so most files are disjoint from the
    # batch's box
    base_rows = [(f"key{j:04d}", f"base{j}") for j in range(200)]
    table.overwrite(spark.createDataFrame(base_rows, "k string, v string"))
    table.compact(sort_cols=["k"], files_per_bucket=5)

    state = dict(base_rows)
    rows = [
        (lsn, f"key{k:04d}", v, op)
        for lsn, (op, k, v) in enumerate(events)
    ]
    for b in range(0, len(rows), batch_size):
        chunk = rows[b:b + batch_size]
        batch = spark.createDataFrame(
            chunk, "lsn long, k string, v string, op string"
        )
        merge_into(table, batch, op_col="op", order_col="lsn", mode="cow")
        for lsn, k, v, op in chunk:
            if op == "delete":
                state.pop(k, None)
            else:
                state[k] = v
    got = {r.k: r.v for r in table.read().collect()}
    assert got == state
