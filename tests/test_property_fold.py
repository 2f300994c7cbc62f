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