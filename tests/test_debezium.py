"""Debezium-envelope normalization → engine apply parity."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.cdc.apply import CdcApplier
from datax_spark.lake.table import LakeTable
from datax_spark.sources import debezium as DBZ

PAYLOAD = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _event(op, lsn, k, v=None, before=None):
    return json.dumps(
        {
            "op": op,
            "before": before,
            "after": {"k": k, "v": v} if op != "d" else None,
            "source": {"lsn": lsn, "ts_ms": 1700000000000 + lsn,
                       "db": "d", "table": "t"},
            "ts_ms": 1700000000500 + lsn,
        }
    )


EVENTS = [
    _event("r", 0, 1, "snap1"),
    _event("c", 1, 2, "two"),
    _event("u", 2, 1, "one-upd"),
    _event("d", 3, 2, before={"k": 2, "v": "two"}),
    _event("c", 4, 3, "three"),
    _event("u", 5, 9, "upsert-missing"),  # update to absent key → insert
    "not json at all",                      # dirty line → dropped by parse
    _event("d", 6, 9, before={"k": 9, "v": "upsert-missing"}),
    _event("c", 7, 9, "reborn"),            # delete-then-reinsert
]


def test_json_lines_to_final_state(spark, tmp_path):
    src = tmp_path / "dbz"
    src.mkdir()
    (src / "part-000.jsonl").write_text("\n".join(EVENTS))

    feed = DBZ.from_json_lines(spark, str(src), PAYLOAD, n_shards=4)
    assert set(feed.columns) == {"lsn", "shard", "ts", "op", "k", "v"}
    rows = {r.lsn: r for r in feed.collect()}
    assert len(rows) == 8  # dirty line dropped
    assert rows[0].op == "insert" and rows[0].v == "snap1"
    assert rows[3].op == "delete" and rows[3].k == 2  # key from before-image
    assert rows[3].v == "two"
    assert rows[0].ts.year == 2023  # source.ts_ms preferred

    table = LakeTable.create(
        spark, str(tmp_path / "t"), schema=PAYLOAD, key_cols=["k"], num_buckets=4
    )
    CdcApplier(table).apply_batch(feed, 0)
    state = {r.k: r.v for r in table.read().collect()}
    assert state == {1: "one-upd", 3: "three", 9: "reborn"}


def test_kafka_value_column_shape(spark):
    df = spark.createDataFrame(
        [(e.encode("utf-8"),) for e in EVENTS], "value binary"
    )
    feed = DBZ.from_value_column(df, PAYLOAD)
    assert feed.count() == 8
    ops = {r["op"] for r in feed.select("op").distinct().collect()}
    assert ops == {"insert", "update", "delete"}
    # stays JVM-side: from_json, no Python eval nodes
    from datax_spark.plans import checks

    checks.assert_no_python_row_udf(feed)


def test_shard_is_stable_per_key(spark, tmp_path):
    src = tmp_path / "dbz"
    src.mkdir()
    (src / "a.jsonl").write_text("\n".join(EVENTS))
    feed = DBZ.from_json_lines(spark, str(src), PAYLOAD, n_shards=4)
    per_key = feed.groupBy("k").agg(F.countDistinct("shard").alias("n")).collect()
    assert all(r.n == 1 for r in per_key)