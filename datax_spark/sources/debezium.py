"""Debezium/Maxwell-shaped CDC envelope normalization.

Real deployments tail a connector stream whose records look like

    {"op": "c"|"u"|"d"|"r", "before": {...}|null, "after": {...}|null,
     "source": {"lsn": 123, "ts_ms": 1700000000000, "db": ..., "table": ...},
     "ts_ms": ...}

(op "r" = snapshot read).  This module maps that shape — from a JSON-lines
directory, a Kafka value column, or any string column — into the engine's
envelope ``(lsn, shard, ts, op, <payload...>)`` with native ``from_json``
(JVM-side, no Python), so ``CdcApplier`` / the streaming runner consume it
unchanged.  The reference analogue is otsstreamreader's record→Record
mapping with its exported sequenceId (otsstreamreader/.../core/
SingleVerAndUpOnlyModeRecordSender.java:38-50,94-100).

No Kafka broker ships in this container; the same normalization applies to
``spark.readStream.format("kafka")``'s ``value`` column verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OP_MAP = {"c": "insert", "r": "insert", "u": "update", "d": "delete"}


def envelope_schema(payload: T.StructType) -> T.StructType:
    """The Debezium value schema for a given payload row type."""
    return T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("before", payload),
            T.StructField("after", payload),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("lsn", T.LongType()),
                        T.StructField("ts_ms", T.LongType()),
                        T.StructField("db", T.StringType()),
                        T.StructField("table", T.StringType()),
                    ]
                ),
            ),
            T.StructField("ts_ms", T.LongType()),
        ]
    )


def _op_expr(raw: Column) -> Column:
    out = F.lit(None).cast("string")
    for k, v in _OP_MAP.items():
        out = F.when(raw == k, F.lit(v)).otherwise(out)
    return out


def normalize(
    parsed: DataFrame, payload: T.StructType, n_shards: int = 8,
    shard_key: str | None = None,
) -> DataFrame:
    """Debezium struct frame → engine envelope.

    - ``lsn`` = source.lsn (ordering authority);
    - ``op`` mapped c/r→insert, u→update, d→delete;
    - payload columns from ``after`` for upserts, from ``before`` for
      deletes (key columns must be recoverable from the tombstone);
    - ``shard`` = pmod(hash(shard_key), n_shards) — Kafka users pass the
      topic partition instead.
    """
    key0 = shard_key or payload.fields[0].name
    row = F.when(
        F.col("e.op") == "d", F.col("e.before")
    ).otherwise(F.col("e.after"))
    out = parsed.select(
        F.col("e.source.lsn").alias("lsn"),
        F.pmod(F.hash(row[key0]), F.lit(n_shards)).cast("int").alias("shard"),
        F.timestamp_millis(
            F.coalesce(F.col("e.source.ts_ms"), F.col("e.ts_ms"))
        ).alias("ts"),
        _op_expr(F.col("e.op")).alias("op"),
        *[row[f.name].alias(f.name) for f in payload.fields],
    )
    return out.filter(F.col("op").isNotNull() & F.col("lsn").isNotNull())


def from_json_lines(
    spark: SparkSession, path: str, payload: T.StructType, n_shards: int = 8,
    streaming: bool = False,
) -> DataFrame:
    """Read a Debezium JSON-lines directory (batch or streaming) into the
    engine envelope."""
    schema = envelope_schema(payload)
    reader = spark.readStream if streaming else spark.read
    raw = reader.schema(
        T.StructType([T.StructField("value", T.StringType())])
    ).text(path).withColumnRenamed("value", "json")
    parsed = raw.select(F.from_json("json", schema).alias("e")).filter(
        F.col("e").isNotNull()
    )
    return normalize(parsed, payload, n_shards)


def from_value_column(
    df: DataFrame, payload: T.StructType, value_col: str = "value",
    n_shards: int = 8,
) -> DataFrame:
    """Normalize a Kafka-style string/binary ``value`` column (works on the
    frame returned by ``spark.readStream.format("kafka").load()``)."""
    schema = envelope_schema(payload)
    parsed = df.select(
        F.from_json(F.col(value_col).cast("string"), schema).alias("e")
    ).filter(F.col("e").isNotNull())
    return normalize(parsed, payload, n_shards)
