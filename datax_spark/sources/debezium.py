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
    streaming: bool = False, options: dict | None = None,
) -> DataFrame:
    """Read a Debezium JSON-lines directory (batch or streaming) into the
    engine envelope.  ``options`` pass through to the text reader (e.g.
    ``maxFilesPerTrigger`` for a rate-capped stream)."""
    schema = envelope_schema(payload)
    reader = spark.readStream if streaming else spark.read
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
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


# --------------------------------------------------------------- Maxwell
# The other common MySQL-binlog JSON shape (Zendesk Maxwell; public wire
# format).  Differences from Debezium that matter here:
# - type: "insert"/"update"/"delete" (+ "bootstrap-insert" snapshot rows);
# - "data" carries the FULL row for every type — deletes included — and
#   "old" holds only the CHANGED columns' previous values (a partial
#   before-image, not a full row);
# - no LSN: ordering is (ts sec, xid, xoffset) — xid is the transaction
#   id, xoffset the row's index within it.

_MAXWELL_OPS = {
    "insert": "insert",
    "bootstrap-insert": "insert",
    "update": "update",
    "delete": "delete",
}
# lsn = ts·2^31 + (xid mod 2^12)·2^19 + xoffset: ordered by commit
# second, then transaction, then row-within-transaction.  Budget
# arithmetic for the 63 usable bits: ts(sec) < 2^32 (through year 2106)
# in the top bits — max value (2^32-1)·2^31 + 2^31-1 = 2^63-1, no
# overflow; 2^12 = 4096 transactions/second; 2^19 = 524,288 rows per
# transaction is a HARD limit — an xoffset at or beyond it FAILS LOUDLY
# (raise_error) instead of mod-wrapping, because a wrapped LSN is not
# merely a reorder: the per-shard watermark filter is key-agnostic, so a
# wrapped (smaller) LSN landing in a later micro-batch than the shard's
# watermark is silently DROPPED.  The xid mod is unavoidable (MySQL xids
# grow without bound and only same-second relative order matters), which
# leaves a documented hazard: two transactions in the same commit-second
# whose xids collide mod 4096 in the wrong order ACROSS micro-batches
# can likewise be dropped by the watermark filter — feeds that split
# commit-seconds across micro-batches should run filter_watermark=False
# (exactly-once is still held by the batch-id lineage guard).
# 'bootstrap-insert' rows carry NO (xid, xoffset) at all — instead of
# packing them into colliding same-second LSNs they get the snapshot
# SENTINEL lsn = -1, which the engine exempts from watermark advance and
# comparison (cdc/apply.py:filter_already_applied), matching
# emit_table_snapshot's op:"r" records.
_MAXWELL_TS_SHIFT = 1 << 31
_MAXWELL_XID_SHIFT = 1 << 19
_MAXWELL_XID_MOD = 1 << 12
_MAXWELL_XOFF_MOD = 1 << 19


def maxwell_schema(payload: T.StructType) -> T.StructType:
    """The Maxwell value schema for a given payload row type."""
    return T.StructType(
        [
            T.StructField("database", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("ts", T.LongType()),
            T.StructField("xid", T.LongType()),
            T.StructField("xoffset", T.LongType()),
            T.StructField("commit", T.BooleanType()),
            T.StructField("data", payload),
            T.StructField("old", payload),
        ]
    )


def normalize_maxwell(
    parsed: DataFrame, payload: T.StructType, n_shards: int = 8,
    shard_key: str | None = None,
) -> DataFrame:
    """Maxwell struct frame → engine envelope.

    ``lsn`` is synthesized from (ts, xid, xoffset) — see the bit split
    above; same-second transactions order by xid (mod 4096 — the one
    documented collision hazard), rows within a transaction by xoffset —
    Maxwell's emission order.  An ``xoffset`` ≥ 2^19 raises instead of
    wrapping (a wrapped LSN would be silently dropped by the watermark
    filter, not just reordered).  ``bootstrap-insert`` rows (no
    xid/xoffset) get the snapshot sentinel ``lsn = -1``.  Rows with
    unknown ``type`` (ddl, heartbeats) or no ``ts`` are dropped like the
    Debezium path drops unknown ops.  ``data`` is the payload for every
    type (Maxwell deletes carry the full old row there)."""
    key0 = shard_key or payload.fields[0].name
    op = F.lit(None).cast("string")
    for k, v in _MAXWELL_OPS.items():
        op = F.when(F.col("e.type") == k, F.lit(v)).otherwise(op)
    row = F.col("e.data")
    xoff = F.coalesce(F.col("e.xoffset"), F.lit(0))
    # assert_true yields NULL when the guard holds and raises otherwise;
    # coalescing it to 0 keeps the whole expression JVM-side and codegen'd
    wrap_guard = F.coalesce(
        F.assert_true(
            xoff < F.lit(_MAXWELL_XOFF_MOD),
            F.concat(
                F.lit("maxwell xoffset >= 2^19 ("), xoff.cast("string"),
                F.lit("): transaction too large for the synthesized LSN's "
                      "row bits — a mod-wrap here would be silently dropped "
                      "by the watermark filter; split the transaction or "
                      "run filter_watermark=False"),
            ),
        ).cast("long"),
        F.lit(0),
    )
    lsn = F.when(
        (F.col("e.type") == "bootstrap-insert") & F.col("e.ts").isNotNull(),
        F.lit(-1),
    ).otherwise(
        F.col("e.ts") * F.lit(_MAXWELL_TS_SHIFT)
        + F.pmod(F.coalesce(F.col("e.xid"), F.lit(0)),
                 F.lit(_MAXWELL_XID_MOD)) * F.lit(_MAXWELL_XID_SHIFT)
        + xoff + wrap_guard
    )
    out = parsed.select(
        lsn.cast("long").alias("lsn"),
        F.pmod(F.hash(row[key0]), F.lit(n_shards)).cast("int").alias("shard"),
        F.timestamp_seconds(F.col("e.ts")).alias("ts"),
        op.alias("op"),
        *[row[f.name].alias(f.name) for f in payload.fields],
    )
    return out.filter(F.col("op").isNotNull() & F.col("lsn").isNotNull())


def from_maxwell_json_lines(
    spark: SparkSession, path: str, payload: T.StructType, n_shards: int = 8,
    streaming: bool = False, options: dict | None = None,
) -> DataFrame:
    """Read a Maxwell JSON-lines directory (batch or streaming) into the
    engine envelope."""
    schema = maxwell_schema(payload)
    reader = spark.readStream if streaming else spark.read
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    raw = reader.schema(
        T.StructType([T.StructField("value", T.StringType())])
    ).text(path).withColumnRenamed("value", "json")
    parsed = raw.select(F.from_json("json", schema).alias("e")).filter(
        F.col("e").isNotNull()
    )
    return normalize_maxwell(parsed, payload, n_shards)


def from_maxwell_value_column(
    df: DataFrame, payload: T.StructType, value_col: str = "value",
    n_shards: int = 8,
) -> DataFrame:
    """Normalize a Kafka-style ``value`` column carrying Maxwell JSON."""
    schema = maxwell_schema(payload)
    parsed = df.select(
        F.from_json(F.col(value_col).cast("string"), schema).alias("e")
    ).filter(F.col("e").isNotNull())
    return normalize_maxwell(parsed, payload, n_shards)


# ----------------------------------------------------------------- Canal
# Alibaba Canal's flat-message JSON (the binlog bridge of the reference's
# own ecosystem; public wire format).  Differences that matter here:
# - one message carries an ARRAY of rows ("data"), all values STRINGS
#   (MySQL text protocol); "old" is an array of partial before-images;
# - type: "INSERT"/"UPDATE"/"DELETE" (+ DDL messages with isDdl=true);
# - ordering: es (binlog event ms) then id (batch id) then row position.

_CANAL_OPS = {"INSERT": "insert", "UPDATE": "update", "DELETE": "delete"}
# lsn = (es//1000)·2^31 + (id mod 2^12)·2^19 + pos: the same 63-bit
# split as Maxwell's (second · transaction/batch · row) — es is epoch
# MS, coarsened to seconds for the LSN (within a second Canal's monotone
# batch id orders; the envelope's ``ts`` column keeps the full ms
# precision).  A row position ≥ 2^19 = 524,288 FAILS LOUDLY instead of
# mod-wrapping — a wrapped LSN in a later micro-batch falls at-or-below
# the shard watermark and is silently DROPPED, not merely reordered; the
# batch-id mod shares Maxwell's same-second collision hazard (see the
# Maxwell bit-budget comment above — run filter_watermark=False for
# feeds that split commit-seconds across micro-batches).
_CANAL_ES_SHIFT = 1 << 31
_CANAL_ID_SHIFT = 1 << 19
_CANAL_ID_MOD = 1 << 12
_CANAL_POS_MOD = 1 << 19


def canal_schema() -> T.StructType:
    """The Canal flat-message value schema (rows as string maps)."""
    row = T.MapType(T.StringType(), T.StringType())
    return T.StructType(
        [
            T.StructField("database", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("type", T.StringType()),
            T.StructField("es", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("id", T.LongType()),
            T.StructField("isDdl", T.BooleanType()),
            T.StructField("data", T.ArrayType(row)),
            T.StructField("old", T.ArrayType(row)),
        ]
    )


def normalize_canal(
    parsed: DataFrame, payload: T.StructType, n_shards: int = 8,
    shard_key: str | None = None,
) -> DataFrame:
    """Canal struct frame → engine envelope.

    Each message's ``data`` array is exploded (one event per row, message
    order preserved in the synthesized LSN's position bits) and the
    stringly-typed values are cast to the payload schema — the same
    text→typed projection DataX's mysqlreader applies per column.  DDL
    messages (isDdl) and unknown types are dropped; deletes carry the
    full old row in ``data``, exactly like Maxwell."""
    key0 = shard_key or payload.fields[0].name
    op = F.lit(None).cast("string")
    for k, v in _CANAL_OPS.items():
        op = F.when(F.col("e.type") == k, F.lit(v)).otherwise(op)
    ex = parsed.filter(
        ~F.coalesce(F.col("e.isDdl"), F.lit(False))
    ).select(
        F.col("e"), F.posexplode(F.col("e.data")).alias("__pos", "__row")
    )
    es = F.coalesce(F.col("e.es"), F.col("e.ts"))
    # row-position wrap fails loudly (see the bit-budget comment above):
    # assert_true is NULL when the guard holds, coalesced to 0 so the
    # expression stays JVM-side
    pos_guard = F.coalesce(
        F.assert_true(
            F.col("__pos") < F.lit(_CANAL_POS_MOD),
            F.concat(
                F.lit("canal row position >= 2^19 ("),
                F.col("__pos").cast("string"),
                F.lit("): flat message too large for the synthesized LSN's "
                      "row bits — a mod-wrap would be silently dropped by "
                      "the watermark filter; shrink canal.mq.flatMessage "
                      "batches or run filter_watermark=False"),
            ),
        ).cast("long"),
        F.lit(0),
    )
    lsn = (
        F.floor(es / F.lit(1000)).cast("long") * F.lit(_CANAL_ES_SHIFT)
        + F.pmod(F.coalesce(F.col("e.id"), F.lit(0)),
                 F.lit(_CANAL_ID_MOD)) * F.lit(_CANAL_ID_SHIFT)
        + F.col("__pos") + pos_guard
    )
    out = ex.select(
        lsn.cast("long").alias("lsn"),
        F.pmod(
            F.hash(F.col("__row")[key0].cast(payload[key0].dataType)),
            F.lit(n_shards),
        ).cast("int").alias("shard"),
        F.timestamp_millis(es).alias("ts"),
        op.alias("op"),
        *[
            F.col("__row")[f.name].cast(f.dataType).alias(f.name)
            for f in payload.fields
        ],
    )
    return out.filter(F.col("op").isNotNull() & F.col("lsn").isNotNull())


def from_canal_json_lines(
    spark: SparkSession, path: str, payload: T.StructType, n_shards: int = 8,
    streaming: bool = False, options: dict | None = None,
) -> DataFrame:
    """Read a Canal flat-message JSON-lines directory (batch or streaming)
    into the engine envelope."""
    reader = spark.readStream if streaming else spark.read
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    raw = reader.schema(
        T.StructType([T.StructField("value", T.StringType())])
    ).text(path).withColumnRenamed("value", "json")
    parsed = raw.select(
        F.from_json("json", canal_schema()).alias("e")
    ).filter(F.col("e").isNotNull())
    return normalize_canal(parsed, payload, n_shards)


def from_canal_value_column(
    df: DataFrame, payload: T.StructType, value_col: str = "value",
    n_shards: int = 8,
) -> DataFrame:
    """Normalize a Kafka-style ``value`` column carrying Canal JSON."""
    parsed = df.select(
        F.from_json(F.col(value_col).cast("string"), canal_schema()).alias("e")
    ).filter(F.col("e").isNotNull())
    return normalize_canal(parsed, payload, n_shards)


# the one registry every consumer dispatches on (jobspec.load_feed, the
# streaming runner's wire branch): adding a format here is the single
# change point
WIRE_FORMAT_READERS = {
    "debezium-json": from_json_lines,
    "maxwell-json": from_maxwell_json_lines,
    "canal-json": from_canal_json_lines,
}
WIRE_FORMATS = tuple(WIRE_FORMAT_READERS)


def is_published(out_dir: str) -> bool:
    """True when ``out_dir`` already holds a published feed (commit dirs
    or the watermark sidecar) — the single definition of "published" the
    snapshot-bootstrap guard and the CLI share."""
    import os as _os

    return _os.path.isdir(out_dir) and any(
        d.startswith("_commit_version=") or d == "_last_version"
        for d in _os.listdir(out_dir)
    )


# --------------------------------------------------------------- CDC OUT
# The reverse direction: a LakeTable changelog serialized as Debezium JSON
# values, so downstream consumers (Kafka producers, other engines, another
# LakeTable via this module's readers) get the standard CDC interchange
# shape.  Reference analogue: DataX writers emit the channel's records in
# the sink's wire format; here the "wire format" is the Debezium envelope.

def to_value_column(
    changes: DataFrame,
    payload: T.StructType,
    key_cols: list[str],
    db: str = "lake",
    table: str = "table",
    version_ts: dict[int, int] | None = None,
) -> DataFrame:
    """``read_changes_with_images`` frame → one Debezium JSON ``value`` per
    logical change, all JVM-side (``to_json``), no Python.

    - ``update_before``/``update_after`` retraction pairs (same key, same
      ``_change_lsn``, same commit) collapse into ONE ``op:"u"`` record
      carrying both images — the Debezium contract;
    - ``insert`` → ``op:"c"`` (after image), ``delete`` → ``op:"d"``
      (before image);
    - ``source.lsn`` keeps the upstream LSN; append commits carry no LSN
      and serialize as ``-1`` ("before any LSN"), so parse-back keeps them
      and per-commit replay order stays correct — consumers applying into
      another table must replay commit directories in order, exactly like
      ``lake/mirror.sync_mirror`` orders by (commit, lsn);
    - ``source.ts_ms``/``ts_ms`` come from ``version_ts`` (commit version →
      epoch ms, bounded by the emitted range so the literal map stays
      small).

    Returns ``(value: string, _commit_version: long)`` — the version rides
    along for per-commit partitioned sinks (:func:`write_json_lines`)."""
    img = F.struct(*[F.col(f.name) for f in payload.fields])
    typ = F.col("_change_type")
    pre = F.when(typ.isin("update_before", "delete"), img)
    post = F.when(typ.isin("insert", "update_after"), img)
    opc = (
        F.when(typ == "insert", F.lit("c"))
        .when(typ == "delete", F.lit("d"))
        .otherwise(F.lit("u"))
    )
    grouped = changes.groupBy(
        *[F.col(c) for c in key_cols],
        F.col("_commit_version"),
        F.col("_change_lsn"),
    ).agg(
        F.any_value(pre, True).alias("before"),
        F.any_value(post, True).alias("after"),
        F.min(opc).alias("op"),  # uniform within a group — min = the value
    )
    if version_ts:
        ts_map = F.create_map(
            *[F.lit(x) for kv in version_ts.items() for x in kv]
        )
        ts_ms = F.element_at(ts_map, F.col("_commit_version").cast("int"))
    else:
        ts_ms = F.lit(None).cast("long")
    value = F.to_json(
        F.struct(
            F.col("op"),
            F.col("before"),
            F.col("after"),
            F.struct(
                F.coalesce(F.col("_change_lsn"), F.lit(-1)).alias("lsn"),
                ts_ms.alias("ts_ms"),
                F.lit(db).alias("db"),
                F.lit(table).alias("table"),
            ).alias("source"),
            ts_ms.alias("ts_ms"),
        )
    )
    return grouped.select(
        value.alias("value"), F.col("_commit_version")
    )


def from_table_changes(
    table, from_version: int, to_version: int | None = None,
    db: str = "lake", name: str | None = None, on_rewrite: str = "error",
) -> DataFrame:
    """Debezium JSON values for a LakeTable's committed changes in
    ``(from_version, to_version]`` — the engine's CDC-out surface.
    ``table`` is a ``lake.table.LakeTable`` (duck-typed to avoid the
    import cycle).  ``on_rewrite="skip"`` steps over state-rewrite commits
    (``overwrite``/``merge-cow``/partial-update deltas) instead of raising —
    same contract as ``read_changes``; physical rewrites (compact/rebucket)
    are always transparent."""
    import os as _os

    to_v = table.current_version() if to_version is None else to_version
    changes = table.read_changes_with_images(
        from_version, to_v, on_rewrite=on_rewrite
    )
    m = table.manifest(to_v)
    version_ts = {}
    for v in range(from_version + 1, to_v + 1):
        at = table.manifest(v).committed_at
        if at is not None:
            version_ts[v] = int(at * 1000)
    return to_value_column(
        changes, m.schema, m.key_cols, db=db,
        table=name or _os.path.basename(table.location.rstrip("/")),
        version_ts=version_ts,
    )


def write_json_lines(values: DataFrame, path: str, mode: str = "error") -> None:
    """Sink the ``to_value_column`` frame as JSON-lines text files
    partitioned by commit (``path/_commit_version=<v>/part-*.txt``) —
    the directory layout :func:`from_json_lines` tails, with replay order
    carried by the partition directories."""
    (
        values.select("value", "_commit_version")
        .write.mode(mode)
        .partitionBy("_commit_version")
        .text(path)
    )


def emit_table_snapshot(
    table, out_dir: str, db: str = "lake", name: str | None = None,
    version: int | None = None,
) -> dict:
    """Bootstrap-out: a consistent snapshot serialized as Debezium
    ``op:"r"`` (snapshot-read) records — the snapshot-then-follow contract
    of Debezium's snapshot mode / Maxwell's bootstrap.

    The snapshot is published as the ``_commit_version=<v>`` directory and
    the ``_last_version`` watermark is set to ``v``, so a subsequent
    :func:`emit_table_changes` on the same ``out_dir`` resumes at exactly
    the next commit — consumers replay the directories in order and
    converge to the live table.  Refuses a non-empty ``out_dir`` (a
    bootstrap must come first; re-running after a crash before the
    watermark write simply re-publishes).

    Snapshot rows carry the SENTINEL ``source.lsn = -1`` ("before any
    LSN").  The consumer side treats lsn<0 as position-less: such rows
    never advance a shard watermark and are exempt from the watermark
    filter (``cdc/apply.py:filter_already_applied``), so a snapshot that
    spans many micro-batches replays in full even with
    ``filter_watermark=True`` — batch 1 cannot poison the watermark to -1
    and drop the rest."""
    import os as _os
    import shutil as _shutil
    import uuid as _uuid

    v = table.current_version() if version is None else version
    _os.makedirs(out_dir, exist_ok=True)
    existing = [
        d for d in _os.listdir(out_dir)
        if d.startswith("_commit_version=") or d == "_last_version"
    ]
    dst = _os.path.join(out_dir, f"_commit_version={v}")
    if [d for d in existing if d != f"_commit_version={v}"]:
        raise ValueError(
            f"{out_dir} already holds published commits {sorted(existing)}: "
            "a snapshot bootstrap must be the FIRST publication — use "
            "emit_table_changes to continue an existing feed"
        )
    m = table.manifest(v)
    ts_ms = (int(m.committed_at * 1000)
             if m.committed_at is not None else None)
    img = F.struct(*[F.col(f.name) for f in m.schema.fields])
    value = F.to_json(
        F.struct(
            F.lit("r").alias("op"),
            F.when(F.lit(False), img).alias("before"),  # typed null
            img.alias("after"),
            F.struct(
                F.lit(-1).cast("long").alias("lsn"),
                F.lit(ts_ms).cast("long").alias("ts_ms"),
                F.lit(db).alias("db"),
                F.lit(
                    name or _os.path.basename(table.location.rstrip("/"))
                ).alias("table"),
            ).alias("source"),
            F.lit(ts_ms).cast("long").alias("ts_ms"),
        )
    )
    vals = table.read(version=v).select(
        value.alias("value"), F.lit(int(v)).alias("_commit_version")
    )
    staging = f"{out_dir.rstrip('/')}.staging-{_uuid.uuid4().hex}"
    try:
        write_json_lines(vals, staging)
        src = _os.path.join(staging, f"_commit_version={v}")
        if not _os.path.exists(dst):
            if _os.path.exists(src):
                _os.rename(src, dst)
            else:
                _os.makedirs(dst)  # empty snapshot still marks the version
    finally:
        _shutil.rmtree(staging, ignore_errors=True)
    side = _os.path.join(out_dir, "_last_version")
    tmp = side + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(str(v))
        f.flush()
        _os.fsync(f.fileno())
    _os.replace(tmp, side)
    return {"snapshot_version": v, "out": out_dir}


def emit_table_changes(
    table, out_dir: str, db: str = "lake", name: str | None = None,
    on_rewrite: str = "error",
) -> dict:
    """Incrementally publish a LakeTable's changelog as Debezium JSON-lines
    commit directories — EXACTLY-ONCE per commit, resumable.

    The watermark is the OUTPUT itself: the highest ``_commit_version=<v>``
    directory already published (plus a ``_last_version`` sidecar covering
    trailing no-change commits).  New commits are staged next to ``out_dir``
    and published one ``os.rename`` per commit IN VERSION ORDER, so a crash
    leaves a clean prefix and the rerun resumes from it — the same atomic-
    publish discipline as the file writer (sources/file.py).  Returns
    {from_version, to_version, emitted_versions}."""
    import os as _os
    import shutil as _shutil
    import uuid as _uuid

    _os.makedirs(out_dir, exist_ok=True)
    done = [
        int(d.split("=", 1)[1])
        for d in _os.listdir(out_dir)
        if d.startswith("_commit_version=")
    ]
    from_v = max(done, default=0)
    side = _os.path.join(out_dir, "_last_version")
    if _os.path.exists(side):
        with open(side, encoding="utf-8") as f:
            from_v = max(from_v, int(f.read().strip() or 0))
    to_v = table.current_version()
    out = {"from_version": from_v, "to_version": to_v, "emitted_versions": []}
    if to_v <= from_v:
        return out
    vals = from_table_changes(
        table, from_v, to_v, db=db, name=name, on_rewrite=on_rewrite
    )
    staging = f"{out_dir.rstrip('/')}.staging-{_uuid.uuid4().hex}"
    try:
        write_json_lines(vals, staging)
        parts = sorted(
            (int(d.split("=", 1)[1]), d)
            for d in _os.listdir(staging)
            if d.startswith("_commit_version=")
        )
        for v, d in parts:  # version order → crash leaves a clean prefix
            dst = _os.path.join(out_dir, d)
            if not _os.path.exists(dst):
                _os.rename(_os.path.join(staging, d), dst)
                out["emitted_versions"].append(v)
    finally:
        _shutil.rmtree(staging, ignore_errors=True)
    tmp = side + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(str(to_v))
        f.flush()
        _os.fsync(f.fileno())
    _os.replace(tmp, side)
    return out

# ------------------------------------------------- incremental snapshot
# Bootstrap WITHOUT pausing the live tail — the DBLog / Debezium
# "incremental snapshot" shape (public designs: Netflix DBLog paper;
# Debezium DDD-3 incremental snapshotting).  The classic
# emit_table_snapshot is a stop-the-world pass: it must be the FIRST
# publication and the feed only continues once the whole table is out.
# At 100 TB that pause is days.  The incremental variant chunks the
# table by PK range (the same split algebra DataX uses for reader-side
# parallelism — sources/split.py, RangeSplitUtil.doLongSplit /
# SingleTableSplitUtil) and interleaves chunk publications with live
# emit_table_changes commits.
#
# Convergence argument (why consumers need NO new machinery): chunk rows
# are op:"r" with the SENTINEL lsn = -1, and every live event since the
# snapshot's start version rides the wire with its real LSN.  The
# consumer folds last-writer-wins by LSN, so
#   - a key seen ONLY by a chunk keeps the chunk row (sentinel beats
#     nothing);
#   - a key with any live event takes the event: the sentinel loses to
#     every real LSN.  If the chunk's read already folded that event in
#     (chunk read at a later version), the winning event's content
#     EQUALS the chunk row's — either winner is the same state;
#   - a key deleted live: the tombstone's real LSN beats the sentinel,
#     and a chunk read after the delete simply omits the key.
# The one operation that breaks the argument is COMPACTION of the
# consumer table mid-bootstrap: compaction rewrites winners as base rows
# with __lsn = -1 and DROPS tombstones, erasing exactly the ordering
# evidence the sentinel fold relies on (a late chunk row would tie a
# compacted winner or resurrect a compacted-away delete).  Consumers
# therefore set the ``bootstrap_active`` table property for the duration
# of the bootstrap: LakeTable.compact()/rebucket() refuse while it is
# set and the merge-path auto-compaction defers (lake/table.py,
# lake/merge.py).


def snapshot_feed_glob(out_dir: str) -> str:
    """The read glob covering BOTH live commits and incremental-snapshot
    chunks (Hadoop glob alternation — one file-stream source tails both)."""
    import os as _os

    return _os.path.join(out_dir, "{_commit_version=*,_snapshot_chunk=*}")


def _read_snapshot_state(out_dir: str) -> dict | None:
    import json as _json
    import os as _os

    p = _os.path.join(out_dir, "_snapshot_state.json")
    if not _os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as f:
        return _json.load(f)


def _write_snapshot_state(out_dir: str, state: dict) -> None:
    import json as _json
    import os as _os

    p = _os.path.join(out_dir, "_snapshot_state.json")
    tmp = p + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        _json.dump(state, f)
        f.flush()
        _os.fsync(f.fileno())
    _os.replace(tmp, p)


def emit_incremental_snapshot(
    table, out_dir: str, chunk_rows: int = 100_000,
    max_chunks: int | None = None, db: str = "lake",
    name: str | None = None, split_col: str | None = None,
    boundaries: list | None = None,
) -> dict:
    """Publish the next ``max_chunks`` (default: all remaining) snapshot
    chunks as ``_snapshot_chunk=<i>`` JSON-lines directories, each an
    atomic rename — interleave calls with :func:`emit_table_changes` to
    bootstrap a consumer while the live feed keeps flowing.

    The chunk plan is computed ONCE on the first call and persisted to
    ``_snapshot_state.json`` (crash-resumable: already-published chunk
    dirs are skipped, the plan never changes under a resume): quantile
    boundaries over the split key (``sources/split.quantile_split_bounds``
    — row-balanced chunks regardless of key skew, the DataX sampling-split
    analogue) plus a NULL tail when the key is nullable.  Each chunk is
    read at the table's CURRENT version through ``read(where=...)`` so a
    PK-clustered table prunes the scan to the chunk's files via zone maps;
    rows carry the sentinel ``source.lsn = -1`` (see module comment for
    the convergence argument).  If ``out_dir`` has no publications yet,
    the ``_last_version`` watermark is set to the snapshot's start version
    — the chunks stand in for all history at or before it, so a
    subsequent :func:`emit_table_changes` resumes at exactly the next
    commit (the truncated-binlog scenario the feature exists for).

    Returns {"emitted_chunks", "remaining", "done", "start_version"}.
    ``split_col`` defaults to the table's first key column and must be
    integral — pick a different integral key column for tables whose
    leading key is a string (ASCII base-128 interpolation does not agree
    with SQL string collation on mixed-length keys, so string chunking
    is not offered).  ``boundaries`` overrides the quantile plan with
    explicit integer interior boundaries (e.g. a precomputed plan or
    manual skew control)."""
    import math as _math
    import os as _os
    import shutil as _shutil
    import uuid as _uuid

    from datax_spark.sources.split import quantile_split_bounds

    _os.makedirs(out_dir, exist_ok=True)
    state = _read_snapshot_state(out_dir)
    if state is None:
        m = table.manifest()
        v0 = table.current_version()
        key = split_col or m.key_cols[0]
        ktype = {f.name: f.dataType.simpleString() for f in m.schema.fields}[key]
        snap = table.read(version=v0)
        stats = snap.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col(key).isNull(), 1)).alias("n_null"),
        ).collect()[0]
        n_rows, n_null = int(stats["n"]), int(stats["n_null"])
        if ktype not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"split key {key!r} has non-integral type {ktype}: pass "
                "split_col naming an integral key column (string-range "
                "chunking is not offered — ASCII base-128 interpolation "
                "does not match SQL string collation on mixed-length keys)"
            )
        if boundaries is not None:
            interior = [int(b) for b in boundaries]
        else:
            n_chunks = max(1, _math.ceil(max(n_rows - n_null, 1) / chunk_rows))
            interior = quantile_split_bounds(
                snap.filter(F.col(key).isNotNull()), key, n_chunks
            ) if n_chunks > 1 and n_rows > n_null else []
        # half-open interior ranges + closed tail, encoded as (lo, hi)
        # where None = unbounded — the pk_predicates shape
        edges = [None, *interior, None]
        ranges = [[edges[i], edges[i + 1]] for i in range(len(edges) - 1)]
        state = {
            "key_col": key, "ranges": ranges, "next": 0,
            "null_tail": bool(n_null), "start_version": v0,
            "chunk_rows": int(chunk_rows), "done": False,
        }
        if n_rows == 0:
            state["ranges"], state["done"] = [], True
        has_pub = any(
            d.startswith("_commit_version=") or d == "_last_version"
            for d in _os.listdir(out_dir)
        )
        if not has_pub:
            side = _os.path.join(out_dir, "_last_version")
            tmp = side + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(str(v0))
                f.flush()
                _os.fsync(f.fileno())
            _os.replace(tmp, side)
        _write_snapshot_state(out_dir, state)

    key = state["key_col"]
    total = len(state["ranges"]) + (1 if state["null_tail"] else 0)
    emitted: list[int] = []
    budget = total - state["next"] if max_chunks is None else max_chunks
    while not state["done"] and budget > 0:
        i = state["next"]
        dst = _os.path.join(out_dir, f"_snapshot_chunk={i:06d}")
        if not _os.path.exists(dst):
            if i < len(state["ranges"]):
                lo, hi = state["ranges"][i]
                preds = []
                if lo is not None:
                    preds.append((key, ">=", int(lo) + 1))
                if hi is not None:
                    preds.append((key, "<=", int(hi)))
                part = table.read(where=preds or None)
                if lo is None and hi is None and state["null_tail"]:
                    part = part.filter(F.col(key).isNotNull())
            else:  # NULL tail chunk (the DataX pk IS NULL split task)
                part = table.read().filter(F.col(key).isNull())
            mm = table.manifest()
            ts_ms = (int(mm.committed_at * 1000)
                     if mm.committed_at is not None else None)
            img = F.struct(*[F.col(f.name) for f in mm.schema.fields])
            value = F.to_json(
                F.struct(
                    F.lit("r").alias("op"),
                    F.when(F.lit(False), img).alias("before"),
                    img.alias("after"),
                    F.struct(
                        F.lit(-1).cast("long").alias("lsn"),
                        F.lit(ts_ms).cast("long").alias("ts_ms"),
                        F.lit(db).alias("db"),
                        F.lit(
                            name
                            or _os.path.basename(table.location.rstrip("/"))
                        ).alias("table"),
                    ).alias("source"),
                    F.lit(ts_ms).cast("long").alias("ts_ms"),
                )
            )
            vals = part.select(
                value.alias("value"),
                F.lit(f"{i:06d}").alias("_snapshot_chunk"),
            )
            staging = f"{out_dir.rstrip('/')}.chunkstage-{_uuid.uuid4().hex}"
            try:
                (
                    vals.select("value", "_snapshot_chunk")
                    .write.mode("error").partitionBy("_snapshot_chunk")
                    .text(staging)
                )
                src = _os.path.join(staging, f"_snapshot_chunk={i:06d}")
                if _os.path.exists(src):
                    _os.rename(src, dst)
                else:
                    _os.makedirs(dst)  # empty range still marks progress
            finally:
                _shutil.rmtree(staging, ignore_errors=True)
        emitted.append(i)
        state["next"] = i + 1
        state["done"] = state["next"] >= total
        _write_snapshot_state(out_dir, state)
        budget -= 1
    return {
        "emitted_chunks": emitted,
        "remaining": total - state["next"],
        "done": state["done"],
        "start_version": state["start_version"],
    }
