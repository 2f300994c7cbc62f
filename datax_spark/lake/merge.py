"""MERGE INTO for LakeTable — copy-on-write over touched buckets only.

This is the Spark-native rebuild of DataX's upsert, which the reference pushes
into the target database as ``INSERT … ON DUPLICATE KEY UPDATE`` / ``REPLACE``
(plugin-rdbms-util/src/main/java/com/alibaba/datax/plugin/rdbms/writer/util/WriterUtil.java:110-167).
Semantics implemented (whole-row upsert, the DataX model):

    WHEN MATCHED     AND op = 'delete' THEN DELETE
    WHEN MATCHED     THEN UPDATE SET * (row replace)
    WHEN NOT MATCHED AND op <> 'delete' THEN INSERT *

Scale design (the part that must survive 100 TB / 10^10 events):

- **Bucket pruning.** The batch's touched buckets are computed with the same
  ``pmod(hash(bucket_col), N)`` the table was written with; only those buckets
  are scanned and rewritten.  A micro-batch touching k of N buckets costs
  O(k/N · table), never O(table).
- **Anti-join + union, not full-outer.** Because upserts replace whole rows,
  the new bucket state is ``current ⟕anti batch_keys  ∪  batch_survivors``.
  The anti join broadcasts the (small, deduped) batch-key side — no shuffle of
  the big current-state side; Spark/AQE handle the rest.
- **No per-row Python.**  Everything is Column expressions; the plan stays in
  WholeStageCodegen (asserted by tests via datax_spark.plans.checks).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datax_spark.lake.table import LakeTable, Manifest, merge_schemas

OP_COL_DEFAULT = "op"
DELETE_OP = "delete"


def dedup_last_per_key(
    df: DataFrame, key_cols: list[str], order_col: str
) -> DataFrame:
    """Keep only the last event per key within a batch, by max ``order_col``.

    DataX gets this implicitly from channel FIFO + PK-overwrite ordering; here
    ordering is explicit via the LSN (SURVEY.md §2.4).  Implemented with
    ``max_by(struct(*), order)`` — a single hash-aggregate with map-side
    partial aggregation, cheaper at scale than a window sort (no global sort,
    no per-partition ordering requirement).
    """
    payload = F.struct(*[F.col(c) for c in df.columns])
    agg = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.max_by(payload, F.col(order_col)).alias("__row")
    )
    return agg.select("__row.*")


def merge_into(
    table: LakeTable,
    batch: DataFrame,
    op_col: str | None = OP_COL_DEFAULT,
    order_col: str | None = None,
    payload_cols: list[str] | None = None,
    lineage: dict | None = None,
    evolve_schema: bool = True,
    files_per_bucket: int = 1,
) -> Manifest | None:
    """Apply a change batch to the table; returns the new manifest.

    ``batch`` carries the target columns plus optionally ``op_col``
    (insert/update/delete) and ``order_col`` (LSN) for in-batch dedup.
    ``payload_cols`` are the columns persisted into the table (default: all
    batch columns except ``op_col`` and ``order_col`` — envelope metadata like
    shard/ts must be excluded by the caller or via this list).
    If ``lineage`` has a ``batch_id`` already recorded in the table, the call
    is a no-op returning None — the exactly-once replay guard.
    """
    t0 = time.monotonic()
    base = table.manifest()
    if lineage and str(lineage.get("batch_id")) in base.applied_batches:
        return None  # replayed batch — already atomically applied

    key_cols = base.key_cols
    if order_col is not None:
        batch = dedup_last_per_key(batch, key_cols, order_col)
    keep = (payload_cols if payload_cols is not None
            else [c for c in batch.columns if c not in (op_col, order_col)])
    batch = batch.select(*([op_col] if op_col in batch.columns else []), *keep)
    batch = batch.persist()  # reused for bucket pruning, keys, and survivors

    data_cols = [c for c in batch.columns if c != op_col]
    batch_schema = batch.select(*data_cols).schema
    new_schema = (
        merge_schemas(base.schema, batch_schema) if evolve_schema else base.schema
    )

    bexpr = table.bucket_expr(base.bucket_col, base.num_buckets)
    touched = [
        r[0]
        for r in batch.select(bexpr.alias("b")).distinct().collect()
    ]
    current = table.read(buckets=touched)  # bucket-pruned scan
    # cast current state up to the evolved schema (column-add → null)
    have = set(current.columns)
    current = current.select(
        *[
            (F.col(f.name).cast(f.dataType) if f.name in have
             else F.lit(None).cast(f.dataType)).alias(f.name)
            for f in new_schema.fields
        ]
    )

    if op_col is not None and op_col in batch.columns:
        survivors = batch.filter(F.col(op_col) != F.lit(DELETE_OP))
    else:
        survivors = batch
    survivors = survivors.select(
        *[
            (F.col(f.name).cast(f.dataType) if f.name in batch.columns
             else F.lit(None).cast(f.dataType)).alias(f.name)
            for f in new_schema.fields
        ]
    )
    batch_keys = batch.select(*key_cols).distinct()
    # whole-row upsert: drop every batched key from current, re-insert survivors
    new_state = current.join(
        F.broadcast(batch_keys), on=key_cols, how="left_anti"
    ).unionByName(survivors)

    staged_base = Manifest(**{**base.__dict__, "schema": new_schema})
    if new_schema.jsonValue() != base.schema.jsonValue():
        staged_base.current_schema_id = base.current_schema_id + 1
        staged_base.schemas = {
            **base.schemas,
            str(staged_base.current_schema_id): new_schema.jsonValue(),
        }
    try:
        frag = table._stage_write(new_state, staged_base, files_per_bucket)
    finally:
        batch.unpersist()

    if lineage is not None:
        lineage = dict(lineage)
        lineage["wall_ms"] = int((time.monotonic() - t0) * 1000)
    # empty file-list entries for touched-but-now-empty buckets still replace
    replaced = {str(b) for b in touched}
    return table._commit(
        base, frag, replaced_buckets=replaced, lineage=lineage, schema=new_schema
    )
