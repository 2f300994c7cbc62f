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

from datax_spark.lake.table import (
    DELETED_COL,
    LSN_COL,
    CommitConflict,
    LakeTable,
    Manifest,
    merge_schemas,
)

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


def anti_join_batch_keys(
    current: DataFrame,
    batch: DataFrame,
    key_cols: list[str],
    broadcast: bool,
) -> DataFrame:
    """``current`` minus rows whose key appears in ``batch`` — the COW
    "drop every batched key" half of the whole-row upsert.

    Null-safe (<=>) key match so a NULL key column behaves as a real key
    value — identical to MOR reconstruction's groupBy grouping (state must
    not diverge by merge mode).  ``broadcast=True`` hints the (deduped)
    key side — right for micro-batches; a 10^8-key backfill batch would
    OOM the driver, so merge_into guards on batch size and lets AQE plan
    the shuffle join instead (see ``broadcast_key_limit``)."""
    batch_keys = batch.select(
        *[F.col(c).alias(f"__k_{c}") for c in key_cols]
    ).distinct()
    if broadcast:
        batch_keys = F.broadcast(batch_keys)
    anti_cond = None
    for c in key_cols:
        e = current[c].eqNullSafe(F.col(f"__k_{c}"))
        anti_cond = e if anti_cond is None else (anti_cond & e)
    return current.join(batch_keys, on=anti_cond, how="left_anti")


def merge_into(
    table: LakeTable,
    batch: DataFrame,
    op_col: str | None = OP_COL_DEFAULT,
    order_col: str | None = None,
    payload_cols: list[str] | None = None,
    lineage: dict | None = None,
    evolve_schema: bool = True,
    files_per_bucket: int = 1,
    mode: str = "cow",
    auto_compact: int | None = None,
    dedup_batch: bool = True,
    bucket_deltas: bool = True,
    broadcast_key_limit: int = 1_000_000,
    compact_ratio: float | None = None,
    properties_update: dict | None = None,
) -> Manifest | None:
    """Apply a change batch to the table; returns the new manifest.

    ``batch`` carries the target columns plus optionally ``op_col``
    (insert/update/delete) and ``order_col`` (LSN) for in-batch dedup.
    ``payload_cols`` are the columns persisted into the table (default: all
    batch columns except ``op_col`` and ``order_col`` — envelope metadata like
    shard/ts must be excluded by the caller or via this list).
    If ``lineage`` has a ``batch_id`` already recorded in the table, the call
    is a no-op returning None — the exactly-once replay guard.

    ``mode``:
    - ``"cow"`` (copy-on-write): rewrite touched buckets with the merged
      state.  Read-optimal; write cost O(touched buckets of the table) per
      batch — right for low-rate feeds or small tables.
    - ``"mor"`` (merge-on-read): append the deduped batch as delta files
      (upserts + tombstones carrying ``__lsn``/``__deleted``); the scan
      reconstructs last-writer-wins.  Write cost O(batch) per batch — the
      only asymptotic that survives 10^10 events; ``auto_compact`` bounds
      read amplification by compacting buckets whose delta-file count
      exceeds it (Iceberg rewrite_data_files analogue).
    - ``"dv"`` (deletion vectors): positional deletes masking base rows +
      appended base files — no bucket rewrite (unlike COW), no read-time
      per-key aggregation (unlike MOR).  See ``_merge_dv``.
    """
    if mode not in ("cow", "mor", "dv"):
        raise ValueError(f"unknown merge mode {mode!r}")
    if mode == "mor" and order_col is None:
        raise ValueError("mor mode requires order_col (the LSN) for "
                         "last-writer-wins reconstruction")
    t0 = time.monotonic()
    base = table.manifest()
    if lineage and base.is_applied(lineage.get("batch_id")):
        return None  # replayed batch — already atomically applied

    key_cols = base.key_cols
    if order_col is not None and (dedup_batch or mode in ("cow", "dv")):
        # COW/DV require the dedup (whole-row replace has no LSN at read);
        # MOR may skip it — reconstruction collapses duplicates by __lsn.
        batch = dedup_last_per_key(batch, key_cols, order_col)
    keep = (payload_cols if payload_cols is not None
            else [c for c in batch.columns if c not in (op_col, order_col)])
    lsn_col = (
        [F.col(order_col).cast("long").alias(LSN_COL)]
        if mode == "mor" else []
    )
    batch = batch.select(
        *([op_col] if op_col in batch.columns else []), *lsn_col, *keep
    )

    if mode == "mor":
        # optimistic concurrency: a concurrent writer winning the manifest
        # race raises CommitConflict — rebase on the new snapshot and
        # restage (conflicts are rare; orphaned first-attempt files are
        # vacuum()ed).  MOR appends commute, so the retry is always safe;
        # the replay guard re-checks in case the OTHER writer applied this
        # very batch id.
        last_err: Exception | None = None
        for _ in range(5):
            base = table.manifest()
            if lineage and base.is_applied(lineage.get("batch_id")):
                return None
            try:
                return _merge_mor(
                    table, batch, base, op_col, lineage, evolve_schema,
                    files_per_bucket, auto_compact, t0, compact_ratio,
                    bucket_deltas=bucket_deltas,
                    properties_update=properties_update,
                )
            except CommitConflict as e:
                last_err = e
                continue
        raise last_err  # type: ignore[misc]
    from datax_spark.lake.table import L0_BUCKET

    if mode == "dv":
        return _merge_dv(
            table, batch, base, op_col, lineage, evolve_schema,
            files_per_bucket, t0, broadcast_key_limit,
            properties_update=properties_update,
        )

    if L0_BUCKET in base.files:
        raise ValueError(
            "copy-on-write MERGE on a table holding unbucketed L0 deltas "
            "would duplicate or drop L0 rows — run table.compact() first"
        )
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
    # whole-row upsert: drop every batched key from current, re-insert
    # survivors.  `batch` is persisted above, so count() is a cached scan,
    # and rows >= distinct keys makes it a safe broadcast bound.
    new_state = anti_join_batch_keys(
        current, batch, key_cols,
        broadcast=batch.count() <= broadcast_key_limit,
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

    lineage = _resolve_lineage(lineage)
    if lineage is not None:
        lineage = dict(lineage)
        lineage["wall_ms"] = int((time.monotonic() - t0) * 1000)
    # empty file-list entries for touched-but-now-empty buckets still replace
    replaced = {str(b) for b in touched}
    return table._commit(
        base, frag, replaced_buckets=replaced, lineage=lineage,
        schema=new_schema, operation="merge-cow",
        properties_update=properties_update,
    )


def _merge_dv(
    table: LakeTable,
    batch: DataFrame,
    base: Manifest,
    op_col: str | None,
    lineage: dict | None,
    evolve_schema: bool,
    files_per_bucket: int,
    t0: float,
    broadcast_key_limit: int,
    properties_update: dict | None = None,
) -> Manifest | None:
    """Deletion-vector merge: the COW/MOR middle ground (Iceberg v2
    positional deletes).

    Instead of rewriting touched buckets (COW) or deferring the key merge to
    read time (MOR), a batch writes (a) tiny dv files listing the (file,
    position) of every base row whose key the batch replaces or deletes and
    (b) the surviving rows as ordinary new base files.  Writes cost O(batch
    + touched-bucket SCAN) but no bucket REWRITE; reads pay one (file,pos)
    anti-join — no per-key aggregation, so read cost is far closer to COW
    than to MOR.  Right for update/delete-heavy feeds over read-hot tables.

    Positions are only defined on base files, so the table must hold no MOR
    deltas (compact() first); existing dv files are fine — the position
    scan is dv-aware, so already-dead rows are never re-listed."""
    from datax_spark.lake.table import DV_FILE_COL, DV_POS_COL, L0_BUCKET

    if L0_BUCKET in base.files or any(
        len(e) > 2 and e[2] == "delta"
        for entries in base.files.values() for e in entries
    ):
        raise ValueError(
            "dv mode requires a delta-free table (row positions are only "
            "defined on base files) — run table.compact() first"
        )
    batch = batch.persist()
    try:
        data_cols = [c for c in batch.columns if c != op_col]
        new_schema = (
            merge_schemas(base.schema, batch.select(*data_cols).schema)
            if evolve_schema else base.schema
        )
        bexpr = table.bucket_expr(base.bucket_col, base.num_buckets)
        touched = [
            r[0] for r in batch.select(bexpr.alias("b")).distinct().collect()
        ]
        frag: dict = {}
        raw, _ = table._scan_raw(base, touched, expose_pos=True)
        if raw is not None:
            keys = batch.select(
                *[F.col(c).alias(f"__k_{c}") for c in base.key_cols]
            ).distinct()
            if batch.count() <= broadcast_key_limit:
                keys = F.broadcast(keys)
            cond = None
            for c in base.key_cols:
                e = raw[c].eqNullSafe(F.col(f"__k_{c}"))
                cond = e if cond is None else (cond & e)
            hits = raw.join(keys, on=cond, how="inner").select(
                DV_FILE_COL, DV_POS_COL
            )
            frag = table._stage_dv_write(hits)
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
        staged_base = Manifest(**{**base.__dict__, "schema": new_schema})
        if new_schema.jsonValue() != base.schema.jsonValue():
            staged_base.current_schema_id = base.current_schema_id + 1
            staged_base.schemas = {
                **base.schemas,
                str(staged_base.current_schema_id): new_schema.jsonValue(),
            }
        frag2 = table._stage_write(survivors, staged_base, files_per_bucket)
    finally:
        batch.unpersist()
    for b, v in frag2.items():
        frag.setdefault(b, []).extend(v)
    lineage = _resolve_lineage(lineage)
    if lineage is not None and lineage.get("rows") == 0 and not frag:
        return base
    if lineage is not None:
        lineage = dict(lineage)
        lineage["wall_ms"] = int((time.monotonic() - t0) * 1000)
    return table._commit(
        base, frag, replaced_buckets=set(), lineage=lineage,
        schema=new_schema, operation="merge-dv",
        properties_update=properties_update,
    )


def _resolve_lineage(lineage: dict | None) -> dict | None:
    """Lineage may carry a deferred ``_resolve`` callable (Observation-based
    metrics fused into the write job) — evaluate it after the stage write,
    before the commit, so metrics and data publish atomically without a
    separate aggregation job."""
    if lineage is None or "_resolve" not in lineage:
        return lineage
    lineage = dict(lineage)
    resolve = lineage.pop("_resolve")
    lineage.update(resolve())
    return lineage


def _merge_mor(
    table: LakeTable,
    batch: DataFrame,
    base: Manifest,
    op_col: str | None,
    lineage: dict | None,
    evolve_schema: bool,
    files_per_bucket: int,
    auto_compact: int | None,
    t0: float,
    compact_ratio: float | None = None,
    bucket_deltas: bool = True,
    properties_update: dict | None = None,
) -> Manifest:
    """Merge-on-read apply: append the deduped batch as delta files.

    One Spark job (dedup shuffle + bucketed write) per batch — no scan of
    existing state, no key anti-join, no bucket collect.  Tombstones are
    written for deletes so reconstruction drops the key; later re-inserts
    win by LSN."""
    data_cols = [c for c in batch.columns if c not in (op_col, LSN_COL)]
    batch_schema = batch.select(*data_cols).schema
    new_schema = (
        merge_schemas(base.schema, batch_schema) if evolve_schema else base.schema
    )
    delta = batch.select(
        *[
            (F.col(f.name).cast(f.dataType) if f.name in batch.columns
             else F.lit(None).cast(f.dataType)).alias(f.name)
            for f in new_schema.fields
        ],
        F.col(LSN_COL),
        (
            (F.col(op_col) == F.lit(DELETE_OP))
            if op_col is not None and op_col in batch.columns
            else F.lit(False)
        ).alias(DELETED_COL),
    )
    staged_base = Manifest(**{**base.__dict__, "schema": new_schema})
    if new_schema.jsonValue() != base.schema.jsonValue():
        staged_base.current_schema_id = base.current_schema_id + 1
        staged_base.schemas = {
            **base.schemas,
            str(staged_base.current_schema_id): new_schema.jsonValue(),
        }
    frag = table._stage_write(
        delta, staged_base, files_per_bucket,
        kind="delta", extra_cols=[LSN_COL, DELETED_COL],
        bucketed=bucket_deltas,
    )
    lineage = _resolve_lineage(lineage)
    if lineage is not None and lineage.get("rows") == 0 and not frag:
        return base  # empty batch — nothing to commit or record
    if lineage is not None:
        lineage = dict(lineage)
        lineage["wall_ms"] = int((time.monotonic() - t0) * 1000)
    m = table._commit(
        base, frag, replaced_buckets=set(), lineage=lineage,
        schema=new_schema, operation="merge-mor",
        properties_update=properties_update,
    )
    if compact_ratio is not None:
        # cost-based pick: compact when delta bytes rival base bytes (the
        # file-count threshold remains as a small-file backstop)
        heavy = table.compaction_candidates(
            max_delta_files=auto_compact, delta_ratio=compact_ratio
        )
        if heavy:
            m = table.compact(heavy)
    elif auto_compact is not None:
        heavy = table.delta_heavy_buckets(auto_compact)
        if heavy:
            m = table.compact(heavy)
    return m
