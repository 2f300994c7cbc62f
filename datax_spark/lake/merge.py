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

import random
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datax_spark.lake.table import (
    DELETED_COL,
    LSN_COL,
    PRESENT_COL,
    CommitConflict,
    LakeTable,
    Manifest,
    merge_schemas,
)

# optimistic-concurrency rebase budget (Iceberg commit.retry.num-retries
# analogue): each retry fully restages against the fresh snapshot, so the
# cap bounds work, not correctness — MOR appends commute.  Sized for a
# handful of genuinely concurrent writers (the catalog-seam stress test
# runs 4); the jittered backoff below keeps losers from starving.
_MOR_COMMIT_RETRIES = 12

OP_COL_DEFAULT = "op"
DELETE_OP = "delete"

# bucket_deltas="auto" placement threshold: bucket the delta write only when
# the batch is big enough that the per-bucket delta files it would produce
# are non-trivial (>= this many bytes each ON AVERAGE).  Below it, a
# bucketed write is pure small-file pollution — 64 tiny files plus a
# 64-task dynamic-partition write per micro-batch — so the batch goes to
# L0 (LSM level-0: unbucketed, no shuffle, AQE-coalesced to ~1 file) and
# compaction re-buckets it.  At production batch sizes (GBs) auto always
# buckets, preserving per-bucket delta pruning at the 100-TB design point.
L0_AUTO_BYTES_PER_BUCKET = 4 << 20
# rows-only lineage (bytes unmeasured, e.g. aggview/mirror pass bytes=0):
# conservative per-row byte estimate for the placement decision
L0_AUTO_EST_ROW_BYTES = 256


def _resolve_bucket_deltas(bucket_deltas, base: Manifest,
                           lineage: dict | None) -> bool:
    """Resolve ``bucket_deltas="auto"`` to a concrete placement for this
    batch.  The signal is the caller-measured lineage (rows/bytes are
    computed BEFORE the merge in lineage_detail="shards" and by
    aggview/mirror refreshes).  Fused-metrics batches (``_resolve``) carry
    the TRAILING batch's measured size as ``_est_rows``/``_est_bytes`` —
    steady-state CDC batch sizes are stable, and a stale estimate only
    costs one batch a suboptimal (still correct) layout.  No signal at
    all keeps today's bucketed default — auto never guesses."""
    if bucket_deltas != "auto":
        return bool(bucket_deltas)
    if lineage is None:
        return True
    rows = lineage.get("rows", lineage.get("_est_rows"))
    nbytes = lineage.get("bytes", lineage.get("_est_bytes"))
    if not isinstance(rows, int) and not isinstance(nbytes, int):
        return True
    est = max(
        int(nbytes) if isinstance(nbytes, int) else 0,
        (int(rows) if isinstance(rows, int) else 0) * L0_AUTO_EST_ROW_BYTES,
    )
    return est >= base.num_buckets * L0_AUTO_BYTES_PER_BUCKET


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
    bucket_deltas: bool | str = "auto",
    broadcast_key_limit: int = 1_000_000,
    compact_ratio: float | None = None,
    properties_update: dict | None = None,
    partial_update: bool = False,
    present_col: str | None = None,
    keys_unique: bool = False,
    known_buckets: list | None = None,
    batch_rows: int | None = None,
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

    ``partial_update`` — DataX writeMode=update semantics
    (``INSERT … ON DUPLICATE KEY UPDATE col=VALUES(col)`` over the job's
    mapped column subset, WriterUtil.java:110-167): the batch's columns are
    SET on conflict (explicit NULLs win); target columns the batch does not
    carry keep their previous value (whereas the default whole-row replace
    nulls them).  A delete still wipes the whole row — later partial events
    rebuild it from only the columns they cover.  MOR stays O(batch): events
    are appended as "pdelta" files tagged with each event's column set and
    the column-wise fold happens at read
    (``LakeTable._reconstruct_partial``); COW/DV fold the batch and patch it
    against current state up front, then proceed whole-row.

    ``present_col``: optional array<string> column naming the columns each
    EVENT sets (Debezium-style patch events; null = all batch columns) —
    without it, presence is the batch's column set, the DataX
    job-level-column-mapping shape.

    ``keys_unique=True``: caller guarantees at most one event per key in
    the batch (e.g. a groupBy output) — skips the in-batch LWW dedup
    shuffle that would otherwise be forced for COW/DV.  ``known_buckets``:
    caller-computed bucket ids covering EVERY key in the batch (COW only)
    — skips the planning collect; an under-covering list would duplicate
    rows, so pass it only from code that derived it from the batch itself.
    ``batch_rows``: caller-measured batch row count — used only for the
    broadcast-vs-shuffle join decision, so a stale value risks a plan
    choice, never correctness; skips the planning count() job.

    ``bucket_deltas`` (MOR only): True appends bucket-partitioned delta
    files (per-bucket pruning, the big-batch shape); False appends
    unbucketed L0 files with no shuffle (max-throughput ingest); "auto"
    (default) picks per batch from the lineage's measured rows/bytes —
    small batches go to L0 (one tiny file instead of a num_buckets-file
    dynamic-partition write), big ones stay bucketed.  See
    ``_resolve_bucket_deltas``.
    """
    if mode not in ("cow", "mor", "dv"):
        raise ValueError(f"unknown merge mode {mode!r}")
    if mode == "mor" and order_col is None:
        raise ValueError("mor mode requires order_col (the LSN) for "
                         "last-writer-wins reconstruction")
    if partial_update and order_col is None:
        raise ValueError("partial_update requires order_col (the LSN) — "
                         "column-wise last-writer-wins needs an ordering")
    t0 = time.monotonic()
    base = table.manifest()
    if lineage and base.is_applied(lineage.get("batch_id")):
        return None  # replayed batch — already atomically applied

    key_cols = base.key_cols
    keep = (payload_cols if payload_cols is not None
            else [c for c in batch.columns
                  if c not in (op_col, order_col, present_col)])
    fold_cache: DataFrame | None = None
    if partial_update:
        # normalize presence to the hidden per-row array early: explicit
        # present_col per event, else the batch's column set (constant)
        default_present = F.array(*[F.lit(c) for c in keep])
        batch = batch.withColumn(
            PRESENT_COL,
            F.coalesce(F.col(present_col), default_present)
            if present_col is not None and present_col in batch.columns
            else default_present,
        )
        if present_col is not None and present_col in batch.columns:
            batch = batch.drop(present_col)
    if partial_update and mode in ("cow", "dv"):
        batch = _fold_partial_batch(table, batch, base, op_col, order_col,
                                    keep)
        fold_cache = batch  # persisted by the fold; released on every exit
        keep = [c for c in batch.columns if c not in (op_col, order_col)]
        partial_update = False  # batch is whole-row now; proceed normally
    mor_dedup = False
    if order_col is not None and not partial_update and (
        dedup_batch or mode in ("cow", "dv")
    ) and not keys_unique and fold_cache is None:
        # COW/DV require the dedup (whole-row replace has no LSN at read);
        # MOR may skip it — reconstruction collapses duplicates by __lsn.
        # Partial MOR MUST skip it: dropping a delete that precedes a
        # partial update would resurrect the wiped columns (the read-side
        # fold needs the full event sequence).  ``keys_unique=True`` is the
        # caller GUARANTEEING one event per key (e.g. a groupBy output) —
        # the dedup window would be a no-op shuffle, so it is skipped.
        if mode == "mor":
            # deferred into _merge_mor: when the delta write is bucketed,
            # the dedup hash-agg rides the write's own exchange (ONE
            # full-batch shuffle instead of two — _bucketed_lww_frame)
            mor_dedup = True
        else:
            batch = dedup_last_per_key(batch, key_cols, order_col)
    lsn_col = (
        [F.col(order_col).cast("long").alias(LSN_COL)]
        if mode == "mor" else []
    )
    batch = batch.select(
        *([op_col] if op_col in batch.columns else []), *lsn_col, *keep,
        *([PRESENT_COL] if partial_update else []),
    )

    if mode == "mor":
        # optimistic concurrency: a concurrent writer winning the manifest
        # race raises CommitConflict — rebase on the new snapshot and
        # restage (conflicts are rare; orphaned first-attempt files are
        # vacuum()ed).  MOR appends commute, so the retry is always safe;
        # the replay guard re-checks in case the OTHER writer applied this
        # very batch id.
        last_err: Exception | None = None
        for attempt in range(_MOR_COMMIT_RETRIES):
            base = table.manifest()
            if lineage and base.is_applied(lineage.get("batch_id")):
                return None
            try:
                return _merge_mor(
                    table, batch, base, op_col, lineage, evolve_schema,
                    files_per_bucket, auto_compact, t0, compact_ratio,
                    bucket_deltas=bucket_deltas,
                    properties_update=properties_update,
                    partial=partial_update,
                    dedup_lww=mor_dedup,
                )
            except CommitConflict as e:
                last_err = e
                # jittered backoff (Iceberg's commit.retry shape): under
                # genuine multi-writer contention the loser's rebase is
                # slower than the winners' claims, so a tight loop can
                # starve — the capped random sleep de-synchronizes the
                # herd (tests/test_catalog_seam.py concurrent writers)
                time.sleep(min(0.8, 0.05 * (2 ** attempt))
                           * (0.5 + random.random()))
                continue
        raise last_err  # type: ignore[misc]
    try:
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
        keep_map: dict[str, list] = {}
        if known_buckets is not None:
            # caller-supplied bucket ids (e.g. aggview refresh already
            # aggregated them) — skips the planning collect job (and the
            # file-granularity pass: those callers' tables hold one file
            # per bucket, so there is nothing to keep)
            touched = [int(b) for b in known_buckets]
        else:
            # ONE planning job yields the touched buckets AND the batch's
            # per-key-column bounding box — the input to FILE-GRANULARITY
            # rewriting: within a touched bucket, a base file whose zone
            # maps prove it holds no row inside the box cannot contain any
            # batch key, so its rows would survive the anti-join verbatim —
            # keep the file AS IS (its manifest entry re-registers
            # unchanged) instead of rewriting it.  On a sort/z-order
            # clustered table this turns COW write amplification from
            # O(touched buckets) into O(files overlapping the batch's key
            # range) — the Iceberg copy-on-write file-scoping analogue.
            touched, box = _batch_key_box(batch, bexpr, key_cols)
            if box is not None:
                keep_map = _cow_keepable_files(base, touched, box)
        if keep_map:
            # scan only the files being rewritten: a synthetic manifest
            # carrying the touched buckets minus the kept entries (the
            # same preview hook WAP uses)
            kept_paths = {
                e[0] for es in keep_map.values() for e in es
            }
            sub_files = {
                str(b): [
                    e for e in base.files.get(str(b), [])
                    if e[0] not in kept_paths
                ]
                for b in touched
                if base.files.get(str(b))
            }
            sub = Manifest(**{**base.__dict__, "files": sub_files})
            current = table.read(_manifest=sub)
        else:
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
            broadcast=(batch_rows if batch_rows is not None
                       else batch.count()) <= broadcast_key_limit,
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
        # kept (disjoint-by-zone-map) files re-register verbatim: same
        # path, schema id, stats — the commit below replaces the whole
        # bucket, and these entries ride in as part of its new file list
        for b, kept in keep_map.items():
            frag.setdefault(b, []).extend(list(e) for e in kept)

        lineage = _resolve_lineage(lineage)
        if lineage is not None:
            lineage = dict(lineage)
            lineage["wall_ms"] = int((time.monotonic() - t0) * 1000)
            if keep_map:
                # observability for the file-scoped rewrite: how many
                # entries the zone maps saved from rewriting this batch
                lineage["cow_files_kept"] = sum(
                    len(v) for v in keep_map.values()
                )
        # empty file-list entries for touched-but-now-empty buckets still replace
        replaced = {str(b) for b in touched}
        return table._commit(
            base, frag, replaced_buckets=replaced, lineage=lineage,
            schema=new_schema, operation="merge-cow",
            properties_update=properties_update,
        )
    finally:
        if fold_cache is not None:
            fold_cache.unpersist()


def _batch_key_box(batch: DataFrame, bexpr, key_cols: list[str]):
    """ONE planning job shared by the COW file scoping, the dv position
    scan and the partial-update patch read: the batch's touched bucket ids
    plus its per-key-column bounding box as ``read(where=)``-shaped
    predicates.  The box is ``None`` when the batch is empty or any key
    column holds NULLs — min/max ignore NULLs, so a NULL-keyed row would
    escape the box and break the disjointness proof."""
    aggs = [F.collect_set(bexpr.cast("int")).alias("__bs")]
    for i, c in enumerate(key_cols):
        aggs.append(F.min(F.col(c)).alias(f"__lo_{i}"))
        aggs.append(F.max(F.col(c)).alias(f"__hi_{i}"))
        aggs.append(F.max(F.col(c).isNull().cast("int")).alias(f"__nn_{i}"))
    head = batch.agg(*aggs).first()
    touched = [int(b) for b in head["__bs"]]
    if not touched or any(
        head[f"__nn_{i}"] for i in range(len(key_cols))
    ):
        return touched, None
    preds = []
    for i, c in enumerate(key_cols):
        preds.append((c, ">=", head[f"__lo_{i}"]))
        preds.append((c, "<=", head[f"__hi_{i}"]))
    return touched, preds


def _cow_keepable_files(
    base: Manifest, touched: list[int], preds: list[tuple],
) -> dict[str, list]:
    """Per touched bucket, the base-file entries whose zone maps prove
    they hold NO row inside the batch's key bounding box — safe to carry
    into the rewritten bucket unchanged.  Driver-side manifest arithmetic,
    zero Spark jobs.

    A bucket holding ANY non-base entry (delta / pdelta / dv) keeps
    nothing: a kept base file's keys could have newer versions in a delta
    (folded into the rewritten files → duplicate key rows across base
    files) or masked positions in a dv (dropped dv entry → resurrected
    rows), so those buckets take the whole-bucket rewrite.  Files without
    stats can't be disproven and rewrite too (`_file_may_match` is
    conservative: cross-type compares after a schema widen keep the
    file)."""
    from datax_spark.lake.table import _file_may_match

    keep: dict[str, list] = {}
    for b in touched:
        entries = base.files.get(str(b), [])
        if len(entries) < 2:
            continue  # nothing to scope: 0/1-file buckets rewrite as-is
        if any((e[2] if len(e) > 2 else "base") != "base" for e in entries):
            continue
        kept = [
            e for e in entries
            if len(e) > 5 and e[5] and not _file_may_match(e[5], preds)
        ]
        if kept:
            keep[str(b)] = kept
    return keep


def _fold_partial_batch(
    table: LakeTable,
    batch: DataFrame,
    base: Manifest,
    op_col: str | None,
    order_col: str,
    keep: list[str],
) -> DataFrame:
    """Fold a partial-update batch and patch it against current state,
    returning whole rows — the COW/DV front half of writeMode=update.

    Per key (one hash-agg): last delete LSN, last live LSN, and each covered
    column's value at the last live event (presence is batch-constant, so
    the last live event sets every covered column).  The key survives iff a
    live event follows the last delete; surviving keys take covered columns
    from the batch and the rest from current state — NULL instead if any
    delete occurred (the delete wiped the row; the rebuild covers only the
    batch's columns).

    Scale: the fold is map-side-partial on the batch; the patch reads ONLY
    the touched buckets and joins them against the broadcast key set, then
    a small×small left join — the big side never shuffles."""
    key_cols = base.key_cols
    val_cols = [c for c in keep if c not in key_cols]
    has_op = op_col is not None and op_col in batch.columns
    is_del = (
        (F.col(op_col) == F.lit(DELETE_OP)) if has_op else F.lit(False)
    )
    ev = batch.select(
        *key_cols, *val_cols,
        F.col(order_col).cast("long").alias("__l"),
        is_del.alias("__d"),
        F.col(PRESENT_COL).alias("__p"),
    ).persist()

    # stage 1: per key, the last delete LSN (the reset point)
    marks = ev.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.max(F.when(F.col("__d"), F.col("__l"))).alias("__dl"),
        F.max(F.col("__l")).alias("__ml"),
    )
    marks = marks.select(
        *[F.col(c).alias(f"__k_{c}") for c in key_cols], "__dl", "__ml"
    )
    kcond = None
    for c in key_cols:
        e = ev[c].eqNullSafe(F.col(f"__k_{c}"))
        kcond = e if kcond is None else (kcond & e)
    # stage 2: fold the post-delete live events column-wise.  Keys whose
    # last event is the delete have no such events and drop out here —
    # they re-enter below as delete rows.
    live = ev.join(F.broadcast(marks), on=kcond, how="inner").filter(
        ~F.col("__d")
        & (F.col("__l") > F.coalesce(F.col("__dl"), F.lit(-2)))
    )

    def covered(c: str):
        return F.array_contains(F.col("__p"), c)

    folded = live.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.max(F.col("__dl")).alias("__dl"),   # constant per key
        F.max(F.col("__l")).alias("__ll"),
        *[
            F.max_by(F.col(c), F.when(covered(c), F.col("__l")))
            .alias(f"__v_{c}")
            for c in val_cols
        ],
        *[
            F.max(F.when(covered(c), F.lit(1))).alias(f"__has_{c}")
            for c in val_cols
        ],
    ).persist()

    bexpr = table.bucket_expr(base.bucket_col, base.num_buckets)
    # one planning job: touched buckets + the batch-key bounding box.  The
    # patch only consumes CURRENT rows whose keys are in the batch (the
    # broadcast key join below), so handing the box to read(where=) is
    # residual-safe — it drops only rows the join would drop — and its
    # zone-map file skipping makes the patch read O(files overlapping the
    # batch key range) on a clustered table.
    touched, box = _batch_key_box(folded, bexpr, key_cols)
    current = table.read(buckets=touched, where=box)
    keys_b = F.broadcast(
        folded.select(*[F.col(c).alias(f"__k_{c}") for c in key_cols])
    )
    cond = None
    for c in key_cols:
        e = current[c].eqNullSafe(F.col(f"__k_{c}"))
        cond = e if cond is None else (cond & e)
    matched = current.join(keys_b, on=cond, how="inner").select(
        *[F.col(c).alias(f"__cur_{c}") for c in current.columns]
    )
    cond2 = None
    for c in key_cols:
        e = folded[c].eqNullSafe(matched[f"__cur_{c}"])
        cond2 = e if cond2 is None else (cond2 & e)
    joined = folded.join(F.broadcast(matched), on=cond2, how="left")

    preserved = {f.name: f.dataType for f in base.schema.fields}
    out_names = [f.name for f in base.schema.fields] + [
        c for c in val_cols if c not in preserved
    ]

    def value_of(c: str):
        """Covered by a surviving event → its (possibly NULL) value; else
        preserved from current state — unless a delete wiped the row."""
        prev = (
            F.when(F.col("__dl").isNotNull(), F.lit(None))
            .otherwise(F.col(f"__cur_{c}"))
            if c in preserved else F.lit(None)
        )
        if c in val_cols:
            v = F.when(F.col(f"__has_{c}") == 1, F.col(f"__v_{c}")) \
                .otherwise(prev)
        else:
            v = prev  # column the batch never carries
        return (v.cast(preserved[c]) if c in preserved else v).alias(c)

    out_cols = [
        folded[c] if c in key_cols else value_of(c) for c in out_names
    ]
    survivors = joined.select(
        *out_cols,
        F.col("__ll").alias(order_col),
        *([F.lit("upsert").alias(op_col)] if has_op else []),
    )
    out = survivors
    if has_op:
        # keys whose last event is a delete: emit the tombstone row
        dead = marks.filter(
            F.col("__dl").eqNullSafe(F.col("__ml"))
        ).select(
            *[F.col(f"__k_{c}").alias(c) for c in key_cols],
            *[F.lit(None).cast(
                preserved[c] if c in preserved else ev.schema[c].dataType
            ).alias(c) for c in out_names if c not in key_cols],
            F.col("__dl").alias(order_col),
            F.lit(DELETE_OP).alias(op_col),
        )
        out = survivors.unionByName(dead)
    out = out.persist()
    out.count()  # materialize so the fold is computed exactly once
    ev.unpersist()
    folded.unpersist()
    return out


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
        # ONE planning job: touched buckets + the batch's per-key-column
        # bounding box.  The position scan only needs rows whose KEYS are
        # in the batch, and every batch key lies inside the box — so base
        # files whose zone maps are disjoint from it are skipped before
        # they are opened (same soundness argument as the COW file
        # scoping; the key join provides exactness).  On a sort/z-order
        # clustered table the dv position scan reads O(files overlapping
        # the batch key range), not O(touched buckets).
        touched, scan_preds = _batch_key_box(batch, bexpr, base.key_cols)
        frag: dict = {}
        raw, _ = table._scan_raw(
            base, touched, expose_pos=True, where=scan_preds
        )
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
    lineage = {k: v for k, v in lineage.items() if not k.startswith("_est_")}
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
    bucket_deltas: bool | str = "auto",
    properties_update: dict | None = None,
    partial: bool = False,
    dedup_lww: bool = False,
) -> Manifest:
    """Merge-on-read apply: append the deduped batch as delta files.

    One Spark job (dedup shuffle + bucketed write) per batch — no scan of
    existing state, no key anti-join, no bucket collect.  Tombstones are
    written for deletes so reconstruction drops the key; later re-inserts
    win by LSN.

    ``dedup_lww``: the in-batch last-writer-wins dedup was deferred here by
    merge_into so it can FUSE with the delta write: bucketed writes run the
    dedup hash-agg inside the write's own exchange (one full-batch shuffle
    total — ``LakeTable._bucketed_lww_frame``); L0 writes, which have no
    exchange to ride, dedup as their own hash-agg exactly as before.

    ``partial``: files are tagged kind="pdelta" and carry ``__present`` (the
    batch's column set, constant per batch → dictionary-encoded to ~nothing)
    so the read-side fold knows which columns each event SETS vs preserves."""
    bucket_deltas = _resolve_bucket_deltas(bucket_deltas, base, lineage)
    data_cols = [
        c for c in batch.columns if c not in (op_col, LSN_COL, PRESENT_COL)
    ]
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
        # per-row presence, normalized by merge_into (null never reaches
        # storage — readers treat null as "covers everything")
        *([F.col(PRESENT_COL)] if partial else []),
    )
    staged_base = Manifest(**{**base.__dict__, "schema": new_schema})
    if new_schema.jsonValue() != base.schema.jsonValue():
        staged_base.current_schema_id = base.current_schema_id + 1
        staged_base.schemas = {
            **base.schemas,
            str(staged_base.current_schema_id): new_schema.jsonValue(),
        }
    # fused dedup needs the bucket id to be key-functional (bucket_col is a
    # key column — the default layout); otherwise fall back to a standalone
    # dedup hash-agg ahead of the write, as L0 (no write exchange) always does
    fuse = (dedup_lww and bucket_deltas
            and base.bucket_col in base.key_cols)
    if dedup_lww and not fuse:
        delta = dedup_last_per_key(delta, base.key_cols, LSN_COL)
    frag = table._stage_write(
        delta, staged_base, files_per_bucket,
        kind="pdelta" if partial else "delta",
        extra_cols=[LSN_COL, DELETED_COL]
        + ([PRESENT_COL] if partial else []),
        bucketed=bucket_deltas,
        dedup_lww=fuse,
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
    if m.properties.get("bootstrap_active"):
        # incremental-snapshot bootstrap in flight: FULL auto-compaction
        # defers (compact() would refuse loudly — it erases the
        # LSN/tombstone ordering the sentinel chunk fold needs), but
        # history-preserving MINOR compaction is safe and bounds the
        # bootstrap window's delta file count at the same threshold
        if auto_compact is not None:
            m2 = table.compact_minor(min_files=max(2, auto_compact))
            if m2 is not None:
                m = m2
        return m
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


# ------------------------------------------------------------- row-level DML
# reserved lineage shard for DML commits: each delete_where/update_where
# advances last_lsn() through it, so consecutive DML statements strictly
# order against each other AND against everything the feed has applied.
# Negative and distinct from -1 (the global watermark), it can never match
# a real feed shard, so resume filtering ignores it.
DML_SHARD = -2


def _dml_lineage(table: LakeTable, lsn: int, n: int) -> dict:
    return {"batch_id": f"dml{lsn}", "rows": int(n), "bytes": 0,
            "shard_lsns": {DML_SHARD: int(lsn)}}


def delete_where(
    table: LakeTable,
    where,
    lineage: dict | None = None,
    mode: str = "mor",
    auto_compact: int | None = None,
) -> int:
    """``DELETE FROM table WHERE ...`` — the row-level delete surface the
    reference only reaches through preSql (`WriterUtil.java:78-108`
    executes raw DELETE statements before a sync; here the delete is an
    ACID commit with lineage like any merge).

    Plan: one zone-map-pruned scan of the CURRENT state for matching rows
    (``read(where=...)`` — with a dim-clustered layout whole files skip),
    keys only, then a MOR tombstone merge (O(matching rows) appended, no
    bucket rewrite).  The batch's keys are unique by construction (they
    come from reconstructed state), so the merge skips the dedup shuffle.
    Returns the number of rows deleted.  ``where`` takes the
    ``read(where=...)`` predicate list or a boolean Column."""
    m = table.manifest()
    cur = table.read(where=where) if not _is_column(where) \
        else table.read().filter(where)
    lsn = table.last_lsn() + 1
    batch = cur.select(
        *[F.col(c) for c in m.key_cols],
        F.lit("delete").alias("__dml_op"),
        F.lit(lsn).cast("long").alias("__dml_lsn"),
    ).persist()
    n = batch.count()
    if n == 0:
        batch.unpersist()
        return 0
    try:
        merge_into(
            table,
            batch,
            op_col="__dml_op",
            order_col="__dml_lsn",
            payload_cols=list(m.key_cols),
            lineage=lineage or _dml_lineage(table, lsn, n),
            evolve_schema=False,
            mode=mode,
            auto_compact=auto_compact,
            keys_unique=True,
        )
    finally:
        batch.unpersist()
    return n


def update_where(
    table: LakeTable,
    where,
    set_exprs: dict,
    lineage: dict | None = None,
    mode: str = "mor",
    auto_compact: int | None = None,
) -> int:
    """``UPDATE table SET col = expr WHERE ...`` — row-level update as an
    ACID merge: one pruned scan of matching CURRENT rows, SET expressions
    applied column-wise (values are Columns — which see the row's current
    values — or plain literals; pass F.expr(...) explicitly for SQL
    strings, a bare str is a LITERAL), then an upsert merge of the
    rewritten whole rows.  O(matching rows); returns how many."""
    m = table.manifest()
    cur = table.read(where=where) if not _is_column(where) \
        else table.read().filter(where)
    bad = set(set_exprs) - {f.name for f in m.schema.fields}
    if bad:
        raise ValueError(f"update_where SET of unknown columns: {sorted(bad)}")
    if set(set_exprs) & set(m.key_cols):
        raise ValueError(
            "update_where cannot SET key columns — delete + re-insert "
            "instead (a key change is a different logical row)"
        )

    def as_col(v):
        return v if isinstance(v, F.Column) else F.lit(v)

    lsn = table.last_lsn() + 1
    batch = cur.select(
        *[
            (as_col(set_exprs[f.name]).cast(f.dataType)
             if f.name in set_exprs else F.col(f.name)).alias(f.name)
            for f in m.schema.fields
        ],
        F.lit("insert").alias("__dml_op"),
        F.lit(lsn).cast("long").alias("__dml_lsn"),
    ).persist()
    n = batch.count()
    if n == 0:
        batch.unpersist()
        return 0
    try:
        merge_into(
            table,
            batch,
            op_col="__dml_op",
            order_col="__dml_lsn",
            lineage=lineage or _dml_lineage(table, lsn, n),
            evolve_schema=False,
            mode=mode,
            auto_compact=auto_compact,
            keys_unique=True,
        )
    finally:
        batch.unpersist()
    return n


def _is_column(where) -> bool:
    return isinstance(where, F.Column)


class MergeBuilder:
    """Declarative ``MERGE INTO`` with Delta/Iceberg-style WHEN clauses —
    the user-facing merge surface on top of :func:`merge_into`'s whole-row
    event machinery (which itself models DataX's fixed
    REPLACE/ON-DUPLICATE-KEY semantics, WriterUtil.java:110-167; the
    builder generalizes them to arbitrary conditional clauses).

        merge_builder(table, source)
            .when_matched_update(set={"qty": "t.qty + s.qty"},
                                 condition="s.op = 'add'")
            .when_matched_delete(condition="s.op = 'del'")
            .when_not_matched_insert(condition="s.op <> 'del'")
            .execute()

    Semantics (Delta's): source rows join target CURRENT state on the
    table's key columns (null-safe); per source row the FIRST clause whose
    kind (matched/not-matched) and condition apply wins; rows matching no
    clause change nothing.  ``condition`` / ``set`` / ``values``
    expressions are Columns or SQL strings over two namespaces: ``t``
    (target current row) and ``s`` (source row).  ``set=None`` updates
    every source column (Delta ``updateAll``); a ``set`` dict updates only
    the listed columns and the rest keep their target value.  ``values``
    columns not listed take the source column of the same name, else NULL.  The source must have at
    most one row per key (checked; ``source_unique=True`` skips the check
    when the caller can guarantee it — e.g. a groupBy output).

    Scale: one planning aggregate over the source (per-bucket key stats —
    also the uniqueness check), a bucket-pruned read of only the target
    buckets the source touches, a key equi-join (AQE broadcasts the small
    side), then an O(emitted-rows) MOR merge — never O(table).  All pure
    Column expressions; no Python row path."""

    def __init__(self, table: LakeTable, source: DataFrame):
        self.table = table
        self.source = source
        self._clauses: list[tuple[str, dict | None, object]] = []
        m = table.manifest()
        missing = [k for k in m.key_cols if k not in source.columns]
        if missing:
            raise ValueError(f"merge source lacks key columns {missing}")

    # -- clause registration (returns self for chaining) ------------------
    def when_matched_update(self, set: dict | None = None,  # noqa: A002
                            condition=None) -> "MergeBuilder":
        if set is not None:
            schema_cols = {f.name for f in self.table.manifest().schema.fields}
            bad = sorted(set.keys() - schema_cols)
            if bad:
                raise ValueError(f"update SET of unknown columns: {bad}")
            key_hit = sorted(set.keys() & {*self.table.manifest().key_cols})
            if key_hit:
                raise ValueError(
                    f"update SET cannot change key columns {key_hit} — "
                    "delete + insert instead"
                )
        self._clauses.append(("update", set, condition))
        return self

    def when_matched_delete(self, condition=None) -> "MergeBuilder":
        self._clauses.append(("delete", None, condition))
        return self

    def when_not_matched_insert(self, values: dict | None = None,
                                condition=None) -> "MergeBuilder":
        if values is not None:
            schema_cols = {f.name for f in self.table.manifest().schema.fields}
            bad = sorted(values.keys() - schema_cols)
            if bad:
                raise ValueError(f"insert VALUES of unknown columns: {bad}")
        self._clauses.append(("insert", values, condition))
        return self

    # -- execution ---------------------------------------------------------
    def execute(
        self,
        mode: str = "mor",
        lineage: dict | None = None,
        auto_compact: int | None = None,
        source_unique: bool = False,
        properties_update: dict | None = None,
    ) -> int:
        """Run the merge as one ACID commit; returns rows affected
        (updates + deletes + inserts).  0-clause or 0-match merges commit
        nothing and return 0.  ``properties_update`` publishes table
        properties in the SAME atomic commit as the merged rows (the
        watermark-rides-the-commit pattern of aggview/mirror)."""
        if not self._clauses:
            raise ValueError("merge has no WHEN clauses")
        t = self.table
        m = t.manifest()
        keys = list(m.key_cols)
        src = self.source

        # one planning aggregate: per-bucket row/distinct-key counts —
        # the touched-bucket list for pruning AND the uniqueness check
        buckets: list[int] | None = None
        if m.bucket_col in keys:
            bexpr = t.bucket_expr(m.bucket_col, m.num_buckets)
            stats = (
                src.groupBy(bexpr.alias("__b"))
                .agg(F.count(F.lit(1)).alias("n"),
                     # struct-wrapped so NULL key values still count as a
                     # key (DISTINCT skips only a NULL whole-expression)
                     F.count_distinct(
                         F.struct(*[F.col(k) for k in keys])).alias("d"))
                .collect()
            )
            if not stats:
                return 0
            if not source_unique and any(r["n"] != r["d"] for r in stats):
                raise ValueError(
                    "merge source has multiple rows per key — dedup it "
                    "first (or pass source_unique=True when the caller "
                    "guarantees it)"
                )
            buckets = sorted({int(r["__b"]) for r in stats
                              if r["__b"] is not None})
        elif not source_unique:
            dup = (src.groupBy(*keys).count()
                   .filter(F.col("count") > 1).limit(1).count())
            if dup:
                raise ValueError(
                    "merge source has multiple rows per key — dedup it first"
                )

        cur = (t.read(buckets=buckets)
               .withColumn("__t_exists", F.lit(True)).alias("t"))
        on = None
        for k in keys:
            e = F.col(f"s.{k}").eqNullSafe(F.col(f"t.{k}"))
            on = e if on is None else (on & e)
        joined = src.alias("s").join(cur, on=on, how="left")
        matched = F.col("__t_exists").isNotNull()

        def cond_col(c):
            if c is None:
                return F.lit(True)
            return F.expr(c) if isinstance(c, str) else c

        def val_col(v):
            return F.expr(v) if isinstance(v, str) else (
                v if isinstance(v, F.Column) else F.lit(v))

        # first-match-wins action index (matched/not-matched disjoint by
        # the flag, so one chain in declaration order is exact)
        act = None
        for i, (kind, _, cond) in enumerate(self._clauses):
            gate = (matched if kind in ("update", "delete") else ~matched) \
                & cond_col(cond)
            act = F.when(gate, F.lit(i)) if act is None else act.when(
                gate, F.lit(i))
        out = joined.withColumn("__act", act).filter(
            F.col("__act").isNotNull())

        # per-column value = CASE over the winning clause
        cols = []
        for f in m.schema.fields:
            expr = None
            for i, (kind, mapping, _) in enumerate(self._clauses):
                if kind == "update":
                    if mapping is not None:
                        v = (val_col(mapping[f.name])
                             if f.name in mapping else F.col(f"t.{f.name}"))
                    elif f.name in src.columns and f.name not in keys:
                        # set=None — Delta updateAll: every source column
                        # overwrites; columns the source lacks keep target
                        v = F.col(f"s.{f.name}")
                    else:
                        v = F.col(f"t.{f.name}")
                elif kind == "delete":
                    v = F.col(f"t.{f.name}")
                else:  # insert
                    if mapping and f.name in mapping:
                        v = val_col(mapping[f.name])
                    elif f.name in src.columns:
                        v = F.col(f"s.{f.name}")
                    else:
                        v = F.lit(None)
                hit = F.col("__act") == F.lit(i)
                expr = F.when(hit, v) if expr is None else expr.when(hit, v)
            cols.append(expr.cast(f.dataType).alias(f.name))

        is_del = F.col("__act").isin([
            i for i, (k, _, _) in enumerate(self._clauses) if k == "delete"
        ]) if any(k == "delete" for k, _, _ in self._clauses) else F.lit(False)
        lsn = t.last_lsn() + 1
        batch = out.select(
            *cols,
            F.when(is_del, F.lit(DELETE_OP)).otherwise(F.lit("insert"))
            .alias("__dml_op"),
            F.lit(lsn).cast("long").alias("__dml_lsn"),
        ).persist()
        n = batch.count()
        if n == 0:
            batch.unpersist()
            return 0
        if lineage is None:
            lineage = _dml_lineage(t, lsn, n)
        else:
            lineage = dict(lineage)
            lineage.setdefault("rows", int(n))
            lineage.setdefault("bytes", 0)
        try:
            merge_into(
                t,
                batch,
                op_col="__dml_op",
                order_col="__dml_lsn",
                lineage=lineage,
                evolve_schema=False,
                mode=mode,
                auto_compact=auto_compact,
                keys_unique=True,
                known_buckets=buckets,
                properties_update=properties_update,
            )
        finally:
            batch.unpersist()
        return n


def merge_builder(table: LakeTable, source: DataFrame) -> MergeBuilder:
    """Entry point for WHEN-clause merges — see :class:`MergeBuilder`."""
    return MergeBuilder(table, source)
