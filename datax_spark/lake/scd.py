"""Type-2 slowly-changing-dimension (SCD2) history maintained from a CDC
feed.

The reference engine syncs the CURRENT state of a source table
(writeMode insert/replace/update — ``WriterUtil.java:110-167``), and the
first thing a warehouse downstream of such a sync builds is the change
HISTORY the sync threw away.  Here the history is a first-class target
table: one row per key per version interval ``[valid_from, valid_to)``
in source-LSN time, closed by the key's next change (or delete), with
``is_current`` marking the live row.  ``scd2_as_of`` reconstructs the
dimension at any past LSN without snapshots — the classic temporal-join
feed for ``functions/temporal.temporal_table_join``.

Scale shape (100-TB design):

- The per-batch fold is one window over the MICRO-BATCH partitioned by
  key — O(batch log batch-per-key), never O(table).
- Open rows for touched keys come from one key-join read of the
  ``is_current`` slice; the batch-keys side is deduped + broadcast under
  the same size guard as merge's COW path, so the big (history) side
  never shuffles.
- The write is an ordinary :func:`datax_spark.lake.merge.merge_into` on
  key ``(*natural key, valid_from)`` — O(batch) appends under MOR,
  exactly-once via the same lineage replay guard as every other apply
  path, so crash/replay converges byte-identically.

Optional ``suppress_unchanged`` drops no-op updates (Debezium feeds are
full of them: every source UPDATE emits an event even when the mapped
columns are untouched) so they open no spurious interval — run-length
``lag`` comparison per key, deletes acting as breaks, null-safe on the
payload struct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable

VALID_FROM = "valid_from"
VALID_TO = "valid_to"
IS_CURRENT = "is_current"
_RESERVED = (VALID_FROM, VALID_TO, IS_CURRENT)
# broadcast the deduped batch-key frame below this many batch rows — same
# rationale as merge_into's broadcast_key_limit (a 10^8-key backfill
# would OOM the driver; micro-batches are far below it)
_BROADCAST_KEY_LIMIT = 1_000_000


def scd2_schema(
    key_schema: list[T.StructField], payload_schema: list[T.StructField]
) -> T.StructType:
    """History-table schema: natural key + payload + interval columns."""
    return T.StructType(
        [*key_schema, *payload_schema,
         T.StructField(VALID_FROM, T.LongType(), False),
         T.StructField(VALID_TO, T.LongType(), True),
         T.StructField(IS_CURRENT, T.BooleanType(), False)]
    )


def scd2_create(
    spark: SparkSession,
    location: str,
    schema: T.StructType,
    key_cols: list[str],
    num_buckets: int = 16,
    **create_kw,
) -> LakeTable:
    """Create the history table for a dimension whose SOURCE schema is
    ``schema`` (key + payload).  The lake key is ``(*key_cols,
    valid_from)`` — each version interval is its own row — bucketed by
    the first natural-key column so every interval of a key co-locates
    (point history reads prune to one bucket; the apply path's open-row
    read never crosses buckets)."""
    for c in _RESERVED:
        if c in schema.names:
            raise ValueError(f"source schema may not carry reserved "
                             f"column {c!r}")
    key_fields = [schema[c] for c in key_cols]
    payload_fields = [f for f in schema.fields if f.name not in key_cols]
    bucket_col = create_kw.pop("bucket_col", key_cols[0])
    if bucket_col not in key_cols:
        # bucketing by a payload column would scatter a key's intervals
        # across buckets as its payload changes — the apply path's
        # bucket-pruned open-row read would then MISS the open interval
        # and leave it unclosed (silent history corruption)
        raise ValueError(
            f"scd2 bucket_col {bucket_col!r} must be a natural key "
            f"column (one of {key_cols})")
    return LakeTable.create(
        spark, location,
        schema=scd2_schema(key_fields, payload_fields),
        key_cols=[*key_cols, VALID_FROM],
        bucket_col=bucket_col,
        num_buckets=num_buckets,
        **create_kw,
    )


def _enforce_scd2_schema_policy(
    table: LakeTable, batch: DataFrame, policy: str,
    nat_keys: list[str], payload_cols: list[str], allowed: set,
) -> None:
    """schema_policy="strict" for SCD2 targets: the batch payload must
    equal (natural key + payload) exactly — names AND types — else the
    batch fails loudly BEFORE any write.  Needed here even more than on
    current-state targets: scd2_apply projects to the table's payload
    columns, so under the default "evolve" a NEW feed column is silently
    DROPPED (history tables don't auto-evolve — an interval row's width
    is fixed at creation); strict is how an operator turns that into a
    stop-the-pipeline signal."""
    if policy == "evolve":
        return
    if policy != "strict":
        raise ValueError(f"unknown schema_policy {policy!r}")
    from datax_spark.cdc.apply import SchemaPolicyViolation

    want = {f.name: f.dataType.simpleString()
            for f in table.schema().fields if f.name not in _RESERVED}
    got = {f.name: f.dataType.simpleString()
           for f in batch.schema.fields if f.name not in allowed}
    extra = sorted(c for c in got if c not in want)
    missing_c = sorted(c for c in want if c not in got)
    changed = sorted(f"{c}: {got[c]} != {want[c]}"
                     for c in got if c in want and got[c] != want[c])
    if extra or missing_c or changed:
        raise SchemaPolicyViolation(
            "schema_policy='strict' rejected the scd2 batch before any "
            f"write — extra columns: {extra or '-'}; missing columns: "
            f"{missing_c or '-'}; type changes: {changed or '-'}. "
            "History tables do not auto-evolve; recreate the target or "
            "fix the feed.")


def scd2_fold(
    batch: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    order_col: str = "lsn",
    op_col: str = "op",
    suppress_unchanged: bool = False,
) -> DataFrame:
    """Fold a change batch (possibly many events per key) into SCD2
    interval rows.

    Every non-delete event opens an interval at its LSN, closed by the
    key's NEXT event of any op (a delete closes without opening).
    ``order_col`` must be unique per key within the batch — true of any
    binlog position; ties would make interval keys collide.

    This is the batch-local half; :func:`scd2_apply` unions the open
    table rows in as seed events so cross-batch closure falls out of the
    same window.
    """
    return _fold(batch, key_cols, payload_cols, order_col, op_col,
                 suppress_unchanged, seed_col=None)


def _fold(
    events: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    order_col: str,
    op_col: str,
    suppress_unchanged: bool,
    seed_col: str | None,
) -> DataFrame:
    """Shared fold over real events (+ optional seed pseudo-events).

    Seed rows (``seed_col`` true) replay a key's open table row at its
    original ``valid_from`` so the window's ``lead`` closes it exactly
    where the batch's first surviving event lands; a seed that remains
    open (nothing in the batch survived for that key) is dropped — the
    table row is already correct, rewriting it would be pure write
    amplification.
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    is_del = F.col(op_col) == "delete"
    if suppress_unchanged:
        # run-length suppression: an event equal (null-safely) to its
        # predecessor's surviving state is a no-op.  Deletes break runs
        # (their "state" is NULL, never equal to a real payload struct);
        # a delete whose predecessor is a delete — or nothing at all —
        # is itself a no-op.  Consecutive equal events all compare to a
        # member of the same run, so lag() over the UNFILTERED sequence
        # is sufficient (no recursion needed).
        state = F.when(~is_del, F.struct(*[F.col(c) for c in payload_cols]))
        prev = F.lag(state).over(w)
        prev_op = F.lag(F.col(op_col)).over(w)
        keep = F.when(is_del, prev_op.isNotNull() & (prev_op != "delete")) \
            .otherwise(~state.eqNullSafe(prev))
        events = events.withColumn("__keep", keep).filter("__keep") \
            .drop("__keep")
    out = (
        events
        .withColumn("__vt", F.lead(order_col).over(w))
        .filter(~is_del)
    )
    if seed_col is not None:
        out = out.filter(~(F.col(seed_col) & F.col("__vt").isNull()))
    return out.select(
        *key_cols, *payload_cols,
        F.col(order_col).cast("long").alias(VALID_FROM),
        F.col("__vt").cast("long").alias(VALID_TO),
        F.col("__vt").isNull().alias(IS_CURRENT),
    )


def scd2_apply(
    table: LakeTable,
    batch: DataFrame,
    batch_id: int | str | None = None,
    order_col: str = "lsn",
    op_col: str = "op",
    suppress_unchanged: bool = False,
    mode: str = "mor",
    lineage_extra: dict | None = None,
    schema_policy: str = "evolve",
    _plan: tuple | None = None,
    **merge_kw,
) -> "Manifest | None":
    """Apply one CDC micro-batch to an SCD2 history table.

    ``batch`` carries the natural key + payload + ``op_col``
    (insert/update/delete) + ``order_col`` (LSN, unique per key, and —
    the same feed contract every apply path here assumes — greater than
    any LSN already applied for that key).  Returns the new manifest, or
    None when ``batch_id`` was already applied (exactly-once replay
    guard, shared with :func:`merge_into`).

    Mechanics: each touched key's OPEN row re-enters the fold as a seed
    pseudo-event at its original ``valid_from``; one window then yields
    both the closure of the open interval and the batch's new intervals.
    With ``suppress_unchanged`` the seed also provides the cross-batch
    "previous state", so an update identical to the stored current row
    opens no interval.
    """
    nat_keys = [c for c in table.manifest().key_cols if c != VALID_FROM]
    payload_cols = [
        f.name for f in table.schema().fields
        if f.name not in (*nat_keys, *_RESERVED)
    ]
    _enforce_scd2_schema_policy(
        table, batch, schema_policy, nat_keys, payload_cols,
        allowed={op_col, order_col, "shard", "ts"},
    )
    missing = [c for c in (*nat_keys, *payload_cols, op_col, order_col)
               if c not in batch.columns]
    if missing:
        raise ValueError(f"batch is missing columns {missing}")
    m = table.manifest()
    if batch_id is not None and m.is_applied(batch_id):
        return None  # don't pay the fold jobs for a replay

    if _plan is not None:
        n_rows, hi, touched, preds = _plan
        if n_rows == 0:
            return None
    else:
        # ONE planning aggregate (the merge path's _batch_key_box shape):
        # row count + batch max LSN (the MOR ordinal) + touched buckets +
        # natural-key bounding box — so the open-row read below scans
        # only the buckets this batch touches and only the history files
        # whose zone maps intersect the batch's key range, instead of
        # folding the WHOLE history table every micro-batch (the
        # difference between O(batch-adjacent files) and O(table) at
        # 100 TB).
        bexpr = table.bucket_expr(m.bucket_col, m.num_buckets)
        probe = batch.select(
            *nat_keys, F.lit(1).alias("__one"),
            F.col(order_col).cast("long").alias("__lsn"),
        )
        aggs = [F.count("__one").alias("__n"),
                F.max("__lsn").alias("__hi"),
                F.collect_set(bexpr.cast("int")).alias("__bs")]
        for i, c in enumerate(nat_keys):
            aggs.append(F.min(F.col(c)).alias(f"__lo_{i}"))
            aggs.append(F.max(F.col(c)).alias(f"__hi_{i}"))
            aggs.append(
                F.max(F.col(c).isNull().cast("int")).alias(f"__nn_{i}"))
        head = probe.agg(*aggs).first()
        n_rows = int(head["__n"])
        if n_rows == 0:
            return None
        hi = int(head["__hi"])
        touched = sorted(int(b) for b in head["__bs"])
        preds = None
        if touched and not any(
                head[f"__nn_{i}"] for i in range(len(nat_keys))):
            preds = []
            for i, c in enumerate(nat_keys):
                preds.append((c, ">=", head[f"__lo_{i}"]))
                preds.append((c, "<=", head[f"__hi_{i}"]))
    merge_kw.pop("batch_rows", None)  # superseded by the fused count

    batch_keys = batch.select(*nat_keys).distinct()
    if n_rows <= _BROADCAST_KEY_LIMIT:
        batch_keys = F.broadcast(batch_keys)
    open_rows = (
        table.read(buckets=touched or None, where=preds)
        .filter(F.col(IS_CURRENT))
        .join(batch_keys, on=nat_keys, how="inner")
    )
    seeds = open_rows.select(
        *nat_keys, *payload_cols,
        F.col(VALID_FROM).cast("long").alias(order_col),
        F.lit("insert").alias(op_col),
        F.lit(True).alias("__seed"),
    )
    events = batch.select(
        *nat_keys, *payload_cols,
        F.col(order_col).cast("long").alias(order_col),
        F.col(op_col).alias(op_col),
        F.lit(False).alias("__seed"),
    )
    rows = _fold(
        seeds.unionByName(events), nat_keys, payload_cols, order_col,
        op_col, suppress_unchanged, seed_col="__seed",
    ).withColumn("__op", F.lit("insert"))
    # MOR last-writer-wins across batches: every row of this batch carries
    # one ordinal — any monotone per-batch value works because a given
    # (key, valid_from) is only ever REwritten in a later batch (closing
    # an interval opened earlier).  The batch's max LSN (from the fused
    # planning aggregate) is monotone by the feed contract.
    rows = rows.withColumn("__ord", F.lit(hi).cast("long"))
    lineage = None
    if batch_id is not None or lineage_extra:
        lineage = {**(lineage_extra or {})}
        if batch_id is not None:
            lineage["batch_id"] = batch_id
    return merge_into(
        table, rows, op_col="__op", order_col="__ord",
        lineage=lineage, mode=mode, keys_unique=True, **merge_kw,
    )


def scd2_run_incremental(
    table: LakeTable,
    feed: DataFrame,
    batch_lsns: int,
    order_col: str = "lsn",
    op_col: str = "op",
    suppress_unchanged: bool = False,
    mode: str = "mor",
    max_batches: int | None = None,
    schema_policy: str = "evolve",
    **merge_kw,
) -> list[dict]:
    """Bounded incremental replay of ``feed`` into the history table —
    the SCD2 counterpart of :func:`datax_spark.cdc.runner.run_incremental`
    (same LSN-range micro-batching, same deterministic
    ``lsn // batch_lsns`` batch ids, so a resumed run regenerates
    identical boundaries and replayed ids no-op via the lineage guard).
    Returns one ``{"batch_id", "rows"}`` dict per batch applied by THIS
    call (rows = feed events in the batch, the same accounting as every
    other run path)."""
    # one upfront job sizes every batch: empty LSN windows are skipped
    # without paying scd2_apply's planning aggregate
    per = feed.groupBy(
        F.floor(F.col(order_col) / F.lit(int(batch_lsns)))
        .cast("long").alias("__b")
    ).agg(F.count(F.lit(1)).alias("__n")).collect()
    counts = {int(r["__b"]): int(r["__n"]) for r in per
              if r["__b"] is not None}
    if not counts:
        return []
    # ids derive from lsn // batch_lsns: a rerun with a DIFFERENT
    # granularity would map new events onto already-applied ids and the
    # replay guard would silently drop them (same contract as
    # cdc/runner.run_incremental)
    recorded = table.manifest().properties.get("scd2_batch_lsns")
    if recorded is None:
        table.set_properties(scd2_batch_lsns=int(batch_lsns))
    elif int(recorded) != int(batch_lsns):
        raise ValueError(
            f"batch_lsns={batch_lsns} conflicts with this table's recorded "
            f"granularity {recorded}: batch ids would collide with "
            f"already-applied ids. Re-run with batch_lsns={recorded}."
        )
    applied = []
    for b in sorted(counts):
        if max_batches is not None and len(applied) >= max_batches:
            break
        lo, hi = b * batch_lsns, (b + 1) * batch_lsns
        part = feed.filter(
            (F.col(order_col) >= lo) & (F.col(order_col) < hi)
        )
        if scd2_apply(
            table, part, batch_id=b, order_col=order_col, op_col=op_col,
            suppress_unchanged=suppress_unchanged, mode=mode,
            schema_policy=schema_policy, **merge_kw,
        ) is not None:
            applied.append({"batch_id": b, "rows": counts[b]})
    return applied


class Scd2Applier:
    """Streaming-protocol adapter: maintain an SCD2 history table from a
    live tail.  Pass this object as the ``table`` argument of
    :func:`datax_spark.streaming.runner.run_available_now` /
    ``run_continuous`` (anything exposing ``filter_already_applied`` /
    ``apply_batch`` / ``location`` is an applier there) — the history
    rides the same checkpointed, rate-capped, exactly-once foreachBatch
    path as a current-state target.

    Resume semantics match :class:`datax_spark.cdc.apply.CdcApplier`:
    each applied batch records per-shard max-LSN watermarks (when the
    feed carries a ``shard`` column), so after checkpoint loss or a
    source rewind the watermark filter drops already-folded events —
    necessary here because re-folding an old event against a history
    that has since moved on would resurrect a closed interval as open.
    Within the checkpoint's lifetime, stable micro-batch ids no-op
    replays via the ordinary lineage guard before any fold job runs.
    """

    def __init__(
        self,
        table: LakeTable,
        suppress_unchanged: bool = False,
        order_col: str = "lsn",
        op_col: str = "op",
        shard_col: str = "shard",
        mode: str = "mor",
        schema_policy: str = "evolve",
        **merge_kw,
    ):
        from datax_spark.cdc.apply import CdcApplier

        self.table = table
        self.location = table.location
        self.suppress_unchanged = suppress_unchanged
        self.order_col = order_col
        self.op_col = op_col
        self.shard_col = shard_col
        self.mode = mode
        self.schema_policy = schema_policy
        self.merge_kw = merge_kw
        # reuse the engine's shard-watermark resume filter (literal
        # per-shard predicates, sentinel exemption) — it only needs the
        # table's manifest, which is shared here
        self._wm = CdcApplier(table)

    def filter_already_applied(self, feed: DataFrame) -> DataFrame:
        return self._wm.filter_already_applied(feed)

    def apply_batch(self, batch: DataFrame, batch_id) -> dict | None:
        if batch_id is not None and \
                self.table.manifest().is_applied(batch_id):
            return None
        # ONE planning job for everything scalar: per-shard resume
        # watermarks + batch size + max LSN + touched buckets + the
        # natural-key bounding box (per shard, combined driver-side) —
        # scd2_apply then skips its own planning aggregate, so the hot
        # tail path scans each micro-batch exactly twice (plan, write)
        # like the current-state applier.
        m = self.table.manifest()
        nat_keys = [c for c in m.key_cols if c != VALID_FROM]
        bexpr = self.table.bucket_expr(m.bucket_col, m.num_buckets)
        shard = (F.col(self.shard_col) if self.shard_col in batch.columns
                 else F.lit(None).cast("int"))
        aggs = [
            F.max(F.col(self.order_col).cast("long")).alias("__hi"),
            F.count(F.lit(1)).alias("__n"),
            F.collect_set(bexpr.cast("int")).alias("__bs"),
        ]
        for i, c in enumerate(nat_keys):
            aggs.append(F.min(F.col(c)).alias(f"__lo_{i}"))
            aggs.append(F.max(F.col(c)).alias(f"__hi_{i}"))
            aggs.append(
                F.max(F.col(c).isNull().cast("int")).alias(f"__nn_{i}"))
        per = batch.groupBy(shard.alias("__shard")).agg(*aggs).collect()
        n = sum(int(r["__n"]) for r in per)
        if n == 0:
            return None
        his = [int(r["__hi"]) for r in per if r["__hi"] is not None]
        if not his:
            raise ValueError(
                f"batch carries no non-null {self.order_col!r} values — "
                "SCD2 needs an ordering; quarantine null-LSN rows first")
        hi = max(his)
        touched = sorted({int(b) for r in per for b in r["__bs"]})
        preds = None
        if touched and not any(
                r[f"__nn_{i}"] for r in per for i in range(len(nat_keys))):
            preds = []
            for i, c in enumerate(nat_keys):
                preds.append((c, ">=", min(r[f"__lo_{i}"] for r in per)))
                preds.append((c, "<=", max(r[f"__hi_{i}"] for r in per)))
        extra: dict = {"rows": int(n)}
        if self.shard_col in batch.columns:
            extra["shard_lsns"] = {
                str(r["__shard"]): int(r["__hi"]) for r in per
                if r["__shard"] is not None and int(r["__hi"]) >= 0
            }
        mf = scd2_apply(
            self.table, batch, batch_id=batch_id,
            order_col=self.order_col, op_col=self.op_col,
            suppress_unchanged=self.suppress_unchanged, mode=self.mode,
            lineage_extra=extra, schema_policy=self.schema_policy,
            _plan=(n, hi, touched, preds), **self.merge_kw,
        )
        if mf is None:
            return None
        return {"batch_id": batch_id, **extra}


def scd2_current(table: LakeTable) -> DataFrame:
    """The live dimension — equivalent to the ordinary CDC fold of the
    same feed into a current-state table."""
    return table.read().filter(F.col(IS_CURRENT)) \
        .drop(VALID_FROM, VALID_TO, IS_CURRENT)


def scd2_as_of(table: LakeTable, lsn: int) -> DataFrame:
    """The dimension as of source LSN ``lsn`` (inclusive) — interval
    containment over the history, no snapshot needed.  The ``valid_from``
    bound is passed through ``read(where=)`` so zone maps prune history
    files that only hold newer intervals."""
    return (
        table.read(where=[(VALID_FROM, "<=", int(lsn))])
        .filter(F.col(VALID_TO).isNull() | (F.col(VALID_TO) > int(lsn)))
        .drop(VALID_FROM, VALID_TO, IS_CURRENT)
    )
