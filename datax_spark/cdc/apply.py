"""CDC apply: change batch → idempotent MERGE into the lake table.

The rebuild of DataX's writer-side upsert path (REPLACE / ON DUPLICATE KEY
UPDATE, plugin-rdbms-util/.../writer/util/WriterUtil.java:110-167) plus the
checkpoint semantics of its CDC reader (otsstreamreader persists
(shardIterator, skipCount) checkpoints in a status table —
otsstreamreader/src/main/java/com/alibaba/datax/plugin/reader/otsstreamreader/internal/core/RecordProcessor.java:186-248).

Differences by design (SURVEY.md §2.7):
- DELETE events are applied (the reference drops them in single-version mode,
  otsstreamreader/.../core/SingleVerAndUpOnlyModeRecordSender.java:44-46).
- Exactly-once: lineage (batch id + per-shard last LSN + per-partition
  rows/bytes) commits atomically WITH the data in one manifest swap, so a
  replayed micro-batch (Spark checkpoint behind the table commit after a
  crash) is detected and skipped, and a feed re-read from an older offset is
  filtered by ``filter_already_applied``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable

ENVELOPE_COLS = ("lsn", "shard", "ts", "op")

# lineage_detail="shards" fused-metrics cap: per-shard conditional
# aggregates ride the write job as 3 observe columns per shard; past this
# many shards the expression set bloats codegen and the dedicated
# aggregation job is the better plan again
FUSED_SHARDS_MAX = 64
# fuse only when the trailing batch is big enough that re-scanning it for
# the stats pass is real I/O: MEASURED on this box, fusion is neutral at
# 30-60MB batches (page cache makes the second scan free; the fixed
# CollectMetrics codegen ~0.1s/batch slightly loses) and the dedicated agg
# job wins below that.  The fused path pays off when the batch's second
# read would come from cold/object storage — production-sized batches —
# so the gate is deliberately above anything the local bench reaches.
FUSED_MIN_BYTES = 256 << 20


def _observed_row(obs, frame: DataFrame, metrics: list):
    """``Observation.get``, hardened against AQE runtime empty-relation
    propagation: when every row of the observed plan is filtered or deduped
    away AT RUNTIME, AQE may replace the subtree — the CollectMetrics node
    included — with an empty relation, and the observation then holds a
    schemaless row that cannot cross py4j (Spark's ``toPyRow`` asserts).
    Recompute the same aggregates directly in that corner: one extra job
    over a plan that just proved itself empty (the scan prunes to nothing),
    so the fallback costs ~nothing and only fires when the fused write
    collapsed.  ``frame`` must be the PRE-observe frame (re-observing a
    consumed Observation is an error)."""
    try:
        return obs.get
    except Exception:
        return frame.agg(*metrics).collect()[0]


class SchemaPolicyViolation(RuntimeError):
    """schema_policy='strict' rejected a batch whose payload schema
    diverged from the table — raised before any write."""


class CdcApplier:
    """Applies normalized change batches to a LakeTable with exactly-once
    lineage.  Normalized envelope: lsn(long), shard(int), ts, op(string)
    + payload columns (repo/path/commit/lang/content[, evolved columns])."""

    def __init__(
        self,
        table: LakeTable,
        files_per_bucket: int = 1,
        mode: str = "mor",
        auto_compact: int | None = 8,
        dedup_batch: bool = True,
        lineage_detail: str = "shards",
        bucket_deltas: bool | str = "auto",
        compact_ratio: float | None = None,
        partial_update: bool = False,
        present_col: str | None = None,
        schema_policy: str = "evolve",
    ):
        """``mode="mor"`` (default) appends delta files per batch — O(batch)
        writes, the 10^10-event path; ``mode="cow"`` rewrites touched
        buckets — read-optimal for small/low-rate tables.  ``auto_compact``
        bounds MOR read amplification (max delta files per bucket).
        ``dedup_batch=False`` (MOR only) skips the in-batch key dedup
        shuffle — reconstruction collapses duplicates by LSN anyway; worth
        it for insert-heavy feeds where dedup saves little.
        ``lineage_detail``: "shards" records per-shard rows/bytes/last-LSN —
        the first batch pays one aggregation job to discover the shard set,
        steady-state batches fuse the same per-shard metrics into the write
        job via DataFrame.observe (one Spark job per batch; see
        ``_apply_shards_fused``); "global" keeps a single global LSN
        watermark instead (valid for feeds consumed in LSN order).
        ``bucket_deltas=False`` writes unbucketed L0 delta files with NO
        shuffle at all (LSM level-0 append; compaction re-buckets) — the
        maximum-throughput ingest shape."""
        if lineage_detail not in ("shards", "global"):
            raise ValueError(f"unknown lineage_detail {lineage_detail!r}")
        if schema_policy not in ("evolve", "strict"):
            raise ValueError(f"unknown schema_policy {schema_policy!r}")
        # "evolve" (default): batch columns merge into the table schema
        # (column add, int->long widen — merge_schemas).  "strict": the
        # batch payload must match the table schema EXACTLY, else the
        # batch fails loudly BEFORE any write — the schema-contract guard
        # for feeds where an unexpected upstream DDL must stop the
        # pipeline, not silently reshape the lake (the reference fails
        # the analogous way when column mapping and table disagree,
        # WriterUtil.java:110-167).
        self.schema_policy = schema_policy
        self.table = table
        self.files_per_bucket = files_per_bucket
        self.mode = mode
        if bucket_deltas is False and auto_compact is not None:
            # L0 appends produce ~input-partition-count files per batch and
            # every L0 file counts against every bucket's budget — a
            # per-bucket threshold sized for bucketed deltas (8) would
            # trigger a FULL rewrite after almost every batch.  Floor the
            # budget so compaction amortizes over many batches.
            auto_compact = max(auto_compact, 128)
        self.auto_compact = auto_compact
        self.dedup_batch = dedup_batch
        self.lineage_detail = lineage_detail
        self.bucket_deltas = bucket_deltas
        # when set, compaction is cost-based (delta bytes vs base bytes,
        # LakeTable.compaction_candidates) instead of file-count-only
        self.compact_ratio = compact_ratio
        # DataX writeMode=update: batch columns are SET, the rest preserved;
        # present_col names an optional array<string> per-event column set
        self.partial_update = partial_update
        self.present_col = present_col
        # fused per-shard lineage state (lineage_detail="shards"): the first
        # batch discovers the shard set with a dedicated aggregation job;
        # steady-state batches fuse the same per-shard metrics into the
        # write job via DataFrame.observe (one Spark job per batch, like
        # DataX's Communication counters riding the transport itself).  A
        # new shard mid-run (shard split) is counted by an unknown-shard
        # guard metric and back-filled with one extra filtered aggregation.
        self._known_shards: list[int] | None = None
        # trailing batch size (rows, bytes) — feeds bucket_deltas="auto"
        # placement when metrics are deferred into the write job
        self._last_batch_size: tuple[int, int] | None = None

    # -------------------------------------------------------------- recovery
    def filter_already_applied(self, feed: DataFrame) -> DataFrame:
        """Drop events at or below the last applied LSN of their shard.

        Used when resuming a feed read from a position older than the table
        state (at-least-once source → exactly-once effect).  The shard→LSN
        map is tiny (one row per source shard) and broadcast.

        SENTINEL rows — ``lsn < 0`` (snapshot ``op:"r"`` records and
        append-commit CDC-out rows, ``sources/debezium.py``) — always pass:
        they carry no binlog position, never advance a watermark (see the
        ``wm_lsn`` aggregates below), and within the feed's commit-ordered
        delivery contract a rewind that re-delivers them also re-delivers
        every later commit in order, so replaying their images converges.
        Without the exemption a multi-micro-batch snapshot poisons the
        shard watermark to -1 after batch 1 and ``lsn > -1`` silently
        drops the rest of the snapshot.
        """
        shard_lsns = dict(self.table.manifest().shard_lsns)
        if not shard_lsns:
            return feed
        sentinel = F.col("lsn") < 0
        # -1 = global watermark (lineage_detail="global"): applies to all
        # shards — valid because that mode requires LSN-ordered consumption
        global_wm = shard_lsns.pop("-1", None)
        if global_wm is not None:
            feed = feed.filter(
                sentinel | (F.col("lsn") > F.lit(int(global_wm)))
            )
        if not shard_lsns:
            return feed
        if len(shard_lsns) <= FUSED_SHARDS_MAX:
            # literal per-shard predicate instead of a broadcast join: no
            # watermark-frame job, no exchange riding every downstream
            # action, and the OR-of-AND literals reach parquet row-group
            # stats — on resume, fully-applied row groups never leave the
            # scan.  Shards with no watermark (new splits) pass whole.
            keep = sentinel | ~F.col("shard").isin(
                [int(s) for s in shard_lsns]
            )
            for s, l in shard_lsns.items():
                keep = keep | (
                    (F.col("shard") == F.lit(int(s)))
                    & (F.col("lsn") > F.lit(int(l)))
                )
            return feed.filter(keep)
        wm = self.table.spark.createDataFrame(
            [(int(s), int(l)) for s, l in shard_lsns.items()],
            "shard int, __applied_lsn long",
        )
        return (
            feed.join(F.broadcast(wm), on="shard", how="left")
            .filter(
                sentinel
                | F.col("__applied_lsn").isNull()
                | (F.col("lsn") > F.col("__applied_lsn"))
            )
            .drop("__applied_lsn")
        )

    def _enforce_schema_policy(self, batch: DataFrame) -> None:
        """schema_policy="strict": driver-side payload-schema equality
        check (names AND types) against the table — zero Spark jobs."""
        if self.schema_policy != "strict":
            return
        want = {f.name: f.dataType.simpleString()
                for f in self.table.schema().fields}
        got = {f.name: f.dataType.simpleString()
               for f in batch.schema.fields
               if f.name not in ENVELOPE_COLS
               and f.name != self.present_col}
        extra = sorted(c for c in got if c not in want)
        missing = sorted(c for c in want if c not in got)
        changed = sorted(f"{c}: {got[c]} != {want[c]}"
                         for c in got if c in want and got[c] != want[c])
        if extra or missing or changed:
            raise SchemaPolicyViolation(
                "schema_policy='strict' rejected the batch before any "
                f"write — extra columns: {extra or '-'}; missing columns: "
                f"{missing or '-'}; type changes: {changed or '-'}. "
                "Fix the feed/column mapping, or set "
                "schema_policy='evolve' to let the table follow.")

    # ----------------------------------------------------------------- apply
    def apply_batch(self, batch: DataFrame, batch_id: int | str) -> dict | None:
        """MERGE one micro-batch; returns lineage dict, or None if the batch
        was already applied (replay no-op)."""
        if self.table.is_batch_applied(batch_id):
            return None
        self._enforce_schema_policy(batch)
        # NOTE: no .persist() here — the batch is consumed by exactly two
        # passes (stats agg, merge write), and re-scanning pushdown-pruned
        # columnar input is cheaper than materializing a row cache of wide
        # content strings (measured ~8x on 250k-event batches).
        str_cols = [
            f.name
            for f in batch.schema.fields
            if f.dataType.typeName() == "string" and f.name != "op"
        ]
        byte_expr = F.lit(48)  # fixed envelope overhead per event
        for c in str_cols:
            byte_expr = byte_expr + F.coalesce(F.octet_length(c), F.lit(0))

        if self.lineage_detail == "global":
            return self._apply_global(batch, batch_id, byte_expr)

        if (self._known_shards is not None
                and len(self._known_shards) <= FUSED_SHARDS_MAX
                and self._last_batch_size is not None
                and self._last_batch_size[1] >= FUSED_MIN_BYTES):
            return self._apply_shards_fused(batch, batch_id, byte_expr)

        # shard-discovery batch (or >cap shard counts): one aggregate pass
        # for lineage — per-shard consumption metrics (≈ DataX Communication
        # counters, core/.../statistics/communication/
        # CommunicationTool.java:17-53, merged task→job)
        # watermarks advance only on REAL (lsn >= 0) events: sentinel rows
        # (snapshot op:"r" / append-commit CDC-out, lsn = -1) carry no
        # binlog position — a shard whose batch was all-sentinel keeps its
        # previous watermark instead of poisoning it to -1
        wm_expr = F.max(F.when(F.col("lsn") >= 0, F.col("lsn")))
        stats = (
            batch.groupBy("shard")
            .agg(
                wm_expr.alias("wm_lsn"),
                F.count(F.lit(1)).alias("rows"),
                F.sum(byte_expr).alias("bytes"),
            )
            .collect()
        )
        if not stats:
            return None  # empty batch
        lineage = {
            "batch_id": batch_id if isinstance(batch_id, str) else int(batch_id),
            "rows": int(sum(r["rows"] for r in stats)),
            "bytes": int(sum(r["bytes"] for r in stats)),
            "shard_lsns": {
                int(r["shard"]): int(r["wm_lsn"])
                for r in stats if r["wm_lsn"] is not None
            },
            "partitions": [
                {
                    "partition_id": int(r["shard"]),
                    "last_lsn": (-1 if r["wm_lsn"] is None
                                 else int(r["wm_lsn"])),
                    "rows": int(r["rows"]),
                    "bytes": int(r["bytes"]),
                }
                for r in stats
            ],
        }
        payload = [c for c in batch.columns
                   if c not in ENVELOPE_COLS and c != self.present_col]
        merge_into(
            self.table,
            batch,
            op_col="op",
            order_col="lsn",
            payload_cols=payload,
            lineage=lineage,
            evolve_schema=self.schema_policy == "evolve",
            files_per_bucket=self.files_per_bucket,
            mode=self.mode,
            auto_compact=self.auto_compact,
            dedup_batch=self.dedup_batch,
            bucket_deltas=self.bucket_deltas,
            compact_ratio=self.compact_ratio,
            partial_update=self.partial_update,
            present_col=self.present_col,
        )
        self._known_shards = sorted(
            set(self._known_shards or []) | set(lineage["shard_lsns"])
        )
        self._last_batch_size = (lineage["rows"], lineage["bytes"])
        return lineage

    def _apply_shards_fused(
        self, batch: DataFrame, batch_id, byte_expr
    ) -> dict | None:
        """Steady-state shards-detail apply: the SAME per-shard metrics the
        aggregation pass computes, fused into the write job as conditional
        aggregates over the known shard set (3 observe columns per shard)
        plus an unknown-shard guard.  One Spark job per batch; a shard
        split (rows outside the known set) costs one extra filtered
        aggregation for exactly those rows — rare by construction."""
        from pyspark.sql import Observation

        known = list(self._known_shards or [])
        sh = F.col("shard")
        metrics = [
            F.count(F.when(~sh.isin(known), F.lit(1))).alias("__unknown"),
        ]
        for s in known:
            hit = sh == F.lit(s)
            metrics += [
                # watermark = max REAL lsn only (sentinel lsn<0 rows never
                # advance it — see filter_already_applied)
                F.max(F.when(hit & (F.col("lsn") >= 0), F.col("lsn")))
                .alias(f"lsn_{s}"),
                F.count(F.when(hit, F.lit(1))).alias(f"rows_{s}"),
                F.sum(F.when(hit, byte_expr)).alias(f"bytes_{s}"),
            ]
        obs = Observation()
        observed = batch.observe(obs, *metrics)
        cache: dict = {}

        def resolve() -> dict:
            # memoized: called by _resolve_lineage (inside the merge) and by
            # the return path below; the unknown-shard back-fill job must
            # run at most once
            if cache:
                return dict(cache)
            m = _observed_row(obs, batch, metrics)
            parts = [
                {
                    "partition_id": int(s),
                    "last_lsn": (-1 if m[f"lsn_{s}"] is None
                                 else int(m[f"lsn_{s}"])),
                    "rows": int(m[f"rows_{s}"]),
                    "bytes": int(m[f"bytes_{s}"] or 0),
                }
                for s in known
                if m[f"rows_{s}"]
            ]
            if int(m["__unknown"] or 0):
                extra = (
                    batch.filter(~sh.isin(known))
                    .groupBy("shard")
                    .agg(
                        F.max(F.when(F.col("lsn") >= 0, F.col("lsn")))
                        .alias("wm_lsn"),
                        F.count(F.lit(1)).alias("rows"),
                        F.sum(byte_expr).alias("bytes"),
                    )
                    .collect()
                )
                parts += [
                    {
                        "partition_id": int(r["shard"]),
                        "last_lsn": (-1 if r["wm_lsn"] is None
                                     else int(r["wm_lsn"])),
                        "rows": int(r["rows"]),
                        "bytes": int(r["bytes"]),
                    }
                    for r in extra
                ]
                self._known_shards = sorted(
                    set(known) | {p["partition_id"] for p in parts}
                )
            cache.update({
                "rows": int(sum(p["rows"] for p in parts)),
                "bytes": int(sum(p["bytes"] for p in parts)),
                "shard_lsns": {
                    p["partition_id"]: p["last_lsn"]
                    for p in parts if p["last_lsn"] >= 0
                },
                "partitions": parts,
            })
            return dict(cache)

        lineage = {
            "batch_id": batch_id if isinstance(batch_id, str) else int(batch_id),
            "_resolve": resolve,
        }
        if self._last_batch_size is not None:
            # bucket_deltas="auto" placement hint: trailing batch size (the
            # actual metrics resolve only after the write job runs)
            lineage["_est_rows"] = self._last_batch_size[0]
            lineage["_est_bytes"] = self._last_batch_size[1]
        payload = [c for c in batch.columns
                   if c not in ENVELOPE_COLS and c != self.present_col]
        m = merge_into(
            self.table,
            observed,
            op_col="op",
            order_col="lsn",
            payload_cols=payload,
            lineage=lineage,
            evolve_schema=self.schema_policy == "evolve",
            files_per_bucket=self.files_per_bucket,
            mode=self.mode,
            auto_compact=self.auto_compact,
            dedup_batch=self.dedup_batch,
            bucket_deltas=self.bucket_deltas,
            compact_ratio=self.compact_ratio,
            partial_update=self.partial_update,
            present_col=self.present_col,
        )
        if m is None:
            # replay detected inside the merge (concurrent writer applied
            # this batch id): no job ran, so the observation never resolves
            return None
        resolved = resolve()
        if resolved["rows"] == 0:
            return None
        self._last_batch_size = (resolved["rows"], resolved["bytes"])
        return {"batch_id": lineage["batch_id"], **resolved}

    def _apply_global(self, batch: DataFrame, batch_id, byte_expr) -> dict | None:
        """Single-job apply: lineage metrics ride the write job via
        DataFrame.observe (no separate aggregation pass).  The watermark is
        a single global last-LSN under shard id -1 — correct for feeds
        consumed in LSN order (write_feed_ordered / run_incremental)."""
        from pyspark.sql import Observation

        metrics = [
            F.count(F.lit(1)).alias("rows"),
            # watermark = max REAL lsn only; an all-sentinel batch (lsn<0
            # snapshot/append-commit rows) leaves the watermark untouched
            F.max(F.when(F.col("lsn") >= 0, F.col("lsn"))).alias("last_lsn"),
            F.sum(byte_expr).alias("bytes"),
        ]
        src = batch  # pre-observe frame: the _observed_row fallback re-aggs it
        obs = Observation()
        batch = batch.observe(obs, *metrics)

        def resolve() -> dict:
            m = _observed_row(obs, src, metrics)
            rows = int(m["rows"] or 0)
            last = -1 if m["last_lsn"] is None else int(m["last_lsn"])
            nbytes = int(m["bytes"] or 0)
            return {
                "rows": rows,
                "bytes": nbytes,
                "shard_lsns": {-1: last} if rows and last >= 0 else {},
                "partitions": [
                    {"partition_id": -1, "last_lsn": last,
                     "rows": rows, "bytes": nbytes}
                ] if rows else [],
            }

        lineage = {
            "batch_id": batch_id if isinstance(batch_id, str) else int(batch_id),
            "_resolve": resolve,
        }
        payload = [c for c in batch.columns
                   if c not in ENVELOPE_COLS and c != self.present_col]
        merge_into(
            self.table,
            batch,
            op_col="op",
            order_col="lsn",
            payload_cols=payload,
            lineage=lineage,
            evolve_schema=self.schema_policy == "evolve",
            files_per_bucket=self.files_per_bucket,
            mode=self.mode,
            auto_compact=self.auto_compact,
            dedup_batch=self.dedup_batch,
            bucket_deltas=self.bucket_deltas,
            compact_ratio=self.compact_ratio,
            partial_update=self.partial_update,
            present_col=self.present_col,
        )
        resolved = resolve()
        if resolved["rows"] == 0:
            return None
        return {"batch_id": lineage["batch_id"], **resolved}
