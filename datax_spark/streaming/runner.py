"""Structured-Streaming CDC runner: tail a feed → foreachBatch MERGE.

The streaming shape mandated by BASELINE.json north_star: ``readStream`` on
a binlog/WAL-shaped feed → per-micro-batch idempotent MERGE into the lake
table.  Two trigger modes over one shared apply path:
``Trigger.AvailableNow`` (:func:`run_available_now`) for bounded replay
(the analogue of the reference CDC reader's time-bounded [startTs, endTs)
window — otsstreamreader/.../core/RecordProcessor.java:206-228), and a
``processingTime`` live tail (:func:`run_continuous`) that keeps applying
feed files as they land until stopped — the long-running daemon shape of a
real binlog subscription.

Exactly-once layering (SURVEY.md §7.4 risk 1):
1. Spark's streaming checkpoint makes micro-batch ids stable across
   restarts — a replayed ``foreachBatch(batch_id)`` is detected by the
   lineage guard (batch id recorded atomically with the data commit).
2. If the checkpoint itself is lost (or the source rewinds), the per-shard
   last-applied-LSN watermark filters already-applied events
   (CdcApplier.filter_already_applied) — at-least-once source, exactly-once
   effect.

Batch ids are namespaced ``s{batch_id}`` so a streaming resume never
collides with batch-mode (run_incremental) lineage on the same table.

Cross-batch ordering: like every log-tailing CDC applier, correctness
requires the feed be consumed in LSN order across micro-batches (within a
batch, order is irrelevant — dedup by max LSN).  The file source lists
files in path order, so writers must emit lsn-range-named files
(write_feed_ordered below guarantees this).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.cdc.apply import CdcApplier
from datax_spark.lake.table import LakeTable


def write_feed_ordered(feed: DataFrame, path: str, n_files: int = 8) -> None:
    """Materialize a feed as lsn-range-ordered parquet files.

    ``repartitionByRange(lsn)`` makes part-file ordinals follow LSN order;
    the mtime stamping below makes the streaming file source (which orders
    candidate files by MODIFICATION TIME, not name) replay the log in
    sequence — parallel writers finish out of order, and an out-of-order
    file advancing the per-shard watermark would silently drop the
    not-yet-applied older-LSN events behind it (the WAL delivery
    contract this enforces)."""
    feed.repartitionByRange(n_files, F.col("lsn")).sortWithinPartitions(
        "lsn"
    ).write.mode("overwrite").parquet(path)
    parts = sorted(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )
    base = int(os.path.getmtime(os.path.join(path, parts[0]))) if parts else 0
    for i, fn in enumerate(parts):
        # strictly increasing mtimes in part-ordinal (= LSN-range) order
        os.utime(os.path.join(path, fn), (base + i, base + i))


def files_per_trigger_for_bytes(feed_dir: str, max_bytes: int) -> int:
    """Byte-rate admission for the file feed — the rebuild of DataX's
    byte-based channel throttling (core/.../transport/channel/
    Channel.java:148-204; JobContainer.adjustChannelNumber:394-449 derives
    channel count from the byte budget).

    Spark's file source only caps *files* per trigger, and it takes files
    in modification-time order — so batches are deterministic prefixes of
    the mtime-sorted listing.  Pre-scan the sizes and return the largest N
    such that EVERY chunk of N consecutive files stays within ``max_bytes``
    (≥1: a single oversized file is admitted alone — the cap bounds batch
    size, it cannot split a file)."""
    entries = [
        (os.path.getmtime(os.path.join(feed_dir, f)), f,
         os.path.getsize(os.path.join(feed_dir, f)))
        for f in os.listdir(feed_dir)
        if f.endswith(".parquet")
    ]
    sizes = [s for _, _, s in sorted(entries)]
    return _largest_chunk_within(sizes, max_bytes)


def _largest_chunk_within(weights: list[int], budget: int) -> int:
    """Largest N such that every chunk of N consecutive weights stays within
    ``budget`` (≥1: an oversized single unit is admitted alone — the cap
    bounds batch size, it cannot split a file)."""
    if not weights:
        return 1
    best = 1
    for n in range(2, len(weights) + 1):
        if all(
            sum(weights[i : i + n]) <= budget
            for i in range(0, len(weights), n)
        ):
            best = n
        else:
            break
    return best


def files_per_trigger_for_rows(feed_dir: str, max_rows: int) -> int:
    """Record-rate admission — the tps half of the reference's channel
    throttle (core/.../transport/channel/Channel.java:148-204 computes BOTH
    byteSpeed and recordSpeed and sleeps on whichever is exceeded; the byte
    cap alone is the wrong knob for feeds with wildly varying row widths).

    Row counts come from parquet footers (no data read), pre-scanned in
    modification-time order exactly like ``files_per_trigger_for_bytes``
    pre-scans sizes; returns the largest N such that every chunk of N
    consecutive files stays within ``max_rows``."""
    import pyarrow.parquet as pq

    entries = [
        (os.path.getmtime(os.path.join(feed_dir, f)), f,
         pq.read_metadata(os.path.join(feed_dir, f)).num_rows)
        for f in os.listdir(feed_dir)
        if f.endswith(".parquet")
    ]
    rows = [r for _, _, r in sorted(entries)]
    return _largest_chunk_within(rows, max_rows)


def run_available_now(
    spark: SparkSession,
    feed_dir: str,
    table: LakeTable,
    feed_schema: T.StructType | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: int | None = None,
    max_rows_per_trigger: int | None = None,
    timeout_sec: int = 600,
    stall_timeout_sec: float | None = None,
    filter_watermark: bool = True,
    quarantine_rules: list | None = None,
    quarantine_path: str | None = None,
    error_limits=None,
    transform=None,
    on_batch=None,
    feed_format: str = "parquet",
    payload=None,
    txn_boundary: tuple[str, str] | None = None,
    **applier_opts,
) -> list[dict]:
    """Drain the feed directory through Structured Streaming into the table.

    Returns the lineage dicts of batches applied in this run (replays and
    already-applied events are skipped, not re-applied).

    ``filter_watermark=True`` (default) drops events at-or-below each
    shard's last-applied LSN — protects against checkpoint loss / source
    rewind, but REQUIRES in-order (per shard) delivery across micro-batches
    (write_feed_ordered's contract).  For sources that cannot guarantee
    order, pass False: MOR reconstruction is LSN-order-insensitive, so
    unordered batches still converge (exactly-once then rests on the
    streaming checkpoint's stable batch ids alone).

    ``max_bytes_per_trigger`` caps each micro-batch by cumulative file
    bytes (pre-scanned; see files_per_trigger_for_bytes) — the knob that
    matters when a 100-TB backfill shares a cluster.
    ``max_rows_per_trigger`` caps by cumulative footer row counts (the
    reference throttles bytes AND records; see files_per_trigger_for_rows)
    — both caps given, the stricter file count wins.  ``stall_timeout_sec``
    fails the drain when no batch completes for that long while the query
    is active (≈ the reference's hung-task expiry, TaskMonitor.java:80-97)
    — distinct from ``timeout_sec``, the bound on TOTAL drain time.

    ``txn_boundary=(txid_col, commit_col)`` turns on TRANSACTION-CONSISTENT
    apply: only events of transactions whose commit marker (``commit_col``
    true on the last event, the Maxwell shape) has arrived are applied;
    open-transaction tails persist under the checkpoint and re-inject into
    the next micro-batch, so a transaction split across micro-batches is
    never half-applied.  NULL ``txid_col`` rows are auto-commit.  The two
    columns are consumed by the runner and never reach the table.  A
    transaction whose commit marker never arrives is held indefinitely —
    the contract of any txn-consistent consumer.  Held events apply out of
    LSN order when their commit lands later; per-key max-LSN
    reconstruction makes that safe."""
    stream, checkpoint_dir, handle, applied, activity = _build_tail(
        spark, feed_dir, table, feed_schema, checkpoint_dir,
        max_files_per_trigger, max_bytes_per_trigger, max_rows_per_trigger,
        filter_watermark, quarantine_rules, quarantine_path, error_limits,
        transform, applier_opts, on_batch=on_batch,
        feed_format=feed_format, payload=payload, txn_boundary=txn_boundary,
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    deadline = time.monotonic() + timeout_sec
    poll = 1.0 if stall_timeout_sec is None else min(1.0, stall_timeout_sec / 4)
    while not q.awaitTermination(poll):
        now = time.monotonic()
        if now > deadline:
            q.stop()
            raise TimeoutError(f"stream did not drain within {timeout_sec}s")
        if (
            stall_timeout_sec is not None
            and now - activity["t"] > stall_timeout_sec
        ):
            q.stop()
            raise TimeoutError(
                f"stream made no progress for {stall_timeout_sec}s "
                f"(hung-task watchdog; {len(applied)} batches applied)"
            )
    if q.exception() is not None:
        raise q.exception()
    return applied


def _txn_carry_prev(spark, carry_dir: str, batch_id: int):
    """Newest persisted carry-over (incomplete-transaction events) from a
    batch STRICTLY BEFORE ``batch_id`` — strict, because a crashed attempt
    of this very batch may have left its own carry dir, which must not
    feed back into its replay.  None when no predecessor exists."""
    if not os.path.isdir(carry_dir):
        return None
    prev = [
        int(d.split("=", 1)[1])
        for d in os.listdir(carry_dir)
        if d.startswith("batch=") and int(d.split("=", 1)[1]) < batch_id
    ]
    if not prev:
        return None
    return spark.read.parquet(
        os.path.join(carry_dir, f"batch={max(prev)}")
    )


def _build_tail(
    spark, feed_dir, table, feed_schema, checkpoint_dir,
    max_files_per_trigger, max_bytes_per_trigger, max_rows_per_trigger,
    filter_watermark, quarantine_rules, quarantine_path, error_limits,
    transform, applier_opts, on_batch=None, feed_format="parquet",
    payload=None, txn_boundary=None,
):
    """Shared setup for the bounded drain and the continuous tail: the
    rate-capped file-source reader plus the foreachBatch apply closure.
    ``on_batch(lineage)`` (same hook as run_incremental's) fires after
    each APPLIED batch — e.g. live aggregate-view refresh.
    ``feed_format`` accepts "parquet" (engine-envelope files, the default)
    or a connector wire shape ("debezium-json" / "maxwell-json" /
    "canal-json", normalized at read; ``payload`` = row schema DDL).
    Returns ``(stream, checkpoint_dir, handle, applied, activity)``."""
    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(table.location, "_stream_checkpoint")
    if feed_format != "parquet":
        from datax_spark.sources.debezium import (
            WIRE_FORMAT_READERS as readers,
        )

        if feed_format not in readers:
            raise ValueError(
                f"unsupported streaming feed format {feed_format!r}: "
                f"parquet or one of {sorted(readers)}"
            )
        if payload is None:
            raise ValueError(
                f"feed_format={feed_format!r} requires payload "
                "(row schema DDL)"
            )
        if (max_bytes_per_trigger is not None
                or max_rows_per_trigger is not None):
            raise ValueError(
                "byte/row rate caps pre-scan parquet footers and do not "
                "apply to JSON wire feeds — use max_files_per_trigger"
            )
        pl = (payload if isinstance(payload, T.StructType)
              else T.StructType.fromDDL(payload))
        opts = ({"maxFilesPerTrigger": max_files_per_trigger}
                if max_files_per_trigger is not None else None)
        stream = readers[feed_format](
            spark, feed_dir, pl, streaming=True, options=opts
        )
    else:
        if feed_schema is None:
            feed_schema = spark.read.parquet(feed_dir).schema
        if (max_bytes_per_trigger is not None
                or max_rows_per_trigger is not None):
            derived = []
            if max_bytes_per_trigger is not None:
                derived.append(
                    files_per_trigger_for_bytes(
                        feed_dir, max_bytes_per_trigger
                    )
                )
            if max_rows_per_trigger is not None:
                derived.append(
                    files_per_trigger_for_rows(feed_dir, max_rows_per_trigger)
                )
            if max_files_per_trigger is not None:
                derived.append(max_files_per_trigger)
            max_files_per_trigger = min(derived)

        reader = spark.readStream.schema(feed_schema)
        if max_files_per_trigger is not None:
            reader = reader.option(
                "maxFilesPerTrigger", max_files_per_trigger
            )
        stream = reader.parquet(feed_dir)

    if isinstance(table, LakeTable):
        applier = CdcApplier(table, **applier_opts)
    else:
        # a pre-built applier (e.g. cdc/multitable.MultiTableApplier) —
        # anything exposing filter_already_applied/apply_batch/location
        if applier_opts:
            raise ValueError(
                "applier options are set on the applier object itself "
                f"when one is passed (got {sorted(applier_opts)})"
            )
        applier = table
    applied: list[dict] = []
    activity = {"t": time.monotonic()}
    if txn_boundary is not None:
        txn_col, commit_col = txn_boundary
        carry_dir = os.path.join(checkpoint_dir, "_txn_carry")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if transform is not None:
            # per-batch transformer chain (dx_* Column exprs) — same hook
            # point as the incremental runner's pre-apply transforms
            batch_df = transform(batch_df)
        if quarantine_rules is not None:
            from datax_spark.cdc.quarantine import quarantine

            batch_df = quarantine(
                batch_df, quarantine_rules,
                quarantine_path=quarantine_path, limits=error_limits,
            )
        if filter_watermark:
            batch_df = applier.filter_already_applied(batch_df)
        n_held = None
        if txn_boundary is not None:
            # TRANSACTION-BOUNDARY ALIGNMENT (Debezium/Flink-CDC
            # txn-consistent apply): only events of transactions whose
            # COMMIT MARKER has arrived are applied; the open-transaction
            # tail is persisted under the checkpoint and re-injected into
            # the next micro-batch (where its completions may land).
            # Carried rows are injected AFTER the watermark filter — they
            # passed it in their original batch, and the watermark has
            # since advanced past their LSNs by design: held events apply
            # out of LSN order, which the engine's max-LSN-per-key
            # reconstruction is insensitive to.  Crash-safe: the carry dir
            # is keyed by the stable micro-batch id and rewritten
            # deterministically on replay (the apply itself no-ops via the
            # lineage guard).  NULL transaction ids are auto-commit rows
            # and always apply.
            prev = _txn_carry_prev(spark, carry_dir, batch_id)
            if prev is not None:
                batch_df = batch_df.unionByName(prev)
            batch_df = batch_df.persist()
            txid = F.col(txn_col)
            done = (
                batch_df
                .filter(txid.isNotNull()
                        & (F.col(commit_col) == F.lit(True)))
                .select(txid.alias("__txn_done")).distinct()
            )
            applyable = batch_df.join(
                F.broadcast(done),
                on=txid.eqNullSafe(F.col("__txn_done")), how="left",
            )
            held = (applyable
                    .filter(txid.isNotNull()
                            & F.col("__txn_done").isNull())
                    .drop("__txn_done"))
            held.write.mode("overwrite").parquet(
                os.path.join(carry_dir, f"batch={batch_id}")
            )
            n_held = held.count()
            batch_out = (
                applyable
                .filter(txid.isNull() | F.col("__txn_done").isNotNull())
                .drop("__txn_done", txn_col, commit_col)
            )
            # retire carry dirs two batches back (their rows are either
            # applied or re-persisted under this batch's dir)
            import shutil

            for d in os.listdir(carry_dir):
                if d.startswith("batch=") and \
                        int(d.split("=", 1)[1]) < batch_id - 1:
                    shutil.rmtree(os.path.join(carry_dir, d),
                                  ignore_errors=True)
            lineage = applier.apply_batch(batch_out, f"s{batch_id}")
            batch_df.unpersist()
        else:
            lineage = applier.apply_batch(batch_df, f"s{batch_id}")
        if lineage is not None:
            if n_held is not None:
                lineage["txn_held"] = int(n_held)
            applied.append(lineage)
            if on_batch is not None:
                # inside the micro-batch, so a failure here fails the batch
                # (and the query) loudly rather than silently lagging —
                # and a restart replays the batch id as a no-op before
                # re-running the hook (hooks must be idempotent, which a
                # watermark-guarded view refresh is)
                on_batch(lineage)
        activity["t"] = time.monotonic()  # a batch completed = progress

    return stream, checkpoint_dir, handle, applied, activity


class ContinuousTail:
    """Handle for a live :func:`run_continuous` query.

    The query keeps applying new feed files as they land until
    :meth:`stop` is called (or the process exits).  ``applied`` snapshots
    the lineage dicts of batches applied SO FAR by this process (replays
    resumed from the checkpoint are skipped by the lineage guard, exactly
    like the bounded drain)."""

    def __init__(self, query, applied, activity,
                 stall_timeout_sec: float | None):
        self._q = query
        self._applied = applied
        self._activity = activity
        self._stall = stall_timeout_sec

    @property
    def is_active(self) -> bool:
        return self._q.isActive

    def applied(self) -> list[dict]:
        return list(self._applied)

    def applied_rows(self) -> int:
        return sum(int(ln.get("rows", 0)) for ln in self._applied)

    def idle_seconds(self) -> float:
        """Seconds since the last batch completed (or since start)."""
        return time.monotonic() - self._activity["t"]

    def run_until(self, duration_sec: float | None = None,
                  idle_stop_sec: float | None = None,
                  poll_sec: float = 0.25) -> list[dict]:
        """Block until ``duration_sec`` elapses or no batch has completed
        for ``idle_stop_sec`` (whichever first; at least one required),
        then stop and return the applied lineages — the bounded-daemon
        shape a CLI job needs from a live tail."""
        if duration_sec is None and idle_stop_sec is None:
            raise ValueError("run_until needs duration_sec or idle_stop_sec")
        deadline = (None if duration_sec is None
                    else time.monotonic() + duration_sec)
        while True:
            self._check()
            now = time.monotonic()
            if deadline is not None and now >= deadline:
                break
            if idle_stop_sec is not None and self.idle_seconds() >= idle_stop_sec:
                # "idle" must mean CAUGHT UP, not slow to start: on a loaded
                # host the first micro-batch can take longer than the idle
                # bound, so only stop when the source also reports no data
                # waiting and no trigger mid-flight (the stall watchdog
                # still bounds true hangs)
                st = self._q.status
                if (self._q.lastProgress is not None
                        and not st.get("isDataAvailable")
                        and not st.get("isTriggerActive")):
                    break
            if (self._stall is not None
                    and self.idle_seconds() > self._stall
                    and self._should_be_progressing()):
                self._q.stop()
                raise TimeoutError(
                    f"stream made no progress for {self._stall}s "
                    f"(hung-task watchdog; {len(self._applied)} batches "
                    "applied)"
                )
            time.sleep(poll_sec)
        return self.stop()

    def _check(self) -> None:
        if self._q.exception() is not None:
            raise self._q.exception()

    def _should_be_progressing(self) -> bool:
        """True when the source reports pending data or an in-flight
        trigger — the only states where lack of completed batches means
        HUNG rather than merely caught up/idle."""
        st = self._q.status
        return bool(st.get("isDataAvailable") or st.get("isTriggerActive"))

    def wait_for(self, predicate, timeout_sec: float = 60.0,
                 poll_sec: float = 0.25) -> None:
        """Block until ``predicate(applied_lineages)`` is true.

        Raises the query's exception if it died, ``TimeoutError`` on the
        overall deadline, and the hung-task watchdog fires when no batch
        completes for ``stall_timeout_sec`` while data is still expected —
        the same semantics as the bounded drain's in-line watchdog."""
        deadline = time.monotonic() + timeout_sec
        while True:
            self._check()
            if predicate(list(self._applied)):
                return
            now = time.monotonic()
            if now > deadline:
                raise TimeoutError(
                    f"condition not reached within {timeout_sec}s "
                    f"({len(self._applied)} batches applied)"
                )
            if (self._stall is not None
                    and now - self._activity["t"] > self._stall
                    and self._should_be_progressing()):
                self._q.stop()
                raise TimeoutError(
                    f"stream made no progress for {self._stall}s "
                    f"(hung-task watchdog; {len(self._applied)} batches "
                    "applied)"
                )
            time.sleep(poll_sec)

    def wait_for_rows(self, n_rows: int, timeout_sec: float = 60.0) -> None:
        """Block until the batches applied by this process cover at least
        ``n_rows`` feed events."""
        self.wait_for(
            lambda lns: sum(int(x.get("rows", 0)) for x in lns) >= n_rows,
            timeout_sec=timeout_sec,
        )

    def stop(self) -> list[dict]:
        """Stop the query (the in-flight micro-batch finishes or aborts;
        either way the checkpoint + lineage guard make the restart
        exactly-once) and return the applied lineages.  The terminal
        exception is read AFTER termination so a batch failure landing
        during the stop still surfaces instead of reporting success."""
        self._q.stop()
        self._q.awaitTermination()
        exc = self._q.exception()
        if exc is not None:
            raise exc
        return list(self._applied)


def run_continuous(
    spark: SparkSession,
    feed_dir: str,
    table: LakeTable,
    feed_schema: T.StructType | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: int | None = None,
    max_rows_per_trigger: int | None = None,
    trigger_interval: str = "500 milliseconds",
    stall_timeout_sec: float | None = None,
    filter_watermark: bool = True,
    quarantine_rules: list | None = None,
    quarantine_path: str | None = None,
    error_limits=None,
    transform=None,
    on_batch=None,
    feed_format: str = "parquet",
    payload=None,
    txn_boundary: tuple[str, str] | None = None,
    **applier_opts,
) -> ContinuousTail:
    """Tail the feed directory CONTINUOUSLY — the live binlog/WAL shape.

    Unlike :func:`run_available_now` (bounded drain of what exists, then
    stop), this keeps the query up on a ``processingTime`` trigger: files
    appended to ``feed_dir`` after the start are picked up in mtime order
    and applied as they land, until :meth:`ContinuousTail.stop`.  Shares
    the drain's entire apply path — rate caps, quarantine, transformer
    hook, per-shard watermark filter, exactly-once lineage — and the same
    checkpoint namespace, so a deployment can freely alternate bounded
    catch-up drains with live tailing on the same table.

    The byte/row rate caps are converted to a files-per-trigger count
    from the files present AT START (parquet footers); for a feed whose
    file-size mix drifts over a long tail, restart the tail periodically
    (cheap — checkpoint resume) or pass ``max_files_per_trigger``
    directly."""
    stream, checkpoint_dir, handle, applied, activity = _build_tail(
        spark, feed_dir, table, feed_schema, checkpoint_dir,
        max_files_per_trigger, max_bytes_per_trigger, max_rows_per_trigger,
        filter_watermark, quarantine_rules, quarantine_path, error_limits,
        transform, applier_opts, on_batch=on_batch,
        feed_format=feed_format, payload=payload, txn_boundary=txn_boundary,
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .trigger(processingTime=trigger_interval)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    return ContinuousTail(q, applied, activity, stall_timeout_sec)
