"""Multi-table transactional CDC apply: one mixed change feed fanned out
into per-table idempotent MERGEs with a shared consistent-epoch ledger.

A real binlog carries every table of the source database interleaved; the
reference syncs them as independent jobs fanned out over table lists
(``plugin-rdbms-util/.../reader/util/ReaderSplitUtil.java:19-108`` builds
one task per table × jdbcUrl), so cross-table consistency is whatever the
target database happens to expose mid-load.  Here the fan-out happens
INSIDE each micro-batch: events are routed on a table-name column
(Debezium's ``source.table``) to per-table :class:`CdcApplier`s, each with
its own lineage/replay guard, and after every target committed the batch a
small EPOCH MARKER — ``{table: committed_version}`` — is published
atomically (tmp+rename) to a ledger directory.  ``read_consistent`` pins
every table at the newest fully-published epoch, giving readers a
cross-table transactionally-consistent snapshot even while a later batch
is mid-apply (or died mid-apply).

Crash semantics: the per-table appliers commit sequentially; a crash after
table A committed batch B but before table Z did leaves NO epoch marker
for B — consistent readers keep the previous cut (A's direct readers see
B, by design: per-table semantics are unchanged).  The streaming replay of
B no-ops on A (``is_batch_applied``), applies on Z, and then publishes the
marker — convergent, exactly-once per table, and the ledger only ever
exposes cuts where EVERY table contains the batch.

Scale: the micro-batch is PINNED once (memory-and-disk) before the
per-table loop, so routing costs ONE source scan plus N in-memory
columnar filters — not N source scans (a Debezium server-level feed
declares dozens of tables; re-reading a non-rescannable streaming batch
per table would make apply cost O(batch × tables)).  A single-table
group skips the pin.  ``bench.py::bench_multitable`` measures the 2→16
table growth: the residual wall ratio (~3-4× at a 50k-row batch) is the
per-table MERGE commit floor — fixed cost that amortizes with batch
size — while the term the pin removes grows with batch size.  The
ledger is O(tables) JSON per batch.  At 10^10 events nothing here adds
a shuffle beyond what each table's own merge already does.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datax_spark.cdc.apply import CdcApplier
from datax_spark.lake.table import LakeTable


class MultiTableApplier:
    """Duck-type compatible with :class:`CdcApplier` where the streaming
    runner is concerned (``filter_already_applied`` / ``apply_batch`` /
    ``location``), so ``run_available_now(spark, feed, applier)`` tails a
    mixed feed directly.

    ``tables``: ``{table_name: LakeTable}`` — the routing map.
    ``table_col``: feed column carrying the table name.
    ``ledger_dir``: where epoch markers live (default: a ``_txn_ledger``
    sibling shared by the group; must be common to all appliers of the
    group across restarts).
    ``on_unknown``: ``"error"`` (default) fails the batch when a row names
    an undeclared table — silent drops hide upstream schema drift;
    ``"ignore"`` skips the (one-job) guard for trusted feeds.
    ``applier_opts`` are passed to every per-table :class:`CdcApplier`.
    """

    def __init__(
        self,
        tables: dict[str, LakeTable],
        table_col: str = "tbl",
        ledger_dir: str | None = None,
        on_unknown: str = "error",
        filter_watermark: bool = True,
        **applier_opts,
    ):
        if not tables:
            raise ValueError("tables map is empty")
        if on_unknown not in ("error", "ignore"):
            raise ValueError(f"unknown on_unknown {on_unknown!r}")
        self.tables = dict(tables)
        self.table_col = table_col
        self.on_unknown = on_unknown
        self.filter_watermark = filter_watermark
        self.appliers = {
            name: CdcApplier(t, **applier_opts)
            for name, t in sorted(tables.items())
        }
        first = next(iter(self.appliers.values())).table
        self.location = ledger_dir or os.path.join(
            os.path.dirname(first.location.rstrip("/")), "_txn_ledger"
        )
        os.makedirs(self.location, exist_ok=True)
        self._spark = first.spark

    # ------------------------------------------------------------- watermark
    def filter_already_applied(self, feed: DataFrame) -> DataFrame:
        """Identity — watermarks are PER TABLE, so the rewind filter runs
        after routing, inside :meth:`apply_batch` (each table's shard
        watermark only governs its own slice of the feed)."""
        return feed

    # ----------------------------------------------------------------- apply
    def apply_batch(self, batch: DataFrame, batch_id) -> dict | None:
        """Route one micro-batch to every declared table and publish the
        epoch marker once ALL of them committed it.  Returns a combined
        lineage dict, or None when every table had already applied the
        batch (pure replay)."""
        from pyspark.storagelevel import StorageLevel

        # pin the batch once so the N per-table filters (and the stray
        # guard) share ONE source scan — at a server-level feed with
        # dozens of declared tables an unpinned loop re-reads the source
        # per table, making apply O(batch × tables)
        pinned = len(self.appliers) > 1
        if pinned:
            batch = batch.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            if self.on_unknown == "error":
                stray = (
                    batch.filter(
                        ~F.col(self.table_col).isin(list(self.appliers))
                    )
                    .select(self.table_col)
                    .limit(1)
                    .collect()
                )
                if stray:
                    raise ValueError(
                        f"batch {batch_id}: feed names undeclared table "
                        f"{stray[0][0]!r} (declared: "
                        f"{sorted(self.appliers)}); "
                        "declare it or pass on_unknown='ignore'"
                    )
            lineages: dict[str, dict | None] = {}
            for name, ap in self.appliers.items():  # sorted — deterministic
                part = batch.filter(
                    F.col(self.table_col) == F.lit(name)
                ).drop(self.table_col)
                if self.filter_watermark:
                    part = ap.filter_already_applied(part)
                lineages[name] = ap.apply_batch(part, batch_id)
        finally:
            if pinned:
                batch.unpersist()
        self._publish_epoch(batch_id)
        if all(ln is None for ln in lineages.values()):
            return None  # full replay: every table no-opped
        return {
            "batch_id": batch_id,
            "rows": sum(
                int(ln.get("rows", 0)) for ln in lineages.values() if ln
            ),
            "bytes": sum(
                int(ln.get("bytes", 0)) for ln in lineages.values() if ln
            ),
            "tables": lineages,
        }

    # ---------------------------------------------------------------- ledger
    def _marker_path(self, batch_id) -> str:
        return os.path.join(self.location, f"epoch-{batch_id}.json")

    def _publish_epoch(self, batch_id) -> None:
        """Atomically publish ``{table: version}`` for a batch every table
        has committed.  Idempotent: an existing marker (replay after a
        crash that landed between marker and checkpoint) is left alone —
        its versions already contain the batch."""
        path = self._marker_path(batch_id)
        if os.path.exists(path):
            return
        seq = 1 + max(
            (e["seq"] for e in self._epochs()), default=0
        )
        doc = {
            "batch_id": str(batch_id),
            "seq": seq,
            "versions": {
                name: ap.table.current_version()
                for name, ap in self.appliers.items()
            },
        }
        tmp = path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(doc, f)
        os.rename(tmp, path)

    def _epochs(self) -> list[dict]:
        out = []
        for fn in os.listdir(self.location):
            if fn.startswith("epoch-") and fn.endswith(".json"):
                with open(os.path.join(self.location, fn),
                          encoding="utf-8") as f:
                    out.append(json.load(f))
        return out

    def consistent_versions(self) -> dict[str, int] | None:
        """Per-table versions of the newest fully-published epoch, or None
        before any batch published.  Every listed version contains every
        batch up to that epoch for ITS table — a transactionally-consistent
        cross-table cut."""
        epochs = self._epochs()
        if not epochs:
            return None
        return max(epochs, key=lambda e: e["seq"])["versions"]

    def read_consistent(self, name: str) -> DataFrame:
        """Read ``name`` pinned at the newest consistent epoch (falls back
        to version 0 — empty — before the first epoch)."""
        if name not in self.tables:
            raise KeyError(name)
        vs = self.consistent_versions()
        v = 0 if vs is None else int(vs.get(name, 0))
        return self.tables[name].read(version=v)
