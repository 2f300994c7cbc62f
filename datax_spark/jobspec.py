"""Typed job spec — the rebuild of DataX's JSON job configuration.

DataX drives everything from a JSON tree navigated by path expressions
(common/.../util/Configuration.java:53-219; job layout
core/src/main/java/com/alibaba/datax/core/util/container/CoreConstant.java:79-98).
Here the spec is a small dataclass tree with JSON (de)serialization; the
"engine" it configures is the DataFrame/Structured-Streaming pipeline:

    {"source":  {"path": "/feed", "format": "parquet"},
     "target":  {"location": "/lake/repo_files",
                 "key_cols": ["repo","path","commit"],
                 "bucket_col": "repo", "num_buckets": 64},
     "merge":   {"mode": "mor", "auto_compact": 8, "dedup_batch": true},
     "run":     {"kind": "incremental", "batch_lsns": 100000},
     "error_limit": {"record": 0, "percentage": 0.02},
     "transforms": [{"name": "dx_digest", "column": "content",
                     "parameters": ["sha256", "toLower"], "as": "sha"}]}

preCheck (--dry-run) mirrors JobContainer's dry-run mode
(core/.../job/JobContainer.java:103-106,182-192): validate paths, schema,
key columns, op values — no data written.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field, replace
from typing import Any

from pyspark.sql import SparkSession

from datax_spark.cdc.apply import ENVELOPE_COLS
from datax_spark.sources.debezium import WIRE_FORMATS as ENVELOPE_JSON_FORMATS


@dataclass
class SourceSpec:
    path: str
    format: str = "parquet"
    # envelope wire formats ("debezium-json" / "maxwell-json" /
    # "canal-json") normalize connector JSON into the engine envelope at
    # read; they require ``payload``: the row schema as a DDL string
    # (e.g. "repo string, path string, commit string, content string")
    payload: str | None = None


@dataclass
class TargetSpec:
    location: str
    key_cols: list[str] = field(default_factory=lambda: ["repo", "path", "commit"])
    bucket_col: str | None = None
    num_buckets: int = 16
    # type-2 slowly-changing-dimension target (lake/scd.py): the table
    # keeps one row per key per version interval [valid_from, valid_to)
    # instead of the current state; key_cols stay the NATURAL key.
    scd2: bool = False
    # scd2 only: drop no-op updates (payload equal to the stored current
    # row) so they open no interval — the Debezium-feed hygiene knob
    suppress_unchanged: bool = False


@dataclass
class MergeSpec:
    mode: str = "mor"
    auto_compact: int | None = 8
    dedup_batch: bool = True
    files_per_bucket: int = 1
    # cost-based compaction: compact a bucket when delta bytes exceed this
    # fraction of its base bytes (None = file-count threshold only)
    compact_ratio: float | None = None
    # DataX writeMode=update: batch columns are SET on conflict (explicit
    # NULLs win), unmapped target columns keep their previous value
    partial_update: bool = False
    # MOR delta placement: True = bucket-partitioned delta files, False =
    # unbucketed L0 (no shuffle, max throughput), "auto" (default) = pick
    # per batch from measured lineage bytes/rows (lake/merge.py
    # _resolve_bucket_deltas) — small batches go to L0, big ones bucket
    bucket_deltas: bool | str = "auto"
    # schema contract: "evolve" (default — column add / int->long widen
    # follow the feed, merge_schemas) or "strict" (a batch whose payload
    # schema diverges from the table FAILS before any write —
    # cdc/apply.SchemaPolicyViolation)
    schema_policy: str = "evolve"


@dataclass
class RunSpec:
    kind: str = "incremental"  # full | incremental | stream | tail
    batch_lsns: int = 100_000
    max_files_per_trigger: int | None = None
    # stream-only rate/health knobs (Channel.java byte cap;
    # TaskMonitor.java hung-task expiry)
    max_bytes_per_trigger: int | None = None
    # records-per-trigger cap (the tps half of Channel.java:148-204 —
    # the reference throttles bytes AND records); derived from parquet
    # footer row counts, see streaming.runner.files_per_trigger_for_rows
    max_rows_per_trigger: int | None = None
    stall_timeout_sec: float | None = None
    # tail-only bounds: a "tail" job runs the LIVE continuous tail
    # (streaming/runner.run_continuous — files applied as they land) until
    # either bound trips, then stops cleanly; the checkpoint makes the next
    # invocation resume exactly-once.  At least one must be set.
    tail_duration_sec: float | None = None
    tail_idle_stop_sec: float | None = None
    tail_trigger: str = "500 milliseconds"
    # maintain declared agg_views INSIDE each micro-batch (the continuous-
    # aggregate shape: rollups are fresh the moment a batch lands, not at
    # job end); a refresh failure fails the batch loudly.  Off = views
    # refresh once after the tail stops, like every other run kind.
    tail_live_agg_views: bool = False
    # same, for declared join_views: refresh the fact-join-dim view inside
    # each micro-batch so enriched reads are fresh the moment a batch
    # lands (dim-side-only changes still wait for the next batch or the
    # post-run refresh — the tail only wakes on fact commits)
    tail_live_join_views: bool = False
    # same, for declared index_views: the search index is current the
    # moment a micro-batch lands
    tail_live_index_views: bool = False
    # per-shard watermark filter (drop events at-or-below the shard's last
    # applied LSN — the at-least-once→exactly-once resume guard).  Sentinel
    # lsn<0 rows (snapshots, append-commit CDC-out) are always exempt, so
    # wire feeds produced by emit_table_changes/emit_table_snapshot work
    # with the default.  Turn OFF for Maxwell/Canal feeds that split one
    # commit-second across micro-batches: their synthesized LSNs order by
    # (xid mod 4096) within a second, and a cross-batch collision in the
    # wrong order would be dropped by the key-agnostic filter (see
    # sources/debezium.py bit-budget notes); the batch-id lineage guard
    # still holds exactly-once without it.
    filter_watermark: bool = True
    # transaction-consistent apply: [txid_col, commit_col] — only events of
    # transactions whose commit marker arrived are applied; open tails hold
    # under the checkpoint (streaming/runner.py txn_boundary).  The two
    # columns are consumed by the runner and never reach the table.
    txn_boundary: list | None = None
    # incremental-snapshot bootstrap consumer (the DBLog shape —
    # sources/debezium.emit_incremental_snapshot): source.path is the feed
    # DIRECTORY; the run tails BOTH live commits and snapshot chunks via
    # snapshot_feed_glob, sets the target's bootstrap_active property for
    # the duration (compaction defers — it would erase the LSN/tombstone
    # ordering the sentinel chunk fold relies on), and clears it once the
    # producer's _snapshot_state.json reports the chunk plan done.
    # Requires merge.mode="mor" (the fold needs per-row LSNs kept).
    bootstrap: bool = False


@dataclass
class ErrorLimitSpec:
    record: int | None = None
    percentage: float | None = None


def _jv_rights(jv: dict) -> list[dict]:
    """Normalize a ``join_views`` entry to its list-of-dims (star) form.
    Single-dim shorthand ``{"right": path, "on": {...}, ...}`` and the
    star form ``{"rights": [{"right": path, "on": {...}, ...}, ...]}``
    both come out as a list of per-dim dicts."""
    if jv.get("rights"):
        return [dict(r) for r in jv["rights"]]
    return [{"right": jv.get("right"), "on": jv.get("on"),
             "right_cols": jv.get("right_cols"),
             "how": jv.get("how", "inner")}]


def _parse_enrich(e: dict):
    """One parser for enrich specs, shared by build_enricher and
    pre_check so validation and execution can't drift: returns
    (path, format, on-mapping{feed: dim}, cols, how)."""
    on = e.get("on")
    if isinstance(on, list):
        on = {c: c for c in on}
    return (e.get("path"), e.get("format", "parquet"), on or {},
            list(e.get("cols") or []), e.get("how", "left"))


def build_enricher(spark: SparkSession, enrich: list[dict]):
    """Compile the job's ``enrich`` specs into one feed→feed callable —
    the LOOKUP JOIN of streaming engines (Flink's
    ``FOR SYSTEM_TIME AS OF proc_time``): each change event is decorated
    with columns from a small dimension table before it reaches
    quarantine/merge.  The reference can only do this with a JOIN burned
    into the reader's ``querySql``; here it is a declarative job field
    that works identically in batch, stream, and tail runs.

    Spec shape: ``{"path": ..., "format": "parquet",
    "on": {feed_col: dim_col, ...} | [shared_col, ...],
    "cols": [dim_col, ...], "how": "left"|"inner"}``.

    Scale contract: the dimension is BROADCAST (hash lookup riding the
    feed scan — no shuffle of the feed, the only shape that holds at
    10^10 events/day).  A dimension too big to broadcast belongs in
    :func:`datax_spark.functions.temporal.temporal_table_join` against
    its own change history instead."""
    from pyspark.sql import functions as F

    plans = []
    for e in enrich:
        path, fmt, on, cols, how = _parse_enrich(e)
        dim = spark.read.format(fmt).load(path)
        proj = dim.select(
            *[F.col(dc).alias(fc) for fc, dc in on.items()],
            *[F.col(c) for c in cols],
        )
        plans.append((proj, list(on.keys()), how))

    def enrich_fn(df):
        for proj, keys, how in plans:
            df = df.join(F.broadcast(proj), on=keys, how=how)
        return df

    return enrich_fn


def load_feed(spark: SparkSession, source: SourceSpec):
    """Build the BATCH feed DataFrame a SourceSpec describes: plain Spark
    formats load verbatim; envelope wire formats parse the connector JSON
    and normalize it into the engine envelope.  (Stream/tail runs build
    their rate-capped streaming reader in streaming/runner._build_tail.)"""
    if source.format in ENVELOPE_JSON_FORMATS:
        if not source.payload:
            raise ValueError(
                f"source.format={source.format!r} requires source.payload "
                "(the row schema as a DDL string)"
            )
        from datax_spark.sources.debezium import WIRE_FORMAT_READERS
        from pyspark.sql import types as T

        payload = T.StructType.fromDDL(source.payload)
        return WIRE_FORMAT_READERS[source.format](
            spark, source.path, payload
        )
    return spark.read.format(source.format).load(source.path)


# Hook SPI — the rebuild of DataX's pluggable job hooks
# (common/src/main/java/com/alibaba/datax/common/spi/Hook.java:10-25,
# core/.../util/HookInvoker.java:42-89: hooks are discovered by name and
# invoked with the job configuration + final metrics).  Here hooks register
# by name in-process; a job.json references them via "hooks": ["name", ...].
HOOK_REGISTRY: dict[str, Any] = {}


def register_hook(name: str):
    """Decorator: ``@register_hook("audit")`` registers
    ``fn(spec: JobSpec, summary: dict) -> None`` under that name."""

    def deco(fn):
        HOOK_REGISTRY[name] = fn
        return fn

    return deco


@dataclass
class JobSpec:
    source: SourceSpec
    target: TargetSpec
    merge: MergeSpec = field(default_factory=MergeSpec)
    run: RunSpec = field(default_factory=RunSpec)
    error_limit: ErrorLimitSpec = field(default_factory=ErrorLimitSpec)
    transforms: list[dict] = field(default_factory=list)
    quarantine_path: str | None = None
    # pre/post SQL around the job (WriterUtil.java:78-108 / job-level
    # CommonRdbmsWriter.java:86-161): run via spark.sql with the feed
    # registered as view `source` and the lake table as view `target`.
    pre_sql: list[str] = field(default_factory=list)
    post_sql: list[str] = field(default_factory=list)
    # names resolved against HOOK_REGISTRY, invoked post-job with
    # (spec, summary) — HookInvoker.java:42-89
    hooks: list[str] = field(default_factory=list)
    # declared rollups (lake/aggview.py) maintained after every run:
    # [{"location": ..., "dims": [...], "sums": [...], "on_rewrite": ...}].
    # Created (bootstrapped from the post-run snapshot) on first run,
    # incrementally refreshed from the changelog thereafter.
    agg_views: list[dict] = field(default_factory=list)
    # declared join views (lake/joinview.py) maintained after every run:
    # [{"location": ..., "right": <dim LakeTable path>, "on": {fk: dimkey},
    #   "right_cols": {out: src}?, "how": "inner"|"left",
    #   "on_rewrite": ...}], or the star form with several dims:
    # {"location": ..., "rights": [{"right": ..., "on": ..., ...}, ...]}.
    # The job's target is the FACT side; every ``right`` must be an
    # existing LakeTable.  Created (bootstrapped from all current
    # snapshots) on first run, refreshed from EVERY changelog thereafter
    # — a dim-side change alone still updates the view.
    join_views: list[dict] = field(default_factory=list)
    # declared inverted-index views (lake/indexview.py):
    # [{"location": ..., "content_col": ..., "token_pattern"?: ...,
    #   "on_rewrite"?: ...}] — a search index over a target string
    # column, bootstrapped on first run and refreshed from the
    # before-image changelog after every later run.
    index_views: list[dict] = field(default_factory=list)
    # lookup-join enrichment (build_enricher): broadcast dimension
    # columns decorated onto every event before quarantine/merge —
    # [{"path": ..., "on": {feed: dim}|[col,...], "cols": [...],
    #   "how": "left"}].  Applied in batch, stream, and tail runs alike.
    enrich: list[dict] = field(default_factory=list)

    # ------------------------------------------------------------------ io
    @staticmethod
    def from_dict(d: dict[str, Any]) -> "JobSpec":
        return JobSpec(
            source=SourceSpec(**d["source"]),
            target=TargetSpec(**d["target"]),
            merge=MergeSpec(**d.get("merge", {})),
            run=RunSpec(**d.get("run", {})),
            error_limit=ErrorLimitSpec(**d.get("error_limit", {})),
            transforms=list(d.get("transforms", [])),
            quarantine_path=d.get("quarantine_path"),
            pre_sql=list(d.get("pre_sql", [])),
            post_sql=list(d.get("post_sql", [])),
            hooks=list(d.get("hooks", [])),
            agg_views=list(d.get("agg_views", [])),
            join_views=list(d.get("join_views", [])),
            index_views=list(d.get("index_views", [])),
            enrich=list(d.get("enrich", [])),
        )

    @staticmethod
    def from_json(path: str) -> "JobSpec":
        with open(path, encoding="utf-8") as f:
            return JobSpec.from_dict(json.load(f))

    def to_dict(self) -> dict:
        return asdict(self)

    def _effective_source(self) -> SourceSpec:
        """The source as the run actually reads it: under ``run.bootstrap``
        the feed directory is widened to the glob covering both live
        commits and incremental-snapshot chunks."""
        if not self.run.bootstrap:
            return self.source
        from datax_spark.sources.debezium import snapshot_feed_glob

        return replace(self.source, path=snapshot_feed_glob(self.source.path))

    # ------------------------------------------------------------ pre-check
    def pre_check(self, spark: SparkSession) -> list[str]:
        """Dry-run validation; returns a list of problems (empty = OK)."""
        problems: list[str] = []
        if not os.path.exists(self.source.path):
            problems.append(f"source path missing: {self.source.path}")
            return problems
        if (self.source.format in ENVELOPE_JSON_FORMATS
                and not self.source.payload):
            return problems + [
                f"source.format={self.source.format!r} requires "
                "source.payload (row schema DDL)"
            ]
        try:
            df = load_feed(spark, self._effective_source())
        except Exception as e:  # unreadable source
            return problems + [f"source unreadable: {e}"]
        cols = set(df.columns)
        if self.run.kind in ("incremental", "stream", "tail"):
            for c in ENVELOPE_COLS:
                if c not in cols:
                    problems.append(f"feed missing envelope column: {c}")
        for k in self.target.key_cols:
            if k not in cols:
                problems.append(f"feed missing key column: {k}")
        if self.merge.mode not in ("mor", "cow"):
            problems.append(f"unknown merge mode: {self.merge.mode}")
        if self.merge.schema_policy not in ("evolve", "strict"):
            problems.append(
                f"unknown schema_policy: {self.merge.schema_policy}")
        if self.run.kind not in ("full", "incremental", "stream", "tail"):
            problems.append(f"unknown run kind: {self.run.kind}")
        if self.run.kind == "tail" and (
            self.run.tail_duration_sec is None
            and self.run.tail_idle_stop_sec is None
        ):
            problems.append(
                "tail runs need run.tail_duration_sec or "
                "run.tail_idle_stop_sec (else the job never returns)"
            )
        if self.run.bootstrap:
            if self.run.kind not in ("stream", "tail"):
                problems.append(
                    "run.bootstrap only applies to stream/tail runs "
                    "(the chunked snapshot rides the streaming file source)"
                )
            if self.merge.mode != "mor":
                problems.append(
                    "run.bootstrap requires merge.mode='mor': the sentinel "
                    "chunk fold needs per-row LSNs kept, which cow folds "
                    "away at write time"
                )
            if self.target.scd2:
                problems.append(
                    "run.bootstrap does not support target.scd2 (snapshot "
                    "chunks carry no interval history — bootstrap the "
                    "history table from a changelog instead)"
                )
        if self.run.txn_boundary is not None:
            if self.run.kind not in ("stream", "tail"):
                problems.append(
                    "run.txn_boundary only applies to stream/tail runs"
                )
            elif len(self.run.txn_boundary) != 2:
                problems.append(
                    "run.txn_boundary must be [txid_col, commit_col]"
                )
            else:
                for c in self.run.txn_boundary:
                    if c not in cols:
                        problems.append(
                            f"feed missing txn_boundary column: {c}"
                        )
        if (self.run.kind in ("stream", "tail")
                and self.source.format != "parquet"
                and self.source.format not in ENVELOPE_JSON_FORMATS):
            problems.append(
                f"source.format={self.source.format!r} is not streamable: "
                "stream/tail runs support parquet or "
                f"{sorted(ENVELOPE_JSON_FORMATS)}"
            )
        if self.source.format in ENVELOPE_JSON_FORMATS:
            if self.run.kind == "incremental":
                problems.append(
                    "run.kind='incremental' slices batches by "
                    "lsn // batch_lsns, which never terminates on the "
                    "sparse synthesized LSNs of wire-format feeds — use "
                    "run.kind='stream' or 'tail' (file-based batching)"
                )
            if (self.run.max_bytes_per_trigger is not None
                    or self.run.max_rows_per_trigger is not None):
                problems.append(
                    "byte/row rate caps pre-scan parquet footers and do "
                    "not apply to JSON wire feeds — use "
                    "run.max_files_per_trigger"
                )
        bucket = self.target.bucket_col or self.target.key_cols[0]
        if bucket not in cols:
            problems.append(f"bucket column missing from feed: {bucket}")
        if self.target.scd2:
            if self.run.kind == "full":
                problems.append(
                    "target.scd2 cannot run kind='full' (an overwrite "
                    "snapshot carries no change history — replay the "
                    "feed incrementally instead)")
            if self.merge.partial_update:
                problems.append(
                    "target.scd2 cannot combine with partial_update (an "
                    "interval row is a whole-row version)")
            if self.agg_views:
                problems.append(
                    "agg_views aggregate current state, not history — "
                    "run them on a separate non-scd2 target")
            if self.join_views:
                problems.append(
                    "join_views join current state, not history — "
                    "run them on a separate non-scd2 target")
            if self.index_views:
                problems.append(
                    "index_views index current state, not history — "
                    "run them on a separate non-scd2 target")
            sbucket = self.target.bucket_col or self.target.key_cols[0]
            if sbucket not in self.target.key_cols:
                problems.append(
                    f"scd2 bucket_col {sbucket!r} must be one of the "
                    f"natural key columns {self.target.key_cols} (a "
                    "payload bucket would scatter a key's intervals)")
            from datax_spark.lake.scd import _RESERVED as _SCD2_RESERVED

            for c in _SCD2_RESERVED:
                if c in cols:
                    problems.append(
                        f"feed column {c!r} collides with an scd2 "
                        "interval column")
        elif self.target.suppress_unchanged:
            problems.append("target.suppress_unchanged requires "
                            "target.scd2=true")
        for h in self.hooks:
            if h not in HOOK_REGISTRY:
                problems.append(f"unknown hook: {h}")
        seen_out = set(cols)
        for i, e in enumerate(self.enrich):
            tag = f"enrich[{i}]"
            path, fmt, on, ecols, how = _parse_enrich(e)
            if not path or not on or not ecols:
                problems.append(f"{tag}: needs path, on, and cols")
                continue
            if how not in ("left", "inner"):
                problems.append(f"{tag}: how must be left or inner")
            try:
                dim = spark.read.format(fmt).load(path)
            except Exception as ex:
                problems.append(f"{tag}: dimension unreadable: {ex}")
                continue
            dcols = set(dim.columns)
            for fc, dc in on.items():
                if fc not in seen_out:
                    problems.append(f"{tag}: feed missing join column {fc}")
                if dc not in dcols:
                    problems.append(
                        f"{tag}: dimension missing join column {dc}")
            for c in ecols:
                if c not in dcols:
                    problems.append(f"{tag}: dimension missing column {c}")
                elif c in seen_out:
                    problems.append(
                        f"{tag}: output column {c} collides with the feed "
                        "(alias it in the dimension or drop it upstream)")
                else:
                    seen_out.add(c)
        if self.agg_views:
            # refresh reads the target's changelog: only LSN-carrying
            # commits (merge-mor from incremental/stream runs) are
            # changelog-readable — cow/overwrite/partial histories would
            # fail AFTER the data commit, on every run
            if self.merge.mode != "mor":
                problems.append(
                    "agg_views require merge.mode='mor' (changelog-readable"
                    f" commits); got {self.merge.mode!r}")
            if self.run.kind == "full":
                problems.append(
                    "agg_views cannot follow run.kind='full' (overwrite "
                    "commits are not a change stream)")
            if self.merge.partial_update:
                problems.append(
                    "agg_views cannot follow partial_update merges (a "
                    "partial row is not a whole-row change record)")
        for i, av in enumerate(self.agg_views):
            if not av.get("location"):
                problems.append(f"agg_views[{i}]: missing location")
            if not av.get("dims"):
                problems.append(f"agg_views[{i}]: missing dims")
            for c in [*av.get("dims", []), *av.get("sums", []),
                      *av.get("mins", []), *av.get("maxs", [])]:
                if c in ENVELOPE_COLS:
                    problems.append(
                        f"agg_views[{i}]: {c} is an envelope column — "
                        "views aggregate target payload columns"
                    )
                elif c not in cols:
                    problems.append(
                        f"agg_views[{i}]: column not in feed: {c}"
                    )
        if self.join_views:
            # same changelog-readability contract as agg_views (the
            # refresh consumes the TARGET's changelog as its left side)
            if self.merge.mode != "mor":
                problems.append(
                    "join_views require merge.mode='mor' (changelog-"
                    f"readable commits); got {self.merge.mode!r}")
            if self.run.kind == "full":
                problems.append(
                    "join_views cannot follow run.kind='full' (overwrite "
                    "commits are not a change stream)")
            if self.merge.partial_update:
                problems.append(
                    "join_views cannot follow partial_update merges (a "
                    "partial row is not a whole-row change record)")
        for i, jv in enumerate(self.join_views):
            vtag = f"join_views[{i}]"
            if not jv.get("location"):
                problems.append(f"{vtag}: missing location")
            rights = _jv_rights(jv)
            seen_jv_out = set(cols)
            for j, r in enumerate(rights):
                tag = (f"{vtag}.rights[{j}]" if jv.get("rights") else vtag)
                on = r.get("on") or {}
                if not on:
                    problems.append(f"{tag}: missing on ({{fk: dim_key}})")
                if r.get("how", "inner") not in ("inner", "left"):
                    problems.append(f"{tag}: how must be inner or left")
                for fc in on:
                    if fc in ENVELOPE_COLS:
                        problems.append(
                            f"{tag}: {fc} is an envelope column — join on "
                            "target payload columns")
                    elif fc not in cols:
                        problems.append(
                            f"{tag}: join column not in feed: {fc} (star "
                            "contract: dims join on fact columns only)")
                right = r.get("right")
                if not right:
                    problems.append(f"{tag}: missing right (dim table path)")
                    continue
                from datax_spark.lake.table import LakeTable as _LT

                if not _LT.exists(right):
                    problems.append(
                        f"{tag}: right table does not exist: {right}")
                    continue
                rm = _LT(spark, right).manifest()
                if on and set(on.values()) != set(rm.key_cols):
                    problems.append(
                        f"{tag}: join columns {sorted(on.values())} "
                        f"must be exactly the right table's key "
                        f"columns {sorted(rm.key_cols)}")
                rnames = {f.name for f in rm.schema.fields}
                out_cols = (r.get("right_cols")
                            or {f: f for f in rnames - set(rm.key_cols)})
                for out_c, src_c in out_cols.items():
                    if src_c not in rnames:
                        problems.append(
                            f"{tag}: right column missing: {src_c}")
                    if out_c in seen_jv_out:
                        problems.append(
                            f"{tag}: output column {out_c} collides with "
                            "the feed or an earlier dim")
                    seen_jv_out.add(out_c)
        if self.index_views:
            # the refresh consumes the target's before-image changelog —
            # same changelog-readability contract as the other views
            if self.merge.mode != "mor":
                problems.append(
                    "index_views require merge.mode='mor' (changelog-"
                    f"readable commits); got {self.merge.mode!r}")
            if self.run.kind == "full":
                problems.append(
                    "index_views cannot follow run.kind='full' (overwrite "
                    "commits are not a change stream)")
            if self.merge.partial_update:
                problems.append(
                    "index_views cannot follow partial_update merges (a "
                    "partial row is not a whole-row change record)")
        for i, iv in enumerate(self.index_views):
            tag = f"index_views[{i}]"
            if not iv.get("location"):
                problems.append(f"{tag}: missing location")
            c = iv.get("content_col")
            if not c:
                problems.append(f"{tag}: missing content_col")
            elif c in ENVELOPE_COLS:
                problems.append(
                    f"{tag}: {c} is an envelope column — index a target "
                    "payload column")
            elif c not in cols:
                problems.append(f"{tag}: content column not in feed: {c}")
        return problems


def run_job(spark: SparkSession, spec: JobSpec) -> dict:
    """Execute a job spec; returns a summary dict (≈ DataX's end-of-job
    statistics, JobContainer.java:538-592)."""
    import time

    from pyspark.sql import functions as F

    from datax_spark.cdc import quarantine as Q
    from datax_spark.cdc.runner import run_incremental
    from datax_spark.lake.table import LakeTable
    from datax_spark.transforms import TransformerRegistry

    t0 = time.monotonic()
    # the effective source widens a run.bootstrap feed dir to the
    # commits+chunks glob — ALSO required for this batch read: batch
    # partition discovery on the parent dir would see _commit_version=
    # and _snapshot_chunk= as conflicting partition columns, while glob
    # roots are read independently
    feed = load_feed(spark, spec._effective_source())
    if spec.transforms:
        feed = TransformerRegistry().apply_chain(feed, spec.transforms)
    if spec.enrich:
        feed = build_enricher(spark, spec.enrich)(feed)

    # preSql: runs BEFORE any write; a failure aborts the job with nothing
    # landed (WriterUtil.java:78-108 contract).  The feed is visible as
    # view `source`; an existing target table as view `target`.
    if spec.pre_sql:
        feed.createOrReplaceTempView("source")
        if LakeTable.exists(spec.target.location):
            LakeTable(spark, spec.target.location).create_view("target")
        for s in spec.pre_sql:
            spark.sql(s).collect()  # eager: SELECT-shaped checks must fire

    target_loc = spec.target.location
    if LakeTable.exists(target_loc):
        table = LakeTable(spark, target_loc)
    else:
        # txn_boundary columns are runner metadata, never table columns
        txn_cols = list(spec.run.txn_boundary or [])
        if spec.run.kind == "full":
            payload_schema = feed.drop(*ENVELOPE_COLS, *txn_cols).schema
        else:
            payload_schema = feed.drop(
                *[c for c in (*ENVELOPE_COLS, *txn_cols)
                  if c in feed.columns]).schema
        if spec.target.scd2:
            from datax_spark.lake.scd import scd2_create

            table = scd2_create(
                spark, target_loc,
                schema=payload_schema,
                key_cols=spec.target.key_cols,
                bucket_col=spec.target.bucket_col
                or spec.target.key_cols[0],
                num_buckets=spec.target.num_buckets,
            )
        else:
            table = LakeTable.create(
                spark, target_loc,
                schema=payload_schema,
                key_cols=spec.target.key_cols,
                bucket_col=spec.target.bucket_col,
                num_buckets=spec.target.num_buckets,
            )

    limits = Q.ErrorLimits(spec.error_limit.record, spec.error_limit.percentage)
    summary: dict[str, Any] = {"kind": spec.run.kind}

    if spec.run.kind == "full":
        table.overwrite(feed, files_per_bucket=spec.merge.files_per_bucket)
        summary["rows"] = table.file_stats()["rows"]
    elif spec.run.kind == "incremental":
        if spec.error_limit.record is not None or spec.error_limit.percentage is not None \
                or spec.quarantine_path:
            feed = Q.quarantine(
                feed,
                Q.envelope_rules(spec.target.key_cols),
                quarantine_path=spec.quarantine_path,
                limits=limits,
            )
        if spec.target.scd2:
            from datax_spark.lake.scd import scd2_run_incremental

            applied = scd2_run_incremental(
                table, feed, batch_lsns=spec.run.batch_lsns,
                suppress_unchanged=spec.target.suppress_unchanged,
                mode=spec.merge.mode,
                auto_compact=spec.merge.auto_compact,
                compact_ratio=spec.merge.compact_ratio,
                bucket_deltas=spec.merge.bucket_deltas,
                schema_policy=spec.merge.schema_policy,
            )
            summary["batches"] = len(applied)
            summary["rows"] = int(sum(a["rows"] for a in applied))
        else:
            lineages = run_incremental(
                table, feed, batch_lsns=spec.run.batch_lsns,
                mode=spec.merge.mode, auto_compact=spec.merge.auto_compact,
                dedup_batch=spec.merge.dedup_batch,
                compact_ratio=spec.merge.compact_ratio,
                partial_update=spec.merge.partial_update,
                bucket_deltas=spec.merge.bucket_deltas,
                schema_policy=spec.merge.schema_policy,
            )
            summary["batches"] = len(lineages)
            summary["rows"] = int(sum(l["rows"] for l in lineages))
            summary["bytes"] = int(sum(l["bytes"] for l in lineages))
    elif spec.run.kind in ("stream", "tail"):
        from datax_spark.streaming.runner import (
            run_available_now,
            run_continuous,
        )

        src_path = spec._effective_source().path
        snapshot_done_at_start = False
        if spec.run.bootstrap:
            # completion is judged by the producer state AS OF BEFORE the
            # drain: AvailableNow only processes files present at query
            # start, so a chunk published mid-drain (with "done" written
            # after) would be unconsumed — clearing the guard on a
            # post-run check could let compaction run with a chunk still
            # pending, exactly the hazard the property exists to prevent.
            from datax_spark.sources.debezium import _read_snapshot_state

            st = _read_snapshot_state(spec.source.path)
            snapshot_done_at_start = bool(st and st.get("done"))
            if not table.manifest().properties.get("bootstrap_active"):
                # one properties-only commit at bootstrap start; subsequent
                # invocations of a multi-session bootstrap see it already
                # set
                table.set_properties(bootstrap_active=True)

        # forward the full spec exactly like the incremental branch does:
        # merge options via applier_opts, error limits + quarantine rules —
        # a stream job.json must enforce the same contract as a batch one
        want_quarantine = (
            spec.error_limit.record is not None
            or spec.error_limit.percentage is not None
            or spec.quarantine_path
        )
        shared = dict(
            feed_format=spec.source.format,
            payload=spec.source.payload,
            max_files_per_trigger=spec.run.max_files_per_trigger,
            max_bytes_per_trigger=spec.run.max_bytes_per_trigger,
            max_rows_per_trigger=spec.run.max_rows_per_trigger,
            stall_timeout_sec=spec.run.stall_timeout_sec,
            filter_watermark=spec.run.filter_watermark,
            txn_boundary=(tuple(spec.run.txn_boundary)
                          if spec.run.txn_boundary else None),
            transform=(
                (lambda df, _e=(build_enricher(spark, spec.enrich)
                                if spec.enrich else None):
                 (_e or (lambda x: x))(
                     TransformerRegistry().apply_chain(df, spec.transforms)
                     if spec.transforms else df))
                if (spec.transforms or spec.enrich) else None
            ),
            quarantine_rules=(
                Q.envelope_rules(spec.target.key_cols) if want_quarantine else None
            ),
            quarantine_path=spec.quarantine_path,
            error_limits=limits if want_quarantine else None,
        )
        sink = table
        if spec.target.scd2:
            # pre-built applier: the history fold rides the same
            # checkpointed exactly-once tail path as a current-state
            # target (streaming/runner accepts any applier object)
            from datax_spark.lake.scd import Scd2Applier

            sink = Scd2Applier(
                table,
                suppress_unchanged=spec.target.suppress_unchanged,
                mode=spec.merge.mode,
                auto_compact=spec.merge.auto_compact,
                compact_ratio=spec.merge.compact_ratio,
                bucket_deltas=spec.merge.bucket_deltas,
                schema_policy=spec.merge.schema_policy,
            )
        else:
            shared.update(
                mode=spec.merge.mode,
                auto_compact=spec.merge.auto_compact,
                dedup_batch=spec.merge.dedup_batch,
                files_per_bucket=spec.merge.files_per_bucket,
                compact_ratio=spec.merge.compact_ratio,
                partial_update=spec.merge.partial_update,
                bucket_deltas=spec.merge.bucket_deltas,
                schema_policy=spec.merge.schema_policy,
            )
        if spec.run.kind == "stream":
            lineages = run_available_now(spark, src_path, sink,
                                         **shared)
        else:
            # live tail, bounded by duration and/or idle-stop (pre_check
            # enforces at least one); the shared checkpoint makes the next
            # invocation — tail or drain — resume exactly-once
            on_batch = None
            live_join_views = []
            if spec.join_views and spec.run.tail_live_join_views:
                from datax_spark.lake.joinview import create_star_view

                for jv in spec.join_views:
                    vloc = jv["location"]
                    rights = _jv_rights(jv)
                    rts = [LakeTable(spark, r["right"]) for r in rights]
                    if LakeTable.exists(vloc):
                        live_join_views.append(
                            (rts, LakeTable(spark, vloc), jv))
                    else:
                        live_join_views.append((rts, create_star_view(
                            table,
                            [{"table": rt, "on": dict(r["on"]),
                              "right_cols": r.get("right_cols"),
                              "how": r.get("how", "inner")}
                             for rt, r in zip(rts, rights)],
                            vloc,
                        ), jv))
            if spec.agg_views and spec.run.tail_live_agg_views:
                # continuous aggregates: bootstrap absent views from the
                # pre-tail snapshot, then fold every micro-batch's commit
                # into them INSIDE the batch (watermark-guarded, so a
                # replayed batch re-runs the refresh as a no-op)
                from datax_spark.lake.aggview import (
                    create_agg_view,
                    refresh_agg_view,
                )

                live_views = []
                for av in spec.agg_views:
                    vloc = av["location"]
                    if LakeTable.exists(vloc):
                        live_views.append((LakeTable(spark, vloc), av))
                    else:
                        live_views.append((create_agg_view(
                            table, vloc, dims=list(av["dims"]),
                            sums=list(av.get("sums", [])),
                            mins=list(av.get("mins", [])),
                            maxs=list(av.get("maxs", [])),
                        ), av))

            else:
                live_views = []
            live_index_views = []
            if spec.index_views and spec.run.tail_live_index_views:
                from datax_spark.lake.indexview import (
                    DEFAULT_TOKEN_PATTERN as _DTP,
                )
                from datax_spark.lake.indexview import create_index_view

                for iv in spec.index_views:
                    vloc = iv["location"]
                    if LakeTable.exists(vloc):
                        live_index_views.append(
                            (LakeTable(spark, vloc), iv))
                    else:
                        live_index_views.append((create_index_view(
                            table, vloc, iv["content_col"],
                            token_pattern=iv.get("token_pattern", _DTP),
                        ), iv))
            if live_views or live_join_views or live_index_views:
                def on_batch(_lineage):
                    for v, av in live_views:
                        refresh_agg_view(
                            table, v,
                            on_rewrite=av.get("on_rewrite", "error"),
                        )
                    if live_join_views:
                        from datax_spark.lake.joinview import (
                            refresh_star_view as _rsv,
                        )

                        for rts, v, jv in live_join_views:
                            _rsv(table, rts, v,
                                 on_rewrite=jv.get("on_rewrite", "error"))
                    if live_index_views:
                        from datax_spark.lake.indexview import (
                            refresh_index_view as _riv,
                        )

                        for v, iv in live_index_views:
                            _riv(table, v,
                                 on_rewrite=iv.get("on_rewrite", "error"))

            tail = run_continuous(
                spark, src_path, sink,
                trigger_interval=spec.run.tail_trigger,
                on_batch=on_batch, **shared,
            )
            lineages = tail.run_until(
                duration_sec=spec.run.tail_duration_sec,
                idle_stop_sec=spec.run.tail_idle_stop_sec,
            )
        summary["batches"] = len(lineages)
        summary["rows"] = int(sum(l["rows"] for l in lineages))
        summary["bytes"] = int(sum(l.get("bytes", 0) for l in lineages))
        if spec.run.bootstrap:
            # chunk plan done BEFORE the drain started → every chunk was
            # present at query start and has been applied; compaction is
            # safe again.  Otherwise the property stays set across
            # invocations (a bootstrap can span many job runs) and the
            # run AFTER the producer finishes clears it.
            summary["bootstrap_complete"] = snapshot_done_at_start
            if snapshot_done_at_start and table.manifest().properties.get(
                    "bootstrap_active"):
                table.set_properties(bootstrap_active=None)
    else:
        raise ValueError(f"unknown run kind {spec.run.kind}")

    # postSql: target view reflects the post-run state; failure raises so
    # the caller can clean up (the data IS committed — same as reference).
    if spec.post_sql:
        feed.createOrReplaceTempView("source")
        table.create_view("target")
        for s in spec.post_sql:
            spark.sql(s).collect()

    # declared aggregate views: create on first run (bootstrap from the
    # post-run snapshot), incrementally refresh from the changelog after
    if spec.agg_views:
        from datax_spark.lake.aggview import create_agg_view, refresh_agg_view

        results = []
        for av in spec.agg_views:
            loc = av["location"]
            # the sync itself has committed by now — a view failure is
            # recorded per view (like hook errors), never fails the job
            try:
                created = not LakeTable.exists(loc)
                if created:
                    view = create_agg_view(
                        table, loc, dims=list(av["dims"]),
                        sums=list(av.get("sums", [])),
                        mins=list(av.get("mins", [])),
                        maxs=list(av.get("maxs", [])),
                    )
                else:
                    view = LakeTable(spark, loc)
                res = {"location": loc, "created": created,
                       **refresh_agg_view(
                           table, view,
                           on_rewrite=av.get("on_rewrite", "error"))}
            except Exception as e:  # noqa: BLE001 — mirror hook capture
                res = {"location": loc, "error": str(e)}
            results.append(res)
        summary["agg_views"] = results

    # declared join views: the target is the left (fact) side; created on
    # first run, then refreshed from BOTH upstreams' changelogs — so the
    # job also folds dim-side changes that landed since the last run
    if spec.join_views:
        from datax_spark.lake.joinview import (
            create_star_view,
            refresh_star_view,
        )

        jresults = []
        for jv in spec.join_views:
            loc = jv["location"]
            try:
                rights = _jv_rights(jv)
                rts = [LakeTable(spark, r["right"]) for r in rights]
                created = not LakeTable.exists(loc)
                if created:
                    view = create_star_view(
                        table,
                        [{"table": rt, "on": dict(r["on"]),
                          "right_cols": r.get("right_cols"),
                          "how": r.get("how", "inner")}
                         for rt, r in zip(rts, rights)],
                        loc,
                    )
                else:
                    view = LakeTable(spark, loc)
                res = {"location": loc, "created": created,
                       **refresh_star_view(
                           table, rts, view,
                           on_rewrite=jv.get("on_rewrite", "error"))}
            except Exception as e:  # noqa: BLE001 — mirror hook capture
                res = {"location": loc, "error": str(e)}
            jresults.append(res)
        summary["join_views"] = jresults

    # declared inverted-index views: bootstrapped on first run, refreshed
    # from the target's before-image changelog thereafter
    if spec.index_views:
        from datax_spark.lake.indexview import (
            create_index_view,
            refresh_index_view,
        )
        from datax_spark.lake.indexview import (
            DEFAULT_TOKEN_PATTERN as _DTP,
        )

        iresults = []
        for iv in spec.index_views:
            loc = iv["location"]
            try:
                created = not LakeTable.exists(loc)
                if created:
                    view = create_index_view(
                        table, loc, iv["content_col"],
                        token_pattern=iv.get("token_pattern", _DTP),
                    )
                else:
                    view = LakeTable(spark, loc)
                res = {"location": loc, "created": created,
                       **refresh_index_view(
                           table, view,
                           on_rewrite=iv.get("on_rewrite", "error"))}
            except Exception as e:  # noqa: BLE001 — mirror hook capture
                res = {"location": loc, "error": str(e)}
            iresults.append(res)
        summary["index_views"] = iresults

    wall = time.monotonic() - t0
    summary["wall_sec"] = round(wall, 3)
    if summary.get("rows"):
        summary["rows_per_sec"] = round(summary["rows"] / wall, 1)
    summary["table_version"] = table.current_version()

    # post-job hooks: each gets (spec, summary); a hook exception never
    # fails a job that already committed — it is recorded in the summary
    # (HookInvoker.java:62-67 catches Throwable per hook and logs on).
    if spec.hooks:
        errors: dict[str, str] = {}
        for name in spec.hooks:
            fn = HOOK_REGISTRY.get(name)
            if fn is None:
                errors[name] = "unknown hook"
                continue
            try:
                fn(spec, summary)
            except Exception as e:  # noqa: BLE001 — mirror HookInvoker
                errors[name] = str(e)
        if errors:
            summary["hook_errors"] = errors
    _ = F  # keep import local-explicit
    return summary
