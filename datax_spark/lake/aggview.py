"""Incremental aggregate views: GROUP BY rollups maintained from the
changelog — the continuous-aggregate / "dynamic table" pattern
(TimescaleDB continuous aggregates, Flink dynamic tables, Materialize).

The reference has no analogue (DataX moves rows; any rollup re-reads the
whole source per sync, ``CommonRdbmsReader.java:165-214``).  Here the
rollup is a derived :class:`LakeTable` keyed by the group dimensions, and
each refresh consumes only the upstream commits since its watermark via
``read_changes_with_images`` — update_before/delete rows RETRACT (-1),
insert/update_after rows ASSERT (+1), so counts and sums maintain exactly
under updates and deletes.

Aggregates: ``n_rows`` (count) and ``sum_<col>`` are self-maintainable
under retraction; ``avg`` is a read-time division.  ``min_<col>`` /
``max_<col>`` are maintained with the textbook partial-recompute rule:
an arriving value at-or-beyond the current extremum updates it directly,
and ONLY a group whose current extremum actually departs (a retracted
row held it and nothing arriving reaches it) triggers a recompute — one
snapshot pass filtered to just those groups.  Their dim values are
pushed into the scan as per-dim IN predicates via ``read(where=...)``,
so the upstream manifest's ZONE MAPS skip whole files before any are
opened; keep a hot upstream dim-clustered with
``compact(sort_cols=dims)`` and the rescan costs O(matching files),
not O(snapshot) — the refresh result reports the pruning decision under
``"rescan"``.  A broadcast semi join restores group-exactness either
way.  No extremum departure → no snapshot pass at all.

Exactly-once, like the mirror (``lake/mirror.py``): the view stores
``aggview_upstream_version`` in its own manifest properties and advances
it in the SAME atomic commit as the merged deltas; the merge's batch-id
replay guard makes a re-run of a completed refresh a no-op.

Scale: a refresh costs O(changed rows) + one bucket-pruned read of the
CURRENT view restricted to the touched groups (delta group keys are
collected — bounded by the batch's distinct dims, the same planning-scan
bound as COW merge) — never O(view) and never O(upstream).  The upstream
fact table is read only through its commit-log file diff; the buckets its
changed keys live in come straight from that diff's file entries
(``LakeTable.changed_buckets`` — zero Spark jobs).  Views under
``_SMALL_VIEW_FUSED_BYTES`` take a 2-action refresh (one fused planning
aggregate + the merge); bigger views keep the bucket-pruned 3-action
path.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable

WATERMARK_PROP = "aggview_upstream_version"
SPEC_PROP = "aggview_spec"
_OP = "__aggview_op"
_ORDER = "__aggview_order"
# rescan groups at or under this count get their keys pushed into the
# snapshot scan as an isin() filter (row-group pruning); above it, the
# broadcast semi join alone restricts the pass
_RESCAN_PUSHDOWN_CAP = 256

# views at or under this many manifest bytes take the FUSED-STATS refresh:
# the whole (tiny) view is read unpruned and one aggregate action yields
# group count + touched buckets + departed-extremum keys together — two
# Spark actions per refresh instead of three.  Bigger views keep the
# bucket-pruned 3-action path (reading an unpruned big view would cost
# more than the extra action saves).
_SMALL_VIEW_FUSED_BYTES = 64 << 20

_SUMMABLE = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _spec(view: LakeTable) -> dict:
    raw = view.manifest().properties.get(SPEC_PROP)
    if raw is None:
        raise ValueError(
            "table has no aggview spec — create it with create_agg_view()"
        )
    return json.loads(raw)


def _sum_type(dt: T.DataType) -> T.DataType:
    """Spark's sum() widening: integral → long, fractional → double."""
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return T.DoubleType()
    if isinstance(dt, T.DecimalType):
        return T.DecimalType(38, dt.scale)
    return T.LongType()


def _aggregate(
    df: DataFrame, dims: list[str], sums: list[str],
    out_types: dict[str, T.DataType],
    mins: list[str] = (), maxs: list[str] = (),
) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in sums:
        t = out_types[f"sum_{c}"]
        aggs.append(
            F.coalesce(F.sum(c), F.lit(0)).cast(t).alias(f"sum_{c}")
        )
    for c in mins:
        aggs.append(F.min(c).alias(f"min_{c}"))
    for c in maxs:
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(*dims).agg(*aggs)


def create_agg_view(
    upstream: LakeTable,
    location: str,
    dims: list[str],
    sums: list[str] | None = None,
    mins: list[str] | None = None,
    maxs: list[str] | None = None,
    num_buckets: int = 16,
    version: int | None = None,
) -> LakeTable:
    """Create the view table and bootstrap it with a one-shot aggregate of
    the upstream snapshot at ``version`` (default current; 0 = empty view
    that replays the whole changelog).  Schema: dims + ``n_rows`` +
    ``sum_<col>`` / ``min_<col>`` / ``max_<col>`` per requested column.

    Like ``bootstrap_mirror``, bootstrap is two commits (overwrite, then
    watermark) — a crash between them leaves no watermark and bootstrap is
    simply re-run."""
    sums = list(sums or [])
    mins = list(mins or [])
    maxs = list(maxs or [])
    uschema = upstream.schema()
    by_name = {f.name: f for f in uschema.fields}
    for c in [*dims, *sums, *mins, *maxs]:
        if c not in by_name:
            raise ValueError(f"column {c!r} not in upstream schema")
    for c in [*sums, *mins, *maxs]:
        if c in dims:
            raise ValueError(f"column {c!r} cannot be both a dim and a measure")
    for c in sums:
        if not isinstance(by_name[c].dataType, _SUMMABLE):
            raise ValueError(
                f"sum column {c!r} has non-numeric type {by_name[c].dataType}"
            )
    fields = [T.StructField(c, by_name[c].dataType) for c in dims]
    fields.append(T.StructField("n_rows", T.LongType()))
    for c in sums:
        fields.append(T.StructField(f"sum_{c}", _sum_type(by_name[c].dataType)))
    for c in mins:
        fields.append(T.StructField(f"min_{c}", by_name[c].dataType))
    for c in maxs:
        fields.append(T.StructField(f"max_{c}", by_name[c].dataType))
    try:
        view = LakeTable.create(
            upstream.spark,
            location,
            schema=T.StructType(fields),
            key_cols=list(dims),
            bucket_col=dims[0],
            num_buckets=num_buckets,
        )
    except FileExistsError:
        # a prior bootstrap crashed between overwrite and the spec/
        # watermark commit: the table exists but carries no spec — resume
        # the bootstrap on it.  A table WITH a spec is a live view and
        # re-creating it is refused.
        view = LakeTable(upstream.spark, location)
        if view.manifest().properties.get(SPEC_PROP) is not None:
            raise FileExistsError(
                f"aggregate view already exists at {location}"
            ) from None
    at = upstream.current_version() if version is None else version
    if at > 0:
        out_types = {f.name: f.dataType for f in fields}
        view.overwrite(
            _aggregate(upstream.read(version=at), dims, sums, out_types,
                       mins, maxs)
        )
    view.set_properties(**{
        WATERMARK_PROP: int(at),
        SPEC_PROP: json.dumps(
            {"dims": dims, "sums": sums, "mins": mins, "maxs": maxs}
        ),
    })
    return view


def view_lag(upstream: LakeTable, view: LakeTable) -> dict:
    """Staleness of the view vs its upstream: watermark, versions behind,
    and seconds behind (commit-timestamp delta).  Monitoring surface for
    refresh scheduling."""
    _spec(view)  # raises on non-view tables
    wm = int(view.manifest().properties[WATERMARK_PROP])
    return {"view_watermark": wm, **upstream.commit_lag(wm)}


def refresh_agg_view(
    upstream: LakeTable,
    view: LakeTable,
    on_rewrite: str = "error",
    mode: str = "cow",
    auto_compact: int | None = 8,
) -> dict:
    """Fold upstream commits (watermark, current] into the view; returns
    ``{"from_version", "to_version", "groups", "applied"}``.

    Default merge mode is COW, unlike the fact-table default (MOR): a
    rollup is small and read-hot, so rewriting the touched buckets
    (bounded by the refresh's group count) buys delta-free reads for
    every consumer and every subsequent refresh — measured ~40% faster
    over a 4-refresh cycle than MOR-with-compaction on the view.

    Per touched group: ``n_rows += Σ(±1)``, ``sum_c += Σ(±c)``; a group
    whose count reaches zero is deleted from the view.  Groups with NULL
    dimension values aggregate and merge correctly (null-safe keys).

    Delta algorithm — net-state difference, not per-commit images: the
    group delta over (from_v, to_v] is ``agg(changed keys @ to_v) −
    agg(changed keys @ from_v)``.  Both sides come cheap:

    - the NEW state of every changed key is already IN the changelog —
      it is the key's winning change row (max (commit, LSN)), or absence
      if that winner is a delete — so the to_v side is one O(changed
      files) changelog scan + hash-agg, no snapshot reconstruction;
    - the OLD state is one bucket-pruned snapshot read at from_v
      semi-joined to the changed keys.

    One reconstruction per refresh TOTAL, however many commits the range
    spans, vs the ``read_changes_with_images`` path's per-commit prior
    reads (measured ~3s/commit of fixed cost at bench scale).
    Intra-range churn collapses for free: only the endpoint states
    matter."""
    spec = _spec(view)
    dims, sums = spec["dims"], spec["sums"]
    mins = spec.get("mins", [])
    maxs = spec.get("maxs", [])
    wm = view.manifest().properties.get(WATERMARK_PROP)
    if wm is None:
        raise ValueError("view has no watermark — use create_agg_view()")
    from_v = int(wm)
    to_v = upstream.current_version()
    if to_v <= from_v:
        return {"from_version": from_v, "to_version": from_v,
                "groups": 0, "applied": False, "rescan": None}

    ukeys = list(upstream.manifest(to_v).key_cols)
    payload_cols = list(dict.fromkeys([*dims, *sums, *mins, *maxs]))
    order = F.struct(
        F.col("_commit_version").alias("v"),
        F.coalesce(F.col("_change_lsn"), F.lit(-1)).alias("l"),
    )
    winners = (
        upstream.read_changes(from_v, to_v, on_rewrite=on_rewrite)
        .groupBy(*ukeys)
        .agg(
            F.max_by(
                F.struct(
                    F.col("_change_type").alias("__t"),
                    *[F.col(c) for c in payload_cols],
                ),
                order,
            ).alias("__win")
        )
        .persist()
    )
    changed = winners.select(*ukeys)

    new_rows = winners.filter(F.col("__win.__t") != "delete").select(
        *[F.col(f"__win.{c}").alias(c) for c in payload_cols],
        F.lit(1).alias("__w"),
    )

    deltas = None
    try:
        # buckets holding the changed keys, from the MANIFEST DIFF alone
        # (zero Spark jobs): bucketed delta/append files land in their
        # keys' bucket, so the range's added-file bucket set IS the
        # changed-key bucket set; None (L0 placement / rebucket in range)
        # reads every bucket — exactly what the old key-collect pass
        # would have returned at that point anyway
        touched_b = upstream.changed_buckets(from_v, to_v)
        snap = upstream.read(version=from_v, buckets=touched_b)
        cond = None
        for c in ukeys:
            e = snap[c].eqNullSafe(changed[c])
            cond = e if cond is None else (cond & e)
        old_rows = snap.join(changed, on=cond, how="left_semi").select(
            *payload_cols, F.lit(-1).alias("__w")
        )

        weight = F.col("__w")
        delta_aggs = [F.sum(weight).cast("long").alias("__d_n")]
        for c in sums:
            sum_t = view.schema()[f"sum_{c}"].dataType
            delta_aggs.append(
                F.coalesce(
                    F.sum(weight.cast(sum_t.simpleString()) * F.col(c)),
                    F.lit(0).cast(sum_t)).alias(f"__d_{c}")
            )
        # arriving/departing extremum candidates per group for min/max
        for c in mins:
            delta_aggs.append(
                F.min(F.when(weight == 1, F.col(c))).alias(f"__add_min_{c}"))
            delta_aggs.append(
                F.min(F.when(weight == -1, F.col(c))).alias(f"__rem_min_{c}"))
        for c in maxs:
            delta_aggs.append(
                F.max(F.when(weight == 1, F.col(c))).alias(f"__add_max_{c}"))
            delta_aggs.append(
                F.max(F.when(weight == -1, F.col(c))).alias(f"__rem_max_{c}"))
        contrib = new_rows.unionByName(old_rows)
        # all-cancelling groups (pure churn) net to all-zero rows — drop
        # them so untouched groups are not rewritten.  With min/max
        # configured a zero-count/zero-sum group may still shift an
        # extremum, so it is dropped only when the arriving and departing
        # candidates agree (then every maintained aggregate is provably
        # unchanged).
        keep = F.col("__d_n") != 0
        for c in sums:
            keep = keep | (F.col(f"__d_{c}") != 0)
        for c in mins:
            keep = keep | ~F.col(f"__add_min_{c}").eqNullSafe(
                F.col(f"__rem_min_{c}"))
        for c in maxs:
            keep = keep | ~F.col(f"__add_max_{c}").eqNullSafe(
                F.col(f"__rem_max_{c}"))
        deltas = contrib.groupBy(*dims).agg(*delta_aggs).filter(keep).persist()
        m_view = view.manifest()
        bexpr = view.bucket_expr(m_view.bucket_col, m_view.num_buckets)
        view_bytes = sum(
            view._entry_bytes(e)
            for entries in m_view.files.values()
            for e in entries
        )
        fused_stats = view_bytes <= _SMALL_VIEW_FUSED_BYTES
        n_groups: int | None = None
        touched: list | None = None
        if fused_stats:
            # tiny view: read it whole (the broadcast semi join below still
            # restricts the join) and defer ALL planning stats to one
            # aggregate over the merged batch — see _SMALL_VIEW_FUSED_BYTES
            cur = view.read()
        else:
            head = deltas.agg(
                F.count(F.lit(1)).alias("n"),
                F.collect_set(bexpr.cast("int")).alias("bs"),
            ).first()
            n_groups, touched = int(head["n"]), list(head["bs"])
            if n_groups == 0:
                view.set_properties(**{WATERMARK_PROP: int(to_v)})
                return {"from_version": from_v, "to_version": to_v,
                        "groups": 0, "applied": False, "rescan": None}
            cur = view.read(buckets=[b for b in touched if b is not None])
        cond = None
        keys = deltas.select(
            *[F.col(c).alias(f"__k_{c}") for c in dims]
        ).distinct()
        for c in dims:
            e = cur[c].eqNullSafe(F.col(f"__k_{c}"))
            cond = e if cond is None else (cond & e)
        cur = cur.join(F.broadcast(keys), on=cond, how="left_semi")

        jcond = None
        for c in dims:
            e = deltas[c].eqNullSafe(cur[c])
            jcond = e if jcond is None else (jcond & e)
        merged = deltas.join(cur, on=jcond, how="left")
        new_n = F.coalesce(cur["n_rows"], F.lit(0)) + F.col("__d_n")
        out_cols = [deltas[c].alias(c) for c in dims]
        out_cols.append(new_n.alias("n_rows"))
        for c in sums:
            sum_t = view.schema()[f"sum_{c}"].dataType
            out_cols.append(
                (F.coalesce(cur[f"sum_{c}"], F.lit(0).cast(sum_t))
                 + F.col(f"__d_{c}")).cast(sum_t).alias(f"sum_{c}")
            )
        # min/max: direct update when an arriving value reaches the current
        # extremum; flag the group for rescan ONLY when the extremum
        # departs (a retracted row held it) and nothing arriving replaces
        # it — the partial-recompute rule.
        rescan_any = F.lit(False)
        for agg, cols, pick, reaches in (
            ("min", mins, F.least, lambda a, v: a <= v),
            ("max", maxs, F.greatest, lambda a, v: a >= v),
        ):
            for c in cols:
                curv = cur[f"{agg}_{c}"]
                addv = F.col(f"__add_{agg}_{c}")
                remv = F.col(f"__rem_{agg}_{c}")
                departed = curv.isNotNull() & remv.eqNullSafe(curv)
                dominates = addv.isNotNull() & reaches(addv, curv)
                flag = departed & ~dominates & (new_n > 0)
                rescan_any = rescan_any | flag
                inc = F.when(curv.isNull(), addv).otherwise(pick(curv, addv))
                out_cols.append(inc.alias(f"{agg}_{c}"))
        out_cols.append(rescan_any.alias("__rescan"))
        out_cols.append(
            F.when(new_n <= 0, F.lit("delete"))
            .otherwise(F.lit("upsert")).alias(_OP)
        )
        # keys are unique within a refresh; the upstream version is a
        # monotonic LSN across refreshes for MOR last-writer-wins
        out_cols.append(F.lit(int(to_v)).alias(_ORDER))
        batch = merged.select(*out_cols)

        rescan_plan = None  # scan_plan() of the departed-extremum pass
        batch_persisted = fused_stats or bool(mins or maxs)
        if batch_persisted:
            batch = batch.persist()
        if fused_stats:
            # ONE aggregate action yields every planning stat the refresh
            # needs: group count (early exit), the batch's view buckets
            # (merge pruning), and — when min/max are maintained — the
            # capped departed-extremum key list (batch rows are unique per
            # group, so collect_list is already distinct)
            stat_aggs = [
                F.count(F.lit(1)).alias("n"),
                F.collect_set(bexpr.cast("int")).alias("bs"),
            ]
            if mins or maxs:
                stat_aggs.append(
                    F.slice(
                        F.collect_list(
                            F.when(
                                F.col("__rescan") & (F.col(_OP) != "delete"),
                                F.struct(*[F.col(c) for c in dims]),
                            )
                        ),
                        1, _RESCAN_PUSHDOWN_CAP + 1,
                    ).alias("need")
                )
            head = batch.agg(*stat_aggs).first()
            n_groups, touched = int(head["n"]), list(head["bs"])
            if n_groups == 0:
                batch.unpersist()
                view.set_properties(**{WATERMARK_PROP: int(to_v)})
                return {"from_version": from_v, "to_version": to_v,
                        "groups": 0, "applied": False, "rescan": None}
        if mins or maxs:
            # the departed-extremum group keys (bounded by the refresh's
            # group count; capped — beyond the cap the semi join alone
            # filters).  The collected keys double as an IN pushdown so
            # the snapshot scan file-skips on the dim columns.
            need = (
                batch.filter(F.col("__rescan") & (F.col(_OP) != "delete"))
                .select(*dims).distinct()
            )
            need_rows = (
                list(head["need"]) if fused_stats
                else need.limit(_RESCAN_PUSHDOWN_CAP + 1).collect()
            )
            if need_rows:
                # exact recompute for ONLY those groups: one snapshot pass,
                # dim-pushdown-filtered when few groups, semi-joined to the
                # group keys either way.  The pushdown is a per-dim IN
                # conjunction handed to read(where=...) so the MANIFEST
                # ZONE MAPS skip whole files before any are opened — on an
                # upstream kept dim-clustered via compact(sort_cols=dims)
                # each file covers a narrow dim range and a hot-retraction
                # pattern rescans O(matching files), not O(snapshot).  The
                # conjunction over-approximates the exact group set
                # (dim1 IN (..) AND dim2 IN (..) admits cross products);
                # the broadcast semi join below restores exactness.
                # Un-compacted (delta-holding) snapshots skip no files
                # (non-key preds are MOR-unsafe, see _select_entries) —
                # there the residual filter still prunes rows.
                few = (len(need_rows) <= _RESCAN_PUSHDOWN_CAP
                       and not any(v is None for r in need_rows for v in r))
                snap_where = (
                    [(c, "in", sorted({r[i] for r in need_rows}))
                     for i, c in enumerate(dims)]
                    if few else None
                )
                rescan_plan = upstream.scan_plan(
                    where=snap_where, version=to_v)
                snap = upstream.read(version=to_v, where=snap_where)
                nk = need.select(
                    *[F.col(c).alias(f"__n_{c}") for c in dims]
                )
                scond = None
                for c in dims:
                    e = snap[c].eqNullSafe(F.col(f"__n_{c}"))
                    scond = e if scond is None else (scond & e)
                rs_aggs = []
                for c in mins:
                    rs_aggs.append(F.min(c).alias(f"__rs_min_{c}"))
                for c in maxs:
                    rs_aggs.append(F.max(c).alias(f"__rs_max_{c}"))
                rescanned = (
                    snap.join(F.broadcast(nk), on=scond, how="left_semi")
                    .groupBy(*dims).agg(*rs_aggs)
                )
                rcond = None
                for c in dims:
                    e = batch[c].eqNullSafe(rescanned[c])
                    rcond = e if rcond is None else (rcond & e)
                joined = batch.join(rescanned, on=rcond, how="left")
                fixed = [batch[c].alias(c) for c in dims]
                fixed.append(batch["n_rows"].alias("n_rows"))
                for c in sums:
                    fixed.append(batch[f"sum_{c}"].alias(f"sum_{c}"))
                for agg, cols in (("min", mins), ("max", maxs)):
                    for c in cols:
                        fixed.append(
                            F.when(batch["__rescan"],
                                   rescanned[f"__rs_{agg}_{c}"])
                            .otherwise(batch[f"{agg}_{c}"])
                            .alias(f"{agg}_{c}")
                        )
                fixed.append(batch[_OP].alias(_OP))
                fixed.append(batch[_ORDER].alias(_ORDER))
                out = joined.select(*fixed)
            else:
                out = batch.drop("__rescan")
        else:
            out = batch.drop("__rescan")
        batch_final = out

        try:
            m = merge_into(
                view,
                batch_final,
                op_col=_OP,
                order_col=_ORDER,
                lineage={"batch_id": f"aggv{to_v}", "rows": n_groups,
                         "bytes": 0},
                mode=mode,
                auto_compact=auto_compact,
                properties_update={WATERMARK_PROP: int(to_v)},
                # one row per group key by construction (groupBy dims) →
                # the COW in-batch dedup would be a no-op shuffle; and the
                # head aggregate above already collected the batch's view
                # buckets, so the merge's planning collect is redundant
                keys_unique=True,
                known_buckets=(touched if all(b is not None for b in touched)
                               else None),
                batch_rows=n_groups,
            )
        finally:
            if batch_persisted:
                batch.unpersist()
        return {"from_version": from_v, "to_version": to_v,
                "groups": n_groups, "applied": m is not None,
                "rescan": rescan_plan}
    finally:
        if deltas is not None:
            deltas.unpersist()
        winners.unpersist()
