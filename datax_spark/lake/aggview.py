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

Only self-maintainable aggregates are offered: ``n_rows`` (count) and
``sum_<col>``.  ``avg`` is a read-time division; ``min``/``max`` are NOT
maintainable under retraction without re-scanning the group and are
refused rather than silently approximated.

Exactly-once, like the mirror (``lake/mirror.py``): the view stores
``aggview_upstream_version`` in its own manifest properties and advances
it in the SAME atomic commit as the merged deltas; the merge's batch-id
replay guard makes a re-run of a completed refresh a no-op.

Scale: a refresh costs O(changed rows) + one bucket-pruned read of the
CURRENT view restricted to the touched groups (delta group keys are
collected — bounded by the batch's distinct dims, the same planning-scan
bound as COW merge) — never O(view) and never O(upstream).  The upstream
fact table is read only through its commit-log file diff.
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
) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in sums:
        t = out_types[f"sum_{c}"]
        aggs.append(
            F.coalesce(F.sum(c), F.lit(0)).cast(t).alias(f"sum_{c}")
        )
    return df.groupBy(*dims).agg(*aggs)


def create_agg_view(
    upstream: LakeTable,
    location: str,
    dims: list[str],
    sums: list[str] | None = None,
    num_buckets: int = 16,
    version: int | None = None,
) -> LakeTable:
    """Create the view table and bootstrap it with a one-shot aggregate of
    the upstream snapshot at ``version`` (default current; 0 = empty view
    that replays the whole changelog).  Schema: dims + ``n_rows`` +
    ``sum_<col>`` per requested sum column.

    Like ``bootstrap_mirror``, bootstrap is two commits (overwrite, then
    watermark) — a crash between them leaves no watermark and bootstrap is
    simply re-run."""
    sums = list(sums or [])
    uschema = upstream.schema()
    by_name = {f.name: f for f in uschema.fields}
    for c in [*dims, *sums]:
        if c not in by_name:
            raise ValueError(f"column {c!r} not in upstream schema")
    for c in sums:
        if not isinstance(by_name[c].dataType, _SUMMABLE):
            raise ValueError(
                f"sum column {c!r} has non-numeric type {by_name[c].dataType}"
            )
        if c in dims:
            raise ValueError(f"column {c!r} cannot be both a dim and a sum")
    fields = [T.StructField(c, by_name[c].dataType) for c in dims]
    fields.append(T.StructField("n_rows", T.LongType()))
    for c in sums:
        fields.append(T.StructField(f"sum_{c}", _sum_type(by_name[c].dataType)))
    view = LakeTable.create(
        upstream.spark,
        location,
        schema=T.StructType(fields),
        key_cols=list(dims),
        bucket_col=dims[0],
        num_buckets=num_buckets,
    )
    at = upstream.current_version() if version is None else version
    if at > 0:
        out_types = {f.name: f.dataType for f in fields}
        view.overwrite(
            _aggregate(upstream.read(version=at), dims, sums, out_types)
        )
    view.set_properties(**{
        WATERMARK_PROP: int(at),
        SPEC_PROP: json.dumps({"dims": dims, "sums": sums}),
    })
    return view


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
    wm = view.manifest().properties.get(WATERMARK_PROP)
    if wm is None:
        raise ValueError("view has no watermark — use create_agg_view()")
    from_v = int(wm)
    to_v = upstream.current_version()
    if to_v <= from_v:
        return {"from_version": from_v, "to_version": from_v,
                "groups": 0, "applied": False}

    ukeys = list(upstream.manifest(to_v).key_cols)
    payload_cols = list(dict.fromkeys([*dims, *sums]))
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

    m_from = upstream.manifest(from_v)
    fb = upstream.bucket_expr(m_from.bucket_col, m_from.num_buckets)
    touched_b = [
        r[0]
        for r in changed.select(fb.cast("int").alias("b")).distinct().collect()
        if r[0] is not None
    ]
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
            F.coalesce(F.sum(weight.cast(sum_t.simpleString()) * F.col(c)),
                       F.lit(0).cast(sum_t)).alias(f"__d_{c}")
        )
    contrib = new_rows.unionByName(old_rows)
    # all-cancelling groups (pure churn) net to all-zero rows — drop them
    # so untouched groups are not rewritten
    keep = F.col("__d_n") != 0
    for c in sums:
        keep = keep | (F.col(f"__d_{c}") != 0)
    deltas = contrib.groupBy(*dims).agg(*delta_aggs).filter(keep).persist()
    try:
        bexpr = view.bucket_expr(view.manifest().bucket_col,
                                 view.manifest().num_buckets)
        head = deltas.agg(
            F.count(F.lit(1)).alias("n"),
            F.collect_set(bexpr.cast("int")).alias("bs"),
        ).first()
        n_groups, touched = int(head["n"]), list(head["bs"])
        if n_groups == 0:
            view.set_properties(**{WATERMARK_PROP: int(to_v)})
            return {"from_version": from_v, "to_version": to_v,
                    "groups": 0, "applied": False}
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
        out_cols.append(
            F.when(new_n <= 0, F.lit("delete"))
            .otherwise(F.lit("upsert")).alias(_OP)
        )
        # keys are unique within a refresh; the upstream version is a
        # monotonic LSN across refreshes for MOR last-writer-wins
        out_cols.append(F.lit(int(to_v)).alias(_ORDER))
        batch = merged.select(*out_cols)

        m = merge_into(
            view,
            batch,
            op_col=_OP,
            order_col=_ORDER,
            lineage={"batch_id": f"aggv{to_v}", "rows": n_groups, "bytes": 0},
            mode=mode,
            auto_compact=auto_compact,
            properties_update={WATERMARK_PROP: int(to_v)},
        )
        return {"from_version": from_v, "to_version": to_v,
                "groups": n_groups, "applied": m is not None}
    finally:
        deltas.unpersist()
        winners.unpersist()
