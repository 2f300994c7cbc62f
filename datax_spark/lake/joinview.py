"""Incremental equi-join views: a fact ⋈ dim join maintained from BOTH
upstreams' changelogs — the delta-join / "dynamic table" shape
(Flink temporal join materialization, Materialize delta joins) that the
aggregate view (`lake/aggview.py`, GROUP BY only) cannot express.

The reference has no analogue: DataX outsources every join to the source
database's SQL (`plugin-rdbms-util/.../util/ReaderSplitUtil.java:94-103`
passes user querySql through opaquely), so a synced join result goes
stale the moment either base table changes and the whole query re-syncs.
Here the joined result is itself a :class:`LakeTable` and each refresh
touches only the rows either side's changes can affect.

Shape: an N:1 equi-join — the join columns must be exactly the RIGHT
table's key columns (the foreign-key-to-primary-key join every
enrichment pipeline runs), so each left row contributes at most one view
row and the view is keyed by the LEFT table's key. ``how`` is ``inner``
(an unmatched or dim-deleted fact row leaves the view) or ``left`` (it
stays with null dim columns).

Refresh = exact partial recompute, never O(either table):

1. the two changelogs since the view's per-upstream watermarks
   (``read_changes`` — manifest file-diff, O(files added));
2. the AFFECTED left keys: keys appearing in the left changelog, plus
   current left rows whose join columns appear in the right changelog
   (reverse foreign-key lookup — the snapshot scan pushes the touched
   dim keys down as an IN conjunction so manifest ZONE MAPS / bloom
   filters skip files; keep a hot fact table clustered on the fk via
   ``compact(sort_cols=[fk])`` and this costs O(matching files));
3. recompute JUST those keys against the CURRENT right snapshot
   (restricted by semi join to the fk values actually present — O(batch)
   rows on the build side, broadcast outside the small-batch static
   scope), emit upserts for keys that now produce a row and tombstones
   for keys that no longer do;
4. one MERGE into the view carries the rows AND advances both watermarks
   in the same atomic commit (``properties_update``), with the merge's
   batch-id replay guard making a re-run of a completed refresh a no-op
   — the same exactly-once protocol as the mirror and the agg view.

Correctness note (why partial recompute is exact): the view's row for a
left key is a pure function of (current left row for that key, current
right snapshot).  A key's view row can change only if (a) its left row
changed — it is in the left changelog — or (b) a right row it joins to
changed, before or after: the right changelog carries BOTH the old and
new join-key values (tombstones carry keys), so the reverse lookup
finds every such left row.  All other keys' inputs are untouched, and
recomputing an affected key from current snapshots is definitionally
the right answer regardless of how many changes the range held.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.aggview import (
    _RESCAN_PUSHDOWN_CAP,
    _bcast,
    _pin,
    _static_planning_if_small,
)
from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable

L_WATERMARK_PROP = "joinview_left_version"
R_WATERMARK_PROP = "joinview_right_version"
SPEC_PROP = "joinview_spec"
_OP = "__jv_op"
_ORD = "__jv_ord"
# refresh ordinal bit budget: ord = left_version << 31 | right_version.
# 2^31 commits per side is ~68 years of one commit per second; exceeding
# it fails loudly rather than wrapping (the Maxwell/Canal LSN lesson).
_ORD_BITS = 31


def _spec(view: LakeTable) -> dict:
    raw = view.manifest().properties.get(SPEC_PROP)
    if raw is None:
        raise ValueError(
            "table has no joinview spec — create it with create_join_view()"
        )
    return json.loads(raw)


def _changed_bytes(table: LakeTable, from_v: int, to_v: int) -> int:
    """Bytes of logical-change files added in ``(from_v, to_v]`` — the
    static-planning cost input, derived purely from manifests (zero Spark
    jobs).  Physical rewrites (compact/rebucket) add no logical change."""
    total = 0
    prev = {
        e[0]
        for es in table.manifest(from_v).files.values()
        for e in es
    }
    for v in range(from_v + 1, to_v + 1):
        m = table.manifest(v)
        cur = {e[0] for es in m.files.values() for e in es}
        if m.operation not in ("create", "properties", "compact",
                               "compact-minor", "rebucket"):
            total += sum(
                table._entry_bytes(e)
                for es in m.files.values() for e in es
                if e[0] not in prev and not (len(e) > 2 and e[2] == "dv")
            )
        prev = cur
    return total


def _join_cond(left: DataFrame, right: DataFrame, on: dict) -> "F.Column":
    """Plain-equality join condition (NOT null-safe: a null foreign key
    matches no dim row, exactly like SQL)."""
    cond = None
    for lc, rc in on.items():
        e = left[lc] == right[rc]
        cond = e if cond is None else (cond & e)
    return cond


def _joined(left_df: DataFrame, right_df: DataFrame, spec: dict) -> DataFrame:
    """The view's defining query over two snapshot frames, in the view's
    column order."""
    on: dict = spec["on"]
    rsel = right_df.select(
        *[F.col(c).alias(f"__r_{c}") for c in on.values()],
        *[F.col(src).alias(out) for out, src in spec["right_cols"].items()],
    )
    cond = None
    for lc, rc in on.items():
        e = left_df[lc] == rsel[f"__r_{rc}"]
        cond = e if cond is None else (cond & e)
    out = left_df.join(rsel, on=cond, how=spec["how"])
    return out.select(*spec["out_cols"])


def create_join_view(
    left: LakeTable,
    right: LakeTable,
    location: str,
    on: dict[str, str],
    right_cols: dict[str, str] | None = None,
    how: str = "inner",
    num_buckets: int = 16,
    mode: str = "mor",
) -> LakeTable:
    """Create the join view and bootstrap it with a one-shot join of the
    two current snapshots.

    ``on`` maps left (foreign-key) columns to right columns; the right
    side of the mapping must be EXACTLY the right table's key columns, so
    the join is N:1 and the view stays keyed by the left table's key.
    ``right_cols`` maps view output names to right columns (default:
    every right non-key column under its own name; a collision with a
    left column name is an error — rename it).  ``mode`` is the merge
    mode refreshes use (``mor`` default: O(changed keys) per refresh).

    Like the agg view, bootstrap is two commits (overwrite, then
    spec+watermarks) — a crash between them leaves no spec and the
    bootstrap is simply resumed on the next call."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    lm, rm = left.manifest(), right.manifest()
    lnames = {f.name for f in lm.schema.fields}
    rnames = {f.name: f for f in rm.schema.fields}
    for lc, rc in on.items():
        if lc not in lnames:
            raise ValueError(f"join column {lc!r} not in left schema")
        if rc not in rnames:
            raise ValueError(f"join column {rc!r} not in right schema")
    if set(on.values()) != set(rm.key_cols):
        raise ValueError(
            f"join columns {sorted(on.values())} must be exactly the right "
            f"table's key columns {sorted(rm.key_cols)} (N:1 join contract)"
        )
    if right_cols is None:
        right_cols = {
            f.name: f.name for f in rm.schema.fields
            if f.name not in rm.key_cols
        }
    for out, src in right_cols.items():
        if src not in rnames:
            raise ValueError(f"right column {src!r} not in right schema")
        if out in lnames:
            raise ValueError(
                f"output column {out!r} collides with a left column — "
                "rename it via right_cols"
            )
    fields = list(lm.schema.fields)
    for out, src in right_cols.items():
        # dim columns are nullable in the view regardless of source
        # nullability: a left-join miss writes null
        fields.append(T.StructField(out, rnames[src].dataType, True))
    spec = {
        "on": dict(on),
        "right_cols": dict(right_cols),
        "how": how,
        "mode": mode,
        "out_cols": [f.name for f in fields],
    }
    try:
        view = LakeTable.create(
            left.spark, location,
            schema=T.StructType(fields),
            key_cols=list(lm.key_cols),
            bucket_col=lm.key_cols[0],
            num_buckets=num_buckets,
        )
    except FileExistsError:
        view = LakeTable(left.spark, location)
        if view.manifest().properties.get(SPEC_PROP) is not None:
            raise FileExistsError(
                f"join view already exists at {location}"
            ) from None
    lv, rv = left.current_version(), right.current_version()
    if lv > 0:
        snap_bytes = sum(
            left._entry_bytes(e)
            for es in lm.files.values() for e in es
        ) + sum(
            right._entry_bytes(e)
            for es in rm.files.values() for e in es
        )
        with _static_planning_if_small(left.spark, snap_bytes):
            view.overwrite(
                _joined(left.read(version=lv), right.read(version=rv), spec)
            )
    view.set_properties(**{
        L_WATERMARK_PROP: int(lv),
        R_WATERMARK_PROP: int(rv),
        SPEC_PROP: json.dumps(spec),
    })
    return view


def join_view_lag(left: LakeTable, right: LakeTable, view: LakeTable) -> dict:
    """Staleness of the view vs both upstreams — monitoring surface."""
    _spec(view)
    props = view.manifest().properties
    wl, wr = int(props[L_WATERMARK_PROP]), int(props[R_WATERMARK_PROP])
    return {
        "left_watermark": wl,
        "right_watermark": wr,
        "left": left.commit_lag(wl),
        "right": right.commit_lag(wr),
    }


def refresh_join_view(
    left: LakeTable,
    right: LakeTable,
    view: LakeTable,
    on_rewrite: str = "error",
    auto_compact: int | None = None,
) -> dict:
    """One incremental refresh: fold both upstreams' changes since the
    stored watermarks into the view (see module docstring for the exact
    partial-recompute argument).  Returns refresh stats; a re-run of a
    completed refresh is a no-op (merge batch-id replay guard).

    ``on_rewrite`` passes through to ``read_changes`` — upstreams merged
    with ``mode="mor"`` replay cleanly; a COW/DV upstream raises unless
    ``"skip"`` is passed (and then its rewrites are NOT folded, exactly
    like the mirror's contract)."""
    spec = _spec(view)
    props = view.manifest().properties
    wl, wr = int(props[L_WATERMARK_PROP]), int(props[R_WATERMARK_PROP])
    cl, cr = left.current_version(), right.current_version()
    if cl == wl and cr == wr:
        return {"left": (wl, cl), "right": (wr, cr),
                "affected": 0, "applied": False}
    if cl >= (1 << _ORD_BITS) or cr >= (1 << _ORD_BITS):
        raise ValueError(
            f"upstream version exceeds the refresh-ordinal bit budget "
            f"(2^{_ORD_BITS}) — widen _ORD_BITS before this table wraps"
        )
    on: dict = spec["on"]
    lkeys = left.manifest().key_cols
    change_bytes = (
        _changed_bytes(left, wl, cl) + _changed_bytes(right, wr, cr)
    )
    with _static_planning_if_small(left.spark, change_bytes):
        # -- affected left keys ------------------------------------------
        # (a) keys whose own row changed
        ak = None
        if cl > wl:
            dl = left.read_changes(wl, cl, on_rewrite=on_rewrite)
            ak = dl.select(*lkeys).distinct()
        # (b) keys whose dim row changed: reverse fk lookup on the current
        # left snapshot, touched-dim-keys pushed down for file skipping
        rk_keys = None
        if cr > wr:
            dr = right.read_changes(wr, cr, on_rewrite=on_rewrite)
            rkc = list(on.values())
            touched = dr.select(*rkc).distinct()
            t_rows = touched.limit(_RESCAN_PUSHDOWN_CAP + 1).collect()
            few = (len(t_rows) <= _RESCAN_PUSHDOWN_CAP
                   and not any(v is None for r in t_rows for v in r))
            push = (
                [(lc, "in", sorted({r[rc] for r in t_rows}))
                 for lc, rc in on.items()]
                if few else None
            )
            lscan = left.read(version=cl, where=push)
            tk = touched.select(
                *[F.col(rc).alias(f"__t_{rc}") for rc in rkc]
            )
            cond = None
            for lc, rc in on.items():
                e = lscan[lc] == F.col(f"__t_{rc}")
                cond = e if cond is None else (cond & e)
            rk_keys = (
                lscan.join(_bcast(tk), on=cond, how="left_semi")
                .select(*lkeys).distinct()
            )
        aff = ak if rk_keys is None else (
            rk_keys if ak is None else ak.unionByName(rk_keys).distinct()
        )
        aff = _pin(aff)
        try:
            a_rows = aff.limit(_RESCAN_PUSHDOWN_CAP + 1).collect()
            if not a_rows:
                view.set_properties(**{
                    L_WATERMARK_PROP: int(cl), R_WATERMARK_PROP: int(cr),
                })
                return {"left": (wl, cl), "right": (wr, cr),
                        "affected": 0, "applied": False}
            few = (len(a_rows) <= _RESCAN_PUSHDOWN_CAP
                   and not any(v is None for r in a_rows for v in r))
            a_push = (
                [(k, "in", sorted({r[i] for r in a_rows}))
                 for i, k in enumerate(lkeys)]
                if few else None
            )
            # -- recompute just the affected keys ------------------------
            akn = aff.select(
                *[F.col(k).alias(f"__a_{k}") for k in lkeys]
            )
            lsnap = left.read(version=cl, where=a_push)
            cond = None
            for k in lkeys:
                e = lsnap[k].eqNullSafe(F.col(f"__a_{k}"))
                cond = e if cond is None else (cond & e)
            cur_rows = lsnap.join(_bcast(akn), on=cond, how="left_semi")
            # right snapshot restricted to the fk values actually present
            fks = cur_rows.select(
                *[F.col(lc).alias(f"__f_{rc}") for lc, rc in on.items()]
            ).distinct()
            rsnap = right.read(version=cr)
            rcond = None
            for rc in on.values():
                e = rsnap[rc] == F.col(f"__f_{rc}")
                rcond = e if rcond is None else (rcond & e)
            rsnap = rsnap.join(_bcast(fks), on=rcond, how="left_semi")
            result = _joined(cur_rows, rsnap, spec)
            # -- upserts + tombstones, one atomic merge ------------------
            res_k = result.select(
                *[F.col(k).alias(f"__g_{k}") for k in lkeys]
            ).distinct()
            gcond = None
            for k in lkeys:
                e = aff[k].eqNullSafe(F.col(f"__g_{k}"))
                gcond = e if gcond is None else (gcond & e)
            gone = aff.join(res_k, on=gcond, how="left_anti")
            vschema = view.schema()
            dels = gone.select(*[
                (F.col(f.name) if f.name in lkeys
                 else F.lit(None).cast(f.dataType)).alias(f.name)
                for f in vschema.fields
            ])
            ordinal = (int(cl) << _ORD_BITS) | int(cr)
            batch = (
                result.withColumn(_OP, F.lit("insert"))
                .unionByName(dels.withColumn(_OP, F.lit("delete")))
                .withColumn(_ORD, F.lit(ordinal).cast("long"))
            )
            mf = merge_into(
                view, batch, op_col=_OP, order_col=_ORD,
                mode=spec.get("mode", "mor"), auto_compact=auto_compact,
                keys_unique=True,
                # one "joinview" namespace with a monotone numeric tail
                # (the refresh ordinal) — the shape lineage retirement
                # pruning assumes (Manifest.is_applied)
                lineage={"batch_id": f"joinview{ordinal}"},
                properties_update={
                    L_WATERMARK_PROP: int(cl), R_WATERMARK_PROP: int(cr),
                },
            )
        finally:
            aff.unpersist()
    return {
        "left": (wl, cl), "right": (wr, cr),
        "affected": len(a_rows) if len(a_rows) <= _RESCAN_PUSHDOWN_CAP
        else None,
        "applied": mf is not None,
        "pushdown": a_push is not None,
    }
