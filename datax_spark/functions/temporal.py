"""Temporal joins: as-of (point-in-time) and interval range joins.

Neither exists as a Spark relational operator (SPARK-22947 was never
merged); the naive formulations are non-equi joins that Catalyst can only
plan as BroadcastNestedLoopJoin — O(n·m) and a driver OOM at scale.  The
reference engine has no analogue either (DataX joins nothing), but any CDC
consumer immediately needs both: "enrich each fact with the dimension row
as of the fact's timestamp" is THE query shape over a change-history table
(SURVEY.md §2.7 — the lake table is exactly such a history via
``read_changes``).

Scale design:

- ``asof_join`` — union the probe and build sides, one hash shuffle on the
  join keys, and a running ``last(ignorenulls)`` window carries the newest
  build row forward onto each probe row.  No range explosion, no
  per-interval duplication: cost is one shuffle + per-key sort, identical
  to a regular sort-merge join of the two inputs.  Skewed keys behave like
  any skewed window (AQE handles the shuffle; the per-key sort is the
  floor).
- ``range_join`` — fixed-width time bands: intervals are exploded onto the
  bands they cover, points onto exactly one band, the join is a plain
  equi-join on (keys…, band) with the exact predicate as a residual
  filter.  Fan-out is ``ceil(len/band_width)+1`` rows per interval — pick
  ``band_width`` near the typical interval length and it is ≤ 2-3×.
  Timestamps are banded on exact integer microseconds (``unix_micros``),
  never floats, so band assignment and the residual agree bit-for-bit.

Both return plain DataFrames and stay entirely in Catalyst expressions
(zero Python row paths — plans stay in WholeStageCodegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TIME_TYPES = (T.TimestampType, T.TimestampNTZType)


def _time_value(df: DataFrame, col: str) -> Column:
    """Exact, totally-ordered numeric image of a time/numeric column:
    integer microseconds for timestamps, the raw value otherwise.  NTZ
    timestamps cast through TIMESTAMP (identity wall-clock under the
    engine's UTC session, `session.py`); even under a non-UTC session the
    shift is a constant, so ordering, band assignment, and time DIFFERENCES
    are unaffected."""
    dt = df.schema[col].dataType
    if isinstance(dt, _TIME_TYPES):
        return F.unix_micros(F.col(col).cast("timestamp"))
    return F.col(col)


def _is_time(df: DataFrame, col: str) -> bool:
    return isinstance(df.schema[col].dataType, _TIME_TYPES)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    how: str = "left",
    direction: str = "backward",
    tolerance: float | None = None,
    right_order: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Join each left row to the single right row nearest in time.

    ``direction="backward"`` (default): newest right row with
    ``right_time <= left_time`` per key — the point-in-time lookup.
    ``direction="forward"``: oldest right row with ``right_time >=
    left_time``.  Ties at equal timestamps match (``<=``/``>=``), like
    DuckDB/pandas ASOF.

    ``tolerance`` (seconds for timestamps, else time-column units) bounds
    the match distance: a nearest row further away than the tolerance is
    treated as no match.  ``right_order`` breaks exact right-side
    timestamp ties deterministically — the winner is the row nearest in
    ``(time, right_order)`` lexicographic order, i.e. max for backward,
    min for forward; without it, duplicate (key, time) right rows pick an
    arbitrary winner — exactly the hazard pandas ``merge_asof`` has.

    ``how``: "left" keeps unmatched left rows (right columns null),
    "inner" drops them.  Right payload columns are emitted as
    ``<name><suffix>``; the matched right timestamp as
    ``<right_time><suffix>``.
    """
    if not on:
        raise ValueError("asof_join requires at least one equi key in `on`")
    if how not in ("left", "inner"):
        raise ValueError(f"asof_join how={how!r}: expected left|inner")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"asof_join direction={direction!r}: expected backward|forward"
        )
    if _is_time(left, left_time) != _is_time(right, right_time):
        raise ValueError(
            f"asof_join time columns disagree: {left_time} is "
            f"{left.schema[left_time].dataType} but {right_time} is "
            f"{right.schema[right_time].dataType}"
        )

    payload = [c for c in right.columns if c not in (*on, right_time)]
    rv = F.struct(
        F.col(right_time).alias(right_time),
        *[F.col(c).alias(c) for c in payload],
    )
    rv_type = right.select(rv.alias("__rv")).schema["__rv"].dataType

    # Tie column keeps its NATIVE type: casting to double would null out
    # string orders (silently disabling the tie-break — the exact hazard
    # the parameter documents fixing) and lose precision on int64 beyond
    # 2^53.  Non-orderable types raise instead of silently degrading.
    if right_order is not None:
        tdt = right.schema[right_order].dataType
        if not isinstance(
            tdt,
            (T.NumericType, T.StringType, T.DateType, T.BooleanType,
             T.BinaryType, *_TIME_TYPES),
        ):
            raise ValueError(
                f"asof_join right_order={right_order!r} has non-orderable "
                f"type {tdt}; use an atomic orderable column"
            )
        tie = F.col(right_order)
        probe_tie = F.lit(None).cast(tdt)
    else:
        tie = F.lit(0)
        probe_tie = F.lit(0)
    rf = right.select(
        *[F.col(k) for k in on],
        _time_value(right, right_time).alias("__t"),
        F.lit(0).alias("__side"),
        tie.alias("__tie"),
        rv.alias("__rv"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__lv"),
    )
    lf = left.select(
        *[F.col(k) for k in on],
        _time_value(left, left_time).alias("__t"),
        F.lit(1).alias("__side"),
        probe_tie.alias("__tie"),
        F.lit(None).cast(rv_type).alias("__rv"),
        F.struct(*left.columns).alias("__lv"),
    )

    # Window order: probes sort AFTER builds at equal time (side 1 > 0), so
    # a build row at exactly the probe's timestamp is visible to it; among
    # equal-time build rows the winning one sorts LAST (max tie for
    # backward, min for forward).  NULL ties sort first in both directions
    # so a row with a real tie value always outranks one without; the
    # probe rows' own tie is never compared against a build's (side
    # differs), so its value is irrelevant.
    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__side").asc(),
                 F.col("__tie").asc_nulls_first()]
    else:
        order = [F.col("__t").desc(), F.col("__side").asc(),
                 F.col("__tie").desc_nulls_first()]
    w = (
        Window.partitionBy(*[F.col(k) for k in on])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        rf.unionByName(lf)
        .withColumn("__m", F.last("__rv", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )

    if tolerance is not None:
        scale = 1_000_000 if _is_time(left, left_time) else 1
        mt = F.col("__m")[right_time]
        mtv = (
            F.unix_micros(mt.cast("timestamp"))
            if _is_time(right, right_time)
            else mt
        )
        dist = (
            F.col("__t") - mtv if direction == "backward" else mtv - F.col("__t")
        )
        matched = matched.withColumn(
            "__m",
            F.when(dist <= F.lit(tolerance * scale), F.col("__m")),
        )
    if how == "inner":
        matched = matched.filter(F.col("__m").isNotNull())

    out_cols = [F.col("__lv")[c].alias(c) for c in left.columns]
    out_cols.append(F.col("__m")[right_time].alias(f"{right_time}{suffix}"))
    for c in payload:
        out_cols.append(F.col("__m")[c].alias(f"{c}{suffix}"))
    return matched.select(*out_cols)


def temporal_table_join(
    facts: DataFrame,
    dim,
    on: list[str],
    fact_order: str,
    payload: list[str] | None = None,
    suffix: str = "_dim",
    from_version: int = 0,
    on_rewrite: str = "error",
    how: str = "left",
) -> DataFrame:
    """Enrich each fact row with a LakeTable dimension's state AS OF the
    fact's LSN — the streaming "temporal table join" (Flink FOR SYSTEM_TIME
    AS OF), driven by the dimension's own commit log instead of a second
    system.

    ``dim`` is a :class:`~datax_spark.lake.table.LakeTable`; its history
    comes from ``read_changes(from_version)`` — per-commit winners at
    commit granularity (intra-commit churn collapses, the changelog
    contract).  A fact whose nearest-at-or-before change is a DELETE gets
    NULL dimension values: the key did not exist at that point.  Appends
    carry no LSN and order below every real LSN (same contract as
    ``sync_mirror``).

    ``from_version > 0`` additionally seeds the ``from_version`` SNAPSHOT
    as base state at LSN -1 (one bucket-scan read), so keys unchanged
    since then still enrich correctly instead of reading as never-existed
    — use it when the older changelog range is compacted/expired.  Base
    matches report ``_asof_lsn = -1``.

    Output: the fact columns, the matched payload as ``<col><suffix>``
    (NULL when absent or deleted), ``_asof_lsn`` (the matched change's
    LSN, including a matched delete), and ``_asof_live`` (true iff the
    key existed).  ``how="inner"`` drops facts with NO matched change row
    (a matched delete still passes — use ``_asof_live`` to filter).

    Cost: one O(changed files) changelog scan + the asof_join shuffle on
    the keys — the dimension snapshot is never reconstructed.
    """
    hist = dim.read_changes(from_version, on_rewrite=on_rewrite)
    cols = payload if payload is not None else [
        c for c in hist.columns
        if c not in (*on, "_change_type", "_change_lsn", "_commit_version")
    ]
    right = hist.select(
        *on,
        F.coalesce(F.col("_change_lsn"), F.lit(-1)).cast("long")
        .alias("__dim_lsn"),
        F.col("_change_type").alias("__dim_type"),
        *cols,
    )
    if from_version > 0:
        base = dim.read(version=from_version).select(
            *on,
            F.lit(-1).cast("long").alias("__dim_lsn"),
            F.lit("insert").alias("__dim_type"),
            *cols,
        )
        right = right.unionByName(base)
    j = asof_join(
        facts, right, on=on, left_time=fact_order, right_time="__dim_lsn",
        how=how, suffix=suffix,
    )
    t = F.col(f"__dim_type{suffix}")
    live = t.isNotNull() & (t != "delete")
    out = j.select(
        *facts.columns,
        F.col(f"__dim_lsn{suffix}").alias("_asof_lsn"),
        live.alias("_asof_live"),
        *[F.when(live, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
          for c in cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    on: list[str] | None = None,
    band_width: float | None = None,
    how: str = "inner",
    closed: str = "left",
    suffix: str = "_r",
) -> DataFrame:
    """Join left point rows to right interval rows they fall inside.

    Predicate: ``right_start <= left_point < right_end`` (``closed="left"``,
    default) or ``<= … <=`` (``closed="both"``).  ``on`` adds equi keys; an
    empty/None ``on`` is the pure time-overlap join — the case a naive
    formulation turns into a nested-loop cartesian and this one does not.

    ``band_width`` is REQUIRED: the band size in seconds (timestamps) or
    time-column units (numerics).  Choose it near the typical interval
    length; each interval joins ``ceil(len/band)+1`` bands.  Each matched
    (left, right) pair appears exactly once — points occupy a single band,
    so the exploded intervals cannot double-match.

    ``how``: "inner", or "left" to keep unmatched point rows (interval
    columns null).  Right columns colliding with left names get
    ``suffix``.
    """
    if band_width is None or band_width <= 0:
        raise ValueError("range_join requires a positive band_width")
    if how not in ("inner", "left"):
        raise ValueError(f"range_join how={how!r}: expected inner|left")
    if closed not in ("left", "both"):
        raise ValueError(f"range_join closed={closed!r}: expected left|both")
    on = list(on or [])
    if _is_time(left, left_point) != _is_time(right, right_start):
        raise ValueError("range_join point/interval column types disagree")

    scale = 1_000_000 if _is_time(left, left_point) else 1
    width = band_width * scale
    if _is_time(left, left_point):
        width = int(width)
        if width <= 0:
            raise ValueError("band_width below timestamp resolution (1 µs)")

    lband = F.floor(_time_value(left, left_point) / F.lit(width)).cast("long")
    lf = left.withColumn("__band", lband)

    rstart = _time_value(right, right_start)
    rend = _time_value(right, right_end)
    rf = right.withColumn(
        "__band",
        F.explode(
            F.sequence(
                F.floor(rstart / F.lit(width)).cast("long"),
                F.floor(rend / F.lit(width)).cast("long"),
            )
        ),
    )
    # disambiguate collisions before the join
    collide = {
        c for c in right.columns if c in left.columns and c not in on
    }
    for c in collide:
        rf = rf.withColumnRenamed(c, f"{c}{suffix}")
    rs = f"{right_start}{suffix}" if right_start in collide else right_start
    re_ = f"{right_end}{suffix}" if right_end in collide else right_end

    point = lf[left_point]
    upper = point <= rf[re_] if closed == "both" else point < rf[re_]
    cond = (point >= rf[rs]) & upper
    for k in on:
        cond = cond & lf[k].eqNullSafe(rf[k])
    cond = cond & (lf["__band"] == rf["__band"])

    joined = lf.join(rf, cond, "left_outer" if how == "left" else "inner")
    keep = [lf[c].alias(c) for c in left.columns]
    keep += [rf[c].alias(c) for c in rf.columns if c not in ("__band", *on)]
    return joined.select(*keep)
