"""The engine's query/operator suite + ANSI-SQL oracles (driver contract).

Every operator from SURVEY.md §2 that the engine implements is exposed here
as a named (spark_callable, oracle_sql) pair.  The Spark side runs the
engine's real code paths (transformers, dedup-by-LSN, MERGE apply, sketch
dedup, ANN); the oracle is an independent ANSI-SQL formulation DuckDB runs
over the same parquet — row-count + schema + value-hash equality is the
correctness gate (CORRECTNESS_r{N}.json).

Cross-engine determinism rules used throughout:
- money/metrics sums use the cents trick: ``sum(CAST(round(x*100) AS
  BIGINT))`` — per-row IEEE-deterministic rounding, then exact integer
  sums (no float accumulation-order hazards);
- hashes are md5/sha256 (bit-identical in Spark and DuckDB); hash→int64 is
  a 15-hex-char md5 prefix (60-bit positive);
- doubles that must be emitted (cosine, jaccard) are single-division
  results rounded to 6dp, ordered with explicit tiebreaks.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark import transforms as tx
from datax_spark.cdc.apply import CdcApplier
from datax_spark.cdc.runner import run_incremental
from datax_spark.functions import dedup as DD
from datax_spark.functions import sampling as SMP
from datax_spark.functions import similarity as SIM
from datax_spark.functions import text as TXT
from datax_spark.lake.merge import dedup_last_per_key, merge_into
from datax_spark.lake.table import LakeTable


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _cents(col) -> F.Column:
    return F.round((F.col(col) if isinstance(col, str) else col) * 100, 0).cast("long")


# =============================================================== CDC core ops
def _events_feed(ev: DataFrame) -> DataFrame:
    """Normalize the events table into the CDC envelope (lsn, shard, ts, op)
    + payload — the reader-side normalization of SURVEY.md §7.1 source.py.
    op mapping: 'error' events are deletes, the rest upserts."""
    return ev.select(
        F.col("event_id").alias("lsn"),
        F.pmod(F.col("user_id"), F.lit(8)).cast("long").alias("shard"),
        F.col("ts"),
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("insert"))
        .alias("op"),
        F.col("user_id"),
        F.col("event_type"),
        _cents("value").alias("value_cents"),
        F.col("props"),
    )


def q_cdc_merge_apply_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END ENGINE RUN: events→envelope→4 incremental MERGE batches
    into a fresh LakeTable; returns the final table state.  The oracle is
    the pure-SQL fold (last-event-wins, deletes applied) — validating the
    whole reader→channel→writer pipeline, not just one operator."""
    feed = _events_feed(_t(spark, sf_dir, "events"))
    loc = tempfile.mkdtemp(prefix="dx_e2e_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = feed.agg(F.max("lsn")).collect()[0][0]
    run_incremental(table, feed, batch_lsns=max(1, (int(hi) + 4) // 4))
    return table.read().select("user_id", "event_type", "value_cents", "props")


def q_cdc_merge_apply_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same end-to-end fold through the DELETION-VECTOR merge mode
    (positional deletes masking base rows, no bucket rewrite, no read-time
    per-key aggregation) — all three merge strategies must converge to the
    identical folded state."""
    feed = _events_feed(_t(spark, sf_dir, "events"))
    loc = tempfile.mkdtemp(prefix="dx_dv_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = feed.agg(F.max("lsn")).collect()[0][0]
    run_incremental(
        table, feed, batch_lsns=max(1, (int(hi) + 4) // 4),
        mode="dv", auto_compact=None,
    )
    return table.read().select("user_id", "event_type", "value_cents", "props")


def q_cdc_merge_cow_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE-SCOPED copy-on-write (lake/merge.py _cow_keepable_files): an
    orders base sort-clustered into narrow-range files, then a COW merge
    whose batch touches only the LOW end of the key space — files whose
    zone maps are disjoint from the batch's key bounding box must carry
    over verbatim (asserted non-vacuously: at least one entry path
    survives the merge) while the final state equals the SQL fold of the
    same update/delete set."""
    orders = _t(spark, sf_dir, "orders")
    loc = tempfile.mkdtemp(prefix="dx_cowf_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("prio", T.StringType()),
            T.StructField("total_cents", T.LongType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["k"], bucket_col="k",
        num_buckets=2,
    )
    base = orders.select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        _cents("o_totalprice").alias("total_cents"),
    )
    table.overwrite(base)
    table.compact(sort_cols=["k"], files_per_bucket=4)
    before = {e[0] for es in table.manifest().files.values() for e in es}
    cut = int(base.agg(F.max("k")).collect()[0][0]) // 8
    batch = base.filter((F.col("k") <= cut) & (F.col("k") % 4 == 0)).select(
        "k", "prio",
        (F.col("total_cents") + 777).alias("total_cents"),
        F.when(F.col("k") % 20 == 0, F.lit("delete"))
        .otherwise(F.lit("insert")).alias("op"),
        F.col("k").alias("lsn"),
    )
    merge_into(table, batch, op_col="op", order_col="lsn", mode="cow",
               keys_unique=True)
    after = {e[0] for es in table.manifest().files.values() for e in es}
    # the scoping must actually fire here — high-range files carry over
    assert before & after, "file-scoped COW kept no files on a clustered table"
    return table.read().select("k", "prio", "total_cents")


def q_cdc_changelog_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog with BEFORE images (Iceberg changelog-view / Debezium
    envelope): per commit, net changes classified against the prior
    snapshot — insert / update_before+update_after pairs / delete carrying
    the old row.  The oracle replays the per-batch winners and takes each
    key's previous winner as the before image."""
    feed = _events_feed(_t(spark, sf_dir, "events"))
    loc = tempfile.mkdtemp(prefix="dx_chgimg_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = feed.agg(F.max("lsn")).collect()[0][0]
    run_incremental(
        table, feed, batch_lsns=max(1, (int(hi) + 4) // 4), auto_compact=None
    )
    return table.read_changes_with_images(0).select(
        "user_id", "event_type", "value_cents", "props",
        F.col("_change_type").alias("change_type"),
        F.col("_change_lsn").alias("change_lsn"),
    )


def q_cdc_debezium_out(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-OUT roundtrip (sources/debezium.to_value_column — the reverse of
    the envelope reader): the table's changelog-with-images is serialized
    to Debezium JSON values (u-pairs combined into one op:"u" record,
    deletes carrying the before image), parsed BACK with the inbound
    ``from_json`` schema, and re-exploded into the changelog shape — so
    any serialization loss (field drop, image swap, op mismap, LSN
    corruption) breaks the same value oracle ``cdc_changelog_images``
    passes.  All JVM-side (to_json/from_json), no Python."""
    from datax_spark.sources import debezium as DBZ

    feed = _events_feed(_t(spark, sf_dir, "events"))
    loc = tempfile.mkdtemp(prefix="dx_dbzout_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = feed.agg(F.max("lsn")).collect()[0][0]
    run_incremental(
        table, feed, batch_lsns=max(1, (int(hi) + 4) // 4), auto_compact=None
    )
    vals = DBZ.from_table_changes(table, 0, db="appdb", name="events")
    parsed = vals.select(
        F.from_json("value", DBZ.envelope_schema(schema)).alias("e")
    )
    img = lambda side: F.col(f"e.{side}")  # noqa: E731
    row = lambda side, ctype: F.struct(  # noqa: E731
        img(side).alias("img"), F.lit(ctype).alias("change_type")
    )
    exploded = parsed.select(
        F.explode(
            F.when(F.col("e.op") == "u",
                   F.array(row("before", "update_before"),
                           row("after", "update_after")))
            .when(F.col("e.op") == "d", F.array(row("before", "delete")))
            .otherwise(F.array(row("after", "insert")))
        ).alias("r"),
        # -1 marks "append commit, no LSN" on the wire
        F.when(F.col("e.source.lsn") == -1, F.lit(None).cast("long"))
        .otherwise(F.col("e.source.lsn")).alias("change_lsn"),
    )
    return exploded.select(
        F.col("r.img.user_id").alias("user_id"),
        F.col("r.img.event_type").alias("event_type"),
        F.col("r.img.value_cents").alias("value_cents"),
        F.col("r.img.props").alias("props"),
        F.col("r.change_type").alias("change_type"),
        "change_lsn",
    )


def q_cdc_agg_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate view (lake/aggview.py — the continuous-
    aggregate / dynamic-table pattern): a per-event_type count+sum+min+max
    rollup maintained from the upstream table, refreshed after EVERY
    commit.  The refresh is COST-BASED: this feed rewrites nearly every
    key every batch, so the manifest-diff churn ratio sends each refresh
    down the full-recompute path (one to_v aggregate, cheaper than
    incremental at total churn); the low-churn incremental fold — the
    100-TB steady state — is driver-gated separately by
    ``cdc_agg_view_incr``.  The oracle aggregates the pure-SQL folded final state
    directly: maintenance through 4 batches of inserts/updates/deletes
    must equal the one-shot GROUP BY."""
    from datax_spark.lake.aggview import create_agg_view, refresh_agg_view

    feed = _events_feed(_t(spark, sf_dir, "events"))
    loc = tempfile.mkdtemp(prefix="dx_aggv_up_")
    os.rmdir(loc)
    vloc = tempfile.mkdtemp(prefix="dx_aggv_vw_")
    os.rmdir(vloc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    view = create_agg_view(
        table, vloc, dims=["event_type"], sums=["value_cents"],
        mins=["value_cents"], maxs=["value_cents"],
        num_buckets=4, version=0,
    )
    hi = feed.agg(F.max("lsn")).collect()[0][0]
    for _ in range(4):
        run_incremental(
            table, feed, batch_lsns=max(1, (int(hi) + 4) // 4),
            max_batches=1, auto_compact=None,
        )
        refresh_agg_view(table, view)
    return view.read().select(
        "event_type", "n_rows", "sum_value_cents",
        "min_value_cents", "max_value_cents",
    )


def q_cdc_agg_view_incr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INCREMENTAL side of the cost-based aggregate-view refresh (the
    100-TB steady state ``cdc_agg_view``'s total-churn feed cannot reach):
    a 150k-row orders base, then three ~0.3% change batches (patch
    +1000 cents on o_orderkey%97==0; delete the %291==0 third).  Each
    refresh's manifest-diff churn ratio stays far below the recompute
    threshold, so maintenance folds ONLY the changed rows — counts/sums
    via retraction, min/max via the top-K level algebra
    (lake/aggview.py).  The oracle applies the same patch/delete set in
    SQL and aggregates one-shot."""
    from datax_spark.lake.aggview import create_agg_view, refresh_agg_view

    orders = _t(spark, sf_dir, "orders")
    loc = tempfile.mkdtemp(prefix="dx_aggvi_up_")
    os.rmdir(loc)
    vloc = tempfile.mkdtemp(prefix="dx_aggvi_vw_")
    os.rmdir(vloc)
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("prio", T.StringType()),
            T.StructField("total_cents", T.LongType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["k"],
        bucket_col="k", num_buckets=8,
    )
    base = orders.select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        _cents("o_totalprice").alias("total_cents"),
        F.col("o_orderkey").cast("long").alias("lsn"),
        F.lit("insert").alias("op"),
    )
    # o_orderkey is the PK — every batch is one-row-per-key, so the
    # last-writer-wins dedup shuffle would be a no-op; say so via the hint
    merge_into(table, base, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None, keys_unique=True)
    view = create_agg_view(
        table, vloc, dims=["prio"], sums=["total_cents"],
        mins=["total_cents"], maxs=["total_cents"], num_buckets=4,
    )
    changes = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        (_cents("o_totalprice") + 1000).alias("total_cents"),
        (F.col("o_orderkey").cast("long") + F.lit(10**9)).alias("lsn"),
        F.when(F.col("o_orderkey") % 291 == 0, F.lit("delete"))
        .otherwise(F.lit("insert")).alias("op"),
    )
    for i in range(3):
        merge_into(
            table, changes.filter(F.col("k") % 3 == i),
            op_col="op", order_col="lsn", mode="mor", auto_compact=None,
            keys_unique=True,
        )
        refresh_agg_view(table, view)
    return view.read().select(
        "prio", "n_rows", "sum_total_cents",
        "min_total_cents", "max_total_cents",
    )


def _join_view_tables(spark: SparkSession, sf_dir: str):
    """Shared fixture for the join-view queries: orders (fact) and customer
    (dim) as CDC-fed LakeTables.  Base load, then one fact change batch
    (amount patches %97, foreign-key rewires %53, deletes %291) and one dim
    change batch (segment rewires %13, dim deletes %417) — each key gets at
    most ONE change event so the SQL oracle can express the fold as CASE
    expressions."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    floc = tempfile.mkdtemp(prefix="dx_jv_fact_")
    os.rmdir(floc)
    dloc = tempfile.mkdtemp(prefix="dx_jv_dim_")
    os.rmdir(dloc)
    fact = LakeTable.create(
        spark, floc,
        schema=T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("custkey", T.LongType()),
            T.StructField("total_cents", T.LongType()),
            T.StructField("prio", T.StringType()),
        ]),
        key_cols=["k"], bucket_col="k", num_buckets=8,
    )
    dim = LakeTable.create(
        spark, dloc,
        schema=T.StructType([
            T.StructField("ck", T.LongType()),
            T.StructField("seg", T.StringType()),
            T.StructField("acct_cents", T.LongType()),
        ]),
        key_cols=["ck"], bucket_col="ck", num_buckets=4,
    )
    # base loads are pure inserts into empty tables: overwrite() writes
    # bucketed base files in one action (no merge machinery); the change
    # merges layer MOR deltas on top exactly as after a compaction
    k = F.col("o_orderkey").cast("long")
    fact.overwrite(orders.select(
        k.alias("k"),
        F.col("o_custkey").cast("long").alias("custkey"),
        _cents("o_totalprice").alias("total_cents"),
        F.col("o_orderpriority").alias("prio"),
    ))
    ck = F.col("c_custkey").cast("long")
    dim.overwrite(customer.select(
        ck.alias("ck"),
        F.col("c_mktsegment").alias("seg"),
        _cents("c_acctbal").alias("acct_cents"),
    ))
    custk = F.col("o_custkey").cast("long")
    fact_changes = orders.filter(
        (k % 97 == 0) | (k % 53 == 0) | (k % 291 == 0)
    ).select(
        k.alias("k"),
        F.when((k % 53 == 0) & (custk > 1), custk - 1)
        .otherwise(custk).alias("custkey"),
        (_cents("o_totalprice")
         + F.when(k % 97 == 0, F.lit(1000)).otherwise(F.lit(0)))
        .alias("total_cents"),
        F.col("o_orderpriority").alias("prio"),
        (k + F.lit(10**9)).alias("lsn"),
        F.when(k % 291 == 0, F.lit("delete"))
        .otherwise(F.lit("insert")).alias("op"),
    )
    dim_changes = customer.filter(
        (ck % 13 == 0) | (ck % 417 == 0)
    ).select(
        ck.alias("ck"),
        F.when(ck % 13 == 0, F.lit("REWIRED"))
        .otherwise(F.col("c_mktsegment")).alias("seg"),
        (_cents("c_acctbal")
         + F.when(ck % 13 == 0, F.lit(500)).otherwise(F.lit(0)))
        .alias("acct_cents"),
        (ck + F.lit(10**9)).alias("lsn"),
        F.when(ck % 417 == 0, F.lit("delete"))
        .otherwise(F.lit("insert")).alias("op"),
    )
    return fact, dim, fact_changes, dim_changes


def _q_cdc_join_view(spark: SparkSession, sf_dir: str, how: str) -> DataFrame:
    from datax_spark.lake.joinview import create_join_view, refresh_join_view

    fact, dim, fact_changes, dim_changes = _join_view_tables(spark, sf_dir)
    vloc = tempfile.mkdtemp(prefix=f"dx_jv_{how}_")
    os.rmdir(vloc)
    view = create_join_view(fact, dim, vloc, on={"custkey": "ck"}, how=how,
                            num_buckets=8)
    # fact-side refresh: the affected-key count at sf0.01 (~470) exceeds
    # the pushdown cap, exercising the semi-join recompute path
    merge_into(fact, fact_changes, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None, keys_unique=True)
    refresh_join_view(fact, dim, view)
    # dim-side refresh: ~120 touched dim keys ride the zone-map IN pushdown
    # on the reverse foreign-key lookup
    merge_into(dim, dim_changes, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None, keys_unique=True)
    refresh_join_view(fact, dim, view)
    return view.read().select(
        "k", "custkey", "total_cents", "prio", "seg", "acct_cents"
    )


def q_cdc_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN view (lake/joinview.py — the delta-join "dynamic
    table" the aggregate view cannot express): orders ⋈ customer maintained
    from BOTH upstreams' changelogs.  One fact change batch (amount patches,
    foreign-key rewires, deletes) and one dim change batch (segment rewires,
    dim deletes) each trigger an exact partial recompute of only the
    affected fact keys; a dim delete drops its orders from this INNER view.
    The oracle folds both change sets in SQL and joins one-shot — the
    maintained view must match it row-for-row."""
    return _q_cdc_join_view(spark, sf_dir, "inner")


def q_cdc_join_view_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-join variant of ``cdc_join_view``: orders whose customer is
    deleted (or never existed) stay in the view with null dim columns — the
    enrichment-pipeline shape where fact rows must never be lost."""
    return _q_cdc_join_view(spark, sf_dir, "left")


def q_cdc_partial_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataX writeMode=update end-to-end (WriterUtil.java:110-167): 'click'
    events are PATCH events covering only value_cents (per-event presence);
    every other upsert covers the full payload; 'error' events delete.
    Uncovered columns must survive patches, and a delete must wipe them so
    later patches rebuild from nothing.  Runs the public incremental path
    (partial MOR "pdelta" files + column-wise read-side fold); the oracle
    replays the same per-column fold in SQL."""
    ev = _t(spark, sf_dir, "events")
    feed = _events_feed(ev).withColumn(
        "present",
        F.when(F.col("op") == "delete", F.lit(None).cast("array<string>"))
        .when(F.col("event_type") == "click", F.array(F.lit("value_cents")))
        .otherwise(
            F.array(F.lit("event_type"), F.lit("value_cents"),
                    F.lit("props"))
        ),
    )
    loc = tempfile.mkdtemp(prefix="dx_partial_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = feed.agg(F.max("lsn")).collect()[0][0]
    run_incremental(
        table, feed, batch_lsns=max(1, (int(hi) + 4) // 4),
        partial_update=True, present_col="present", auto_compact=None,
    )
    return table.read().select(
        "user_id", "event_type", "value_cents", "props"
    )


def q_cdc_changelog_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC *out*: ingest the feed as 4 MOR merge batches, then consume the
    table itself as a change feed via ``LakeTable.read_changes`` (Iceberg
    incremental-read analogue).  Emits every logical change row — per-batch
    last-event-per-key winners, tombstones included — with its change type
    and LSN; the oracle replays the same batch windows + in-batch dedup in
    SQL."""
    feed = _events_feed(_t(spark, sf_dir, "events"))
    loc = tempfile.mkdtemp(prefix="dx_chg_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = feed.agg(F.max("lsn")).collect()[0][0]
    run_incremental(
        table, feed, batch_lsns=max(1, (int(hi) + 4) // 4), auto_compact=None
    )
    return table.read_changes(0).select(
        "user_id", "event_type", "value_cents", "props",
        F.col("_change_type").alias("change_type"),
        F.col("_change_lsn").alias("change_lsn"),
    )


def q_cdc_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-Audit-Publish ingest: every batch is STAGED (invisible),
    audited against its preview state, then atomically published — the
    inspect-then-swap the reference's error-limit gate cannot do (it fails
    the job only after bad rows reached the target,
    ErrorRecordChecker.java:18-82).  Final state must equal the same fold
    as the direct MERGE path."""
    from datax_spark.lake.wap import publish_staged, read_staged, stage_merge

    feed = _events_feed(_t(spark, sf_dir, "events"))
    loc = tempfile.mkdtemp(prefix="dx_wap_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = int(feed.agg(F.max("lsn")).collect()[0][0])
    bl = max(1, (hi + 4) // 4)
    payload = ["user_id", "event_type", "value_cents", "props"]
    for i in range(4):
        b = feed.filter(F.floor(F.col("lsn") / bl) == i)
        wid = stage_merge(
            table, b, op_col="op", order_col="lsn", payload_cols=payload,
            lineage={"batch_id": i, "rows": b.count(), "bytes": 0},
        )
        if wid is None:
            continue
        # audit: the preview must never shrink below the published state
        assert read_staged(table, wid).count() >= table.read().count() - b.count()
        publish_staged(table, wid)
    return table.read().select(*payload)


def q_cdc_mirror_relay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC relay end-to-end: ingest the feed into an UPSTREAM table (4 MOR
    merge batches), then maintain a DOWNSTREAM mirror purely from the
    upstream's changelog (``bootstrap_mirror(version=0)`` + ``sync_mirror``
    — no re-read of the source feed) and return the MIRROR's state.  The
    oracle is the same pure-SQL fold as the direct ingest: relaying through
    the commit log must be state-identical to applying the feed directly."""
    from datax_spark.lake.mirror import bootstrap_mirror, sync_mirror

    feed = _events_feed(_t(spark, sf_dir, "events"))
    loc = tempfile.mkdtemp(prefix="dx_relay_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    up = LakeTable.create(
        spark, os.path.join(loc, "up"), schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = feed.agg(F.max("lsn")).collect()[0][0]
    run_incremental(
        up, feed, batch_lsns=max(1, (int(hi) + 4) // 4), auto_compact=None
    )
    mirror = bootstrap_mirror(up, os.path.join(loc, "mirror"), version=0)
    sync_mirror(up, mirror)
    return mirror.read().select("user_id", "event_type", "value_cents", "props")


def q_lake_prune_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map pruned read: ingest, compact with a sort order (files
    range-clustered on user_id), then a predicate read (key range + non-key
    equality) served through manifest file-skipping — files whose recorded
    min/max disprove the predicate are never opened.  The oracle is the
    fold + the same WHERE; the suite run also asserts the plan actually
    skipped files (pruning must not be vacuous)."""
    feed = _events_feed(_t(spark, sf_dir, "events"))
    loc = tempfile.mkdtemp(prefix="dx_prune_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = feed.agg(F.max("lsn")).collect()[0][0]
    run_incremental(table, feed, batch_lsns=max(1, (int(hi) + 4) // 4))
    table.compact(files_per_bucket=4, sort_cols=["user_id"])
    where = [("user_id", "between", (10, 60)), ("event_type", "=", "click")]
    plan = table.scan_plan(where=where)
    assert plan["files_skipped"] > 0, f"pruning was vacuous: {plan}"
    return table.read(where=where).select(
        "user_id", "event_type", "value_cents", "props"
    )


def q_lake_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup via DRIVER-SIDE bucket derivation (Iceberg
    bucket-transform partition pruning analogue): ingest into a table
    bucketed by user_id, then read(where user_id IN (...)) — the scan is
    confined to pmod(hash(id), n) buckets computed with the Murmur3 mirror
    in lake/hashing.py, zero Spark jobs spent planning.  At 100 TB this is
    the O(files-per-bucket) key-lookup path.  The suite run asserts the
    derivation actually happened AND pruned candidate files; the oracle is
    the fold + the same IN."""
    feed = _events_feed(_t(spark, sf_dir, "events"))
    loc = tempfile.mkdtemp(prefix="dx_lookup_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = feed.agg(F.max("lsn")).collect()[0][0]
    run_incremental(table, feed, batch_lsns=max(1, (int(hi) + 4) // 4))
    table.compact(files_per_bucket=4)
    where = [("user_id", "in", [1, 7, 11])]
    plan = table.scan_plan(where=where)
    assert plan["buckets_derived"] is not None, f"no derivation: {plan}"
    full = table.scan_plan()
    assert plan["files_total"] < full["files_total"], (
        f"bucket pruning was vacuous: {plan} vs {full}"
    )
    return table.read(where=where).select(
        "user_id", "event_type", "value_cents", "props"
    )


def q_lake_bloom_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-FILTER FILE SKIPPING (lake/table.py BLOOM_PROP — the
    Iceberg/Delta bloom story for equality lookups on high-cardinality
    NON-clustered columns): ingest, enable per-file blooms on value_cents,
    compact (bloom-bearing base files), then a point lookup on a mid-range
    value — inside every unsorted file's [min,max], so zone maps keep all
    files and ONLY the bloom bitmaps (tested driver-side, zero jobs, zero
    file opens) can skip.  The run asserts bloom pruning fired; the oracle
    is the fold + the same scalar lookup."""
    feed = _events_feed(_t(spark, sf_dir, "events"))
    loc = tempfile.mkdtemp(prefix="dx_bloom_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = feed.agg(F.max("lsn")).collect()[0][0]
    run_incremental(table, feed, batch_lsns=max(1, (int(hi) + 4) // 4))
    table.set_bloom_filters(["value_cents"])
    table.compact(files_per_bucket=4)
    # a mid-range needle: the surviving value of the smallest user id —
    # random-valued, so it sits inside every file's zone-map range and
    # only the blooms can prune
    probe = (
        table.read()
        .orderBy("user_id")
        .select("value_cents")
        .first()["value_cents"]
    )
    where = [("value_cents", "=", int(probe))]
    plan = table.scan_plan(where=where)
    assert plan["bloom_skipped"] > 0, f"bloom pruning was vacuous: {plan}"
    return table.read(where=where).select(
        "user_id", "event_type", "value_cents", "props"
    )


def q_lake_zorder_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustered read: ingest, compact with an interleaved-bit
    (user_id, value_cents) key, then a predicate on value_cents ALONE —
    the column a lexicographic (user_id, value_cents) sort would leave
    unprunable.  The suite run asserts files were actually skipped; the
    oracle is the fold + the same WHERE."""
    feed = _events_feed(_t(spark, sf_dir, "events"))
    loc = tempfile.mkdtemp(prefix="dx_zorder_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = feed.agg(F.max("lsn")).collect()[0][0]
    run_incremental(table, feed, batch_lsns=max(1, (int(hi) + 4) // 4))
    table.compact(files_per_bucket=4, zorder_cols=["user_id", "value_cents"])
    where = [("value_cents", "between", (1000, 3000))]
    plan = table.scan_plan(where=where)
    assert plan["files_skipped"] > 0, f"z-order pruning was vacuous: {plan}"
    return table.read(where=where).select(
        "user_id", "event_type", "value_cents", "props"
    )


def q_cdc_stream_available_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same fold through Structured Streaming (readStream → foreachBatch
    MERGE, Trigger.AvailableNow) — the north_star execution shape."""
    from datax_spark.streaming.runner import run_available_now, write_feed_ordered

    feed = _events_feed(_t(spark, sf_dir, "events"))
    work = tempfile.mkdtemp(prefix="dx_stream_")
    feed_dir = os.path.join(work, "feed")
    write_feed_ordered(feed, feed_dir, n_files=8)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, os.path.join(work, "table"), schema=schema,
        key_cols=["user_id"], bucket_col="user_id", num_buckets=8,
    )
    run_available_now(spark, feed_dir, table, max_files_per_trigger=2)
    return table.read().select("user_id", "event_type", "value_cents", "props")


def q_cdc_rate_capped_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RATE-CAPPED DRAIN (SURVEY §2.1/§2.5 — the byte AND record halves of
    the reference's Channel throttle, Channel.java:148-204): the rows- and
    bytes-per-trigger caps derive a files-per-trigger from parquet footer
    row counts / file sizes (zero Spark jobs,
    streaming/runner.files_per_trigger_for_rows/_bytes), so the drain is
    forced into several micro-batches (asserted non-vacuously from the
    returned lineage) while the final fold stays byte-identical to the
    one-shot oracle — throughput shaping must never change the answer."""
    from datax_spark.streaming.runner import run_available_now, write_feed_ordered

    feed = _events_feed(_t(spark, sf_dir, "events"))
    n_rows = feed.count()
    work = tempfile.mkdtemp(prefix="dx_rate_")
    feed_dir = os.path.join(work, "feed")
    write_feed_ordered(feed, feed_dir, n_files=8)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, os.path.join(work, "table"), schema=schema,
        key_cols=["user_id"], bucket_col="user_id", num_buckets=8,
    )
    lineages = run_available_now(
        spark, feed_dir, table,
        max_rows_per_trigger=max(1, int(n_rows) // 3),
        max_bytes_per_trigger=1 << 30,  # bytes cap present but not binding
    )
    assert len(lineages) >= 3, f"rows cap must split the drain: {len(lineages)}"
    assert sum(l["rows"] for l in lineages) == n_rows
    return table.read().select("user_id", "event_type", "value_cents", "props")


def q_file_sequence_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQ legacy-format reader (SURVEY §2.1 — HdfsReader.java:80-86
    SEQUENCE branch: Text values are delimited lines, keys ignored): the
    orders table serialized to CSV lines inside a Hadoop SequenceFile,
    read back through sources/file.read_sequence_text's column-spec path
    (index/type/name projection + constant column — the engine's one
    sanctioned RDD hop), and compared against DuckDB reading the SAME
    source parquet.  Money rides as cents text so no float-format
    roundtrip can differ between engines."""
    from datax_spark.sources import file as FS

    orders = _t(spark, sf_dir, "orders")
    lines = orders.select(
        F.concat_ws(
            ",",
            F.col("o_orderkey").cast("string"),
            F.col("o_orderpriority"),
            _cents("o_totalprice").cast("string"),
        ).alias("line")
    )
    work = tempfile.mkdtemp(prefix="dx_seq_")
    seq_dir = os.path.join(work, "seq")
    os.rmdir(work)
    lines.rdd.map(lambda r: (0, r[0])).saveAsSequenceFile(seq_dir)
    return FS.read_sequence_text(
        spark, seq_dir,
        columns=[
            {"index": 0, "type": "long", "name": "o_orderkey"},
            {"index": 1, "type": "string", "name": "o_orderpriority"},
            {"index": 2, "type": "long", "name": "total_cents"},
            {"value": "seq", "type": "string", "name": "src"},
        ],
    )


def q_cdc_view_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-view DAG (the dbt-style pipeline, fully incremental):
    orders ⋈ customer JOIN VIEW feeds an AGGREGATE VIEW (per-segment
    count + revenue) — the join view's MOR merges are themselves a
    changelog, so the rollup maintains from the view exactly as it would
    from a base table.  After fact churn and dim churn each stage
    refreshes in sequence; the oracle folds both change sets, joins, and
    aggregates one-shot in SQL."""
    from datax_spark.lake.aggview import create_agg_view, refresh_agg_view
    from datax_spark.lake.joinview import create_join_view, refresh_join_view

    fact, dim, fact_changes, dim_changes = _join_view_tables(spark, sf_dir)
    vloc = tempfile.mkdtemp(prefix="dx_pipe_jv_")
    os.rmdir(vloc)
    aloc = tempfile.mkdtemp(prefix="dx_pipe_agg_")
    os.rmdir(aloc)
    view = create_join_view(fact, dim, vloc, on={"custkey": "ck"},
                            how="inner", num_buckets=8)
    rollup = create_agg_view(view, aloc, dims=["seg"],
                             sums=["total_cents"], num_buckets=4)
    merge_into(fact, fact_changes, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None, keys_unique=True)
    refresh_join_view(fact, dim, view)
    refresh_agg_view(view, rollup)
    merge_into(dim, dim_changes, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None, keys_unique=True)
    refresh_join_view(fact, dim, view)
    refresh_agg_view(view, rollup)
    return rollup.read().select("seg", "n_rows", "sum_total_cents")


def q_cdc_star_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimension STAR view (lake/joinview.create_star_view):
    lineitem ⋈ part (inner) ⋈ supplier (left) maintained from all three
    changelogs.  One fact change batch (price patches %97, deletes %291
    by order), then part rewires/deletes and supplier patches/deletes
    folded in a SINGLE refresh — the multi-dim partial recompute: each
    dim's reverse foreign-key lookup contributes affected fact keys, one
    merge settles them all.  The oracle folds all three change sets in
    SQL and double-joins one-shot."""
    from datax_spark.lake.joinview import create_star_view, refresh_star_view

    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    flocs = [tempfile.mkdtemp(prefix=f"dx_star_{n}_")
             for n in ("fact", "p", "s", "v")]
    for d in flocs:
        os.rmdir(d)
    fact = LakeTable.create(
        spark, flocs[0],
        schema=T.StructType([
            T.StructField("k1", T.LongType()),
            T.StructField("k2", T.LongType()),
            T.StructField("partkey", T.LongType()),
            T.StructField("suppkey", T.LongType()),
            T.StructField("price_cents", T.LongType()),
        ]),
        key_cols=["k1", "k2"], bucket_col="k1", num_buckets=8,
    )
    dimp = LakeTable.create(
        spark, flocs[1],
        schema=T.StructType([
            T.StructField("pk", T.LongType()),
            T.StructField("brand", T.StringType()),
        ]),
        key_cols=["pk"], bucket_col="pk", num_buckets=4,
    )
    dims = LakeTable.create(
        spark, flocs[2],
        schema=T.StructType([
            T.StructField("sk", T.LongType()),
            T.StructField("s_acct_cents", T.LongType()),
        ]),
        key_cols=["sk"], bucket_col="sk", num_buckets=4,
    )
    # every fourth order: the full 600k-row lineitem at sf0.1 quadruples
    # the fixture-build cost without adding semantics coverage (4 is
    # coprime with the %97 patch and %291 delete moduli, so both change
    # classes survive the thinning at every scale)
    lineitem = lineitem.filter(F.col("l_orderkey") % 4 == 0)
    ok = F.col("l_orderkey").cast("long")
    ln = F.col("l_linenumber").cast("long")
    base_lsn = ok * 8 + ln
    # base loads are pure inserts into empty tables: overwrite() writes
    # bucketed base files in one action (the post-compaction read fast
    # path) — later MOR change merges layer deltas on top exactly as
    # they would after a compaction
    fact.overwrite(lineitem.select(
        ok.alias("k1"), ln.alias("k2"),
        F.col("l_partkey").cast("long").alias("partkey"),
        F.col("l_suppkey").cast("long").alias("suppkey"),
        _cents("l_extendedprice").alias("price_cents"),
    ))
    pk = F.col("p_partkey").cast("long")
    dimp.overwrite(part.select(
        pk.alias("pk"), F.col("p_brand").alias("brand"),
    ))
    sk = F.col("s_suppkey").cast("long")
    dims.overwrite(supplier.select(
        sk.alias("sk"),
        _cents("s_acctbal").alias("s_acct_cents"),
    ))
    view = create_star_view(
        fact,
        [{"table": dimp, "on": {"partkey": "pk"}, "how": "inner"},
         {"table": dims, "on": {"suppkey": "sk"}, "how": "left"}],
        flocs[3], num_buckets=8,
    )
    # fact-side churn → refresh 1 (above-cap semi-join recompute path)
    merge_into(fact, lineitem.filter((ok % 97 == 0) | (ok % 291 == 0))
               .select(
        ok.alias("k1"), ln.alias("k2"),
        F.col("l_partkey").cast("long").alias("partkey"),
        F.col("l_suppkey").cast("long").alias("suppkey"),
        (_cents("l_extendedprice")
         + F.when(ok % 97 == 0, F.lit(1000)).otherwise(F.lit(0)))
        .alias("price_cents"),
        (base_lsn + F.lit(10**9)).alias("lsn"),
        F.when(ok % 291 == 0, F.lit("delete"))
        .otherwise(F.lit("insert")).alias("op"),
    ), op_col="op", order_col="lsn", mode="mor", auto_compact=None,
        keys_unique=True)
    refresh_star_view(fact, [dimp, dims], view)
    # BOTH dims churn → one multi-dim refresh (pushdown reverse lookups)
    merge_into(dimp, part.filter((pk % 13 == 0) | (pk % 419 == 0)).select(
        pk.alias("pk"),
        F.when(pk % 13 == 0, F.lit("REWIRED"))
        .otherwise(F.col("p_brand")).alias("brand"),
        (pk + F.lit(10**9)).alias("lsn"),
        F.when(pk % 419 == 0, F.lit("delete"))
        .otherwise(F.lit("insert")).alias("op"),
    ), op_col="op", order_col="lsn", mode="mor", auto_compact=None,
        keys_unique=True)
    merge_into(dims, supplier.filter((sk % 11 == 0) | (sk % 83 == 0))
               .select(
        sk.alias("sk"),
        (_cents("s_acctbal")
         + F.when(sk % 11 == 0, F.lit(500)).otherwise(F.lit(0)))
        .alias("s_acct_cents"),
        (sk + F.lit(10**9)).alias("lsn"),
        F.when(sk % 83 == 0, F.lit("delete"))
        .otherwise(F.lit("insert")).alias("op"),
    ), op_col="op", order_col="lsn", mode="mor", auto_compact=None,
        keys_unique=True)
    refresh_star_view(fact, [dimp, dims], view)
    return view.read().select(
        "k1", "k2", "partkey", "suppkey", "price_cents", "brand",
        "s_acct_cents",
    )


def q_text_index_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained inverted index (lake/indexview.py — a
    search index as a derived view): documents become a CDC-fed table,
    the index bootstraps from the base snapshot, then one change batch
    (content rewrites %7, deletes %31) folds through the before-image
    changelog — old postings retract, new ones assert, term frequencies
    update, all in O(changed docs × tokens).  The query returns the
    postings for four probe terms via the bucket-pruned point-read path;
    the oracle tokenizes the folded final corpus one-shot in SQL."""
    from datax_spark.lake.indexview import (
        create_index_view,
        lookup_postings,
        refresh_index_view,
    )

    documents = _t(spark, sf_dir, "documents")
    loc = tempfile.mkdtemp(prefix="dx_ixdocs_")
    os.rmdir(loc)
    ixloc = tempfile.mkdtemp(prefix="dx_ixview_")
    os.rmdir(ixloc)
    table = LakeTable.create(
        spark, loc,
        schema=T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("body", T.StringType()),
        ]),
        key_cols=["doc_id"], bucket_col="doc_id", num_buckets=8,
    )
    d = F.col("doc_id").cast("long")
    base = documents.select(
        d.alias("doc_id"), F.col("text").alias("body"),
        d.alias("lsn"), F.lit("insert").alias("op"),
    )
    merge_into(table, base, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None, keys_unique=True)
    view = create_index_view(table, ixloc, "body", num_buckets=8)
    changes = documents.filter((d % 7 == 0) | (d % 31 == 0)).select(
        d.alias("doc_id"),
        F.concat(F.lit("updated contents for document "),
                 d.cast("string")).alias("body"),
        (d + F.lit(10**9)).alias("lsn"),
        F.when(d % 31 == 0, F.lit("delete"))
        .otherwise(F.lit("insert")).alias("op"),
    )
    merge_into(table, changes, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None, keys_unique=True)
    refresh_index_view(table, view)
    return lookup_postings(
        view, ["updated", "document", "scan", "window"]
    ).select("token", "doc_id", "tf")


def q_text_index_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval over the MAINTAINED index stack — three composed
    incremental views: documents CDC-fed → inverted index
    (lake/indexview.py) → doc-length rollup (an ordinary agg view over
    the index, sums=["tf"]).  After a change batch both views refresh
    incrementally and ``search_bm25`` answers from pruned postings +
    the rollup — no per-query corpus pass anywhere.  The oracle computes
    Okapi BM25 one-shot in SQL from the folded final corpus with the
    index's own tokenization."""
    from datax_spark.lake.aggview import create_agg_view, refresh_agg_view
    from datax_spark.lake.indexview import (
        create_index_view,
        refresh_index_view,
        search_bm25,
    )

    documents = _t(spark, sf_dir, "documents")
    locs = [tempfile.mkdtemp(prefix=f"dx_bm25ix_{n}_")
            for n in ("docs", "ix", "dl")]
    for d in locs:
        os.rmdir(d)
    table = LakeTable.create(
        spark, locs[0],
        schema=T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("body", T.StringType()),
        ]),
        key_cols=["doc_id"], bucket_col="doc_id", num_buckets=8,
    )
    d = F.col("doc_id").cast("long")
    table.overwrite(documents.select(
        d.alias("doc_id"), F.col("text").alias("body"),
    ))
    view = create_index_view(table, locs[1], "body", num_buckets=8)
    doclen = create_agg_view(view, locs[2], dims=["doc_id"], sums=["tf"],
                             num_buckets=4)
    changes = documents.filter((d % 7 == 0) | (d % 31 == 0)).select(
        d.alias("doc_id"),
        F.concat(F.lit("updated contents for document "),
                 d.cast("string")).alias("body"),
        (d + F.lit(10**9)).alias("lsn"),
        F.when(d % 31 == 0, F.lit("delete"))
        .otherwise(F.lit("insert")).alias("op"),
    )
    merge_into(table, changes, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None, keys_unique=True)
    refresh_index_view(table, view)
    refresh_agg_view(view, doclen)
    return search_bm25(view, ["scan", "window", "updated"], k=20,
                       doclen=doclen)


def q_lake_purge_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """History-reaching key purge (lake/purge.py — right-to-be-forgotten):
    an orders table with three commits of history (base, %97 amount
    patches, %291 deletes) purges the contiguous key band [50, 199] from
    ALL retained snapshots.  The query itself asserts the purge reached
    history (the
    pre-purge snapshot version no longer serves any purged key — a
    non-vacuous time-travel check) and that the file rewrite was
    zone-map-pruned, then returns the final state; the oracle folds the
    same changes in SQL and excludes the purged keys."""
    from datax_spark.lake.purge import purge_rows

    orders = _t(spark, sf_dir, "orders")
    loc = tempfile.mkdtemp(prefix="dx_purge_")
    os.rmdir(loc)
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("prio", T.StringType()),
        T.StructField("total_cents", T.LongType()),
    ])
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["k"], bucket_col="k",
        num_buckets=8,
    )
    k = F.col("o_orderkey").cast("long")
    base = orders.select(
        k.alias("k"), F.col("o_orderpriority").alias("prio"),
        _cents("o_totalprice").alias("total_cents"),
        k.alias("lsn"), F.lit("insert").alias("op"),
    )
    merge_into(table, base, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None, keys_unique=True)
    changes = orders.filter((k % 97 == 0) | (k % 291 == 0)).select(
        k.alias("k"), F.col("o_orderpriority").alias("prio"),
        (_cents("o_totalprice") + 1000).alias("total_cents"),
        (k + F.lit(10**9)).alias("lsn"),
        F.when(k % 291 == 0, F.lit("delete"))
        .otherwise(F.lit("insert")).alias("op"),
    )
    merge_into(table, changes, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None, keys_unique=True)
    # key-cluster the history so the purge rewrite is zone-map-prunable
    table.compact(sort_cols=["k"])
    pre_purge_v = table.current_version()
    # a contiguous key band (the "one tenant's id range" shape) — narrow
    # against the clustered layout, so most sorted files prove disjoint
    lo, hi = 50, 199
    union_files = {
        e[0]
        for v in table.catalog.list_versions() if v > 0
        for es in table.manifest(v).files.values() for e in es
    }
    out = purge_rows(table, [("k", "between", (lo, hi))])
    assert out["rows_purged"] > 0, "purge removed nothing"
    assert out["files_scanned"] < len(union_files), \
        "purge rewrite was not zone-map-pruned"
    # the purge must have reached history: the PRE-PURGE snapshot no
    # longer serves any purged key
    leaked = (
        table.read(version=pre_purge_v)
        .filter(F.col("k").between(lo, hi)).count()
    )
    assert leaked == 0, f"{leaked} purged rows still readable via history"
    return table.read().select("k", "prio", "total_cents")


def q_file_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC reader (SURVEY §2.1 — HdfsReader.java:80-86 ORC branch): the
    orders table written as ORC, read back through sources/file.read_orc's
    shared column-spec path (index + named-field projection, cast,
    constant column), compared against DuckDB reading the SAME source
    parquet.  Spark's native ORC scan does pushdown/pruning; money rides
    as cents so no float-format roundtrip can differ."""
    from datax_spark.sources import file as FS

    orders = _t(spark, sf_dir, "orders")
    work = tempfile.mkdtemp(prefix="dx_orc_")
    orc_dir = os.path.join(work, "orc")
    orders.select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        _cents("o_totalprice").alias("cents"),
    ).coalesce(4).write.mode("overwrite").orc(orc_dir)
    return FS.read_orc(
        spark, orc_dir,
        columns=[
            {"index": 0, "type": "long", "name": "o_orderkey"},
            {"field": "prio", "type": "string", "name": "o_orderpriority"},
            {"index": 2, "type": "long", "name": "total_cents"},
            {"value": "orc", "type": "string", "name": "src"},
        ],
    )


def q_file_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines reader (the interchange format of public web-scale
    training corpora): events serialized as nested JSON objects
    (envelope + payload struct), read back with a PINNED schema (no
    inference pass — the 100-TB contract) and dotted-path field
    projection through the shared column spec, vs DuckDB on the source
    parquet."""
    from datax_spark.sources import file as FS

    ev = _t(spark, sf_dir, "events")
    work = tempfile.mkdtemp(prefix="dx_jsonl_")
    jdir = os.path.join(work, "jsonl")
    FS.write_jsonl(
        ev.select(
            F.col("event_id").cast("long").alias("event_id"),
            F.struct(
                F.col("user_id").cast("long").alias("user_id"),
                F.col("event_type").alias("event_type"),
                _cents("value").alias("value_cents"),
            ).alias("payload"),
        ).coalesce(4),
        jdir, write_mode="truncate",
    )
    return FS.read_jsonl(
        spark, jdir,
        schema=("event_id bigint, payload struct<user_id: bigint, "
                "event_type: string, value_cents: bigint>"),
        columns=[
            {"field": "event_id", "type": "long"},
            {"field": "payload.user_id", "type": "long"},
            {"field": "payload.event_type", "type": "string"},
            {"field": "payload.value_cents", "type": "long"},
        ],
    )


def q_cdc_stream_continuous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same fold through the LIVE tail (streaming/runner.run_continuous —
    processingTime trigger): half the ordered feed is present when the
    query starts; the other half lands in the directory WHILE IT RUNS and
    is applied by the same exactly-once foreachBatch path.  The long-
    running binlog-subscription shape the bounded drain cannot cover;
    final state must equal the one-shot SQL fold."""
    import shutil
    import time as _time

    import pyarrow.parquet as _pq

    from datax_spark.streaming.runner import run_continuous, write_feed_ordered

    feed = _events_feed(_t(spark, sf_dir, "events"))
    work = tempfile.mkdtemp(prefix="dx_tail_")
    staging = os.path.join(work, "staging")
    write_feed_ordered(feed, staging, n_files=8)
    live = os.path.join(work, "feed")
    os.makedirs(live)
    parts = sorted(f for f in os.listdir(staging) if f.endswith(".parquet"))
    rows_of = {
        fn: _pq.ParquetFile(os.path.join(staging, fn)).metadata.num_rows
        for fn in parts
    }  # driver-side footer reads — no Spark jobs

    def land(names: list[str], base: int) -> None:
        for i, fn in enumerate(names):
            dst = os.path.join(live, fn)
            shutil.copy(os.path.join(staging, fn), dst)
            os.utime(dst, (base + i, base + i))  # preserve LSN-order mtimes

    now = int(_time.time())
    land(parts[:4], now - 100)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, os.path.join(work, "table"), schema=schema,
        key_cols=["user_id"], bucket_col="user_id", num_buckets=8,
    )
    tail = run_continuous(
        spark, live, table, trigger_interval="250 milliseconds",
        stall_timeout_sec=240,
    )
    try:
        tail.wait_for_rows(sum(rows_of[f] for f in parts[:4]),
                           timeout_sec=240)
        land(parts[4:], now)  # late arrivals against the live query
        tail.wait_for_rows(sum(rows_of.values()), timeout_sec=240)
    finally:
        tail.stop()
    return table.read().select("user_id", "event_type", "value_cents", "props")


_CDC_FOLD_ORACLE = """
WITH ranked AS (
  SELECT user_id, event_type, CAST(round(value*100) AS BIGINT) AS value_cents,
         props, event_type = 'error' AS is_delete,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events)
SELECT user_id, event_type, value_cents, props
FROM ranked WHERE rn = 1 AND NOT is_delete
"""


def q_cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION MID-STREAM (SURVEY §2.7; DataX column-mapping
    analogue): the first half of the feed arrives NARROW — no ``props``
    column, ``value_cents`` as INT — and the second half adds ``props`` and
    widens ``value_cents`` to LONG.  Both halves run through the ordinary
    incremental MERGE path; ``merge_schemas`` (lake/table.py) applies the
    column add + int→long widen before the batch commits, and the final
    read null-fills ``props`` for rows whose winner predates the column.
    The oracle folds in SQL with ``props`` nulled for first-half winners."""
    feed = _events_feed(_t(spark, sf_dir, "events"))
    hi = int(feed.agg(F.max("lsn")).collect()[0][0])
    mid = hi // 2
    narrow = feed.filter(F.col("lsn") <= mid).select(
        "lsn", "shard", "ts", "op", "user_id", "event_type",
        F.col("value_cents").cast("int").alias("value_cents"),
    )
    wide = feed.filter(F.col("lsn") > mid)
    loc = tempfile.mkdtemp(prefix="dx_evo_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.IntegerType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    bl = max(1, (hi + 4) // 4)
    run_incremental(table, narrow, batch_lsns=bl, auto_compact=None)
    # second source epoch: distinct batch-id namespace (the replay guard is
    # per batch id); per-shard watermarks make the handoff exactly-once
    run_incremental(table, wide, batch_lsns=bl, start_batch_id=1000,
                    auto_compact=None)
    return table.read().select(
        "user_id", "event_type",
        F.col("value_cents").cast("long").alias("value_cents"), "props",
    )


def _dirty_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The envelope with deterministic dirt injected (keyed on the original
    LSN so the oracle can name the same rows): every 97th LSN gets an
    unknown op, every 101st a NULL key, every 103rd a NULL LSN."""
    feed = _events_feed(_t(spark, sf_dir, "events"))
    return (
        feed.withColumn(
            "op",
            F.when(F.pmod("lsn", F.lit(97)) == 0, F.lit("bogus"))
            .otherwise(F.col("op")),
        )
        .withColumn(
            "user_id",
            F.when(F.pmod("lsn", F.lit(101)) == 0, F.lit(None))
            .otherwise(F.col("user_id")),
        )
        .withColumn(
            "lsn",
            F.when(F.pmod("lsn", F.lit(103)) == 0, F.lit(None))
            .otherwise(F.col("lsn")),
        )
    )


def q_cdc_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIRTY-RECORD QUARANTINE in the ingest path (SURVEY §2.8 —
    AbstractTaskPluginCollector + ErrorRecordChecker): deterministic dirt is
    injected into the envelope, ``envelope_rules`` routes violations to the
    quarantine side in the same scan (reason = first violated rule), the
    errorLimit.percentage=0.1 gate passes (~3% dirty), and ONLY clean rows
    flow into the incremental MERGE.  The oracle folds the feed minus the
    injected-dirty rows."""
    from datax_spark.cdc.quarantine import (
        ErrorLimits, envelope_rules, quarantine,
    )

    f = _dirty_feed(spark, sf_dir)
    qloc = tempfile.mkdtemp(prefix="dx_quar_")
    clean = quarantine(
        f, envelope_rules(["user_id"]), quarantine_path=qloc,
        limits=ErrorLimits(percentage=0.1),
    )
    loc = tempfile.mkdtemp(prefix="dx_qtab_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = int(clean.agg(F.max("lsn")).collect()[0][0])
    run_incremental(table, clean, batch_lsns=max(1, (hi + 4) // 4),
                    auto_compact=None)
    return table.read().select("user_id", "event_type", "value_cents", "props")


def q_cdc_quarantine_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dirty side of the same split: reason × count — DataX's
    dirty-collector report (one throwable class per record).  Reason is the
    FIRST violated rule in declaration order (null_lsn > bad_op >
    null_key)."""
    from datax_spark.cdc.quarantine import (
        ERROR_COL, envelope_rules, split_dirty,
    )

    f = _dirty_feed(spark, sf_dir)
    _, dirty = split_dirty(f, envelope_rules(["user_id"]))
    return dirty.groupBy(F.col(ERROR_COL).alias("reason")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def q_cdc_quarantine_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DLQ REPLAY (cdc/quarantine.replay_quarantine — the completion of
    the dirty-collector story: the reference only collects,
    AbstractTaskPluginCollector.java:41-57): the dirty feed is
    quarantined and the clean rows ingested as usual; then the DLQ is
    replayed with a FIX that recomputes the op from event_type — the
    bogus-op rows (lsn%97) become clean and MERGE in at their original
    LSNs (LWW folds them correctly against newer data); the null-key
    (lsn%101) and null-lsn (lsn%103) rows are unrecoverable and land in
    _dead.  The oracle folds events minus only the unrecoverable dirt.
    A second replay finds an empty DLQ (files archived)."""
    from datax_spark.cdc.quarantine import (
        envelope_rules, quarantine, replay_quarantine,
    )

    f = _dirty_feed(spark, sf_dir)
    qloc = tempfile.mkdtemp(prefix="dx_dlq_")
    rules = envelope_rules(["user_id"])
    clean = quarantine(f, rules, quarantine_path=qloc)
    loc = tempfile.mkdtemp(prefix="dx_dlqtab_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = int(clean.agg(F.max("lsn")).collect()[0][0])
    run_incremental(table, clean, batch_lsns=max(1, (hi + 4) // 4),
                    auto_compact=None)

    def fix(df):  # the repaired mapping: op re-derived from event_type
        return df.withColumn(
            "op",
            F.when(F.col("event_type") == "error", F.lit("delete"))
            .otherwise(F.lit("insert")),
        )

    res = replay_quarantine(spark, qloc, table, rules, fix=fix)
    assert res["replayed"] > 0, f"replay was vacuous: {res}"
    assert res["still_dirty"] > 0, f"dead-letter split was vacuous: {res}"
    again = replay_quarantine(spark, qloc, table, rules, fix=fix)
    assert again["files"] == 0, f"DLQ did not drain: {again}"
    return table.read().select(
        "user_id", "event_type", "value_cents", "props"
    )


def q_cdc_shard_skew_delivery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUT-OF-ORDER CROSS-SHARD DELIVERY (SURVEY §2.7): the even shards'
    ENTIRE history is ingested first — advancing their watermarks to the
    feed head — then the odd shards', whose LSNs sit far BELOW the even
    shards' watermarks.  A single global watermark would wrongly drop the
    whole second pass; per-shard lineage (the engine's default) applies it
    in full.  The oracle is the plain full fold — any dropped or duplicated
    shard breaks the value hash."""
    feed = _events_feed(_t(spark, sf_dir, "events"))
    even = feed.filter(F.pmod("shard", F.lit(2)) == 0)
    odd = feed.filter(F.pmod("shard", F.lit(2)) == 1)
    loc = tempfile.mkdtemp(prefix="dx_skewdel_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = int(feed.agg(F.max("lsn")).collect()[0][0])
    bl = max(1, (hi + 4) // 4)
    run_incremental(table, even, batch_lsns=bl, auto_compact=None)
    run_incremental(table, odd, batch_lsns=bl, start_batch_id=1000,
                    auto_compact=None)
    return table.read().select("user_id", "event_type", "value_cents", "props")


def q_cdc_debezium_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEBEZIUM ENVELOPE NORMALIZATION (SURVEY §2.1 row 13), value-gated:
    each event is serialized into a real Debezium change record (op c/r/u/d,
    before-image on deletes, after-image otherwise, source.lsn/ts_ms) with
    ``to_json``, then parsed back through the engine's actual Kafka-value
    path (``sources.debezium.from_value_column`` → ``normalize``).  The
    oracle recomputes the envelope directly from the table, so any
    parse/op-mapping/before-after-selection bug breaks the hash.  All
    JVM-side (`from_json`), no Python."""
    from datax_spark.sources import debezium as DBZ

    ev = _t(spark, sf_dir, "events")
    payload = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    row = F.struct(
        F.col("user_id"), F.col("event_type"),
        _cents("value").alias("value_cents"), F.col("props"),
    )
    op = (
        F.when(F.col("event_type") == "error", F.lit("d"))
        .when(F.col("event_type") == "purchase", F.lit("u"))
        .when(F.pmod("event_id", F.lit(13)) == 0, F.lit("r"))
        .otherwise(F.lit("c"))
    )
    # ts is TIMESTAMP_NTZ in the fixture parquet; the session pins UTC, so
    # the cast interprets the wall time exactly as DuckDB's epoch_ms does
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    value = F.to_json(
        F.struct(
            op.alias("op"),
            F.when(op == "d", row).alias("before"),
            F.when(op != "d", row).alias("after"),
            F.struct(
                F.col("event_id").alias("lsn"),
                ts_ms.alias("ts_ms"),
                F.lit("appdb").alias("db"),
                F.lit("events").alias("table"),
            ).alias("source"),
            ts_ms.alias("ts_ms"),
        )
    )
    env = DBZ.from_value_column(ev.select(value.alias("value")), payload)
    # shard is pmod(hash(key)) — engine-internal; ts returned as epoch ms
    return env.select(
        "lsn", "op", "user_id", "event_type", "value_cents", "props",
        F.unix_millis("ts").alias("ts_ms"),
    )


def q_cdc_maxwell_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXWELL ENVELOPE NORMALIZATION (the other common MySQL-binlog JSON
    shape; SURVEY §2.1 row 13), value-gated like the Debezium roundtrip:
    each event serialized as a Maxwell change record (type insert/update/
    delete/bootstrap-insert, full row in ``data`` for every type, ordering
    carried by (ts, xid, xoffset) — no LSN on the wire) with ``to_json``,
    then parsed back through ``sources.debezium.from_maxwell_value_column``.
    The oracle recomputes the synthesized LSN's bit split, the
    bootstrap-insert sentinel (lsn = -1 — snapshot rows carry no binlog
    position) and the op map directly, so any parse/ordering bug breaks
    the hash."""
    from datax_spark.sources import debezium as DBZ

    ev = _t(spark, sf_dir, "events")
    payload = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    row = F.struct(
        F.col("user_id"), F.col("event_type"),
        _cents("value").alias("value_cents"), F.col("props"),
    )
    typ = (
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .when(F.col("event_type") == "purchase", F.lit("update"))
        .when(F.pmod("event_id", F.lit(13)) == 0, F.lit("bootstrap-insert"))
        .otherwise(F.lit("insert"))
    )
    ts_s = (F.unix_millis(F.col("ts").cast("timestamp"))
            / F.lit(1000)).cast("long")
    live = typ != "bootstrap-insert"
    # real Maxwell bootstrap rows carry NO xid/xoffset (to_json drops the
    # nulls, so the wire shape is faithful: the fields are absent)
    xid = F.when(live, F.floor(F.col("event_id") / F.lit(4))).cast("long")
    xoff = F.when(live, F.pmod("event_id", F.lit(4))).cast("long")
    value = F.to_json(
        F.struct(
            F.lit("appdb").alias("database"),
            F.lit("events").alias("table"),
            typ.alias("type"),
            ts_s.alias("ts"),
            xid.alias("xid"),
            xoff.alias("xoffset"),
            (xoff == 3).alias("commit"),
            row.alias("data"),
            F.lit(None).cast(payload).alias("old"),
        )
    )
    env = DBZ.from_maxwell_value_column(
        ev.select(value.alias("value")), payload
    )
    return env.select(
        "lsn", "op", "user_id", "event_type", "value_cents", "props",
        (F.unix_millis("ts") / F.lit(1000)).cast("long").alias("ts_s"),
    )


def q_cdc_canal_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CANAL FLAT-MESSAGE NORMALIZATION (the binlog bridge of the
    reference's own ecosystem), value-gated like the other two envelope
    roundtrips: each event serialized as a Canal message (type INSERT/
    UPDATE/DELETE, ``data`` an ARRAY of stringly-typed rows — MySQL text
    protocol — ordering from (es, id, row position)) with ``to_json``,
    parsed back through ``sources.debezium.from_canal_value_column``,
    which explodes the array and casts the strings to the payload types.
    Multi-row message ordering is pinned by unit test; the oracle
    recomputes the LSN bit split, op map and text→typed casts."""
    from datax_spark.sources import debezium as DBZ

    ev = _t(spark, sf_dir, "events")
    payload = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    typ = (
        F.when(F.col("event_type") == "error", F.lit("DELETE"))
        .when(F.col("event_type") == "purchase", F.lit("UPDATE"))
        .otherwise(F.lit("INSERT"))
    )
    es = F.unix_millis(F.col("ts").cast("timestamp"))
    row_map = F.map_from_arrays(
        F.array(F.lit("user_id"), F.lit("event_type"),
                F.lit("value_cents"), F.lit("props")),
        F.array(
            F.col("user_id").cast("string"),
            F.col("event_type"),
            _cents("value").cast("string"),
            F.col("props"),
        ),
    )
    value = F.to_json(
        F.struct(
            F.lit("appdb").alias("database"),
            F.lit("events").alias("table"),
            typ.alias("type"),
            es.alias("es"),
            (es + 500).alias("ts"),
            F.col("event_id").cast("long").alias("id"),
            F.lit(False).alias("isDdl"),
            F.array(row_map).alias("data"),
            F.lit(None).cast("array<map<string,string>>").alias("old"),
        )
    )
    env = DBZ.from_canal_value_column(ev.select(value.alias("value")), payload)
    return env.select(
        "lsn", "op", "user_id", "event_type", "value_cents", "props",
        F.unix_millis("ts").alias("es_ms"),
    )


def q_file_delimited_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELIMITED READER SEMANTICS (SURVEY §2.1 row 8), value-gated: the
    events table is written as quoted CSV (nullFormat \\N, DataX writer
    shape) and read back through ``sources.file.read_delimited`` with the
    reference's column spec ({index,type,name} projection+cast plus a
    constant {value} column).  The oracle computes the same rows from the
    parquet directly — any delimiter/quote/cast/null-format bug breaks the
    value hash (doubles round-trip exactly through Java's shortest-repr
    CSV writer)."""
    from datax_spark.sources.file import read_delimited

    ev = _t(spark, sf_dir, "events")
    loc = tempfile.mkdtemp(prefix="dx_csv_")
    (
        ev.select("event_id", "user_id", "event_type", "value", "props")
        .write.mode("overwrite")
        .option("nullValue", "\\N")
        .csv(loc)
    )
    cols = [
        {"index": 0, "type": "long", "name": "event_id"},
        {"index": 1, "type": "long", "name": "user_id"},
        {"index": 2, "type": "string", "name": "event_type"},
        {"index": 3, "type": "double", "name": "value"},
        {"index": 4, "type": "string", "name": "props"},
        {"value": "csv", "type": "string", "name": "src"},
    ]
    df = read_delimited(spark, loc, columns=cols, null_format="\\N")
    return df.select(
        "event_id", "user_id", "event_type",
        _cents("value").alias("value_cents"), "props", "src",
    )


def q_cdc_dml_delete_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DML over the ingested table (lake/merge.delete_where /
    update_where — the DELETE FROM / UPDATE surface the reference reaches
    only through raw preSql statements): fold the feed, then
    UPDATE SET value_cents = value_cents + 1000 WHERE event_type='purchase'
    and DELETE WHERE event_type='click', both as ACID MOR merges.  The
    oracle applies the same mutations to the SQL fold."""
    from datax_spark.lake.merge import delete_where, update_where

    feed = _events_feed(_t(spark, sf_dir, "events"))
    loc = tempfile.mkdtemp(prefix="dx_dml_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = feed.agg(F.max("lsn")).collect()[0][0]
    run_incremental(table, feed, batch_lsns=max(1, (int(hi) + 2) // 2))
    update_where(
        table, [("event_type", "=", "purchase")],
        {"value_cents": F.col("value_cents") + F.lit(1000)},
    )
    delete_where(table, [("event_type", "=", "click")])
    return table.read().select(
        "user_id", "event_type", "value_cents", "props"
    )


def q_cdc_dedup_last_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The in-batch dedup operator alone: last event per key by max LSN
    (lake.merge.dedup_last_per_key — hash-agg max_by, no window sort)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("event_id").alias("lsn"), "event_type", _cents("value").alias("value_cents")
    )
    out = dedup_last_per_key(ev, ["user_id"], "lsn")
    return out.select(
        "user_id",
        F.col("lsn").alias("last_lsn"),
        F.col("event_type").alias("last_event_type"),
        F.col("value_cents").alias("last_value_cents"),
    )


def q_cdc_shard_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard consumption metrics — the lineage/metrics aggregate the
    applier commits with every batch (≈ DataX Communication counters)."""
    ev = _events_feed(_t(spark, sf_dir, "events"))
    byte_expr = (
        F.lit(48)
        + F.coalesce(F.octet_length("event_type"), F.lit(0))
        + F.coalesce(F.octet_length("props"), F.lit(0))
    )
    return ev.groupBy("shard").agg(
        F.count(F.lit(1)).alias("rows"),
        F.max("lsn").alias("last_lsn"),
        F.sum(byte_expr).alias("bytes"),
    )


def q_cdc_op_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Envelope op-mix accounting (read/write success counters analogue)."""
    ev = _events_feed(_t(spark, sf_dir, "events"))
    return ev.groupBy("op").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("lsn").alias("min_lsn"),
        F.max("lsn").alias("max_lsn"),
    )


def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation — the hot-key skew defense (SURVEY.md
    §2.6 JobAssignUtil analogue).  Salt = lsn % 8 splits a hot user across
    8 reducers for the partial agg; final agg re-combines.  Result is
    identical to the direct group-by (the oracle proves it)."""
    ev = _t(spark, sf_dir, "events")
    salted = ev.withColumn("__salt", F.pmod(F.col("event_id"), F.lit(8))).groupBy(
        "user_id", "__salt"
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(_cents("value")).alias("pv"),
    )
    return salted.groupBy("user_id").agg(
        F.sum("pn").alias("n_events"),
        F.sum("pv").alias("sum_value_cents"),
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows via lag-gap (>3600s starts a new session)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("sec")
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    gap = (F.col("sec") - F.lag("sec").over(w)).alias("gap")
    flagged = ev.select("user_id", gap)
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.lit(1)
            + F.sum(F.when(F.col("gap") > 3600, 1).otherwise(0))
        ).cast("long").alias("n_sessions"),
    )


# ============================================================ temporal joins
def q_asof_purchase_attrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (functions/temporal.asof_join): each error event matched
    to the same user's most recent purchase at-or-before it, within a
    3-day tolerance.  Engine = union + running last() window (one shuffle,
    no range explosion); oracle = DuckDB's native ASOF JOIN — an entirely
    independent implementation of the semantics."""
    from datax_spark.functions.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.col("event_id").alias("purchase_id"),
        _cents("value").alias("purchase_cents"),
    )
    res = asof_join(
        errors, purchases, on=["user_id"], left_time="ts", right_time="ts",
        how="inner", tolerance=3 * 86400.0, right_order="purchase_id",
    )
    return res.select(
        "event_id", "user_id",
        F.col("purchase_id_r").alias("purchase_id"),
        F.col("purchase_cents_r").alias("purchase_cents"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("ts_r").cast("timestamp"))
        ).alias("lag_us"),
    )


def q_asof_forward_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each signup matched to the same user's FIRST
    purchase at-or-after it, within 7 days.  The oracle runs DuckDB's
    (backward-only) ASOF JOIN over negated integer-µs timestamps — time
    reversal turns 'oldest at-or-after' into 'newest at-or-before'."""
    from datax_spark.functions.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts",
        F.col("event_id").alias("purchase_id"),
        _cents("value").alias("purchase_cents"),
    )
    res = asof_join(
        signups, purchases, on=["user_id"], left_time="ts", right_time="ts",
        how="inner", direction="forward", tolerance=7 * 86400.0,
        right_order="purchase_id",
    )
    return res.select(
        "event_id", "user_id",
        F.col("purchase_id_r").alias("purchase_id"),
        F.col("purchase_cents_r").alias("purchase_cents"),
        (
            F.unix_micros(F.col("ts_r").cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("lead_us"),
    )


def q_range_error_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval range join (functions/temporal.range_join): platform-wide
    error count inside each purchase's 10-minute window — a PURE non-equi
    time-overlap join (no shared key), the shape Catalyst alone can only
    nested-loop.  Banding (600s bands → ≤2 bands/interval) makes it an
    equi-join; zero-hit windows restored by a left join on the counts."""
    from datax_spark.functions.temporal import range_join

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    hits = range_join(errors, purchases, "ts", "w_start", "w_end",
                      band_width=600.0)
    counts = hits.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_errors")
    )
    return (
        purchases.select("purchase_id")
        .join(counts, "purchase_id", "left")
        .select(
            "purchase_id",
            F.coalesce("n_errors", F.lit(0)).cast("long").alias("n_errors"),
        )
    )


def q_temporal_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal table join (functions/temporal.temporal_table_join — Flink
    FOR SYSTEM_TIME AS OF): click facts enriched with the CDC dimension's
    state AS OF each fact's LSN, driven by the lake table's own commit log
    (per-commit winners; a matched delete yields NULL values).  The oracle
    replays the per-batch winner collapse in SQL and applies DuckDB's
    native ASOF JOIN over it."""
    from datax_spark.functions.temporal import temporal_table_join

    feed = _events_feed(_t(spark, sf_dir, "events"))
    loc = tempfile.mkdtemp(prefix="dx_ttj_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = feed.agg(F.max("lsn")).collect()[0][0]
    run_incremental(
        table, feed, batch_lsns=max(1, (int(hi) + 4) // 4), auto_compact=None
    )
    facts = feed.filter(F.col("event_type") == "click").select(
        "user_id", "lsn"
    )
    res = temporal_table_join(
        facts, table, on=["user_id"], fact_order="lsn",
        payload=["event_type", "value_cents"],
    )
    return res.select(
        "user_id", "lsn",
        F.col("_asof_lsn").alias("asof_lsn"),
        F.col("_asof_live").alias("asof_live"),
        F.col("event_type_dim").alias("dim_event_type"),
        F.col("value_cents_dim").alias("dim_value_cents"),
    )


# ========================================================== transformer chain
def q_tx_chain_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataX transformer chain (substr→pad→digest→filter) as one Catalyst
    plan (TransformerRegistry.java:34-39 built-ins)."""
    docs = _t(spark, sf_dir, "documents")
    reg = tx.TransformerRegistry()
    chain = [
        {"name": "dx_substr", "column": "text", "parameters": [0, 16], "as": "head"},
        {"name": "dx_pad", "column": "lang", "parameters": ["l", 8, "*"], "as": "lang_pad"},
        {"name": "dx_digest", "column": "text", "parameters": ["md5", "toLower"], "as": "digest"},
        {"name": "dx_filter", "column": "n_chars", "parameters": ["<", 200]},
    ]
    return reg.apply_chain(docs, chain).select("doc_id", "head", "lang_pad", "digest")


def q_tx_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dx_replace splice (ReplaceTransformer.java:21-65): mask the 0-based
    char range [4, 8) of the source tag."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", tx.dx_replace("source", 4, 4, "####").alias("masked")
    )


def q_tx_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dx_filter like = anchored Java-regex full match
    (FilterTransformer.java:294-310): drop sources matching 'src1.*'."""
    docs = _t(spark, sf_dir, "documents")
    return tx.dx_filter(docs, "source", "like", "src1.*").select("doc_id", "source")


# =========================================================== split planning
def q_split_minmax_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK-range split planning (SingleTableSplitUtil.java:34-130 rebuild):
    min/max scan + 8 even integer ranges, computed distributed (no driver
    loop; the tiny agg row is cross-joined to the split ids)."""
    bounds = _t(spark, sf_dir, "orders").agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    splits = spark.range(8).select(F.col("id").alias("split_id"))
    j = splits.crossJoin(F.broadcast(bounds))
    return j.select(
        "split_id",
        "n_rows",
        F.expr("lo + (hi - lo + 1) * split_id div 8").cast("long").alias("lo_bound"),
        F.expr("lo + (hi - lo + 1) * (split_id + 1) div 8 - 1").cast("long").alias("hi_bound"),
    )


def q_split_quantile_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-height (quantile) split planning — the rebuild of DataX's
    sampling-based split for skewed/sparse PKs (SingleTableSplitUtil.java:
    305-398: Oracle SAMPLE → sorted sample → evenly spaced split points).
    ntile(8) over the PK is the exact spec; the production scale path
    (sources.split.quantile_split_bounds, approxQuantile — no global sort)
    is property-tested against it in tests/test_sources.py."""
    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    t = o.select(
        "o_orderkey", F.ntile(8).over(w).cast("long").alias("split_id")
    )
    return t.groupBy("split_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_orderkey").alias("lo_bound"),
        F.max("o_orderkey").alias("hi_bound"),
    )


# ================================================================== TPC-H-ish
def q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("count_order"),
        F.sum(F.col("l_quantity")).cast("long").alias("sum_qty"),
        F.sum(_cents("l_extendedprice")).alias("sum_base_price_cents"),
        F.sum(_cents(disc_price)).alias("sum_disc_price_cents"),
        F.sum(_cents("l_discount")).alias("sum_discount_cents"),
    )


def q_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan-heavy filter + agg: the predicate-pushdown showcase (filters
    reach the parquet scan; assert via plans.checks in tests)."""
    li = _t(spark, sf_dir, "lineitem")
    sel = li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01"))
        & (F.col("l_shipdate") < F.lit("1995-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return sel.agg(
        F.sum(_cents(F.col("l_extendedprice") * F.col("l_discount"))).alias(
            "revenue_cents"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-way star join (region→nation→customer/supplier→orders→lineitem)
    with broadcast dims — the join-reordering/broadcast showcase."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-01-01"))
    )
    lineitem = _t(spark, sf_dir, "lineitem")
    j = (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            supplier,
            (lineitem.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return j.groupBy("n_name").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue_cents"
        )
    )


def q_events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation (F.window) — the batch twin
    of the Structured-Streaming windowed agg; oracle uses date_trunc."""
    ev = _t(spark, sf_dir, "events")
    w = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), F.col("event_type")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_cents("value")).alias("sum_value_cents"),
    )
    return w.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value_cents",
    )


def q_tx_pandas_udf_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dx_groovy escape hatch (GroovyTransformer.java:25-88) as an
    Arrow-vectorized pandas UDF: user text normalization.  The oracle
    reproduces it in SQL — proving the vectorized path, not just native
    exprs, matches cross-engine."""

    @F.pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        return s.fillna("").str.strip().str.lower().str.replace(
            r"\s+", " ", regex=True
        )

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", norm(F.col("text")).alias("norm_text"),
        F.md5(norm(F.col("text"))).alias("norm_md5"),
    )


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (event_type → value band → grand total)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "value_band", (F.floor(F.col("value") / 25) * 25).cast("long")
    )
    return ev.rollup("event_type", "value_band").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_cents("value")).alias("sum_value_cents"),
    )


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first signup precedes their first view
    precedes their first purchase (conditional min aggregation + ordering
    predicate — the sequential-pattern primitive)."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("event_id"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "view", F.col("event_id"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("event_id"))).alias("first_purchase"),
    )
    return firsts.filter(
        F.col("first_signup").isNotNull()
        & F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_signup") < F.col("first_view"))
        & (F.col("first_view") < F.col("first_purchase"))
    ).select("user_id", "first_signup", "first_view", "first_purchase")


def q_semi_join_shipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): order-priority mix of orders with at least
    one line shipped after the cutoff."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01")
    )
    sel = o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
    return sel.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


def q_anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders, by segment."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    idle = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(_cents("c_acctbal")).alias("sum_acctbal_cents"),
    )


def q_q3_top_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-heavy shipping-priority query; the small filtered customer dim
    is broadcast (DataX outsources joins to the source DB — SURVEY.md §2.4;
    here they're first-class)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
    )
    rev = j.groupBy("l_orderkey", "o_orderdate").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue_cents"
        )
    )
    return (
        rev.orderBy(F.col("revenue_cents").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            # emit as a formatted string: DuckDB types raw dates/timestamps
            # differently than Spark and the driver hash compares typed values
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "revenue_cents",
        )
    )


def q_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped correlated EXISTS: orders in a six-month window with
    at least one line shipped after the order date, counted by priority.
    The EXISTS is a left-semi hash join on the equi key with the non-equi
    date predicate as a join residual — no subquery re-execution per row."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


def q_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped two-nation trade volume by year.  The nation dims are
    pre-filtered to the two trading nations BEFORE the join (shrinks the
    probe fan-in at scale), broadcast, and the cross-pair predicate is
    applied post-join."""
    pair = ("NATION_1", "NATION_2")
    n1 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("s_nk"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue_cents"
        )
    )


def q_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: top 20 customers by lost revenue on returned items
    in one quarter; customer/nation dims broadcast, sort-limit top-N."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    rev = j.groupBy(
        "c_custkey", "c_name", _cents("c_acctbal").alias("acctbal_cents"), "n_name"
    ).agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue_cents"
        )
    )
    return rev.orderBy(F.col("revenue_cents").desc(), F.col("c_custkey")).limit(20)


def q_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promo-revenue share: lineitem x part (broadcast dim)
    over one quarter, conditional vs total sums as exact cents (no float
    division cross-engine)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01"))
    )
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    disc = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0))).alias(
            "promo_revenue_cents"
        ),
        F.sum(disc).alias("total_revenue_cents"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume orders: HAVING sum(quantity) > 300 on a
    map-side-combinable hash agg, then join back to orders + customer."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = big.join(o, big.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    return j.select(
        "c_custkey",
        "c_name",
        F.col("l_orderkey").alias("o_orderkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        _cents("o_totalprice").alias("totalprice_cents"),
        "total_qty",
    )


def q_top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-N per key: 3 highest-value orders per market segment via
    a rank window (deterministic tiebreak on orderkey).  At scale this is
    the partial-top-N pattern AQE handles with a window + filter — no global
    sort."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderkey", _cents("o_totalprice").alias("price_cents")
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("price_cents").desc(), F.col("o_orderkey")
    )
    return (
        j.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("c_mktsegment", "rank", "o_orderkey", "price_cents")
    )


def q_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped national market share: within ASIA-customer orders
    for ECONOMY parts over 1996-1997, NATION_3-supplied revenue vs total,
    per year.  Returned as numerator/denominator cents (BIGINT) — the
    final division is a client-side detail and doubles don't hash stably
    across engines.  Dims (region→nation, filtered part) broadcast; the
    fact table shuffles once per join key."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("c_nk")
    )
    sn = n.select(F.col("n_nationkey").alias("s_nk"),
                  F.col("n_name").alias("supp_nation"))
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    j = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("c_nk"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("s_nk"))
    )
    vol = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return j.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        F.coalesce(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", vol)), F.lit(0)
        ).cast("long").alias("nation_cents"),
        F.sum(vol).cast("long").alias("total_cents"),
    )


def q_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer order-count distribution (the reduced
    testdata ships no o_comment, so the comment exclusion is dropped):
    LEFT join keeps zero-order customers — the q13 trap — then a
    two-level aggregation.  Both shuffles are on high-cardinality keys;
    no broadcast needed."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: quarterly revenue per supplier, keep
    the max-revenue supplier(s).  The 1-row global max is broadcast back
    against the per-supplier aggregate — no window over a single
    partition, no collect."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        ).cast("long").alias("total_revenue_cents")
    )
    mx = rev.agg(F.max("total_revenue_cents").alias("__mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx),
                 rev.total_revenue_cents == F.col("__mx"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select(
            F.col("s_suppkey").cast("long").alias("s_suppkey"),
            "s_name", "total_revenue_cents",
        )
    )


def q_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped small-quantity-order revenue for one brand (the
    reduced testdata ships no p_container): lineitems under 20% of their
    part's average quantity.  The per-part average is a partial-agg
    groupBy re-joined on l_partkey (shuffle on the join key) — not a
    window over the fact table.  Totals in BIGINT cents + item count; the
    /7.0 'avg_yearly' division is client-side."""
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#3"
    ).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    avg_q = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.avg("l_quantity").alias("__avg_q")
    )
    small = li.join(F.broadcast(avg_q), F.col("l_partkey") == F.col("__pk")) \
        .filter(F.col("l_quantity") < 0.2 * F.col("__avg_q"))
    return small.agg(
        F.coalesce(F.sum(_cents("l_extendedprice")), F.lit(0))
        .cast("long").alias("total_cents"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate revenue (brand × size-range ×
    quantity-range ORs; the reduced testdata ships no p_container or
    l_shipmode).  The filtered part side broadcasts; the OR-of-ANDs stays
    one Column expression so Catalyst can prune part columns and push the
    brand disjunction into the part scan."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    pred = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10)
         & q.between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 20)
           & q.between(10, 25))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 30)
           & q.between(20, 35))
    )
    return j.filter(pred).agg(
        F.coalesce(
            F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))),
            F.lit(0),
        ).cast("long").alias("revenue_cents")
    )


def q_q22_rich_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped: customers with above-average balance and no orders.
    The global-average scalar subquery is computed as exact integer
    (cents x count > total) to avoid cross-engine float-boundary flips; the
    1-row aggregate is broadcast; NOT EXISTS is a left-anti join."""
    c = _t(spark, sf_dir, "customer").withColumn(
        "acctbal_cents", _cents("c_acctbal")
    )
    stats = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum("acctbal_cents").alias("__tot"), F.count(F.lit(1)).alias("__n")
    )
    rich = c.join(F.broadcast(stats)).filter(
        F.col("acctbal_cents") * F.col("__n") > F.col("__tot")
    )
    o = _t(spark, sf_dir, "orders")
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("acctbal_cents").alias("sum_acctbal_cents"),
    )


# ========================================================== dedup / text ops
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.exact_dedup_groups(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        n=3, threshold=0.12, max_df=100,
    )


def q_dedup_ngram_jaccard_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-then-verify Jaccard: MinHash-band candidate pruning before the
    exact shingle-intersection join — the 100-TB path (the exact variant's
    quadratic shingle-join mass shrinks to the candidate neighborhood)."""
    return DD.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        n=3, threshold=0.12, max_df=100, prefilter_k=8, prefilter_bands=4,
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3, k=8, bands=4
    )


def q_dedup_cluster_keep_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END of the dedup pipeline: near-dup pairs (exact jaccard, same
    params as dedup_ngram_jaccard) → connected components (distributed
    min-label propagation, functions/dedup.connected_components) → one
    surviving doc per cluster + (component, n_dups) provenance.  The
    oracle recomputes the transitive closure with a DuckDB RECURSIVE CTE
    — an entirely independent implementation of reachability."""
    docs = _t(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.12, max_df=100
    )
    return DD.dedup_keep_one(docs, pairs, "doc_id").select(
        "doc_id", "component", "n_dups"
    )


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (the 4x storage cut a vector
    corpus takes before ANN indexing): per-vector max-abs scale, values →
    round(x*127/max_abs) via floor(x+0.5) — floor keeps Spark and DuckDB
    bit-identical where banker's-vs-half-up round() would drift.  The
    vector is emitted as a canonical comma string so the driver hash
    compares scalars."""
    from datax_spark.functions import similarity as SIM

    q = SIM.quantize_embeddings(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding"
    )
    return q.select(
        "vec_id",
        F.col("max_abs"),
        F.concat_ws(",", F.col("q_vec").cast("array<string>"))
        .alias("q_vec_str"),
    )


def q_text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical retrieval: Okapi BM25 top-20 for a fixed query over the
    documents corpus (functions/retrieval.bm25_topk — one tokenize pass,
    postings joined to the broadcast query terms, hash-agg fold; the
    inverted-index cost expressed relationally).  The oracle recomputes
    BM25 in DuckDB SQL; scores round to 6dp on both sides, avgdl is an
    exact integer-sum division, ties break by doc_id."""
    from datax_spark.functions import retrieval as R

    return R.bm25_topk(
        _t(spark, sf_dir, "documents"), "merge table scan", k=20
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return DD.simhash_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    feats = TXT.quality_features("text")
    return docs.select("doc_id", *[c.alias(n) for n, c in feats.items()])


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", TXT.lang_id("text").alias("pred_lang"))


def q_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails → IPv4 → phones, C4-style pre-training scrub):
    the corpus carries no PII, so each doc is deterministically enriched
    with one of each category derived from doc_id — the oracle rebuilds
    the identical text and re-runs the same ordered regex cascade, so the
    scrubbed string AND the per-category counts must match byte-for-byte.
    Pure Column expressions (regexp_replace/regexp_count): per-row, no
    shuffle, whole-stage codegen at any corpus size."""
    from datax_spark.functions import scrub as SCR

    docs = _t(spark, sf_dir, "documents")
    enriched = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com via 10.0."),
            (F.col("doc_id") % 200).cast("string"), F.lit("."),
            (F.col("doc_id") % 250).cast("string"),
            F.lit(" or +1 555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        ).alias("t"),
    )
    counts = SCR.pii_counts("t")
    return enriched.select(
        "doc_id", SCR.pii_scrub("t").alias("scrubbed"),
        *[c.alias(n) for n, c in counts.items()],
    )


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonicalization (functions/scrub.normalize_text — the
    C4/CCNet-style cleanup pass): NFC via an Arrow-batched pandas UDF (no
    JVM normalizer exists), then control-char strip / space-run collapse /
    newline tidying as native regexp_replace.  The corpus is ASCII, so
    each doc is enriched with deterministic unicode dirt (a combining
    accent that NFC must compose, a BEL control, double spaces); DuckDB
    rebuilds the same dirty text and applies nfc_normalize + the identical
    regex cascade — byte-for-byte."""
    from datax_spark.functions import scrub as SCR

    docs = _t(spark, sf_dir, "documents")
    # decomposed e + U+0301: NFC must fuse it into one codepoint
    dirty = F.concat(
        F.lit("  cafe\u0301 \x07 "), F.col("text"),
        F.lit(" tail\tend  "),
    )
    return docs.select(
        "doc_id",
        SCR.normalize_text(dirty).alias("norm_text"),
        F.length(SCR.normalize_text(dirty)).cast("long").alias("norm_len"),
    )


def q_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination hygiene pass (functions/scrub.py
    contamination_report): every corpus document sharing ≥5 distinct
    3-word shingles with the synthetic "eval set" (docs with
    doc_id % 37 == 0), with the shared count and the doc's shingle count.
    Eval shingles broadcast; the corpus side never shuffles its text."""
    from datax_spark.functions.scrub import contamination_report

    docs = _t(spark, sf_dir, "documents")
    return contamination_report(
        docs, docs.filter(F.col("doc_id") % 37 == 0),
        "doc_id", "text", n=3, min_shared=5,
    )


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition-quality signals: duplicate word mass and the
    most-frequent-2-gram share, reported as exact integer numerators /
    denominators (hash-stable across engines).  Two map-side-combinable
    hash-aggs keyed by the document — no hot keys, scale-safe."""
    from datax_spark.functions import scrub as SCR

    return SCR.repetition_features(_t(spark, sf_dir, "documents"))


def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM token accounting: whitespace word count vs BPE-ish pre-tokenizer
    count (the GPT-2 split rule — contractions and punctuation runs become
    their own tokens) plus the distinct-token vocabulary size per doc.  One
    JVM regex pass per row, no shuffle; the oracle runs the IDENTICAL
    pattern (Java∩RE2 subset) through DuckDB's RE2."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TXT.token_count("text").alias("n_words"),
        TXT.bpe_token_count("text").alias("n_bpe"),
        F.size(F.array_distinct(TXT.bpe_tokens("text")))
        .cast("long").alias("n_bpe_distinct"),
    )


def q_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document exact dedup (the C4/RefinedWeb paragraph pass): each
    distinct paragraph survives only at its globally first (doc, position)
    occurrence and documents are reassembled without the repeats.  One
    hash-agg keyed by md5(paragraph) picks winners — no corpus-wide window,
    no all-pairs.  The oracle rebuilds the same winners and reassembled
    text in SQL, so a wrong winner, order, or join breaks the hash."""
    docs = _t(spark, sf_dir, "documents")
    return DD.paragraph_dedup(docs, "doc_id", "text", para_words=10)


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for data mixing: downsample 'en',
    keep all 'zh', default 10% for the rest — decisions keyed on
    md5(doc_id), so the kept set is identical across runs, partitionings,
    and engines (the oracle re-derives it bit-for-bit in SQL)."""
    docs = _t(spark, sf_dir, "documents")
    return SMP.stratified_hash_sample(
        docs, "lang", {"en": 0.3, "zh": 1.0, "fr": 0.5},
        key_cols=["doc_id"], default=0.1, salt="s1",
    ).select("doc_id", "lang")


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: greedy contiguous token-budget packs per language
    (context-window construction).  One window cumsum per stratum; the
    oracle replays the identical rule in SQL."""
    docs = _t(spark, sf_dir, "documents")
    packed = SMP.pack_sequences(
        docs, SMP.token_count("text"), budget=512,
        order_col="doc_id", strata_cols=["lang"],
    )
    return packed.select(
        "doc_id", "lang",
        F.col("__tokens").alias("n_tokens"),
        F.col("pack_id").cast("long").alias("pack_id"),
    )


def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjoint deterministic train/val/test split: one hash draw,
    cumulative-weight ranges — adding files or re-running never moves a
    row between splits.  The oracle re-derives membership bit-for-bit."""
    docs = _t(spark, sf_dir, "documents")
    return SMP.hash_split(
        docs, ["doc_id"], {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="sp",
    ).select("doc_id", "split")


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking: fixed token windows with overlap carried between
    consecutive chunks (sequence+posexplode+slice — no shuffle, no Python).
    The oracle rebuilds every chunk string in SQL."""
    docs = _t(spark, sf_dir, "documents")
    return SMP.chunk_documents(
        docs, "text", chunk_tokens=64, overlap=16,
        keep_cols=["doc_id", "lang"],
    )


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(TXT.token_count("text") >= 4)
    return docs.select("doc_id", TXT.doc_fingerprint("text", 4).alias("fingerprint"))


# ======================================================== similarity search
def q_embed_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=3)


def q_ann_bucketed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.ann_bucketed_topk(emb, emb.filter(F.col("vec_id") < 20), k=3, nbits=8)


def q_ivf_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained-IVF partition function: deterministic Lloyd's k-means (k=8,
    2 iterations, integer fixed-point centroid sums) — every vector's final
    cluster.  The oracle replays the identical iterations in SQL."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = SIM.kmeans_lite(emb, k=8, n_iters=2)
    return SIM.kmeans_assign(emb, cents)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k over the trained IVF lists (nprobe=1): each query ranks
    exact cosine inside its nearest centroid's inverted list only."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.ivf_topk(
        emb, emb.filter(F.col("vec_id") < 20), k=3, n_centroids=8, n_iters=2
    )


def q_embed_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.cosine_pairs(emb, threshold=0.4, nbits=4)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload pipeline: attach payload+metadata → Arrow mapInPandas
    feature kernel (deterministic byte histogram over the utf-8 payload).
    The DuckDB oracle reproduces the kernel over the blob's hex expansion —
    the mapInPandas path gets a full value gate, not a rows-only check."""
    from datax_spark.functions import multimodal as MM

    docs = MM.attach_fake_binary(_t(spark, sf_dir, "documents"), "text")
    feats = MM.fake_feature_extract(docs, dims=8)
    return feats.select(
        "doc_id",
        F.round(F.element_at("feature", 1), 6).alias("f0"),
        F.round(F.element_at("feature", 2), 6).alias("f1"),
    )


def q_multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stand-in decode kernel (mapInPandas: payload → mime/n_bytes/
    byte-sum checksum) — the second Arrow-kernel path under a value oracle."""
    from datax_spark.functions import multimodal as MM

    docs = MM.attach_fake_binary(_t(spark, sf_dir, "documents"), "text")
    return MM.fake_decode_meta(docs)


def q_multimodal_decode_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: each doc's utf-8 bytes are laid out as
    RGB pixels and encoded as an actual 24-bit BI_RGB BMP file; the decode
    kernel (pure-numpy header parse, bottom-up rows, stride padding, BGR
    flip — functions/multimodal.py bmp_decode) recovers dimensions + exact
    per-channel sums.  The oracle recomputes them from the text bytes, so
    any header/stride/channel-order bug breaks the value hash."""
    from datax_spark.functions import multimodal as MM

    docs = MM.attach_bmp_binary(_t(spark, sf_dir, "documents"), "text")
    return MM.decode_image(docs)


def q_multimodal_decode_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: each doc's utf-8 bytes become centered
    int16 PCM samples encoded as an actual RIFF/WAVE file; the decode
    kernel (pure-numpy chunk walk + PCM parse — functions/multimodal.py
    wav_decode) recovers rate/channels/sample stats.  The oracle recomputes
    them from the text bytes, so any header/chunk/endianness bug breaks
    the value hash."""
    from datax_spark.functions import multimodal as MM

    docs = MM.attach_wav_binary(_t(spark, sf_dir, "documents"), "text")
    return MM.decode_audio(docs)


def q_multimodal_decode_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode + frame sampling end-to-end: each doc's utf-8
    bytes become consecutive 8×2 RGB frames inside an actual AVI container
    (RIFF LIST tree, uncompressed DIB frames); the decode kernel walks the
    container, samples every 2nd frame — the decode-budget pattern of a
    training pipeline — and sums channels over the sampled frames only.
    The oracle recomputes the sampled-byte sums from the text, so any
    container/stride/sampling bug breaks the value hash."""
    from datax_spark.functions import multimodal as MM

    docs = MM.attach_avi_binary(_t(spark, sf_dir, "documents"), "text")
    return MM.decode_video(docs)


# ================================================================= registry
_DOC_SHINGLES_3 = r"""
w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(w[i:i+2], ' ') AS shingle
       FROM w, LATERAL (SELECT unnest(range(1, len(w)-1)) AS i) t)
"""

# Deterministic Lloyd's k-means (k=8, 2 iterations) replayed in SQL: init =
# 8 lowest-id vectors; score = |c|^2 - 2 v.c (list_dot_product is bit-equal
# to the engines' sequential fold — verified); centroid sums are integer
# fixed-point so accumulation order cannot perturb them; element = s/n/1e6,
# the same two IEEE divisions Python computes.  Ends with a2(vec_id, cid).
_KMEANS_CTE = """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings),
fx AS (SELECT vec_id, vec,
              list_transform(vec, x -> CAST(round(x*1000000) AS BIGINT)) AS fv
       FROM v),
c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid,
              vec AS cvec
       FROM (SELECT * FROM v ORDER BY vec_id LIMIT 8)),
s1 AS (SELECT f.vec_id, c.cid,
              list_dot_product(c.cvec, c.cvec) - 2*list_dot_product(f.vec, c.cvec) AS score
       FROM fx f CROSS JOIN c0 c),
r1 AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rn FROM s1),
a1 AS (SELECT vec_id, cid FROM r1 WHERE rn = 1),
u1 AS (SELECT a1.cid, generate_subscripts(f.fv, 1) AS pos, unnest(f.fv) AS val
       FROM a1 JOIN fx f USING (vec_id)),
g1 AS (SELECT cid, pos, sum(val)::BIGINT AS s, count(*) AS n FROM u1 GROUP BY 1, 2),
c1 AS (SELECT cid, list(s / n / 1000000.0 ORDER BY pos) AS cvec FROM g1 GROUP BY cid),
s2 AS (SELECT f.vec_id, c.cid,
              list_dot_product(c.cvec, c.cvec) - 2*list_dot_product(f.vec, c.cvec) AS score
       FROM fx f CROSS JOIN c1 c),
r2 AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rn FROM s2),
a2i AS (SELECT vec_id, cid FROM r2 WHERE rn = 1),
u2 AS (SELECT a2i.cid, generate_subscripts(f.fv, 1) AS pos, unnest(f.fv) AS val
       FROM a2i JOIN fx f USING (vec_id)),
g2 AS (SELECT cid, pos, sum(val)::BIGINT AS s, count(*) AS n FROM u2 GROUP BY 1, 2),
c2 AS (SELECT cid, list(s / n / 1000000.0 ORDER BY pos) AS cvec FROM g2 GROUP BY cid),
s3 AS (SELECT f.vec_id, c.cid,
              list_dot_product(c.cvec, c.cvec) - 2*list_dot_product(f.vec, c.cvec) AS score
       FROM fx f CROSS JOIN c2 c),
r3 AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score, cid) AS rn FROM s3),
a2 AS (SELECT vec_id, cid FROM r3 WHERE rn = 1)
"""


# Changelog-with-images rows — shared by the direct read and the
# Debezium CDC-out serialization roundtrip (which must lose nothing).
_IMAGES_SQL = """
WITH p AS (SELECT CAST((max(event_id) + 4) // 4 AS BIGINT) AS bl FROM events),
e AS (
  SELECT e.user_id, e.event_type,
         CAST(round(e.value*100) AS BIGINT) AS value_cents, e.props,
         CAST(e.event_id AS BIGINT) AS lsn, e.event_id // p.bl AS b,
         e.event_type = 'error' AS is_del,
         row_number() OVER (PARTITION BY e.user_id, e.event_id // p.bl
                            ORDER BY e.event_id DESC) AS rn
  FROM events e CROSS JOIN p),
win AS (SELECT * FROM e WHERE rn = 1),
seq AS (
  SELECT *,
    lag(event_type)  OVER (PARTITION BY user_id ORDER BY b) AS p_et,
    lag(value_cents) OVER (PARTITION BY user_id ORDER BY b) AS p_vc,
    lag(props)       OVER (PARTITION BY user_id ORDER BY b) AS p_pr,
    lag(is_del)      OVER (PARTITION BY user_id ORDER BY b) AS p_del
  FROM win)
SELECT user_id, event_type, value_cents, props,
       'insert' AS change_type, lsn AS change_lsn
FROM seq WHERE NOT is_del AND (p_del IS NULL OR p_del)
UNION ALL
SELECT user_id, p_et, p_vc, p_pr, 'update_before', lsn
FROM seq WHERE NOT is_del AND p_del = false
UNION ALL
SELECT user_id, event_type, value_cents, props, 'update_after', lsn
FROM seq WHERE NOT is_del AND p_del = false
UNION ALL
SELECT user_id, p_et, p_vc, p_pr, 'delete', lsn
FROM seq WHERE is_del AND p_del = false
"""

_ORACLES: dict[str, str] = {
    "cdc_merge_apply_e2e": _CDC_FOLD_ORACLE,
    # file-scoped COW: the same update(+777 on k%4==0)/delete(k%20==0)
    # set over the low eighth of the key space, replayed in SQL
    "cdc_merge_cow_clustered": """
WITH base AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderpriority AS prio,
         CAST(round(o_totalprice*100) AS BIGINT) AS total_cents
  FROM orders),
lim AS (SELECT CAST(max(k) // 8 AS BIGINT) AS cut FROM base)
SELECT k, prio,
       CASE WHEN k <= cut AND k % 4 = 0 THEN total_cents + 777
            ELSE total_cents END AS total_cents
FROM base CROSS JOIN lim
WHERE NOT (k <= cut AND k % 20 = 0)
""",
    # the SQL fold + the same row-level mutations delete_where/update_where
    # applied (order matters only for rows hit by both — none here, the
    # predicates are disjoint event_types)
    "cdc_dml_delete_update": """
WITH ranked AS (
  SELECT user_id, event_type, CAST(round(value*100) AS BIGINT) AS value_cents,
         props, event_type = 'error' AS is_delete,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events),
state AS (SELECT user_id, event_type, value_cents, props
          FROM ranked WHERE rn = 1 AND NOT is_delete)
SELECT user_id, event_type,
       CASE WHEN event_type = 'purchase' THEN value_cents + 1000
            ELSE value_cents END AS value_cents,
       props
FROM state WHERE event_type <> 'click'
""",
    "cdc_agg_view": """
WITH ranked AS (
  SELECT user_id, event_type, CAST(round(value*100) AS BIGINT) AS value_cents,
         event_type = 'error' AS is_delete,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events),
state AS (SELECT event_type, value_cents FROM ranked WHERE rn = 1 AND NOT is_delete)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(value_cents) AS BIGINT) AS sum_value_cents,
       CAST(min(value_cents) AS BIGINT) AS min_value_cents,
       CAST(max(value_cents) AS BIGINT) AS max_value_cents
FROM state GROUP BY event_type
""",
    "cdc_agg_view_incr": """
WITH base AS (
  SELECT o_orderkey AS k, o_orderpriority AS prio,
         CAST(round(o_totalprice*100) AS BIGINT) AS total_cents
  FROM orders),
final AS (
  SELECT k, prio,
         CASE WHEN k % 97 = 0 THEN total_cents + 1000
              ELSE total_cents END AS total_cents
  FROM base WHERE NOT (k % 97 = 0 AND k % 291 = 0))
SELECT prio, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(total_cents) AS BIGINT) AS sum_total_cents,
       CAST(min(total_cents) AS BIGINT) AS min_total_cents,
       CAST(max(total_cents) AS BIGINT) AS max_total_cents
FROM final GROUP BY prio
""",
    # incremental join view: fold both change sets (each key has at most one
    # change event, so the fold is a CASE over the base row), then join
    # one-shot — the incrementally-maintained view must equal it.
    "cdc_join_view": """
WITH fact AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k,
         CASE WHEN o_orderkey % 53 = 0 AND o_custkey > 1
              THEN CAST(o_custkey AS BIGINT) - 1
              ELSE CAST(o_custkey AS BIGINT) END AS custkey,
         CAST(round(o_totalprice*100) AS BIGINT)
           + CASE WHEN o_orderkey % 97 = 0 THEN 1000 ELSE 0 END AS total_cents,
         o_orderpriority AS prio
  FROM orders WHERE o_orderkey % 291 <> 0),
dim AS (
  SELECT CAST(c_custkey AS BIGINT) AS ck,
         CASE WHEN c_custkey % 13 = 0 THEN 'REWIRED'
              ELSE c_mktsegment END AS seg,
         CAST(round(c_acctbal*100) AS BIGINT)
           + CASE WHEN c_custkey % 13 = 0 THEN 500 ELSE 0 END AS acct_cents
  FROM customer WHERE c_custkey % 417 <> 0)
SELECT f.k, f.custkey, f.total_cents, f.prio, d.seg, d.acct_cents
FROM fact f JOIN dim d ON f.custkey = d.ck
""",
    "cdc_join_view_left": """
WITH fact AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k,
         CASE WHEN o_orderkey % 53 = 0 AND o_custkey > 1
              THEN CAST(o_custkey AS BIGINT) - 1
              ELSE CAST(o_custkey AS BIGINT) END AS custkey,
         CAST(round(o_totalprice*100) AS BIGINT)
           + CASE WHEN o_orderkey % 97 = 0 THEN 1000 ELSE 0 END AS total_cents,
         o_orderpriority AS prio
  FROM orders WHERE o_orderkey % 291 <> 0),
dim AS (
  SELECT CAST(c_custkey AS BIGINT) AS ck,
         CASE WHEN c_custkey % 13 = 0 THEN 'REWIRED'
              ELSE c_mktsegment END AS seg,
         CAST(round(c_acctbal*100) AS BIGINT)
           + CASE WHEN c_custkey % 13 = 0 THEN 500 ELSE 0 END AS acct_cents
  FROM customer WHERE c_custkey % 417 <> 0)
SELECT f.k, f.custkey, f.total_cents, f.prio, d.seg, d.acct_cents
FROM fact f LEFT JOIN dim d ON f.custkey = d.ck
""",
    "cdc_merge_apply_dv": _CDC_FOLD_ORACLE,
    # writeMode=update fold: clicks patch only value_cents; full upserts set
    # everything; a delete wipes the row so later patches rebuild from
    # nothing.  Per column: value at the last live event COVERING it after
    # the last delete (value joins, not arg_max — DuckDB's arg_max skips
    # NULL values, which would break explicit-NULL sets).
    "cdc_partial_update": """
WITH ev AS (
  SELECT event_id AS lsn, user_id,
         event_type = 'error' AS is_del,
         event_type = 'click' AS is_patch,
         event_type,
         CAST(round(value*100) AS BIGINT) AS value_cents,
         props
  FROM events),
d AS (
  SELECT user_id, max(CASE WHEN is_del THEN lsn END) AS dl
  FROM ev GROUP BY user_id),
live AS (
  SELECT ev.* FROM ev JOIN d ON ev.user_id = d.user_id
  WHERE NOT is_del AND lsn > coalesce(dl, -1)),
fold AS (
  SELECT user_id,
         max(CASE WHEN NOT is_patch THEN lsn END) AS l_full,
         max(lsn) AS l_any
  FROM live GROUP BY user_id)
SELECT f.user_id,
       ef.event_type AS event_type,
       ea.value_cents AS value_cents,
       ef.props AS props
FROM fold f
JOIN live ea ON ea.user_id = f.user_id AND ea.lsn = f.l_any
LEFT JOIN live ef ON ef.user_id = f.user_id AND ef.lsn = f.l_full
""",
    "cdc_stream_available_now": _CDC_FOLD_ORACLE,
    # live tail (files landing mid-query) == bounded drain == direct apply
    "cdc_stream_continuous": _CDC_FOLD_ORACLE,
    # relay through the commit log == direct apply (same fold)
    "cdc_mirror_relay": _CDC_FOLD_ORACLE,
    # stage→audit→publish == direct apply (same fold)
    "cdc_wap_publish": _CDC_FOLD_ORACLE,
    # read_changes replay: the change stream is exactly the per-batch
    # last-event-per-key winners (batch window = lsn // batch_lsns with
    # batch_lsns = (max_lsn + 4) // 4, the suite ingest's granularity),
    # tombstones included with change_type='delete'.
    "cdc_changelog_read": """
WITH p AS (SELECT CAST((max(event_id) + 4) // 4 AS BIGINT) AS bl FROM events),
w AS (
  SELECT e.user_id, e.event_type,
         CAST(round(e.value*100) AS BIGINT) AS value_cents, e.props,
         e.event_id,
         CASE WHEN e.event_type = 'error' THEN 'delete' ELSE 'upsert' END
           AS change_type,
         row_number() OVER (PARTITION BY e.user_id, e.event_id // p.bl
                            ORDER BY e.event_id DESC) AS rn
  FROM events e CROSS JOIN p)
SELECT user_id, event_type, value_cents, props, change_type,
       CAST(event_id AS BIGINT) AS change_lsn
FROM w WHERE rn = 1
""",
    # before-image changelog: per-batch winners; each key's PREVIOUS winner
    # (unless it was a delete) is the before image; deletes of non-existent
    # keys vanish
    "cdc_changelog_images": _IMAGES_SQL,
    # CDC-out roundtrip must reproduce the changelog-with-images rows
    "cdc_debezium_out": _IMAGES_SQL,
    # zone-map pruned read = fold + the same WHERE (read(where=) must equal
    # read().filter(...) regardless of which files were skipped)
    "lake_prune_read": """
WITH ranked AS (
  SELECT user_id, event_type, CAST(round(value*100) AS BIGINT) AS value_cents,
         props, event_type = 'error' AS is_delete,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events)
SELECT user_id, event_type, value_cents, props
FROM ranked
WHERE rn = 1 AND NOT is_delete
  AND user_id BETWEEN 10 AND 60 AND event_type = 'click'
""",
    # bucket-derived point lookup = fold + the same IN
    "lake_point_lookup": """
WITH ranked AS (
  SELECT user_id, event_type, CAST(round(value*100) AS BIGINT) AS value_cents,
         props, event_type = 'error' AS is_delete,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events)
SELECT user_id, event_type, value_cents, props
FROM ranked
WHERE rn = 1 AND NOT is_delete AND user_id IN (1, 7, 11)
""",
    # z-order read = fold + WHERE on the non-leading cluster column
    "lake_zorder_read": """
WITH ranked AS (
  SELECT user_id, event_type, CAST(round(value*100) AS BIGINT) AS value_cents,
         props, event_type = 'error' AS is_delete,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events)
SELECT user_id, event_type, value_cents, props
FROM ranked
WHERE rn = 1 AND NOT is_delete AND value_cents BETWEEN 1000 AND 3000
""",
    "cdc_dedup_last_per_key": """
WITH ranked AS (
  SELECT user_id, event_id AS last_lsn, event_type AS last_event_type,
         CAST(round(value*100) AS BIGINT) AS last_value_cents,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events)
SELECT user_id, last_lsn, last_event_type, last_value_cents FROM ranked WHERE rn = 1
""",
    "cdc_shard_lineage": """
SELECT user_id % 8 AS shard, count(*) AS rows,
       max(event_id) AS last_lsn,
       CAST(sum(48 + strlen(event_type) + coalesce(strlen(props), 0)) AS BIGINT) AS bytes
FROM events GROUP BY user_id % 8
""",
    "cdc_op_mix": """
SELECT CASE WHEN event_type='error' THEN 'delete' ELSE 'insert' END AS op,
       count(*) AS n_events, min(event_id) AS min_lsn, max(event_id) AS max_lsn
FROM events GROUP BY 1
""",
    "skew_salted_agg": """
SELECT user_id, count(*) AS n_events,
       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY user_id
""",
    "events_sessionize": """
WITH t AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
l AS (SELECT user_id, sec - lag(sec) OVER (PARTITION BY user_id ORDER BY event_id) AS gap FROM t)
SELECT user_id, count(*) AS n_events,
       CAST(1 + sum(CASE WHEN gap > 3600 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM l GROUP BY user_id
""",
    "asof_purchase_attrib": """
WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
p AS (SELECT user_id, ts, event_id AS purchase_id,
             CAST(round(value*100) AS BIGINT) AS purchase_cents
      FROM events WHERE event_type = 'purchase'
      QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1)
SELECT e.event_id AS event_id, e.user_id AS user_id,
       p.purchase_id AS purchase_id, p.purchase_cents AS purchase_cents,
       CAST(epoch_us(e.ts) - epoch_us(p.ts) AS BIGINT) AS lag_us
FROM e ASOF JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
WHERE epoch_us(e.ts) - epoch_us(p.ts) <= 259200000000
""",
    "asof_forward_next_purchase": """
WITH s AS (SELECT event_id, user_id, ts, -epoch_us(ts) AS neg
           FROM events WHERE event_type = 'signup'),
p AS (SELECT user_id, ts, -epoch_us(ts) AS neg, event_id AS purchase_id,
             CAST(round(value*100) AS BIGINT) AS purchase_cents
      FROM events WHERE event_type = 'purchase'
      QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id ASC) = 1)
SELECT s.event_id AS event_id, s.user_id AS user_id,
       p.purchase_id AS purchase_id, p.purchase_cents AS purchase_cents,
       CAST(epoch_us(p.ts) - epoch_us(s.ts) AS BIGINT) AS lead_us
FROM s ASOF JOIN p ON s.user_id = p.user_id AND s.neg >= p.neg
WHERE epoch_us(p.ts) - epoch_us(s.ts) <= 604800000000
""",
    "range_error_window": """
WITH e AS (SELECT ts FROM events WHERE event_type = 'error'),
p AS (SELECT event_id AS purchase_id, ts AS w_start,
             ts + INTERVAL 10 MINUTE AS w_end
      FROM events WHERE event_type = 'purchase')
SELECT p.purchase_id AS purchase_id, CAST(count(e.ts) AS BIGINT) AS n_errors
FROM p LEFT JOIN e ON e.ts >= p.w_start AND e.ts < p.w_end
GROUP BY p.purchase_id
""",
    "temporal_dim_join": """
WITH env AS (
  SELECT event_id AS lsn, user_id,
         CASE WHEN event_type = 'error' THEN 'delete' ELSE 'insert' END AS op,
         event_type, CAST(round(value*100) AS BIGINT) AS value_cents
  FROM events),
b AS (SELECT (max(lsn) + 4) // 4 AS bl FROM env),
win AS (
  SELECT e.*,
         row_number() OVER (PARTITION BY e.user_id, e.lsn // b.bl
                            ORDER BY e.lsn DESC) AS rn
  FROM env e, b),
hist AS (SELECT user_id, lsn, op, event_type, value_cents
         FROM win WHERE rn = 1),
facts AS (SELECT user_id, lsn FROM env WHERE event_type = 'click')
SELECT f.user_id AS user_id, f.lsn AS lsn,
       h.lsn AS asof_lsn,
       COALESCE(h.op = 'insert', FALSE) AS asof_live,
       CASE WHEN h.op = 'insert' THEN h.event_type END AS dim_event_type,
       CASE WHEN h.op = 'insert' THEN h.value_cents END AS dim_value_cents
FROM facts f ASOF LEFT JOIN hist h
  ON f.user_id = h.user_id AND f.lsn >= h.lsn
""",
    "tx_chain_docs": """
SELECT doc_id, substr(text, 1, 16) AS head, lpad(lang, 8, '*') AS lang_pad,
       lower(md5(text)) AS digest
FROM documents WHERE NOT (n_chars < 200)
""",
    "tx_filter_like": """
SELECT doc_id, source FROM documents
WHERE NOT regexp_full_match(source, 'src1.*')
""",
    "tx_replace": """
SELECT doc_id, substr(source, 1, 4) || '####' || substr(source, 9) AS masked
FROM documents
""",
    "split_minmax_pk": """
WITH b AS (SELECT min(o_orderkey) AS lo, max(o_orderkey) AS hi, count(*) AS n_rows FROM orders)
SELECT r.range AS split_id, n_rows,
       lo + ((hi - lo + 1) * r.range) // 8 AS lo_bound,
       lo + ((hi - lo + 1) * (r.range + 1)) // 8 - 1 AS hi_bound
FROM range(8) r, b
""",
    "split_quantile_pk": """
WITH t AS (SELECT o_orderkey,
                  ntile(8) OVER (ORDER BY o_orderkey) AS split_id
           FROM orders)
SELECT split_id, count(*) AS n_rows,
       min(o_orderkey) AS lo_bound, max(o_orderkey) AS hi_bound
FROM t GROUP BY split_id
""",
    "q1_pricing_summary": """
SELECT l_returnflag, l_linestatus, count(*) AS count_order,
       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_price_cents,
       CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
       CAST(sum(CAST(round(l_discount*100) AS BIGINT)) AS BIGINT) AS sum_discount_cents
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    "events_rollup": """
SELECT event_type, CAST(floor(value/25)*25 AS BIGINT) AS value_band,
       count(*) AS n_events,
       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY ROLLUP (event_type, CAST(floor(value/25)*25 AS BIGINT))
""",
    "events_funnel": """
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type='signup' THEN event_id END) AS first_signup,
         min(CASE WHEN event_type='view' THEN event_id END) AS first_view,
         min(CASE WHEN event_type='purchase' THEN event_id END) AS first_purchase
  FROM events GROUP BY user_id)
SELECT user_id, first_signup, first_view, first_purchase
FROM firsts
WHERE first_signup IS NOT NULL AND first_view IS NOT NULL
  AND first_purchase IS NOT NULL
  AND first_signup < first_view AND first_view < first_purchase
""",
    "semi_join_shipped_orders": """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > TIMESTAMP '1997-01-01')
GROUP BY o_orderpriority
""",
    "anti_join_idle_customers": """
SELECT c_mktsegment, count(*) AS n_customers,
       CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_acctbal_cents
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
""",
    "q6_forecast_revenue": """
SELECT CAST(sum(CAST(round(l_extendedprice*l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
""",
    "q5_local_supplier_volume": """
SELECT n_name,
       CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1994-01-01'
  AND o_orderdate <  TIMESTAMP '1996-01-01'
GROUP BY n_name
""",
    "events_tumbling_window": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n_events,
       CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY 1, 2
""",
    "tx_pandas_udf_norm": r"""
WITH n AS (SELECT doc_id,
    lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS norm_text
  FROM documents)
SELECT doc_id, norm_text, md5(norm_text) AS norm_md5 FROM n
""",
    "q3_top_shipping": """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_cents DESC, l_orderkey LIMIT 10
""",
    "q4_order_priority": """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
    "q7_volume_shipping": """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(date_part('year', l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3
""",
    "q10_returned_items": """
SELECT c_custkey, c_name,
       CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents, n_name,
       CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3, 4
ORDER BY revenue_cents DESC, c_custkey LIMIT 20
""",
    "q14_promo_revenue": """
SELECT
  CAST(sum(CASE WHEN p_type = 'PROMO'
       THEN CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)
       ELSE 0 END) AS BIGINT) AS promo_revenue_cents,
  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS total_revenue_cents,
  count(*) AS n_rows
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
""",
    "q18_large_volume": """
WITH big AS (
  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING CAST(sum(l_quantity) AS BIGINT) > 300)
SELECT c_custkey, c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_cents, total_qty
FROM big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
""",
    "top_orders_per_segment": """
WITH r AS (
  SELECT c_mktsegment, o_orderkey,
         CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY round(o_totalprice*100) DESC, o_orderkey) AS rank
  FROM orders JOIN customer ON o_custkey = c_custkey)
SELECT c_mktsegment, CAST(rank AS BIGINT) AS rank, o_orderkey, price_cents
FROM r WHERE rank <= 3
""",
    "multimodal_decode_audio": """
WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
                  octet_length(encode(text)) AS n
           FROM documents),
bytes AS (SELECT doc_id, ('0x' || substr(hx, 2*i - 1, 2))::INT AS v
          FROM b, LATERAL (SELECT unnest(range(1, n + 1)) AS i) t),
s AS (SELECT doc_id,
             CAST(coalesce(sum(abs(v - 128)), 0) * 256 AS BIGINT) AS sum_abs,
             CAST(coalesce(max(abs(v - 128)), 0) * 256 AS INT) AS peak
      FROM bytes GROUP BY doc_id)
SELECT b.doc_id, CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
       CAST(n AS BIGINT) AS n_samples,
       coalesce(s.sum_abs, 0) AS sum_abs, coalesce(s.peak, 0) AS peak
FROM b LEFT JOIN s ON s.doc_id = b.doc_id
""",
    "multimodal_decode_video": """
WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
                  octet_length(encode(text)) AS n
           FROM documents),
bytes AS (SELECT doc_id, i, ('0x' || substr(hx, 2*i - 1, 2))::INT AS v
          FROM b, LATERAL (SELECT unnest(range(1, n + 1)) AS i) t
          WHERE ((i - 1) // 48) % 2 = 0),
s AS (SELECT doc_id,
             CAST(coalesce(sum(CASE WHEN (i-1)%3=0 THEN v END), 0) AS BIGINT) AS sum_r,
             CAST(coalesce(sum(CASE WHEN (i-1)%3=1 THEN v END), 0) AS BIGINT) AS sum_g,
             CAST(coalesce(sum(CASE WHEN (i-1)%3=2 THEN v END), 0) AS BIGINT) AS sum_b
      FROM bytes GROUP BY doc_id)
SELECT b.doc_id, CAST(10 AS INT) AS fps, CAST(8 AS INT) AS width,
       CAST(2 AS INT) AS height,
       CAST(greatest(1, ceil(n / 48.0)) AS INT) AS n_frames,
       CAST(ceil(greatest(1, ceil(n / 48.0)) / 2.0) AS INT) AS n_sampled,
       coalesce(s.sum_r, 0) AS sum_r,
       coalesce(s.sum_g, 0) AS sum_g,
       coalesce(s.sum_b, 0) AS sum_b
FROM b LEFT JOIN s ON s.doc_id = b.doc_id
""",
    "q8_market_share": """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(coalesce(sum(CASE WHEN n2.n_name = 'NATION_3'
                 THEN round(l_extendedprice * (1 - l_discount) * 100, 0)
                 END), 0) AS BIGINT) AS nation_cents,
       CAST(sum(round(l_extendedprice * (1 - l_discount) * 100, 0))
            AS BIGINT) AS total_cents
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'ECONOMY'
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'
GROUP BY 1
""",
    "q13_customer_distribution": """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
GROUP BY c_count
""",
    "q15_top_supplier": """
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(round(l_extendedprice * (1 - l_discount) * 100, 0))
              AS BIGINT) AS total_revenue_cents
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY l_suppkey)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, total_revenue_cents
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue_cents = (SELECT max(total_revenue_cents) FROM rev)
""",
    "q17_small_quantity_revenue": """
WITH li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3'),
a AS (SELECT l_partkey AS pk, avg(l_quantity) AS avg_q FROM li GROUP BY 1)
SELECT CAST(coalesce(sum(round(l_extendedprice * 100, 0)), 0) AS BIGINT)
         AS total_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM li JOIN a ON l_partkey = pk
WHERE l_quantity < 0.2 * avg_q
""",
    "q19_discounted_revenue": """
SELECT CAST(coalesce(sum(round(l_extendedprice * (1 - l_discount) * 100, 0)),
            0) AS BIGINT) AS revenue_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
       AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30
       AND l_quantity BETWEEN 20 AND 35)
""",
    "q22_rich_idle_customers": """
WITH s AS (
  SELECT CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS tot,
         count(*) AS n
  FROM customer WHERE c_acctbal > 0)
SELECT c_nationkey, count(*) AS n_customers,
       CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS sum_acctbal_cents
FROM customer, s
WHERE CAST(round(c_acctbal*100) AS BIGINT) * n > tot
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = customer.c_custkey)
GROUP BY c_nationkey
""",
    "dedup_exact": """
SELECT min(doc_id) AS doc_id, md5(text) AS text_hash, count(*) AS n_copies
FROM documents GROUP BY md5(text)
""",
    # contamination: distinct shared 3-shingles per (corpus doc, eval doc)
    # with the corpus doc's full shingle count; eval set = doc_id % 37 == 0
    "text_contamination": f"""
WITH {_DOC_SHINGLES_3},
ev AS (SELECT DISTINCT doc_id AS eval_id, shingle FROM sh
       WHERE doc_id % 37 = 0),
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
hits AS (SELECT s.doc_id, e.eval_id, count(*) AS sh_n
         FROM sh s JOIN ev e USING (shingle) GROUP BY 1, 2)
SELECT h.doc_id, h.eval_id,
       CAST(h.sh_n AS BIGINT) AS shared_shingles,
       CAST(c.n AS BIGINT) AS n_shingles
FROM hits h JOIN cnt c ON c.doc_id = h.doc_id
WHERE h.sh_n >= 5
""",
    "dedup_ngram_jaccard": f"""
WITH {_DOC_SHINGLES_3},
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
-- hub-shingle cap (max_df=100): per-doc sizes from the FULL set, pair
-- intersections from the capped set — mirrors the engine exactly
keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
shc AS (SELECT sh.* FROM sh JOIN keep USING (shingle)),
pairs AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_common
          FROM shc a JOIN shc b USING (shingle) WHERE a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT a, b, n_common,
       round(n_common * 1.0 / (ca.n + cb.n - n_common), 6) AS jaccard
FROM pairs JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
WHERE n_common * 1.0 / (ca.n + cb.n - n_common) >= 0.12
""",
    # Okapi BM25 replicated in SQL: same tokenization (lower + whitespace
    # split), same idf form, exact integer-sum avgdl, 6dp score grain,
    # doc_id tie-break — query terms: 'merge', 'table', 'scan'
    "text_bm25_topk": """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM documents WHERE length(trim(text)) > 0),
postings AS (SELECT doc_id, term, count(*) AS tf
             FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, sum(tf) AS dl FROM postings GROUP BY doc_id),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
q AS (SELECT unnest(['merge', 'table', 'scan']) AS term),
idf AS (SELECT term,
               ln(1.0 + (s.n_docs - count(*) + 0.5) / (count(*) + 0.5)) AS idf
        FROM postings JOIN q USING (term), stats s
        GROUP BY term, s.n_docs),
contrib AS (
  SELECT p.doc_id,
         i.idf * (p.tf * 2.2)
           / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)) AS part
  FROM postings p JOIN idf i USING (term)
  JOIN dl d USING (doc_id), stats s)
SELECT doc_id, round(sum(part), 6) AS score
FROM contrib GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 20
""",
    # transitive closure via RECURSIVE CTE — an independent reachability
    # implementation checking the engine's distributed label propagation
    "dedup_cluster_keep_one": f"""
WITH RECURSIVE {_DOC_SHINGLES_3},
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
shc AS (SELECT sh.* FROM sh JOIN keep USING (shingle)),
p0 AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_common
       FROM shc a JOIN shc b USING (shingle) WHERE a.doc_id < b.doc_id
       GROUP BY 1, 2),
pairs AS (SELECT a, b FROM p0 JOIN cnt ca ON ca.doc_id = a
          JOIN cnt cb ON cb.doc_id = b
          WHERE n_common * 1.0 / (ca.n + cb.n - n_common) >= 0.12),
edges AS (SELECT a AS s, b AS d FROM pairs
          UNION SELECT b, a FROM pairs),
reach AS (
  SELECT s AS id, d AS r FROM edges
  UNION
  SELECT reach.id, e.d FROM reach JOIN edges e ON e.s = reach.r
),
comp AS (SELECT id, least(min(r), id) AS component FROM reach GROUP BY id),
sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS n_dups
          FROM comp GROUP BY component)
SELECT d.doc_id, d.doc_id AS component, CAST(1 AS BIGINT) AS n_dups
FROM documents d LEFT JOIN comp c ON c.id = d.doc_id WHERE c.id IS NULL
UNION ALL
SELECT c.id AS doc_id, c.component, s.n_dups
FROM comp c JOIN sizes s USING (component) WHERE c.id = c.component
""",
    "embed_quantize": """
WITH m AS (
  SELECT vec_id, embedding,
         greatest(list_max(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE)))), 1e-30) AS max_abs
  FROM embeddings)
SELECT vec_id, max_abs,
       array_to_string(list_transform(embedding,
         x -> CAST(CAST(floor(CAST(x AS DOUBLE) * 127.0 / max_abs + 0.5)
                        AS INT) AS VARCHAR)), ',') AS q_vec_str
FROM m
""",
    "dedup_ngram_jaccard_lsh": f"""
WITH {_DOC_SHINGLES_3},
cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
sig AS (SELECT doc_id,
  {", ".join(f"min(('0x'||substr(md5(shingle||'#{i}'),1,15))::BIGINT) AS mh{i}" for i in range(8))}
  FROM sh GROUP BY doc_id),
banded AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {b} AS band_idx, md5(mh{2*b}::VARCHAR || ',' || mh{2*b+1}::VARCHAR) AS sig FROM sig"
      for b in range(4))}
),
cand AS (SELECT a.doc_id AS a, b.doc_id AS b
         FROM banded a JOIN banded b USING (band_idx, sig)
         WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
shc AS (SELECT sh.* FROM sh JOIN keep USING (shingle)),
pairs AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_common
          FROM shc x JOIN shc y USING (shingle) WHERE x.doc_id < y.doc_id
          GROUP BY 1, 2),
p2 AS (SELECT pairs.* FROM pairs JOIN cand USING (a, b))
SELECT a, b, n_common,
       round(n_common * 1.0 / (ca.n + cb.n - n_common), 6) AS jaccard
FROM p2 JOIN cnt ca ON ca.doc_id = a JOIN cnt cb ON cb.doc_id = b
WHERE n_common * 1.0 / (ca.n + cb.n - n_common) >= 0.12
""",
    "dedup_minhash_lsh": f"""
WITH {_DOC_SHINGLES_3},
sig AS (SELECT doc_id,
  {", ".join(f"min(('0x'||substr(md5(shingle||'#{i}'),1,15))::BIGINT) AS mh{i}" for i in range(8))}
  FROM sh GROUP BY doc_id),
banded AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {b} AS band_idx, md5(mh{2*b}::VARCHAR || ',' || mh{2*b+1}::VARCHAR) AS sig FROM sig"
      for b in range(4))}
),
cand AS (SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_shared_bands
         FROM banded a JOIN banded b USING (band_idx, sig)
         WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT a, b, n_shared_bands,
       round(({" + ".join(f"CASE WHEN sa.mh{i}=sb.mh{i} THEN 1 ELSE 0 END" for i in range(8))}) / 8.0, 6) AS est_jaccard
FROM cand JOIN sig sa ON sa.doc_id = a JOIN sig sb ON sb.doc_id = b
""",
    "dedup_simhash": r"""
WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok FROM documents),
h AS (SELECT doc_id, ('0x'||substr(md5(tok),1,15))::BIGINT AS h FROM toks),
bits AS (SELECT doc_id, j, sum(((h >> j) & 1) * 2 - 1) AS v
         FROM h, LATERAL (SELECT unnest(range(0, 48)) AS j) t GROUP BY doc_id, j),
fp AS (SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END) AS simhash
       FROM bits GROUP BY doc_id)
SELECT a.doc_id AS a, b.doc_id AS b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM fp a, fp b
WHERE a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= 3
""",
    "text_quality": r"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars_m,
  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
  CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'),
       x -> x IN ('the','a','of','and','to','in','is','it'))) AS BIGINT) AS n_stop,
  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS sum_token_len
FROM documents
""",
    "text_langid": r"""
WITH t AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS w FROM documents),
hits AS (SELECT doc_id,
  len(list_filter(w, x -> x IN ('the','a','of','and','to','in','is','it'))) AS h_en,
  len(list_filter(w, x -> x IN ('der','die','das','und','nicht'))) AS h_de,
  len(list_filter(w, x -> x IN ('le','la','les','et','une'))) AS h_fr
  FROM t)
SELECT doc_id,
  CASE WHEN greatest(h_en, h_de, h_fr) < 1 THEN 'unknown'
       WHEN h_en = greatest(h_en, h_de, h_fr) THEN 'en'
       WHEN h_de = greatest(h_en, h_de, h_fr) THEN 'de'
       ELSE 'fr' END AS pred_lang
FROM hits
""",
    # Unicode canonicalization: same deterministic dirt, DuckDB's ICU
    # nfc_normalize + the identical regex cascade — byte-for-byte
    "text_normalize": r"""
WITH e AS (SELECT doc_id,
  '  cafe' || chr(769) || ' ' || chr(7) || ' ' || text
  || ' tail' || chr(9) || 'end  ' AS t
  FROM documents),
n AS (SELECT doc_id,
  trim(regexp_replace(regexp_replace(regexp_replace(
    nfc_normalize(t), '[\x00-\x09\x0B-\x1F\x7F]', ' ', 'g'),
    ' {2,}', ' ', 'g'), ' ?\n ?', chr(10), 'g'), ' ') AS norm_text
  FROM e)
SELECT doc_id, norm_text, CAST(length(norm_text) AS BIGINT) AS norm_len FROM n
""",
    # PII scrub: same deterministic enrichment, same ordered regex cascade
    # (emails → IPv4 → phones), counts taken on the progressively-scrubbed
    # text exactly like the engine's pii_counts
    "text_pii_scrub": r"""
WITH e AS (SELECT doc_id,
  text || ' contact user' || doc_id || '@example.com via 10.0.'
       || (doc_id % 200) || '.' || (doc_id % 250)
       || ' or +1 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS t
  FROM documents),
s1 AS (SELECT doc_id,
  CAST(len(regexp_extract_all(t,
       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
  regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g') AS t
  FROM e),
s2 AS (SELECT doc_id, n_email,
  CAST(len(regexp_extract_all(t,
       '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ipv4,
  regexp_replace(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t
  FROM s1),
s3 AS (SELECT doc_id, n_email, n_ipv4,
  CAST(len(regexp_extract_all(t,
       '\+\d{1,3}[- ]\d{3}[- ]\d{4}\b')) AS BIGINT) AS n_phone,
  regexp_replace(t, '\+\d{1,3}[- ]\d{3}[- ]\d{4}\b', '<PHONE>', 'g') AS t
  FROM s2)
SELECT doc_id, t AS scrubbed, n_email, n_ipv4, n_phone FROM s3
""",
    # repetition signals: non-distinct consecutive 2-grams, max/sum per doc
    "text_repetition": r"""
WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
           FROM documents),
base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
                CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_tokens, w
         FROM w),
g AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS g
      FROM base, LATERAL (SELECT unnest(range(1, len(w))) AS i) t),
c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
tops AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_n,
                CAST(sum(c) AS BIGINT) AS n_bigrams
         FROM c GROUP BY 1)
SELECT b.doc_id, b.n_tokens, b.n_distinct_tokens,
       coalesce(t.top_bigram_n, CAST(0 AS BIGINT)) AS top_bigram_n,
       coalesce(t.n_bigrams, CAST(0 AS BIGINT)) AS n_bigrams
FROM base b LEFT JOIN tops t ON t.doc_id = b.doc_id
""",
    # stratified hash sample: identical md5-prefix draw, CASE thresholds
    "sample_stratified": r"""
SELECT doc_id, lang FROM documents
WHERE ('0x' || substr(md5('s1' || chr(31) || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      % 1000000
      < CASE lang WHEN 'en' THEN 300000 WHEN 'zh' THEN 1000000
                  WHEN 'fr' THEN 500000 ELSE 100000 END
""",
    # sequence packing: same cumsum window + floor((cum-tokens)/budget)
    "pack_sequences": r"""
WITH t AS (
  SELECT doc_id, lang,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t)
SELECT doc_id, lang, n_tokens,
       CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS pack_id
FROM c
""",
    # one hash draw, cumulative-weight ranges (train 0.8 / val 0.1 / test)
    "sample_split": r"""
WITH h AS (
  SELECT doc_id,
         ('0x' || substr(md5('sp' || chr(31) || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
         % 1000000 AS draw
  FROM documents)
SELECT doc_id,
       CASE WHEN draw < 800000 THEN 'train'
            WHEN draw < 900000 THEN 'val'
            ELSE 'test' END AS split
FROM h
""",
    # fixed 64-token windows, 16-token overlap (step 48), 1-based inclusive
    # list slicing == Spark slice(toks, start+1, 64)
    "chunk_documents": r"""
WITH w AS (
  SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS w
  FROM documents WHERE length(trim(coalesce(text, ''))) > 0),
s AS (
  SELECT doc_id, lang, w, CAST(i AS BIGINT) // 48 AS chunk_ix, i
  FROM w, LATERAL (
    SELECT unnest(range(0, greatest(len(w) - 16, 1), 48)) AS i) t)
SELECT doc_id, lang, chunk_ix,
       array_to_string(w[i+1:i+64], ' ') AS chunk,
       CAST(len(w[i+1:i+64]) AS BIGINT) AS chunk_tokens
FROM s
""",
    "text_fingerprint": r"""
WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents),
sh AS (SELECT doc_id, array_to_string(w[i:i+3], ' ') AS s
       FROM w, LATERAL (SELECT unnest(range(1, len(w)-2)) AS i) t
       WHERE len(w) >= 4)
SELECT doc_id, min(('0x'||substr(md5(s),1,15))::BIGINT) AS fingerprint
FROM sh GROUP BY doc_id
""",
    "embed_cosine_topk": """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
q AS (SELECT * FROM n WHERE vec_id < 5),
sim AS (SELECT q.vec_id AS q, c.vec_id AS neighbor,
               list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine
        FROM q, n c WHERE c.vec_id <> q.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY q ORDER BY cosine DESC, neighbor) AS rank FROM sim)
SELECT q, neighbor, CAST(rank AS INT) AS rank, round(cosine, 6) AS cosine FROM r WHERE rank <= 3
""",
    "ann_bucketed_topk": f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
      {" + ".join(f"CASE WHEN v[{j+1}] > 0 THEN {1 << j}::BIGINT ELSE 0::BIGINT END" for j in range(8))} AS bucket
      FROM v),
q AS (SELECT * FROM n WHERE vec_id < 20),
sim AS (SELECT q.vec_id AS q, q.bucket AS bucket, c.vec_id AS neighbor,
               list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine
        FROM q JOIN n c USING (bucket) WHERE c.vec_id <> q.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY q ORDER BY cosine DESC, neighbor) AS rank FROM sim)
SELECT q, bucket, neighbor, CAST(rank AS INT) AS rank, round(cosine, 6) AS cosine FROM r WHERE rank <= 3
""",
    "ivf_kmeans_assign": _KMEANS_CTE + """
SELECT vec_id, cid AS cluster FROM a2
""",
    "ann_ivf_topk": _KMEANS_CTE + """,
n AS (SELECT vec_id, vec, sqrt(list_dot_product(vec, vec)) AS nrm FROM v),
sim AS (SELECT qa.vec_id AS q, qa.cid AS cluster, ca.vec_id AS neighbor,
               list_dot_product(qn.vec, cn.vec) / (qn.nrm * cn.nrm) AS cosine
        FROM a2 qa
        JOIN a2 ca ON ca.cid = qa.cid AND ca.vec_id <> qa.vec_id
        JOIN n qn ON qn.vec_id = qa.vec_id
        JOIN n cn ON cn.vec_id = ca.vec_id
        WHERE qa.vec_id < 20),
r AS (SELECT *, row_number() OVER (PARTITION BY q ORDER BY cosine DESC, neighbor) AS rank
      FROM sim)
SELECT q, cluster, neighbor, CAST(rank AS INT) AS rank, round(cosine, 6) AS cosine
FROM r WHERE rank <= 3
""",
    "embed_near_dup": f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm,
      {" + ".join(f"CASE WHEN v[{j+1}] > 0 THEN {1 << j}::BIGINT ELSE 0::BIGINT END" for j in range(4))} AS bucket
      FROM v)
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
FROM n a JOIN n b USING (bucket)
WHERE a.vec_id < b.vec_id
  AND list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
""",
    "multimodal_features": """
WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
                  octet_length(encode(text)) AS n
           FROM documents),
bytes AS (SELECT doc_id, ('0x' || substr(hx, 2*i - 1, 2))::INT % 8 AS m
          FROM b, LATERAL (SELECT unnest(range(1, n + 1)) AS i) t),
hist AS (SELECT doc_id,
                sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS c0,
                sum(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS c1,
                count(*) AS total
         FROM bytes GROUP BY doc_id)
SELECT b.doc_id,
       round(coalesce(c0 * 1.0 / total, 0.0), 6) AS f0,
       round(coalesce(c1 * 1.0 / total, 0.0), 6) AS f1
FROM b LEFT JOIN hist ON hist.doc_id = b.doc_id
""",
    "multimodal_decode_meta": """
WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
                  octet_length(encode(text)) AS n
           FROM documents),
bytes AS (SELECT doc_id, ('0x' || substr(hx, 2*i - 1, 2))::INT AS v
          FROM b, LATERAL (SELECT unnest(range(1, n + 1)) AS i) t),
s AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS checksum
      FROM bytes GROUP BY doc_id)
SELECT b.doc_id, 'application/x-fake' AS mime,
       CAST(n AS BIGINT) AS n_bytes,
       coalesce(s.checksum, 0) AS checksum
FROM b LEFT JOIN s ON s.doc_id = b.doc_id
""",
    # decode_image contract: pixels are the utf-8 text bytes RGB row-major,
    # zero-padded to an 8-wide raster — so dims + channel sums recompute
    # from the text alone (1-based byte i feeds channel (i-1)%3; pads add 0)
    "multimodal_decode_image": """
WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
                  octet_length(encode(text)) AS n
           FROM documents),
bytes AS (SELECT doc_id, i, ('0x' || substr(hx, 2*i - 1, 2))::INT AS v
          FROM b, LATERAL (SELECT unnest(range(1, n + 1)) AS i) t),
s AS (SELECT doc_id,
             CAST(coalesce(sum(CASE WHEN (i-1)%3=0 THEN v END), 0) AS BIGINT) AS sum_r,
             CAST(coalesce(sum(CASE WHEN (i-1)%3=1 THEN v END), 0) AS BIGINT) AS sum_g,
             CAST(coalesce(sum(CASE WHEN (i-1)%3=2 THEN v END), 0) AS BIGINT) AS sum_b
      FROM bytes GROUP BY doc_id)
SELECT b.doc_id, CAST(8 AS INT) AS width,
       CAST(greatest(1, ceil(n / 24.0)) AS INT) AS height,
       coalesce(s.sum_r, 0) AS sum_r,
       coalesce(s.sum_g, 0) AS sum_g,
       coalesce(s.sum_b, 0) AS sum_b
FROM b LEFT JOIN s ON s.doc_id = b.doc_id
""",
}

# Fold minus the dirty rows q_cdc_quarantine injects (keyed on original LSN).
_ORACLES["cdc_quarantine"] = """
WITH clean AS (
  SELECT * FROM events
  WHERE event_id % 97 <> 0 AND event_id % 101 <> 0 AND event_id % 103 <> 0),
ranked AS (
  SELECT user_id, event_type, CAST(round(value*100) AS BIGINT) AS value_cents,
         props, event_type = 'error' AS is_delete,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM clean)
SELECT user_id, event_type, value_cents, props
FROM ranked WHERE rn = 1 AND NOT is_delete
"""

# Reason precedence mirrors envelope_rules declaration order:
# null_lsn, then bad_op, then null_key.
_ORACLES["cdc_quarantine_replay"] = """
WITH clean AS (
  SELECT * FROM events
  WHERE event_id % 101 <> 0 AND event_id % 103 <> 0),
ranked AS (
  SELECT user_id, event_type, CAST(round(value*100) AS BIGINT) AS value_cents,
         props, event_type = 'error' AS is_delete,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM clean)
SELECT user_id, event_type, value_cents, props
FROM ranked WHERE rn = 1 AND NOT is_delete
"""


_ORACLES["cdc_quarantine_report"] = """
SELECT CASE WHEN event_id % 103 = 0 THEN 'null_lsn'
            WHEN event_id % 97 = 0 THEN 'bad_op'
            ELSE 'null_key:user_id' END AS reason,
       CAST(count(*) AS BIGINT) AS n
FROM events
WHERE event_id % 97 = 0 OR event_id % 101 = 0 OR event_id % 103 = 0
GROUP BY 1
"""

# Fold with props nulled for winners from the narrow (pre-evolution) half.
_ORACLES["cdc_schema_evolution"] = """
WITH mid AS (SELECT max(event_id) // 2 AS mid FROM events),
ranked AS (
  SELECT user_id, event_type, CAST(round(value*100) AS BIGINT) AS value_cents,
         CASE WHEN event_id > (SELECT mid FROM mid) THEN props END AS props,
         event_type = 'error' AS is_delete,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events)
SELECT user_id, event_type, value_cents, props
FROM ranked WHERE rn = 1 AND NOT is_delete
"""

# Cross-shard out-of-order delivery must converge to the plain full fold.
_ORACLES["cdc_shard_skew_delivery"] = _CDC_FOLD_ORACLE

# The envelope the Debezium JSON roundtrip must reproduce ('r' and 'c' both
# normalize to insert; deletes carry the before-image payload).
_ORACLES["cdc_debezium_envelope"] = """
SELECT event_id AS lsn,
       CASE WHEN event_type = 'error' THEN 'delete'
            WHEN event_type = 'purchase' THEN 'update'
            ELSE 'insert' END AS op,
       user_id, event_type,
       CAST(round(value*100) AS BIGINT) AS value_cents, props,
       CAST(epoch_ms(ts) AS BIGINT) AS ts_ms
FROM events
"""

# The Maxwell roundtrip: op map (bootstrap-insert folds into insert,
# carrying the snapshot SENTINEL lsn = -1) and the synthesized LSN bit
# split ts·2^31 + (xid mod 2^12)·2^19 + xoffset for live rows.
_ORACLES["cdc_maxwell_envelope"] = """
SELECT CAST(CASE WHEN event_type NOT IN ('error', 'purchase')
                  AND event_id % 13 = 0 THEN -1
            ELSE (epoch_ms(ts) // 1000) * 2147483648
                 + ((event_id // 4) % 4096) * 524288
                 + (event_id % 4) END AS BIGINT) AS lsn,
       CASE WHEN event_type = 'error' THEN 'delete'
            WHEN event_type = 'purchase' THEN 'update'
            ELSE 'insert' END AS op,
       user_id, event_type,
       CAST(round(value*100) AS BIGINT) AS value_cents, props,
       CAST(epoch_ms(ts) // 1000 AS BIGINT) AS ts_s
FROM events
"""

# The Canal roundtrip: op map, text→typed casts, and the synthesized LSN
# bit split (es//1000)·2^31 + (id mod 2^12)·2^19 + pos (single-row → 0).
_ORACLES["cdc_canal_envelope"] = """
SELECT CAST((epoch_ms(ts) // 1000) * 2147483648
            + (event_id % 4096) * 524288 AS BIGINT) AS lsn,
       CASE WHEN event_type = 'error' THEN 'delete'
            WHEN event_type = 'purchase' THEN 'update'
            ELSE 'insert' END AS op,
       user_id, event_type,
       CAST(round(value*100) AS BIGINT) AS value_cents, props,
       CAST(epoch_ms(ts) AS BIGINT) AS es_ms
FROM events
"""

# The delimited roundtrip must reproduce the source rows exactly.
_ORACLES["file_delimited_roundtrip"] = """
SELECT event_id, user_id, event_type,
       CAST(round(value*100) AS BIGINT) AS value_cents, props,
       'csv' AS src
FROM events
"""

# The IDENTICAL Java∩RE2 pattern runs through DuckDB's RE2 engine.
_BPE_SQL_PAT = TXT.BPE_TOKEN_PATTERN.replace("'", "''")
_ORACLES["text_token_stats"] = rf"""
SELECT doc_id,
  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words,
  CAST(len(regexp_extract_all(text, '{_BPE_SQL_PAT}')) AS BIGINT) AS n_bpe,
  CAST(len(list_distinct(regexp_extract_all(text, '{_BPE_SQL_PAT}')))
       AS BIGINT) AS n_bpe_distinct
FROM documents
"""

# Paragraph = consecutive 10-word slice (the chunk_documents derivation);
# winner = first (doc_id, pos) occurrence; documents reassembled in order.
_ORACLES["dedup_paragraphs"] = r"""
WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w
           FROM documents),
p AS (SELECT doc_id, j AS pos,
             array_to_string(w[10*j+1 : 10*j+10], ' ') AS para
      FROM w, LATERAL (SELECT unnest(range(0,
               CAST(ceil(len(w)/10.0) AS BIGINT))) AS j) t),
k AS (SELECT doc_id, pos, para,
             row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
      FROM p),
kept AS (SELECT doc_id, pos, para FROM k WHERE rn = 1),
reb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(para, ' ' ORDER BY pos) AS clean_text
        FROM kept GROUP BY doc_id),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_paras FROM p GROUP BY doc_id)
SELECT d.doc_id, coalesce(reb.clean_text, '') AS clean_text,
       coalesce(tot.n_paras, 0) AS n_paras,
       coalesce(reb.n_kept, 0) AS n_kept
FROM documents d
LEFT JOIN tot ON tot.doc_id = d.doc_id
LEFT JOIN reb ON reb.doc_id = d.doc_id
"""

# ------------------------------------------------- round-4 operator additions
def q_lake_snapshot_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETENTION MAINTENANCE end-to-end (LakeTable.expire_snapshots +
    vacuum + verify_files — Iceberg expire_snapshots / remove_orphan_files
    analogue; the reference has no table lifecycle at all): fold the feed
    in 3 COW batches (bucket rewrites leave orphanable files), tag the
    first snapshot as an audit pin, expire every untagged old version,
    vacuum the unreferenced data files, and PROVE the maintenance bit:
    expired versions must no longer time-travel, the tagged version must,
    orphaned files must physically disappear, and verify_files() must stay
    clean.  Returns the final state — retention must never change the
    readable table (the oracle is the plain SQL fold)."""
    feed = _events_feed(_t(spark, sf_dir, "events"))
    loc = tempfile.mkdtemp(prefix="dx_exp_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = int(feed.agg(F.max("lsn")).collect()[0][0])
    run_incremental(table, feed, batch_lsns=max(1, (hi + 3) // 3),
                    mode="cow")
    v_final = table.current_version()
    if v_final < 3:
        raise AssertionError(f"expected >=3 commits, got {v_final}")
    table.create_tag("audit", version=1)
    n_expired = table.expire_snapshots(keep_versions=1)
    n_removed = table.vacuum(keep_versions=1)
    if n_expired == 0 or n_removed == 0:
        raise AssertionError(
            f"retention was vacuous: expired={n_expired} removed={n_removed}"
        )
    # expired version: time travel must fail loudly
    expired = next(v for v in range(2, v_final)
                   if v not in table.tags().values())
    try:
        table.read(version=expired).count()
    except Exception:
        pass
    else:
        raise AssertionError(f"expired version {expired} still readable")
    # tagged + current versions: readable and physically intact
    table.read(version=table.tag_version("audit")).count()
    bad = table.verify_files()
    if bad:
        raise AssertionError(f"verify_files after vacuum: {bad}")
    return table.read().select("user_id", "event_type", "value_cents",
                               "props")


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (sampling.weighted_sample_topk — Efraimidis–Spirakis exponential keys
    over the content-hash draw): keep the 25 highest-priority documents
    per language, weighted by document length.  The oracle replays the
    identical md5 draw, ``round(-ln(u)/w, 9)`` key, and top-k window in
    SQL — bit-for-bit, including the selection (see the function's
    cross-engine ln analysis)."""
    docs = _t(spark, sf_dir, "documents")
    out = SMP.weighted_sample_topk(
        docs.select("doc_id", "lang", "n_chars"),
        key_cols=["doc_id"], weight_col="n_chars", k=25,
        strata_cols=["lang"], salt="ws",
    )
    return out.select("doc_id", "lang", "n_chars", "es_key")


def q_events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (F.window with a slide — each event lands
    in window_len/slide overlapping windows; the hopping-window shape of
    rate metrics).  10-minute windows sliding by 5: every event belongs to
    exactly 2 windows; the oracle reproduces them with integer
    epoch-microsecond arithmetic."""
    ev = _t(spark, sf_dir, "events")
    w = ev.groupBy(
        F.window("ts", "10 minutes", "5 minutes").alias("w"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_cents("value")).alias("sum_value_cents"),
    )
    return w.select(
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
        .alias("window_start"),
        "event_type",
        "n_events",
        "sum_value_cents",
    )


def q_cdc_agg_view_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental EXACT COUNT(DISTINCT) maintenance
    (lake/aggview.create_distinct_view — support-multiplicity composition;
    the aggregate plain retraction algebra cannot carry): orders base,
    distinct customers per priority, then a ~1% change batch that
    reassigns some orders' customers (collapsing them onto a small id
    range) and deletes a subset.  The refresh folds ONLY the support
    changelog's appear/disappear transitions (±1), never rescanning the
    value space.  The oracle applies the same mutation in SQL and
    aggregates COUNT(DISTINCT) one-shot."""
    from datax_spark.lake.aggview import (
        create_distinct_view,
        refresh_distinct_view,
    )

    orders = _t(spark, sf_dir, "orders")
    loc = tempfile.mkdtemp(prefix="dx_dvup_")
    os.rmdir(loc)
    vloc = tempfile.mkdtemp(prefix="dx_dvvw_")
    os.rmdir(vloc)
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("prio", T.StringType()),
            T.StructField("cust", T.LongType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["k"],
        bucket_col="k", num_buckets=8,
    )
    base = orders.select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_custkey").cast("long").alias("cust"),
        F.col("o_orderkey").cast("long").alias("lsn"),
        F.lit("insert").alias("op"),
    )
    merge_into(table, base, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None, keys_unique=True)
    view = create_distinct_view(table, vloc, dims=["prio"], col="cust",
                                num_buckets=4)
    changes = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        F.col("o_orderkey").cast("long").alias("k"),
        F.col("o_orderpriority").alias("prio"),
        (F.col("o_custkey").cast("long") % 50).alias("cust"),
        (F.col("o_orderkey").cast("long") + F.lit(10**9)).alias("lsn"),
        F.when(F.col("o_orderkey") % 291 == 0, F.lit("delete"))
        .otherwise(F.lit("insert")).alias("op"),
    )
    merge_into(table, changes, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None, keys_unique=True)
    refresh_distinct_view(table, view)
    return view.read().select("prio", "n_distinct_cust")


_ORACLES["cdc_agg_view_distinct"] = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderpriority AS prio, o_custkey AS cust
  FROM orders),
final AS (
  SELECT k, prio,
         CASE WHEN k % 97 = 0 THEN cust % 50 ELSE cust END AS cust
  FROM base WHERE NOT (k % 97 = 0 AND k % 291 = 0))
SELECT prio, CAST(count(DISTINCT cust) AS BIGINT) AS n_distinct_cust
FROM final GROUP BY prio
"""


def q_text_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + canonical-URL dedup (functions/web.py — the
    web-crawl dedup key): deterministic URL variants are synthesized per
    document (case noise, www label, default port, trailing slash,
    tracking params, param order, fragments) and must collapse onto one
    canonical form per (site, page).  The oracle re-derives the synth AND
    the canonical rules independently in SQL (RFC 3986 §6 subset)."""
    from datax_spark.functions import web as WEB

    d = _t(spark, sf_dir, "documents").select("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    did = F.col("doc_id")
    url = F.concat(
        F.when(did % 3 == 0, F.lit("HTTP://WWW."))
        .when(did % 3 == 1, F.lit("http://"))
        .otherwise(F.lit("HTTP://")),
        F.lit("Site"), s(did % 37), F.lit(".Example.com"),
        F.when(did % 2 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/Page/"), s(did % 11),
        F.when(did % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?"),
        F.when(did % 4 == 0, F.lit("utm_source=feed&")).otherwise(F.lit("")),
        F.when(did % 2 == 0, F.concat(F.lit("b=2&a="), s(did % 11)))
        .otherwise(F.concat(F.lit("a="), s(did % 11), F.lit("&b=2"))),
        F.when(did % 3 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    out = d.select(
        "doc_id",
        WEB.canonicalize_url(url).alias("canonical_url"),
        WEB.url_host(url).alias("host"),
    )
    return out.groupBy("canonical_url", "host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.min("doc_id").alias("min_doc_id"),
    )


_ORACLES["text_url_canonical"] = r"""
WITH u AS (
  SELECT doc_id,
    (CASE doc_id % 3 WHEN 0 THEN 'HTTP://WWW.' WHEN 1 THEN 'http://'
          ELSE 'HTTP://' END
     || 'Site' || (doc_id % 37) || '.Example.com'
     || CASE doc_id % 2 WHEN 0 THEN ':80' ELSE '' END
     || '/Page/' || (doc_id % 11)
     || CASE doc_id % 5 WHEN 0 THEN '/' ELSE '' END
     || '?'
     || CASE doc_id % 4 WHEN 0 THEN 'utm_source=feed&' ELSE '' END
     || CASE doc_id % 2 WHEN 0 THEN 'b=2&a=' || (doc_id % 11)
             ELSE 'a=' || (doc_id % 11) || '&b=2' END
     || CASE doc_id % 3 WHEN 0 THEN '#sec' ELSE '' END) AS url
  FROM documents),
parts AS (
  SELECT doc_id,
    lower(regexp_extract(trim(url),
          '^(?:([a-zA-Z][a-zA-Z0-9+.-]*)://)?', 1)) AS scheme,
    lower(regexp_extract(trim(url),
          '^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?([^/?#]*)', 1)) AS auth0,
    regexp_extract(trim(url),
          '^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?[^/?#]*([^?#]*)', 1) AS path0,
    regexp_extract(trim(url), '^[^?#]*\?([^#]*)', 1) AS query0
  FROM u),
norm AS (
  SELECT doc_id, scheme,
    regexp_replace(
      CASE WHEN scheme = 'http' THEN regexp_replace(auth0, ':80$', '')
           WHEN scheme = 'https' THEN regexp_replace(auth0, ':443$', '')
           ELSE auth0 END, '^www\.', '') AS auth,
    regexp_replace(regexp_replace(auth0, ':[0-9]+$', ''), '^www\.', '')
      AS host,
    regexp_replace(path0, '/$', '') AS path,
    array_to_string(list_sort(list_filter(string_split(query0, '&'),
      x -> x <> '' AND NOT regexp_matches(
        x, '^(utm_[^=]*|fbclid|gclid)(=.*)?$'))), '&') AS q
  FROM parts),
canon AS (
  SELECT doc_id, host,
    (CASE WHEN scheme <> '' THEN scheme || '://' || auth ELSE auth END)
    || path || CASE WHEN q <> '' THEN '?' || q ELSE '' END AS canonical_url
  FROM norm)
SELECT canonical_url, host, count(*) AS n_urls,
       CAST(min(doc_id) AS BIGINT) AS min_doc_id
FROM canon GROUP BY 1, 2
"""


def q_cdc_txn_boundary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRANSACTION-CONSISTENT streaming apply (streaming/runner.py
    txn_boundary — the Debezium/Flink-CDC txn-alignment semantic the
    reference's FIFO channel cannot express): the feed carries synthetic
    transactions of 7 consecutive LSNs with a commit marker on the last;
    micro-batch cuts are placed MID-transaction, so the runner must hold
    the open tail under the checkpoint and apply it only when its commit
    arrives.  Verifies some events were actually held (non-vacuous) and
    that the final state equals the plain fold — a half-applied
    transaction would diverge."""
    from datax_spark.streaming.runner import run_available_now

    ev = _events_feed(_t(spark, sf_dir, "events"))
    hi = int(ev.agg(F.max("lsn")).collect()[0][0])
    txid = (F.col("lsn") / 7).cast("long")
    feed = ev.withColumn("txn_id", txid).withColumn(
        "txn_commit", (F.col("lsn") % 7 == 6) | (F.col("lsn") == hi))
    work = tempfile.mkdtemp(prefix="dx_txnb_")
    fdir = os.path.join(work, "feed")
    os.makedirs(fdir)
    # three files cut mid-transaction (offset +3 into a 7-LSN txn)
    c1 = (hi // 3) // 7 * 7 + 3
    c2 = (2 * hi // 3) // 7 * 7 + 3
    slices = [(0, c1), (c1, c2), (c2, hi + 1)]
    for i, (lo, hi_x) in enumerate(slices):
        part = feed.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi_x))
        tmp = os.path.join(work, f"tmp{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(fdir, f"{i}.parquet")
        os.rename(os.path.join(tmp, src), dst)
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    loc = tempfile.mkdtemp(prefix="dx_txnt_")
    os.rmdir(loc)
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    applied = run_available_now(
        spark, fdir, table, max_files_per_trigger=1,
        checkpoint_dir=os.path.join(work, "ckpt"),
        txn_boundary=("txn_id", "txn_commit"),
    )
    if sum(l.get("txn_held", 0) for l in applied) == 0:
        raise AssertionError("txn boundary was vacuous: nothing held")
    return table.read().select("user_id", "event_type", "value_cents",
                               "props")


_ORACLES["cdc_txn_boundary"] = _CDC_FOLD_ORACLE

_ORACLES["lake_bloom_lookup"] = """
WITH ranked AS (
  SELECT user_id, event_type, CAST(round(value*100) AS BIGINT) AS value_cents,
         props, event_type = 'error' AS is_delete,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events),
fold AS (
  SELECT user_id, event_type, value_cents, props
  FROM ranked WHERE rn = 1 AND NOT is_delete)
SELECT user_id, event_type, value_cents, props FROM fold
WHERE value_cents = (
  SELECT value_cents FROM fold
  WHERE user_id = (SELECT min(user_id) FROM fold))
"""



_SCD2_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value_cents", T.LongType()),
        T.StructField("props", T.StringType()),
    ]
)


def _scd2_build(spark, feed, suppress: bool) -> DataFrame:
    from datax_spark.lake import scd

    loc = tempfile.mkdtemp(prefix="dx_scd2_")
    os.rmdir(loc)
    table = scd.scd2_create(
        spark, loc, schema=_SCD2_SCHEMA, key_cols=["user_id"],
        num_buckets=8,
    )
    hi = int(feed.agg(F.max("lsn")).collect()[0][0])
    scd.scd2_run_incremental(
        table, feed, batch_lsns=max(1, (hi + 4) // 4),
        suppress_unchanged=suppress,
    )
    return table.read().select(
        "user_id", "event_type", "value_cents", "props",
        "valid_from", "valid_to", "is_current",
    )


def q_cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 HISTORY BUILD (lake/scd.py — the type-2 dimension the
    reference's current-state sync discards): events→envelope→4
    incremental scd2_apply batches; each non-delete event opens an
    interval closed by the key's next change, deletes close without
    opening.  Returns the FULL history, so the oracle (one window over
    the whole feed) also proves batch-boundary invariance of the
    seed-based cross-batch closure."""
    return _scd2_build(
        spark, _events_feed(_t(spark, sf_dir, "events")), suppress=False
    )


def q_cdc_scd2_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 NO-OP SUPPRESSION (scd2_apply(suppress_unchanged=True) — the
    Debezium-feed reality: every source UPDATE emits an event even when
    the mapped columns are untouched): every event is duplicated at the
    adjacent LSN (lsn*2 and lsn*2+1, same payload), so HALF the feed is
    no-ops — duplicate updates and double deletes.  Suppression must
    collapse them exactly: the oracle is the plain interval window over
    the ORIGINAL feed at lsn*2, with no knowledge of the duplicates."""
    feed = _events_feed(_t(spark, sf_dir, "events"))
    doubled = feed.withColumn("lsn", F.col("lsn") * 2).unionByName(
        feed.withColumn("lsn", F.col("lsn") * 2 + 1)
    )
    return _scd2_build(spark, doubled, suppress=True)


def q_cdc_enrich_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOOKUP-JOIN ENRICHMENT in the ingest path (jobspec.build_enricher
    — the Flink lookup-join shape; the reference can only join inside
    the reader's querySql): a job.json ``enrich`` entry decorates every
    change event with broadcast customer-dimension columns BEFORE the
    MERGE, so the lake table lands pre-joined.  Runs through run_job
    (spec → enrich → quarantine-less incremental MERGE); the oracle is
    the SQL fold joined to the same dimension."""
    from datax_spark.jobspec import JobSpec, run_job

    feed = _events_feed(_t(spark, sf_dir, "events"))
    work = tempfile.mkdtemp(prefix="dx_enrich_")
    feed_dir = os.path.join(work, "feed")
    feed.write.parquet(feed_dir)
    hi = int(feed.agg(F.max("lsn")).collect()[0][0])
    spec = JobSpec.from_dict({
        "source": {"path": feed_dir},
        "target": {"location": os.path.join(work, "lake"),
                   "key_cols": ["user_id"], "bucket_col": "user_id",
                   "num_buckets": 8},
        "run": {"kind": "incremental",
                "batch_lsns": max(1, (hi + 4) // 4)},
        "enrich": [{"path": os.path.join(sf_dir, "customer.parquet"),
                    "on": {"user_id": "c_custkey"},
                    "cols": ["c_mktsegment", "c_nationkey"],
                    "how": "left"}],
    })
    problems = spec.pre_check(spark)
    assert problems == [], f"pre_check: {problems}"
    summary = run_job(spark, spec)
    assert summary["batches"] >= 2, summary
    table = LakeTable(spark, spec.target.location)
    return table.read().select(
        "user_id", "event_type", "value_cents", "props",
        "c_mktsegment", "c_nationkey",
    )


_ORACLES_ENRICH = """
WITH ranked AS (
  SELECT user_id, event_type, CAST(round(value*100) AS BIGINT) AS value_cents,
         props, event_type = 'error' AS is_delete,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events),
fold AS (
  SELECT user_id, event_type, value_cents, props
  FROM ranked WHERE rn = 1 AND NOT is_delete)
SELECT f.user_id, f.event_type, f.value_cents, f.props,
       c.c_mktsegment, c.c_nationkey
FROM fold f LEFT JOIN customer c ON f.user_id = c.c_custkey
"""


_SCD2_ORACLE = """
WITH e AS (
  SELECT user_id, event_type, CAST(round(value*100) AS BIGINT) AS value_cents,
         props, CAST(event_id AS BIGINT){lsn_expr} AS lsn,
         event_type = 'error' AS is_delete
  FROM events),
iv AS (
  SELECT *, lead(lsn) OVER (PARTITION BY user_id ORDER BY lsn) AS valid_to
  FROM e)
SELECT user_id, event_type, value_cents, props,
       lsn AS valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM iv WHERE NOT is_delete
"""

def q_cdc_incremental_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL (chunked) SNAPSHOT BOOTSTRAP — the DBLog / Debezium
    incremental-snapshot shape (sources/debezium.emit_incremental_snapshot):
    the first half of the feed is upstream HISTORY the wire never carries
    (truncated binlog); the consumer bootstraps from PK-range snapshot
    chunks published INTERLEAVED with the live commits of the second half,
    never pausing the feed.  Chunk rows ride the sentinel lsn=-1 fold, so
    the ordinary LWW merge converges with zero consumer machinery; the
    bootstrap_active property defers compaction for the duration (the one
    operation that would erase the ordering evidence).  Final state must
    equal the one-shot SQL fold of the WHOLE feed."""
    from datax_spark.sources import debezium as DBZ
    from datax_spark.streaming.runner import run_available_now

    feed = _events_feed(_t(spark, sf_dir, "events"))
    hi = int(feed.agg(F.max("lsn")).collect()[0][0])
    mid = hi // 2
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="dx_incsnap_")
    src = LakeTable.create(
        spark, os.path.join(work, "src"), schema=schema,
        key_cols=["user_id"], bucket_col="user_id", num_buckets=8,
    )
    pay = ["user_id", "event_type", "value_cents", "props"]
    merge_into(src, feed.filter(F.col("lsn") <= mid), op_col="op",
               order_col="lsn", mode="mor", payload_cols=pay)
    out = os.path.join(work, "wire")
    # plan + first chunk before any live commit, then interleave one live
    # slice with one chunk per step until both are exhausted; ~4 chunks at
    # any scale (each chunk is a read+publish job pair — the bootstrap's
    # unit of work, not something to multiply at bench scale)
    n_keys = src.read().count()
    res = DBZ.emit_incremental_snapshot(
        src, out, chunk_rows=max(40, (int(n_keys) + 3) // 4),
        max_chunks=1, db="appdb", name="events",
    )
    step = max(1, (hi - mid) // 3 + 1)
    lo = mid
    while lo <= hi or not res["done"]:
        if lo <= hi:
            sl = feed.filter((F.col("lsn") > lo) & (F.col("lsn") <= lo + step))
            merge_into(src, sl, op_col="op", order_col="lsn", mode="mor",
                       payload_cols=pay)
            lo += step
            DBZ.emit_table_changes(src, out, db="appdb", name="events")
        if not res["done"]:
            res = DBZ.emit_incremental_snapshot(src, out, max_chunks=1)
    tgt = LakeTable.create(
        spark, os.path.join(work, "tgt"), schema=schema,
        key_cols=["user_id"], bucket_col="user_id", num_buckets=8,
    )
    tgt.set_properties(bootstrap_active=True)
    run_available_now(
        spark, DBZ.snapshot_feed_glob(out), tgt,
        feed_format="debezium-json",
        payload="user_id long, event_type string, value_cents long, "
                "props string",
        filter_watermark=False, dedup_batch=False, auto_compact=None,
    )
    tgt.set_properties(bootstrap_active=None)
    return tgt.read().select("user_id", "event_type", "value_cents", "props")


def q_cdc_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM STATEFUL STREAMING OPERATOR (SURVEY §2.7 — the extension
    point the reference lacks entirely): per-key running (event count,
    last LSN, bytes) maintained in ``applyInPandasWithState`` GroupState
    across micro-batches (streaming/stateful.running_key_totals; Arrow
    per group, no per-row Python).  The feed drains in several
    rate-capped micro-batches; update-mode emissions are cumulative, so
    the final per-key emission must equal the one-shot SQL GROUP BY —
    and the emission count exceeding the key count proves state
    genuinely crossed batch boundaries (asserted non-vacuously)."""
    import uuid as _uuid

    from datax_spark.streaming.runner import write_feed_ordered
    from datax_spark.streaming.stateful import running_key_totals

    ev = _t(spark, sf_dir, "events")
    feed = ev.select(
        F.col("event_id").alias("lsn"),
        F.col("user_id"),
        F.col("props").alias("content"),
    )
    work = tempfile.mkdtemp(prefix="dx_stateful_")
    fp = os.path.join(work, "feed")
    write_feed_ordered(feed, fp, n_files=8)
    stream = spark.readStream.schema(
        spark.read.parquet(fp).schema
    ).option("maxFilesPerTrigger", 2).parquet(fp)
    name = f"totals_{_uuid.uuid4().hex[:8]}"
    q = (
        running_key_totals(stream, key_col="user_id")
        .writeStream.format("memory").queryName(name)
        .outputMode("update").trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .start()
    )
    q.awaitTermination(600)
    emitted = spark.table(name)
    n_keys = feed.select("user_id").distinct().count()
    assert emitted.count() > n_keys, \
        "state must cross micro-batches (keys re-emitted per batch)"
    # update-mode emissions are cumulative monotone per key: the final
    # state is the per-key max of each counter
    return emitted.groupBy(F.col("key").alias("user_key")).agg(
        F.max("n_events").alias("n_events"),
        F.max("last_lsn").alias("last_lsn"),
        F.max("bytes").alias("content_bytes"),
    )


_ORACLES["cdc_stateful_totals"] = """
SELECT CAST(user_id AS VARCHAR) AS user_key,
       COUNT(*) AS n_events,
       MAX(CAST(event_id AS BIGINT)) AS last_lsn,
       CAST(SUM(COALESCE(octet_length(encode(props)), 0)) AS BIGINT)
         AS content_bytes
FROM events GROUP BY user_id
"""


def q_cdc_minor_compact_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HISTORY-PRESERVING MINOR COMPACTION under ingest
    (lake/table.compact_minor): 4 incremental MOR batches with a minor
    compaction after each — delta files consolidate to one per bucket
    with ``__lsn``/tombstones kept, so cross-batch last-writer-wins,
    delete application, and late-arriving lower-LSN events all behave
    exactly as with the uncompacted file set.  Final state must equal
    the one-shot SQL fold; the consolidation is asserted non-vacuous."""
    feed = _events_feed(_t(spark, sf_dir, "events"))
    loc = tempfile.mkdtemp(prefix="dx_minor_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = int(feed.agg(F.max("lsn")).collect()[0][0])
    step = max(1, (hi + 4) // 4)
    consolidated = 0
    for lo in range(0, hi + 1, step):
        sl = feed.filter((F.col("lsn") > lo) & (F.col("lsn") <= lo + step))
        merge_into(table, sl, op_col="op", order_col="lsn", mode="mor",
                   auto_compact=None, bucket_deltas=True,
                   payload_cols=["user_id", "event_type", "value_cents",
                                 "props"])
        if table.compact_minor(min_files=2) is not None:
            consolidated += 1
    assert consolidated >= 2, "minor compaction must have run non-vacuously"
    assert table.file_stats()["delta_files"] <= table.manifest().num_buckets
    return table.read().select("user_id", "event_type", "value_cents",
                               "props")


_ORACLES["cdc_minor_compact_fold"] = _CDC_FOLD_ORACLE
_ORACLES["cdc_incremental_snapshot"] = _CDC_FOLD_ORACLE
_ORACLES["cdc_rate_capped_drain"] = _CDC_FOLD_ORACLE
_ORACLES["file_sequence_roundtrip"] = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderpriority,
       CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
       'seq' AS src
FROM orders
"""
_ORACLES["cdc_view_pipeline"] = """
WITH fact AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k,
         CASE WHEN o_orderkey % 53 = 0 AND o_custkey > 1
              THEN CAST(o_custkey AS BIGINT) - 1
              ELSE CAST(o_custkey AS BIGINT) END AS custkey,
         CAST(round(o_totalprice*100) AS BIGINT)
           + CASE WHEN o_orderkey % 97 = 0 THEN 1000 ELSE 0 END AS total_cents
  FROM orders WHERE o_orderkey % 291 <> 0),
dim AS (
  SELECT CAST(c_custkey AS BIGINT) AS ck,
         CASE WHEN c_custkey % 13 = 0 THEN 'REWIRED'
              ELSE c_mktsegment END AS seg
  FROM customer WHERE c_custkey % 417 <> 0)
SELECT d.seg, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(f.total_cents) AS BIGINT) AS sum_total_cents
FROM fact f JOIN dim d ON f.custkey = d.ck
GROUP BY d.seg
"""
_ORACLES["cdc_star_view"] = """
WITH fact AS (
  SELECT CAST(l_orderkey AS BIGINT) AS k1,
         CAST(l_linenumber AS BIGINT) AS k2,
         CAST(l_partkey AS BIGINT) AS partkey,
         CAST(l_suppkey AS BIGINT) AS suppkey,
         CAST(round(l_extendedprice*100) AS BIGINT)
           + CASE WHEN l_orderkey % 97 = 0 THEN 1000 ELSE 0 END
           AS price_cents
  FROM lineitem
  WHERE l_orderkey % 4 = 0 AND l_orderkey % 291 <> 0),
dimp AS (
  SELECT CAST(p_partkey AS BIGINT) AS pk,
         CASE WHEN p_partkey % 13 = 0 THEN 'REWIRED'
              ELSE p_brand END AS brand
  FROM part WHERE p_partkey % 419 <> 0),
dims AS (
  SELECT CAST(s_suppkey AS BIGINT) AS sk,
         CAST(round(s_acctbal*100) AS BIGINT)
           + CASE WHEN s_suppkey % 11 = 0 THEN 500 ELSE 0 END
           AS s_acct_cents
  FROM supplier WHERE s_suppkey % 83 <> 0)
SELECT f.k1, f.k2, f.partkey, f.suppkey, f.price_cents, p.brand,
       s.s_acct_cents
FROM fact f
JOIN dimp p ON f.partkey = p.pk
LEFT JOIN dims s ON f.suppkey = s.sk
"""
_ORACLES["text_index_view"] = """
WITH docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN 'updated contents for document ' || CAST(doc_id AS VARCHAR)
              ELSE text END AS body
  FROM documents WHERE doc_id % 31 <> 0),
p AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(body), '[a-z0-9]+')) AS token
  FROM docs)
SELECT token, CAST(doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS tf
FROM p
WHERE token IN ('updated', 'document', 'scan', 'window')
GROUP BY token, doc_id
"""
_ORACLES["text_index_bm25"] = """
WITH docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN 'updated contents for document ' || CAST(doc_id AS VARCHAR)
              ELSE text END AS body
  FROM documents WHERE doc_id % 31 <> 0),
toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(body), '[a-z0-9]+')) AS term
  FROM docs),
postings AS (SELECT doc_id, term, count(*) AS tf
             FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, sum(tf) AS dl FROM postings GROUP BY doc_id),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs,
                 CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
q AS (SELECT unnest(['scan', 'window', 'updated']) AS term),
idf AS (SELECT term,
               ln(1.0 + (s.n_docs - count(*) + 0.5) / (count(*) + 0.5)) AS idf
        FROM postings JOIN q USING (term), stats s
        GROUP BY term, s.n_docs),
contrib AS (
  SELECT p.doc_id,
         i.idf * (p.tf * 2.2)
           / (p.tf + 1.2 * (0.25 + 0.75 * d.dl / s.avgdl)) AS part
  FROM postings p JOIN idf i USING (term)
  JOIN dl d USING (doc_id), stats s)
SELECT CAST(doc_id AS BIGINT) AS doc_id, round(sum(part), 6) AS score
FROM contrib GROUP BY doc_id
ORDER BY score DESC, doc_id LIMIT 20
"""
_ORACLES["lake_purge_key"] = """
SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderpriority AS prio,
       CAST(round(o_totalprice*100) AS BIGINT)
         + CASE WHEN o_orderkey % 97 = 0 THEN 1000 ELSE 0 END AS total_cents
FROM orders
WHERE o_orderkey % 291 <> 0 AND o_orderkey NOT BETWEEN 50 AND 199
"""
_ORACLES["file_orc_roundtrip"] = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderpriority,
       CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
       'orc' AS src
FROM orders
"""
_ORACLES["file_jsonl_roundtrip"] = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id, event_type,
       CAST(round(value * 100) AS BIGINT) AS value_cents
FROM events
"""
_ORACLES["cdc_enrich_dim"] = _ORACLES_ENRICH
_ORACLES["cdc_scd2_history"] = _SCD2_ORACLE.format(lsn_expr="")
# suppression collapses the duplicated events exactly, so the history
# equals the plain window over the ORIGINAL feed rescaled to lsn*2
_ORACLES["cdc_scd2_suppress"] = _SCD2_ORACLE.format(lsn_expr=" * 2")


def q_cdc_multi_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-TABLE TRANSACTIONAL APPLY (cdc/multitable.MultiTableApplier —
    the binlog reality DataX fans out as independent per-table jobs,
    ``ReaderSplitUtil.java:19-108``): one mixed feed routed on a table-name
    column into two lake tables, each batch published to the consistent-
    epoch ledger only after BOTH tables committed it.  Returns the union of
    the CONSISTENT reads (must equal the per-route folds; a half-published
    epoch or a routing error diverges).  The epoch-count assert is
    non-vacuous: every batch must have published."""
    from datax_spark.cdc.multitable import MultiTableApplier

    feed = _events_feed(_t(spark, sf_dir, "events")).withColumn(
        "tbl",
        F.when(F.col("user_id") % 2 == 0, F.lit("even")).otherwise(
            F.lit("odd")
        ),
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    work = tempfile.mkdtemp(prefix="dx_mtt_")
    tables = {
        n: LakeTable.create(
            spark, os.path.join(work, n), schema=schema,
            key_cols=["user_id"], bucket_col="user_id", num_buckets=8,
        )
        for n in ("even", "odd")
    }
    ap = MultiTableApplier(
        tables, table_col="tbl", ledger_dir=os.path.join(work, "ledger")
    )
    hi = int(feed.agg(F.max("lsn")).collect()[0][0])
    step = max(1, (hi + 3) // 3)
    for i in range(3):
        lo, up = i * step, min((i + 1) * step, hi + 1)
        ap.apply_batch(
            feed.filter((F.col("lsn") >= lo) & (F.col("lsn") < up)), i
        )
    if len(ap._epochs()) != 3:
        raise AssertionError("not every batch published an epoch")
    out = None
    for n in tables:
        part = ap.read_consistent(n).select(
            F.lit(n).alias("tbl"), "user_id", "event_type",
            "value_cents", "props",
        )
        out = part if out is None else out.unionByName(part)
    return out


_ORACLES["cdc_multi_table"] = """
WITH ranked AS (
  SELECT user_id, event_type, CAST(round(value*100) AS BIGINT) AS value_cents,
         props, event_type = 'error' AS is_delete,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events)
SELECT CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS tbl,
       user_id, event_type, value_cents, props
FROM ranked WHERE rn = 1 AND NOT is_delete
"""


def q_cdc_merge_when_clauses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHEN-clause MERGE (lake/merge.MergeBuilder — the Delta/Iceberg
    MERGE INTO surface generalizing DataX's fixed REPLACE semantics):
    fold the feed into a table, then merge per-user activity stats with
    a 3-clause program — matched & higher total ⇒ UPDATE (boost),
    matched & 7-divisible activity ⇒ DELETE, unmatched & even activity ⇒
    INSERT (restore a folded-away user) — first clause wins.  The oracle
    replays the same program over the SQL fold with IS TRUE three-valued
    gating (a NULL condition falls through, exactly like F.when)."""
    from datax_spark.lake.merge import merge_builder

    feed = _events_feed(_t(spark, sf_dir, "events"))
    loc = tempfile.mkdtemp(prefix="dx_mrg_")
    os.rmdir(loc)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value_cents", T.LongType()),
            T.StructField("props", T.StringType()),
        ]
    )
    table = LakeTable.create(
        spark, loc, schema=schema, key_cols=["user_id"],
        bucket_col="user_id", num_buckets=8,
    )
    hi = int(feed.agg(F.max("lsn")).collect()[0][0])
    run_incremental(table, feed, batch_lsns=max(1, (hi + 2) // 2))
    ev = _t(spark, sf_dir, "events")
    src = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_cents("value")).alias("total_cents"),
    )
    (
        merge_builder(table, src)
        .when_matched_update(
            set={"value_cents": "s.total_cents",
                 "event_type": F.lit("boosted")},
            condition="s.total_cents > t.value_cents")
        .when_matched_delete(condition="s.n_events % 7 = 0")
        .when_not_matched_insert(
            values={"event_type": F.lit("restored"),
                    "value_cents": "s.total_cents"},
            condition="s.n_events % 2 = 0")
        .execute(source_unique=True)  # groupBy output: one row per key
    )
    return table.read().select("user_id", "event_type", "value_cents",
                               "props")


_ORACLES["cdc_merge_when_clauses"] = """
WITH ranked AS (
  SELECT user_id, event_type, CAST(round(value*100) AS BIGINT) AS value_cents,
         props, event_type = 'error' AS is_delete,
         row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events),
state AS (SELECT user_id, event_type, value_cents, props
          FROM ranked WHERE rn = 1 AND NOT is_delete),
src AS (SELECT user_id, count(*) AS n_events,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
                 AS total_cents
        FROM events GROUP BY user_id),
j AS (SELECT s.user_id AS uid, t.user_id IS NOT NULL AS matched,
             t.event_type, t.value_cents, t.props, s.n_events, s.total_cents,
             (s.total_cents > t.value_cents) IS TRUE AS upd,
             (s.n_events % 7 = 0) IS TRUE AS del,
             (s.n_events % 2 = 0) IS TRUE AS ins
      FROM src s LEFT JOIN state t ON t.user_id = s.user_id)
SELECT uid AS user_id,
       CASE WHEN matched AND upd THEN 'boosted'
            WHEN matched THEN event_type
            ELSE 'restored' END AS event_type,
       CASE WHEN matched AND upd THEN total_cents
            WHEN matched THEN value_cents
            ELSE total_cents END AS value_cents,
       CASE WHEN matched THEN props ELSE NULL END AS props
FROM j
WHERE NOT (matched AND NOT upd AND del) AND (matched OR ins)
"""


_ORACLES["lake_snapshot_expiry"] = _CDC_FOLD_ORACLE

# identical md5 draw → u=(draw+0.5)/1e6 → round(-ln(u)/w, 9) → top-25/lang
_ORACLES["sample_weighted"] = r"""
WITH d AS (
  SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
         ('0x' || substr(md5('ws' || chr(31) || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
           % 1000000 AS draw
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
e AS (
  SELECT doc_id, lang, n_chars, draw,
         round(-ln((CAST(draw AS DOUBLE) + 0.5) / 1000000.0)
               / CAST(n_chars AS DOUBLE), 9) AS es_key
  FROM d),
r AS (
  SELECT doc_id, lang, n_chars, es_key,
         row_number() OVER (PARTITION BY lang
                            ORDER BY es_key, draw, doc_id) AS rn
  FROM e)
SELECT doc_id, lang, n_chars, es_key FROM r WHERE rn <= 25
"""

# each event falls in exactly two 10-min/5-min-slide windows: starts at
# floor(t/5min)*5min and 5min earlier — pure integer microsecond arithmetic
_ORACLES["events_sliding_window"] = """
WITH e AS (
  SELECT event_type, CAST(round(value*100) AS BIGINT) AS value_cents,
         epoch_us(ts) AS us
  FROM events),
w AS (
  SELECT event_type, value_cents,
         (us // 300000000 - o.o) * 300000000 AS ws
  FROM e, (VALUES (0), (1)) o(o))
SELECT strftime(make_timestamp(ws), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n_events,
       CAST(sum(value_cents) AS BIGINT) AS sum_value_cents
FROM w GROUP BY 1, 2
"""


def q_cdc_snowflake_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNOWFLAKE schema as composed incremental views (round-4 verdict
    Next #6; lake/joinview.flatten_dim): orders → customer → nation is a
    two-hop chain the star contract rejects directly, so the supported
    recipe maintains customer ⋈ nation as a FLATTENED DIM view (an
    ordinary LakeTable keyed by c_custkey) feeding a star over orders.
    Churn on ALL THREE levels — nation renames %5 / deletes %23,
    customer nation-rewires %7 / deletes %53, order price patches %31 /
    deletes %97 — then refresh flatten-first, star-second: a nation
    rename two hops from the fact reaches every affected order row in
    two O(changed-keys) refreshes, never a fact scan.  The oracle folds
    all three change sets in SQL and double-joins one-shot."""
    from datax_spark.lake.joinview import (
        create_star_view,
        flatten_dim,
        refresh_flattened_dim,
        refresh_star_view,
    )

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    locs = [tempfile.mkdtemp(prefix=f"dx_snow_{n}_")
            for n in ("fact", "cust", "nat", "flat", "star")]
    for d in locs:
        os.rmdir(d)
    fact = LakeTable.create(
        spark, locs[0],
        schema=T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("custkey", T.LongType()),
            T.StructField("total_cents", T.LongType()),
        ]),
        key_cols=["k"], bucket_col="k", num_buckets=8,
    )
    cust = LakeTable.create(
        spark, locs[1],
        schema=T.StructType([
            T.StructField("ck", T.LongType()),
            T.StructField("nationkey", T.LongType()),
            T.StructField("acct_cents", T.LongType()),
        ]),
        key_cols=["ck"], bucket_col="ck", num_buckets=4,
    )
    nat = LakeTable.create(
        spark, locs[2],
        schema=T.StructType([
            T.StructField("nk", T.LongType()),
            T.StructField("nname", T.StringType()),
        ]),
        key_cols=["nk"], bucket_col="nk", num_buckets=2,
    )
    ok = F.col("o_orderkey").cast("long")
    ck = F.col("c_custkey").cast("long")
    nk = F.col("n_nationkey").cast("long")
    fact.overwrite(orders.select(
        ok.alias("k"), F.col("o_custkey").cast("long").alias("custkey"),
        _cents("o_totalprice").alias("total_cents"),
    ))
    cust.overwrite(customer.select(
        ck.alias("ck"), F.col("c_nationkey").cast("long").alias("nationkey"),
        _cents("c_acctbal").alias("acct_cents"),
    ))
    nat.overwrite(nation.select(nk.alias("nk"),
                                F.col("n_name").alias("nname")))
    flat = flatten_dim(
        cust,
        [{"table": nat, "on": {"nationkey": "nk"}, "how": "inner",
          "right_cols": {"nname": "nname"}}],
        locs[3], num_buckets=4,
    )
    star = create_star_view(
        fact,
        [{"table": flat, "on": {"custkey": "ck"}, "how": "inner",
          "right_cols": {"acct_cents": "acct_cents", "nname": "nname"}}],
        locs[4], num_buckets=8,
    )
    # churn at EVERY level of the snowflake
    merge_into(nat, nation.filter((nk % 5 == 0) | (nk % 23 == 0)).select(
        nk.alias("nk"),
        F.when(nk % 5 == 0, F.lit("RENAMED"))
        .otherwise(F.col("n_name")).alias("nname"),
        (nk + F.lit(10**9)).alias("lsn"),
        F.when(nk % 23 == 0, F.lit("delete"))
        .otherwise(F.lit("insert")).alias("op"),
    ), op_col="op", order_col="lsn", mode="mor", auto_compact=None,
        keys_unique=True)
    merge_into(cust, customer.filter((ck % 7 == 0) | (ck % 53 == 0))
               .select(
        ck.alias("ck"),
        F.when(ck % 7 == 0,
               (F.col("c_nationkey").cast("long") + 1) % 25)
        .otherwise(F.col("c_nationkey").cast("long")).alias("nationkey"),
        _cents("c_acctbal").alias("acct_cents"),
        (ck + F.lit(10**9)).alias("lsn"),
        F.when(ck % 53 == 0, F.lit("delete"))
        .otherwise(F.lit("insert")).alias("op"),
    ), op_col="op", order_col="lsn", mode="mor", auto_compact=None,
        keys_unique=True)
    merge_into(fact, orders.filter((ok % 31 == 0) | (ok % 97 == 0)).select(
        ok.alias("k"), F.col("o_custkey").cast("long").alias("custkey"),
        (_cents("o_totalprice")
         + F.when(ok % 31 == 0, F.lit(1000)).otherwise(F.lit(0)))
        .alias("total_cents"),
        (ok + F.lit(10**9)).alias("lsn"),
        F.when(ok % 97 == 0, F.lit("delete"))
        .otherwise(F.lit("insert")).alias("op"),
    ), op_col="op", order_col="lsn", mode="mor", auto_compact=None,
        keys_unique=True)
    # flatten-first, star-second: the composed incremental propagation
    refresh_flattened_dim(cust, [nat], flat)
    refresh_star_view(fact, [flat], star)
    return star.read().select("k", "custkey", "total_cents",
                              "acct_cents", "nname")


_ORACLES["cdc_snowflake_view"] = """
WITH nat AS (
  SELECT CAST(n_nationkey AS BIGINT) AS nk,
         CASE WHEN n_nationkey % 5 = 0 THEN 'RENAMED'
              ELSE n_name END AS nname
  FROM nation WHERE n_nationkey % 23 <> 0),
cust AS (
  SELECT CAST(c_custkey AS BIGINT) AS ck,
         CASE WHEN c_custkey % 7 = 0
              THEN (CAST(c_nationkey AS BIGINT) + 1) % 25
              ELSE CAST(c_nationkey AS BIGINT) END AS nationkey,
         CAST(round(c_acctbal*100) AS BIGINT) AS acct_cents
  FROM customer WHERE c_custkey % 53 <> 0),
fact AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k,
         CAST(o_custkey AS BIGINT) AS custkey,
         CAST(round(o_totalprice*100) AS BIGINT)
           + CASE WHEN o_orderkey % 31 = 0 THEN 1000 ELSE 0 END
           AS total_cents
  FROM orders WHERE o_orderkey % 97 <> 0)
SELECT f.k, f.custkey, f.total_cents, c.acct_cents, n.nname
FROM fact f
JOIN cust c ON f.custkey = c.ck
JOIN nat n ON c.nationkey = n.nk
"""


# Registry order matters: the driver gate evaluates the FIRST 50 entries
# against their DuckDB oracles each round.  Round-5 policy (deterministic,
# prescribed by the round-4 verdict): oldest-driver-evidence-first — entries
# never driver-gated come first, then cohorts ascending by the round of their
# latest fully-green driver row, stable within a cohort.  Regenerate with
# ``python tools/rotate_window.py`` after each round's CORRECTNESS lands, so
# no query's driver row ever ages past ~2 rounds.
_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # ---- never driver-gated (new this round) ----
    "cdc_snowflake_view": q_cdc_snowflake_view,
    # ---- latest driver-green row: r2 ----
    "skew_salted_agg": q_skew_salted_agg,
    "cdc_shard_lineage": q_cdc_shard_lineage,
    "split_quantile_pk": q_split_quantile_pk,
    "tx_replace": q_tx_replace,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "cdc_stream_available_now": q_cdc_stream_available_now,
    "cdc_dedup_last_per_key": q_cdc_dedup_last_per_key,
    "cdc_op_mix": q_cdc_op_mix,
    "events_sessionize": q_events_sessionize,
    "tx_pandas_udf_norm": q_tx_pandas_udf_norm,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "text_langid": q_text_langid,
    "tx_chain_docs": q_tx_chain_docs,
    "dedup_exact": q_dedup_exact,
    "text_quality": q_text_quality,
    "split_minmax_pk": q_split_minmax_pk,
    "tx_filter_like": q_tx_filter_like,
    "semi_join_shipped_orders": q_semi_join_shipped_orders,
    "anti_join_idle_customers": q_anti_join_idle_customers,
    "q5_local_supplier_volume": q_q5_local_supplier_volume,
    "q6_forecast_revenue": q_q6_forecast_revenue,
    "q4_order_priority": q_q4_order_priority,
    "q7_volume_shipping": q_q7_volume_shipping,
    "q10_returned_items": q_q10_returned_items,
    "q14_promo_revenue": q_q14_promo_revenue,
    "q18_large_volume": q_q18_large_volume,
    "top_orders_per_segment": q_top_orders_per_segment,
    "q22_rich_idle_customers": q_q22_rich_idle_customers,
    "events_tumbling_window": q_events_tumbling_window,
    "events_rollup": q_events_rollup,
    "events_funnel": q_events_funnel,
    "q3_top_shipping": q_q3_top_shipping,
    "q1_pricing_summary": q_q1_pricing_summary,
    # ---- latest driver-green row: r3 ----
    "cdc_merge_cow_clustered": q_cdc_merge_cow_clustered,
    "dedup_cluster_keep_one": q_dedup_cluster_keep_one,
    "text_bm25_topk": q_text_bm25_topk,
    "embed_quantize": q_embed_quantize,
    "text_pii_scrub": q_text_pii_scrub,
    "text_contamination": q_text_contamination,
    "text_repetition": q_text_repetition,
    "text_token_stats": q_text_token_stats,
    "dedup_paragraphs": q_dedup_paragraphs,
    "sample_split": q_sample_split,
    "pack_sequences": q_pack_sequences,
    "ivf_kmeans_assign": q_ivf_kmeans_assign,
    "ann_ivf_topk": q_ann_ivf_topk,
    "embed_near_dup": q_embed_near_dup,
    "multimodal_features": q_multimodal_features,
    "multimodal_decode_meta": q_multimodal_decode_meta,  # ← gate window boundary (first 50)
    "multimodal_decode_image": q_multimodal_decode_image,
    "multimodal_decode_audio": q_multimodal_decode_audio,
    "multimodal_decode_video": q_multimodal_decode_video,
    "lake_prune_read": q_lake_prune_read,
    "lake_zorder_read": q_lake_zorder_read,
    "cdc_wap_publish": q_cdc_wap_publish,
    "cdc_changelog_read": q_cdc_changelog_read,
    "chunk_documents": q_chunk_documents,
    "text_fingerprint": q_text_fingerprint,
    "embed_cosine_topk": q_embed_cosine_topk,
    "ann_bucketed_topk": q_ann_bucketed_topk,
    "asof_purchase_attrib": q_asof_purchase_attrib,
    "asof_forward_next_purchase": q_asof_forward_next_purchase,
    "range_error_window": q_range_error_window,
    "temporal_dim_join": q_temporal_dim_join,
    "cdc_changelog_images": q_cdc_changelog_images,
    "cdc_mirror_relay": q_cdc_mirror_relay,
    "sample_stratified": q_sample_stratified,
    "dedup_ngram_jaccard_lsh": q_dedup_ngram_jaccard_lsh,
    # ---- latest driver-green row: r4 ----
    "q8_market_share": q_q8_market_share,
    "q13_customer_distribution": q_q13_customer_distribution,
    "q15_top_supplier": q_q15_top_supplier,
    "q17_small_quantity_revenue": q_q17_small_quantity_revenue,
    "q19_discounted_revenue": q_q19_discounted_revenue,
    "lake_point_lookup": q_lake_point_lookup,
    "cdc_debezium_out": q_cdc_debezium_out,
    "text_normalize": q_text_normalize,
    "cdc_join_view": q_cdc_join_view,
    "cdc_join_view_left": q_cdc_join_view_left,
    "file_orc_roundtrip": q_file_orc_roundtrip,
    "file_jsonl_roundtrip": q_file_jsonl_roundtrip,
    "lake_purge_key": q_lake_purge_key,
    "text_index_view": q_text_index_view,
    "cdc_star_view": q_cdc_star_view,
    "cdc_view_pipeline": q_cdc_view_pipeline,
    "text_index_bm25": q_text_index_bm25,
    "lake_snapshot_expiry": q_lake_snapshot_expiry,
    "sample_weighted": q_sample_weighted,
    "events_sliding_window": q_events_sliding_window,
    "cdc_merge_when_clauses": q_cdc_merge_when_clauses,
    "cdc_agg_view_distinct": q_cdc_agg_view_distinct,
    "cdc_txn_boundary": q_cdc_txn_boundary,
    "cdc_multi_table": q_cdc_multi_table,
    "cdc_scd2_history": q_cdc_scd2_history,
    "cdc_scd2_suppress": q_cdc_scd2_suppress,
    "cdc_quarantine_replay": q_cdc_quarantine_replay,
    "cdc_enrich_dim": q_cdc_enrich_dim,
    "cdc_incremental_snapshot": q_cdc_incremental_snapshot,
    "cdc_minor_compact_fold": q_cdc_minor_compact_fold,
    "cdc_stateful_totals": q_cdc_stateful_totals,
    "cdc_rate_capped_drain": q_cdc_rate_capped_drain,
    "file_sequence_roundtrip": q_file_sequence_roundtrip,
    "lake_bloom_lookup": q_lake_bloom_lookup,
    "text_url_canonical": q_text_url_canonical,
    "cdc_merge_apply_e2e": q_cdc_merge_apply_e2e,
    "cdc_merge_apply_dv": q_cdc_merge_apply_dv,
    "cdc_agg_view": q_cdc_agg_view,
    "cdc_agg_view_incr": q_cdc_agg_view_incr,
    "cdc_partial_update": q_cdc_partial_update,
    "cdc_dml_delete_update": q_cdc_dml_delete_update,
    "cdc_schema_evolution": q_cdc_schema_evolution,
    "cdc_quarantine": q_cdc_quarantine,
    "cdc_quarantine_report": q_cdc_quarantine_report,
    "cdc_shard_skew_delivery": q_cdc_shard_skew_delivery,
    "cdc_debezium_envelope": q_cdc_debezium_envelope,
    "cdc_maxwell_envelope": q_cdc_maxwell_envelope,
    "cdc_canal_envelope": q_cdc_canal_envelope,
    "file_delimited_roundtrip": q_file_delimited_roundtrip,
    "cdc_stream_continuous": q_cdc_stream_continuous,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
