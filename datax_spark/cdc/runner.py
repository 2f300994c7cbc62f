"""Job runners: full sync, bounded incremental replay, and resume.

≈ DataX's JobContainer lifecycle (core/src/main/java/com/alibaba/datax/core/
job/JobContainer.java:96-180: init→prepare→split→schedule→post) collapsed to
its Spark-native shape: the "split" is the feed's partitioning, the
"schedule" is Spark's, and each micro-batch is one reader→channel→writer
round that ends in an atomic lake commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.cdc.apply import CdcApplier
from datax_spark.lake.table import LakeTable

REPO_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)
KEY_COLS = ["repo", "path", "commit"]


def create_repo_table(
    spark: SparkSession,
    location: str,
    num_buckets: int = 16,
    schema: T.StructType = REPO_SCHEMA,
) -> LakeTable:
    """The Iceberg-shaped target mandated by BASELINE.json input_hint:
    (repo, path, commit, lang, content), bucketed by repo."""
    return LakeTable.create(
        spark,
        location,
        schema=schema,
        key_cols=KEY_COLS,
        bucket_col="repo",
        num_buckets=num_buckets,
    )


def full_sync(table: LakeTable, snapshot: DataFrame) -> None:
    """Initial snapshot load (DataX full-sync job; writeMode=truncate,
    hdfswriter/.../HdfsWriter.java:84-92)."""
    table.overwrite(snapshot)


def run_incremental(
    table: LakeTable,
    feed: DataFrame,
    batch_lsns: int,
    start_batch_id: int = 0,
    max_batches: int | None = None,
    on_batch=None,
    mode: str = "mor",
    auto_compact: int | None = 8,
    dedup_batch: bool = True,
    lineage_detail: str = "shards",
    bucket_deltas: bool | str = "auto",
    compact_ratio: float | None = None,
    partial_update: bool = False,
    present_col: str | None = None,
    schema_policy: str = "evolve",
) -> list[dict]:
    """Bounded incremental replay: slice the feed into micro-batches by LSN
    range and apply each with exactly-once lineage.

    This is the batch-mode equivalent of the streaming runner (identical
    apply path); used by tests for kill/resume and by bench.  Batch id =
    lsn // batch_lsns, so a resumed run regenerates identical batch
    boundaries — replayed ids no-op via the lineage guard.

    Batch-id safety: because ids derive from ``lsn // batch_lsns``, a rerun
    with a DIFFERENT ``batch_lsns`` would map genuinely new events onto
    already-applied ids and the replay guard would silently drop them.  The
    granularity is therefore recorded in table properties on first use and
    a run that (a) still has unapplied events after the watermark filter
    and (b) uses a different ``batch_lsns`` is refused.  Watermark-only
    no-op replays (any granularity) remain allowed.
    """
    applier = CdcApplier(
        table, mode=mode, auto_compact=auto_compact, dedup_batch=dedup_batch,
        lineage_detail=lineage_detail, bucket_deltas=bucket_deltas,
        compact_ratio=compact_ratio, partial_update=partial_update,
        present_col=present_col, schema_policy=schema_policy,
    )
    feed = applier.filter_already_applied(feed)
    bounds = feed.agg(
        F.min("lsn").alias("lo"), F.max("lsn").alias("hi")
    ).collect()[0]
    if bounds["lo"] is None:
        return []
    recorded = table.manifest().properties.get("incremental_batch_lsns")
    if recorded is None:
        table.set_properties(incremental_batch_lsns=int(batch_lsns))
    elif int(recorded) != int(batch_lsns):
        raise ValueError(
            f"batch_lsns={batch_lsns} conflicts with this table's recorded "
            f"granularity {recorded}: lsn//batch_lsns batch ids would "
            f"collide with already-applied ids and silently drop new "
            f"events. Re-run with batch_lsns={recorded}."
        )
    first = int(bounds["lo"]) // batch_lsns
    last = int(bounds["hi"]) // batch_lsns
    out = []
    n = 0
    for b in range(first, last + 1):
        if max_batches is not None and n >= max_batches:
            break
        lo, hi = b * batch_lsns, (b + 1) * batch_lsns
        batch = feed.filter((F.col("lsn") >= lo) & (F.col("lsn") < hi))
        lineage = applier.apply_batch(batch, start_batch_id + b)
        n += 1
        if lineage is not None:
            out.append(lineage)
            if on_batch is not None:
                on_batch(lineage)
    return out
