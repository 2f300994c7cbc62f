"""Write-Audit-Publish (WAP): staged MERGE commits audited before they land.

The lakehouse pattern Iceberg implements with ``wap.id`` branches: a batch is
written to durable storage and a STAGED (invisible) commit record, quality
checks run against the would-be state, and only then is the commit atomically
published — or aborted, deleting the files.  This is the missing half of the
reference's error-limit gate (``core/.../util/ErrorRecordChecker.java:18-82``
fails the job AFTER bad rows were already written to the target; DataX has no
way to inspect-then-swap — closest is hdfswriter's tmp-dir + rename,
``hdfswriter/.../HdfsWriter.java:195-196,293-326``, which is atomic but
unauditable).

Mechanics here: staging runs the normal MOR delta write (files land under
``data/``) but records ``{frag, lineage, file_schema}`` in
``meta/staged-<wap_id>.json`` instead of committing a manifest.  The staged
delta's parquet schema is registered under the unique string key
``wap-<wap_id>`` at read/publish time, so a table whose schema evolved
between stage and publish never collides with the staged files' schema ids.
Publish rebases onto the CURRENT manifest — MOR deltas commute, so this is
always safe — retrying through optimistic-concurrency conflicts; the batch-id
replay guard makes double-publish a no-op.  ``vacuum`` treats staged files
as live, so out-of-band maintenance can't delete an un-audited commit.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.merge import (
    DELETE_OP,
    _resolve_lineage,
    dedup_last_per_key,
)
from datax_spark.lake.table import (
    DELETED_COL,
    LSN_COL,
    CommitConflict,
    LakeTable,
    Manifest,
    merge_schemas,
)


def _staged_path(table: LakeTable, wap_id: str) -> str:
    return os.path.join(table.meta_dir, f"staged-{wap_id}.json")


def _schema_key(wap_id: str) -> str:
    return f"wap-{wap_id}"


def _load(table: LakeTable, wap_id: str) -> dict:
    p = _staged_path(table, wap_id)
    if not os.path.exists(p):
        raise FileNotFoundError(f"no staged commit {wap_id!r} at {table.location}")
    with open(p, encoding="utf-8") as f:
        return json.load(f)


def stage_merge(
    table: LakeTable,
    batch: DataFrame,
    op_col: str | None = "op",
    order_col: str | None = None,
    payload_cols: list[str] | None = None,
    lineage: dict | None = None,
    wap_id: str | None = None,
    dedup_batch: bool = True,
    files_per_bucket: int = 1,
    bucket_deltas: bool = True,
) -> str | None:
    """Write the batch as MOR delta files + a staged commit record; returns
    the ``wap_id`` (pass to :func:`read_staged` / :func:`publish_staged` /
    :func:`abort_staged`).  The table's visible state is unchanged until
    publish.  Returns None if the batch id was already applied (replay).

    Only the MOR shape can stage: its deltas are self-contained and commute
    with concurrent commits, so publishing later — after the base advanced —
    is exactly as correct as committing now.  COW/DV rewrite state computed
    against one specific base version and cannot be deferred."""
    if order_col is None:
        raise ValueError("staging requires order_col (the LSN) — published "
                         "deltas reconstruct last-writer-wins by it")
    base = table.manifest()
    if lineage and base.is_applied(lineage.get("batch_id")):
        return None
    wap_id = wap_id or uuid.uuid4().hex[:12]
    if os.path.exists(_staged_path(table, wap_id)):
        raise FileExistsError(f"staged commit {wap_id!r} already exists")
    if dedup_batch:
        batch = dedup_last_per_key(batch, base.key_cols, order_col)
    keep = (payload_cols if payload_cols is not None
            else [c for c in batch.columns if c not in (op_col, order_col)])
    batch = batch.select(
        *([op_col] if op_col in batch.columns else []),
        F.col(order_col).cast("long").alias(LSN_COL),
        *keep,
    )
    data_cols = [c for c in batch.columns if c not in (op_col, LSN_COL)]
    file_schema = merge_schemas(base.schema, batch.select(*data_cols).schema)
    delta = batch.select(
        *[
            (F.col(f.name).cast(f.dataType) if f.name in batch.columns
             else F.lit(None).cast(f.dataType)).alias(f.name)
            for f in file_schema.fields
        ],
        F.col(LSN_COL),
        (
            (F.col(op_col) == F.lit(DELETE_OP))
            if op_col is not None and op_col in batch.columns
            else F.lit(False)
        ).alias(DELETED_COL),
    )
    staged_base = Manifest(**{**base.__dict__, "schema": file_schema})
    frag = table._stage_write(
        delta, staged_base, files_per_bucket,
        kind="delta", extra_cols=[LSN_COL, DELETED_COL],
        bucketed=bucket_deltas,
    )
    skey = _schema_key(wap_id)
    frag = {b: [[e[0], skey, *e[2:]] for e in v] for b, v in frag.items()}
    lineage = _resolve_lineage(lineage)
    rec = {
        "wap_id": wap_id,
        "frag": frag,
        "lineage": lineage,
        "file_schema": file_schema.jsonValue(),
        "staged_at_version": base.version,
    }
    with open(_staged_path(table, wap_id), "x", encoding="utf-8") as f:
        json.dump(rec, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    return wap_id


def _preview_manifest(table: LakeTable, rec: dict) -> Manifest:
    m = table.manifest()
    file_schema = T.StructType.fromJson(rec["file_schema"])
    files = {b: list(v) for b, v in m.files.items()}
    for b, v in rec["frag"].items():
        files.setdefault(b, []).extend(v)
    return Manifest(**{
        **m.__dict__,
        "schema": merge_schemas(m.schema, file_schema),
        "files": files,
        "schemas": {**m.schemas,
                    _schema_key(rec["wap_id"]): rec["file_schema"]},
    })


def read_staged(table: LakeTable, wap_id: str) -> DataFrame:
    """The state the table WOULD have after publishing — current snapshot +
    the staged deltas, last-writer-wins reconstructed.  This is the audit
    surface: run row counts, invariant checks, dedup-rate checks against it
    before deciding publish vs abort."""
    return table.read(_manifest=_preview_manifest(table, _load(table, wap_id)))


def list_staged(table: LakeTable) -> list[str]:
    return sorted(
        fn[len("staged-"):-len(".json")]
        for fn in os.listdir(table.meta_dir)
        if fn.startswith("staged-") and fn.endswith(".json")
    )


def publish_staged(table: LakeTable, wap_id: str, max_retries: int = 5):
    """Atomically promote the staged commit onto the CURRENT manifest
    (rebase — MOR deltas commute with whatever landed since staging).
    Returns the new Manifest, or None when the batch id was already applied
    (replay / double-publish).  The staged record is removed on success."""
    rec = _load(table, wap_id)
    file_schema = T.StructType.fromJson(rec["file_schema"])
    lineage = rec.get("lineage")
    last_err: Exception | None = None
    for _ in range(max_retries):
        base = table.manifest()
        if lineage and base.is_applied(lineage.get("batch_id")):
            os.remove(_staged_path(table, wap_id))
            return None
        base2 = Manifest(**{
            **base.__dict__,
            "schemas": {**base.schemas,
                        _schema_key(wap_id): rec["file_schema"]},
        })
        try:
            m = table._commit(
                base2,
                {b: [list(e) for e in v] for b, v in rec["frag"].items()},
                replaced_buckets=set(),
                lineage=dict(lineage) if lineage else None,
                schema=merge_schemas(base.schema, file_schema),
                operation="merge-mor",
            )
            os.remove(_staged_path(table, wap_id))
            return m
        except CommitConflict as e:
            last_err = e
            continue
    raise last_err  # type: ignore[misc]


def abort_staged(table: LakeTable, wap_id: str) -> int:
    """Drop the staged commit and delete its data files; returns the number
    of files removed.  The audit said no — nothing was ever visible."""
    rec = _load(table, wap_id)
    removed = 0
    for entries in rec["frag"].values():
        for e in entries:
            p = os.path.join(table.location, e[0])
            if os.path.exists(p):
                os.remove(p)
                removed += 1
    os.remove(_staged_path(table, wap_id))
    return removed
