"""History-reaching key purge — the right-to-be-forgotten operation.

``delete_where`` removes rows from the CURRENT snapshot; every retained
historical snapshot (time travel, tags, the changelog's file diffs) still
serves the data, and that is exactly what a GDPR/CCPA erasure request
forbids.  Iceberg's answer is "rewrite current + expire all history" —
which also destroys the audit trail for every OTHER row.  This module
keeps history and removes just the purged keys from all of it:

1. find every live data file across ALL retained manifests whose zone
   maps / bloom filters admit the purge predicate (pure manifest math,
   zero Spark jobs — at 100 TB a key-clustered table rewrites O(matching
   files), not O(history));
2. rewrite each matching file 1:1 without the purged rows, preserving the
   file's physical schema byte-for-byte (MOR delta/pdelta hidden columns
   included) and recomputing its manifest stats + bloom bitmaps;
3. swap the rewritten files into every retained manifest via the catalog
   seam's ``replace_manifest`` — the one sanctioned mutation of history —
   then record a purge audit marker in a normal properties commit and
   delete the originals.

Contract and safety:

- predicates must reference KEY columns only (the "purge user X" shape).
  Key columns are present in every file kind (base, delta, pdelta
  patches always carry the key) so the predicate is evaluable
  everywhere; non-key predicates would be undecidable on pdelta rows.
- deletion-vector history is refused loudly: dv masks address base-file
  ROW POSITIONS, and dropping rows from a base file would shift every
  later position.  Compact + expire the dv snapshots first.
- writers are FENCED for the duration: purge sets the ``purge_active``
  table property before touching any manifest, and ``_write_manifest``
  refuses every data commit that carries it (``PurgeActive``) — a writer
  whose base predates the fence hits ``CommitConflict`` on its claim,
  rebases onto the fenced manifest, and is refused there, so no commit
  can land referencing files the purge is deleting.  The pre-existing
  best-effort sweep still runs (it covers commits that landed BEFORE the
  fence version).  The fence clears in the same properties commit as the
  audit marker, after originals are removed; after a crash mid-purge the
  fence stays up and a re-run (idempotent) finishes the job and clears
  it.
- crash-safe by re-run: originals are deleted only after every manifest
  is rewritten, so a crash mid-purge leaves all snapshots readable
  (some already purged, some not); re-running finds the remaining
  matches and finishes the job.  Orphans from a crash are exactly what
  ``vacuum`` collects.
- the purge itself does not bump the table version per rewritten
  snapshot — history keeps its shape (same versions, same operations,
  same lineage); only the audit marker is a new commit.

Derived views: purge REWRITES history in place, so it never appears in
any changelog — a join/index view refreshed afterwards will NOT hear
about it.  The operator purges each fact-keyed derived view with the
SAME key predicate: views are ordinary LakeTables whose key columns
include the doc/fact key (join views are keyed by the fact key; the
index view by (token, doc_key) — the doc key is a key column, so the
predicate is purge-legal), and refreshes keep working afterwards
(pinned by ``test_purge_cascades_to_derived_views``).  Aggregate views
hold only aggregates, not per-row data — out of redaction scope by
construction.

Reference analogue: none — DataX can only re-sync a source (the
"purge" is re-running the job after the source deleted the rows,
``introduction.md:23-31``); a lake engine owns its history and must be
able to redact it.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any

from pyspark.sql import functions as F

from datax_spark.lake.table import (
    PURGE_ACTIVE_PROP,
    LakeTable,
    _bloom_may_match,
    _file_column_stats,
    _file_may_match,
    _normalize_preds,
    _preds_to_column,
)

PURGE_AUDIT_PROP = "last_purge"


def purge_rows(table: LakeTable, where: list[tuple]) -> dict:
    """Remove every row matching ``where`` from the current snapshot AND
    every retained historical snapshot.  See the module docstring for the
    contract.  Returns ``{"files_scanned", "files_rewritten",
    "files_dropped", "rows_purged", "versions_rewritten"}``."""
    preds = _normalize_preds(where)
    if not preds:
        raise ValueError("purge_rows requires at least one predicate")
    cur = table.manifest()
    keyset = set(cur.key_cols)
    bad = [c for c, _, _ in preds if c not in keyset]
    if bad:
        raise ValueError(
            f"purge predicates must reference key columns only "
            f"(got {sorted(set(bad))}; keys are {sorted(keyset)}) — "
            "non-key predicates are undecidable on partial-update rows"
        )
    # fence writers BEFORE reading any manifest state: every data commit
    # from here to the final audit+clear commit raises PurgeActive at the
    # commit point (table._write_manifest), including writers whose base
    # predates the fence (their version claim conflicts → rebase onto the
    # fenced manifest → refused).  A re-run after a crash finds the fence
    # already up and proceeds (idempotent resume).
    if not cur.properties.get(PURGE_ACTIVE_PROP):
        from datax_spark.lake.catalog import CommitConflict

        fence = {PURGE_ACTIVE_PROP: {
            "at": time.time(),
            "where": [[c, op, _jsonable(v)] for c, op, v in preds],
        }}
        for attempt in range(5):
            try:
                table.set_properties(**fence)
                break
            except CommitConflict:
                # a writer won the version claim — rebase (set_properties
                # re-reads the base) and try again; after the fence lands
                # no further data commit can race
                if attempt == 4:
                    raise
        cur = table.manifest()
    try:
        return _purge_fenced(table, preds, cur)
    except BaseException:
        # a refused purge (e.g. dv history) must not leave writers fenced;
        # manifests rewritten so far are a valid partial purge (every
        # snapshot stays readable) and a re-run finishes the job
        table.set_properties(**{PURGE_ACTIVE_PROP: None})
        raise


def _purge_fenced(table: LakeTable, preds: list[tuple], cur) -> dict:
    import pyarrow.parquet as pq

    versions = table.catalog.list_versions()
    manifests = {v: table.manifest(v) for v in versions}
    # candidate files: union over all retained snapshots, stat/bloom-pruned
    candidates: dict[str, list[Any]] = {}
    for m in manifests.values():
        for entries in m.files.values():
            for e in entries:
                kind = e[2] if len(e) > 2 else "base"
                if kind == "dv":
                    raise ValueError(
                        "table history holds deletion-vector files: dv "
                        "masks address base-file row positions, which a "
                        "purge rewrite would shift. compact() and "
                        "expire_snapshots() past the dv commits first."
                    )
                if e[0] in candidates:
                    continue
                stats = e[5] if len(e) > 5 else None
                bloom = e[6] if len(e) > 6 else None
                if not _file_may_match(stats, preds):
                    continue
                if not _bloom_may_match(bloom, preds, m.schema):
                    continue
                candidates[e[0]] = e
    pred_col = _preds_to_column(preds)
    hit = F.coalesce(pred_col, F.lit(False))
    replacements: dict[str, list[Any] | None] = {}
    rows_purged = 0
    for relpath, e in sorted(candidates.items()):
        full = os.path.join(table.location, relpath)
        old_rows = int(e[4]) if len(e) > 4 else pq.read_metadata(full).num_rows
        kept = table.spark.read.parquet(full).filter(~hit)
        tmpd = os.path.join(table.location, f".purge-{uuid.uuid4().hex}")
        kept.coalesce(1).write.mode("overwrite").parquet(tmpd)
        part = next(
            fn for fn in sorted(os.listdir(tmpd)) if fn.endswith(".parquet")
        )
        src = os.path.join(tmpd, part)
        md = pq.read_metadata(src)
        if md.num_rows == old_rows:
            # zone map / bloom admitted the file but no row matched
            _rm_tree(tmpd)
            continue
        rows_purged += old_rows - md.num_rows
        if md.num_rows == 0:
            replacements[relpath] = None
            _rm_tree(tmpd)
            continue
        bdir = os.path.dirname(relpath)  # data/b=<k>
        new_rel = os.path.join(bdir, f"{uuid.uuid4().hex}.parquet")
        dst = os.path.join(table.location, new_rel)
        os.rename(src, dst)
        _rm_tree(tmpd)
        new_e = list(e)
        new_e[0] = new_rel
        if len(new_e) > 3:
            new_e[3] = os.path.getsize(dst)
        if len(new_e) > 4:
            new_e[4] = md.num_rows
        if len(new_e) > 5:
            new_e[5] = _file_column_stats(md)
        if len(new_e) > 6:
            # recompute the bloom bitmap for the surviving rows (current
            # bloom conf; a conf-less manifest keeps no bitmap = no pruning)
            frag = table._attach_blooms(
                {os.path.basename(bdir).split("=", 1)[-1]: [new_e[:6]]}, cur
            )
            ne = next(iter(frag.values()))[0]
            new_e = ne if len(ne) > 6 else new_e[:6]
        replacements[relpath] = new_e
    versions_rewritten = 0
    if replacements:
        def rewrite(v: int, m) -> bool:
            changed = False
            new_files: dict[str, list[list[Any]]] = {}
            for b, entries in m.files.items():
                out = []
                for e in entries:
                    if e[0] in replacements:
                        r = replacements[e[0]]
                        changed = True
                        if r is None:
                            continue  # every row purged — drop the entry
                        # keep THIS manifest's schema_id/kind, swap the
                        # rest; pad short pre-stats entries ([path,
                        # schema_id]) to the 3-wide shape first
                        ne = list(r) + [None] * max(0, 3 - len(r))
                        ne[1], ne[2] = e[1], (e[2] if len(e) > 2 else "base")
                        out.append(ne)
                    else:
                        out.append(e)
                if out:
                    new_files[b] = out
            if changed:
                m.files = new_files
                table.catalog.replace_manifest(v, m.to_json())
            return changed

        for v in versions:
            if rewrite(v, manifests[v]):
                versions_rewritten += 1
        # best-effort sweep of commits that landed while we rewrote: a
        # concurrent writer may have read a pre-purge manifest and
        # committed entries referencing replaced files.  Purge is an
        # administrative operation — quiesce writers for a hard
        # guarantee — but this closes the common race before originals
        # are deleted.
        for v in table.catalog.list_versions():
            if v not in manifests:
                if rewrite(v, table.manifest(v)):
                    versions_rewritten += 1
    out = {
        "files_scanned": len(candidates),
        "files_rewritten": sum(1 for r in replacements.values()
                               if r is not None),
        "files_dropped": sum(1 for r in replacements.values() if r is None),
        "rows_purged": int(rows_purged),
        "versions_rewritten": versions_rewritten,
    }
    # originals first: every manifest already points at the rewrites, so a
    # crash here costs orphan files (vacuum's job) or a re-run that finds
    # nothing left to purge — never a broken snapshot
    for relpath in replacements:
        try:
            os.remove(os.path.join(table.location, relpath))
        except OSError:
            pass
    # audit marker + fence clear in ONE properties commit, after originals
    # are gone — the fence drops only when no deleted file can be raced
    table.set_properties(**{
        PURGE_AUDIT_PROP: {
            "at": time.time(),
            "where": [[c, op, _jsonable(v)] for c, op, v in preds],
            **out,
        },
        PURGE_ACTIVE_PROP: None,
    })
    return out


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return str(v)


def _rm_tree(path: str) -> None:
    import shutil

    shutil.rmtree(path, ignore_errors=True)
