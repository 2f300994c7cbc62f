"""CLI entry point: ``python -m datax_spark.cli job.json [--dry-run]``.

≈ ``python datax.py job.json`` (reference Engine.main,
core/src/main/java/com/alibaba/datax/core/Engine.java:215-236) collapsed to
its Spark shape: parse spec → preCheck → run → print summary JSON.
"""

from __future__ import annotations

import argparse
import json
import sys

from datax_spark.jobspec import JobSpec, run_job
from datax_spark.session import get_session


def _run_cmd(args) -> int:
    spec = JobSpec.from_json(args.job)
    spark = get_session("datax-spark-job", cores=args.cores)
    problems = spec.pre_check(spark)
    if problems:
        print(json.dumps({"ok": False, "problems": problems}))
        return 2
    if args.dry_run:
        print(json.dumps({"ok": True, "dry_run": True}))
        return 0
    summary = run_job(spark, spec)
    print(json.dumps({"ok": True, **summary}))
    return 0


def _maintain_cmd(args) -> int:
    """Out-of-band table maintenance (the analogue of the reference's
    post-job hooks + our compaction scheduling, ROADMAP)."""
    from datax_spark.lake.table import LakeTable
    from datax_spark.metrics import job_report

    spark = get_session("datax-spark-maintain", cores=args.cores)
    t = LakeTable(spark, args.table)
    out = {"ok": True, "table": args.table, "version": t.current_version()}
    if args.bloom_cols:
        # enable per-file bloom filters for all FUTURE writes; set BEFORE
        # the compaction blocks below so `--bloom-cols ... --compact` in
        # one invocation backfills the existing files with bitmaps
        t.set_bloom_filters(args.bloom_cols, m_bits=args.bloom_bits)
        out["bloom_cols"] = args.bloom_cols
        t = LakeTable(spark, args.table)  # reload properties
    if args.compact_ratio is not None:
        # out-of-band cost-based compaction: only buckets whose delta bytes
        # exceed ratio x base bytes (manifest-stat planning, no listing)
        cand = t.compaction_candidates(delta_ratio=args.compact_ratio)
        out["compaction_candidates"] = [str(b) for b in cand]
        m = (t.compact(cand, files_per_bucket=args.files_per_bucket,
                       sort_cols=args.sort_cols) if cand else None)
        out["compacted"] = m is not None
        if m is not None:
            out["version"] = m.version
    elif args.compact or args.sort_cols:
        m = t.compact(files_per_bucket=args.files_per_bucket,
                      sort_cols=args.sort_cols)
        out["compacted"] = m is not None
        if m is not None:
            out["version"] = m.version
    if args.compact_minor:
        # history-preserving delta consolidation — the only compaction
        # allowed while an incremental-snapshot bootstrap is in flight
        m = t.compact_minor(min_files=args.compact_minor)
        out["compacted_minor"] = m is not None
        if m is not None:
            out["version"] = m.version
    if args.rebucket_target_bytes is not None:
        n = t.suggest_num_buckets(args.rebucket_target_bytes)
        out["rebucket_to"] = n
        if n is not None:
            m = t.rebucket(num_buckets=n)
            out["rebucketed"] = m is not None
            if m is not None:
                out["version"] = m.version
                out["num_buckets"] = m.num_buckets
    if args.tag:
        t.create_tag(args.tag)
        out["tagged"] = {args.tag: t.tag_version(args.tag)}
    if args.rollback is not None or args.rollback_tag is not None:
        m = t.rollback(version=args.rollback, tag=args.rollback_tag)
        out["rolled_back_to"] = (
            args.rollback if args.rollback is not None else args.rollback_tag
        )
        out["version"] = m.version
    if args.purge:
        # right-to-be-forgotten: each COL=V (repeatable; same column twice
        # becomes an IN-list) must name a key column; reaches ALL retained
        # snapshots, not just the current one
        from datax_spark.lake.purge import purge_rows

        by_col: dict[str, list[str]] = {}
        for pair in args.purge:
            c, _, v = pair.partition("=")
            if not _:
                print(json.dumps({"ok": False,
                                  "error": f"--purge wants COL=VALUE, "
                                           f"got {pair!r}"}))
                return 2
            by_col.setdefault(c, []).append(v)
        sch = {f.name: f.dataType.simpleString() for f in t.schema().fields}

        def coerce(c, vals):
            dt = sch.get(c)
            if dt in ("bigint", "int", "smallint", "tinyint"):
                vals = [int(v) for v in vals]
            elif dt in ("double", "float"):
                vals = [float(v) for v in vals]
            elif dt == "boolean":
                lut = {"true": True, "1": True, "false": False, "0": False}
                try:
                    vals = [lut[v.lower()] for v in vals]
                except KeyError:
                    raise ValueError(
                        f"--purge {c}=... wants true/false for a boolean "
                        f"column, got {vals!r}") from None
            elif dt is not None and dt != "string":
                # date/decimal/binary/... key equality needs a typed value
                # the shell can't spell unambiguously — surface a contract
                # error instead of letting a str-vs-typed comparison blow
                # up inside zone-map pruning
                raise ValueError(
                    f"--purge on {c} ({dt}) is not supported from the CLI "
                    "— call datax_spark.lake.purge.purge_rows() with a "
                    "typed value")
            return (c, "=", vals[0]) if len(vals) == 1 else (c, "in", vals)
        try:
            res = purge_rows(t, [coerce(c, vs) for c, vs in by_col.items()])
        except ValueError as e:
            print(json.dumps({"ok": False, "error": str(e)}))
            return 2
        out["purge"] = res
        out["version"] = t.current_version()
    if args.vacuum is not None:
        out["vacuumed_files"] = t.vacuum(keep_versions=args.vacuum)
    if args.report:
        out["report"] = job_report(t)
        out["files"] = t.file_stats()
    if args.snapshots:
        out["snapshots"] = [r.asDict() for r in t.snapshots_df().collect()]
    print(json.dumps(out))
    return 0


def _relay_cmd(args) -> int:
    """Maintain a downstream mirror from an upstream table's changelog —
    the CLI face of lake/mirror.py (DataX analogue: chaining two sync jobs,
    minus the second full extraction — the hop is the commit log)."""
    from datax_spark.lake.mirror import bootstrap_mirror, sync_mirror
    from datax_spark.lake.table import LakeTable

    spark = get_session("datax-spark-relay", cores=args.cores)
    upstream = LakeTable(spark, args.upstream)
    out = {"ok": True, "upstream": args.upstream, "mirror": args.mirror}
    if args.lag:
        from datax_spark.lake.mirror import mirror_lag

        out["lag"] = mirror_lag(upstream, LakeTable(spark, args.mirror))
        print(json.dumps(out))
        return 0
    if not LakeTable.exists(args.mirror):
        mirror = bootstrap_mirror(upstream, args.mirror,
                                  version=args.bootstrap_version)
        out["bootstrapped"] = True
    else:
        mirror = LakeTable(spark, args.mirror)
        out["bootstrapped"] = False
    res = sync_mirror(upstream, mirror, on_rewrite=args.on_rewrite,
                      mode=args.mode)
    out.update(res)
    print(json.dumps(out))
    return 0


def _cdcout_cmd(args) -> int:
    """Publish a table's changelog as Debezium JSON-lines commit dirs —
    the CLI face of sources/debezium.emit_table_changes (CDC interchange
    out; re-running resumes from the last published commit)."""

    from datax_spark.lake.table import LakeTable
    from datax_spark.sources.debezium import (
        emit_table_changes,
        emit_table_snapshot,
        is_published,
    )

    spark = get_session("datax-spark-cdcout", cores=args.cores)
    upstream = LakeTable(spark, args.upstream)
    out = {"ok": True, "upstream": args.upstream, "out": args.out}
    if args.incremental_snapshot:
        # DBLog-shaped chunked bootstrap: publish up to --snapshot-chunks
        # PK-range chunks per invocation, interleaved with the ordinary
        # changes pass below — the feed never pauses.  Re-running resumes
        # the persisted chunk plan; once done this flag is a no-op.
        from datax_spark.sources.debezium import emit_incremental_snapshot

        out["snapshot"] = emit_incremental_snapshot(
            upstream, args.out, chunk_rows=args.snapshot_chunk_rows,
            max_chunks=args.snapshot_chunks, db=args.db, name=args.name,
        )
    elif args.bootstrap and not is_published(args.out):
        # snapshot-then-follow: publish op:"r" records + the watermark,
        # then the ordinary changes pass below no-ops until new commits
        out.update(emit_table_snapshot(
            upstream, args.out, db=args.db, name=args.name
        ))
    out.update(
        emit_table_changes(upstream, args.out, db=args.db, name=args.name,
                           on_rewrite=args.on_rewrite)
    )
    print(json.dumps(out))
    return 0


def _aggview_cmd(args) -> int:
    """Maintain an incremental aggregate view from an upstream table's
    changelog — the CLI face of lake/aggview.py (created on first call,
    refreshed thereafter; re-running a completed refresh is a no-op)."""
    from datax_spark.lake.aggview import create_agg_view, refresh_agg_view
    from datax_spark.lake.table import LakeTable

    spark = get_session("datax-spark-aggview", cores=args.cores)
    upstream = LakeTable(spark, args.upstream)
    out = {"ok": True, "upstream": args.upstream, "view": args.view}
    if args.lag:
        from datax_spark.lake.aggview import view_lag

        out["lag"] = view_lag(upstream, LakeTable(spark, args.view))
        print(json.dumps(out))
        return 0
    try:
        if not LakeTable.exists(args.view):
            if not args.dims:
                raise ValueError("--dims is required to create a view")
            view = create_agg_view(
                upstream, args.view, dims=args.dims, sums=args.sums or [],
                mins=args.mins or [], maxs=args.maxs or [],
                version=args.bootstrap_version,
            )
            out["created"] = True
        else:
            view = LakeTable(spark, args.view)
            out["created"] = False
        res = refresh_agg_view(upstream, view, on_rewrite=args.on_rewrite)
    except (ValueError, FileExistsError) as e:
        print(json.dumps({"ok": False, "error": str(e)}))
        return 2
    out.update(res)
    print(json.dumps(out))
    return 0


def _joinview_cmd(args) -> int:
    """Maintain an incremental equi-join view from two upstream tables'
    changelogs — the CLI face of lake/joinview.py (created on first call,
    refreshed thereafter; re-running a completed refresh is a no-op)."""
    from datax_spark.lake.joinview import (
        create_join_view, join_view_lag, refresh_join_view,
    )
    from datax_spark.lake.table import LakeTable

    spark = get_session("datax-spark-joinview", cores=args.cores)
    left = LakeTable(spark, args.left)
    right = LakeTable(spark, args.right)
    out = {"ok": True, "left": args.left, "right": args.right,
           "view": args.view}
    if args.lag:
        out["lag"] = join_view_lag(left, right, LakeTable(spark, args.view))
        print(json.dumps(out))
        return 0
    try:
        if not LakeTable.exists(args.view):
            if not args.on:
                raise ValueError("--on is required to create a view")
            on = dict(pair.split("=", 1) for pair in args.on)
            rcols = (dict(pair.split("=", 1) for pair in args.right_cols)
                     if args.right_cols else None)
            view = create_join_view(
                left, right, args.view, on=on, right_cols=rcols,
                how=args.how,
            )
            out["created"] = True
        else:
            view = LakeTable(spark, args.view)
            out["created"] = False
        res = refresh_join_view(left, right, view,
                                on_rewrite=args.on_rewrite)
    except (ValueError, FileExistsError) as e:
        print(json.dumps({"ok": False, "error": str(e)}))
        return 2
    out.update(res)
    print(json.dumps(out))
    return 0


def _search_cmd(args) -> int:
    """Term search against a maintained inverted-index view
    (lake/indexview.py): postings for the query terms are a bucket- and
    zone-map-pruned point read; docs rank by matched-term count then
    summed term frequency."""
    from pyspark.sql import functions as F

    from datax_spark.lake.indexview import _spec, lookup_postings
    from datax_spark.lake.table import LakeTable

    spark = get_session("datax-spark-search", cores=args.cores)
    view = LakeTable(spark, args.index)
    try:
        spec = _spec(view)
        if args.bm25:
            from datax_spark.lake.indexview import search_bm25

            doclen = (LakeTable(spark, args.doclen)
                      if args.doclen else None)
            hits = search_bm25(view, args.terms, k=args.topk,
                               doclen=doclen)
        else:
            keys = list(spec["doc_keys"])
            hits = (
                lookup_postings(view, args.terms)
                .groupBy(*keys)
                .agg(F.countDistinct("token").alias("matched"),
                     F.sum("tf").alias("score"))
                .orderBy(F.col("matched").desc(), F.col("score").desc(),
                         *[F.col(k) for k in keys])
                .limit(args.topk)
            )
    except ValueError as e:
        print(json.dumps({"ok": False, "error": str(e)}))
        return 2
    print(json.dumps({
        "ok": True, "index": args.index, "terms": args.terms,
        "ranking": "bm25" if args.bm25 else "tf",
        "hits": [r.asDict() for r in hits.collect()],
    }, default=str))
    return 0


def _dlq_cmd(args) -> int:
    from datax_spark import get_session
    from datax_spark.cdc import quarantine as Q
    from datax_spark.jobspec import JobSpec
    from datax_spark.lake.table import LakeTable
    from datax_spark.transforms import TransformerRegistry

    spec = JobSpec.from_json(args.job)
    if not spec.quarantine_path:
        print(json.dumps({"ok": False,
                          "error": "job has no quarantine_path"}))
        return 2
    spark = get_session("datax-spark-dlq", cores=args.cores)
    if not LakeTable.exists(spec.target.location):
        print(json.dumps({"ok": False,
                          "error": "target table does not exist — run the "
                                   "job first"}))
        return 2
    # NOT the job's transform chain: quarantined rows were captured
    # AFTER it ran (run_job transforms the feed before quarantine), so
    # re-applying it would double-transform them.  The fix for stored
    # rows is its own chain, passed explicitly.
    fix = None
    if args.fix_chain:
        chain = json.loads(args.fix_chain)
        fix = lambda df: TransformerRegistry().apply_chain(df, chain)
    res = Q.replay_quarantine(
        spark, spec.quarantine_path, LakeTable(spark, spec.target.location),
        Q.envelope_rules(spec.target.key_cols), fix=fix,
        auto_compact=spec.merge.auto_compact,
        bucket_deltas=spec.merge.bucket_deltas,
    )
    print(json.dumps({"ok": True, "quarantine": spec.quarantine_path,
                      **res}))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="datax-spark")
    sub = p.add_subparsers(dest="cmd")

    runp = sub.add_parser("run", help="execute a job spec (default command)")
    runp.add_argument("job", help="path to job spec JSON")
    runp.add_argument("--dry-run", action="store_true",
                      help="validate only (preCheck), write nothing")
    runp.add_argument("--cores", default=None)

    mnt = sub.add_parser("maintain", help="compact / vacuum / report a table")
    mnt.add_argument("table", help="lake table location")
    mnt.add_argument("--compact", action="store_true")
    mnt.add_argument("--compact-minor", type=int, default=None,
                     metavar="MIN_FILES",
                     help="history-preserving delta consolidation (keeps "
                          "__lsn/tombstones — safe during a bootstrap): "
                          "collapse each bucket holding at least MIN_FILES "
                          "delta files into one")
    mnt.add_argument("--compact-ratio", type=float, default=None, metavar="R",
                     help="cost-based compaction: only buckets with delta "
                          "bytes > R x base bytes")
    mnt.add_argument("--sort-cols", default=None, metavar="C1,C2",
                     type=lambda v: [c for c in v.split(",") if c],
                     help="cluster rewritten files by these columns "
                          "(Iceberg SORT ORDER): zone maps become selective "
                          "for read(where=...) file skipping; implies a "
                          "full re-clustering compact when no deltas exist")
    mnt.add_argument("--files-per-bucket", type=int, default=1,
                     help="files per bucket on compaction (pair with "
                          "--sort-cols for narrow-range files)")
    mnt.add_argument("--rebucket-target-bytes", type=int, default=None,
                     metavar="BYTES",
                     help="bucket-count evolution: rewrite to the next "
                          "power-of-2 multiple of buckets so the average "
                          "bucket holds at most BYTES of base data")
    mnt.add_argument("--bloom-cols", default=None, metavar="C1,C2",
                     type=lambda v: [c for c in v.split(",") if c],
                     help="enable per-file bloom filters on these columns "
                          "for equality-lookup file skipping (zone-map "
                          "blind spots); combine with --compact to "
                          "backfill existing files (on an already-"
                          "compacted table add --sort-cols, which forces "
                          "the rewrite)")
    mnt.add_argument("--bloom-bits", type=int, default=32768,
                     help="bloom bitmap bits per file per column "
                          "(default 32768 = 4 KiB)")
    mnt.add_argument("--purge", default=None, nargs="+", metavar="COL=V",
                     help="right-to-be-forgotten: remove matching rows "
                          "from the current AND every retained historical "
                          "snapshot (key columns only; repeat a column "
                          "for an IN-list)")
    mnt.add_argument("--tag", default=None, metavar="NAME",
                     help="tag the current snapshot (protects it from "
                          "expire_snapshots; read(version=tag_version))")
    mnt.add_argument("--rollback", type=int, default=None, metavar="VERSION",
                     help="restore the table to VERSION as a new commit "
                          "(state, replay guards, and LSN watermarks revert; "
                          "history stays time-travelable)")
    mnt.add_argument("--rollback-tag", default=None, metavar="NAME",
                     help="like --rollback but targets a tag name")
    mnt.add_argument("--vacuum", type=int, default=None, metavar="KEEP",
                     help="delete files unreferenced by the last KEEP versions")
    mnt.add_argument("--report", action="store_true")
    mnt.add_argument("--snapshots", action="store_true",
                     help="list commit history (version, operation, file/"
                          "byte/row totals) from manifests")
    mnt.add_argument("--cores", default=None)

    rel = sub.add_parser("relay", help="mirror a table from its changelog")
    rel.add_argument("upstream", help="upstream lake table location")
    rel.add_argument("mirror", help="mirror location (bootstrapped if absent)")
    rel.add_argument("--bootstrap-version", type=int, default=None,
                     help="snapshot version to bootstrap from (0 = empty "
                          "mirror that replays the whole changelog)")
    rel.add_argument("--mode", default="mor", choices=["mor", "cow", "dv"],
                     help="merge mode for applied deltas")
    rel.add_argument("--on-rewrite", default="error",
                     choices=["error", "skip"],
                     help="changelog behavior across compaction/rewrite "
                          "commits")
    rel.add_argument("--lag", action="store_true",
                     help="report staleness (versions/seconds behind "
                          "upstream) without syncing")
    rel.add_argument("--cores", default=None)

    agg = sub.add_parser(
        "aggview", help="maintain a count/sum rollup from a table's changelog"
    )
    agg.add_argument("upstream", help="upstream lake table location")
    agg.add_argument("view", help="view location (created if absent)")
    agg.add_argument("--dims", default=None, metavar="C1,C2",
                     type=lambda v: [c for c in v.split(",") if c],
                     help="GROUP BY dimensions (required on create)")
    agg.add_argument("--sums", default=None, metavar="C1,C2",
                     type=lambda v: [c for c in v.split(",") if c],
                     help="numeric columns to maintain sum_<col> for")
    agg.add_argument("--mins", default=None, metavar="C1,C2",
                     type=lambda v: [c for c in v.split(",") if c],
                     help="columns to maintain min_<col> for (departed "
                          "extremum → group rescan)")
    agg.add_argument("--maxs", default=None, metavar="C1,C2",
                     type=lambda v: [c for c in v.split(",") if c],
                     help="columns to maintain max_<col> for")
    agg.add_argument("--bootstrap-version", type=int, default=None,
                     help="snapshot version to bootstrap from (0 = empty "
                          "view that replays the whole changelog)")
    agg.add_argument("--on-rewrite", default="error",
                     choices=["error", "skip"],
                     help="changelog behavior across state-rewrite commits")
    agg.add_argument("--lag", action="store_true",
                     help="report staleness (versions/seconds behind "
                          "upstream) without refreshing")
    agg.add_argument("--cores", default=None)

    jv = sub.add_parser(
        "joinview",
        help="maintain a fact-join-dim view from two tables' changelogs",
    )
    jv.add_argument("left", help="left (fact) lake table location")
    jv.add_argument("right", help="right (dim) lake table location")
    jv.add_argument("view", help="view location (created if absent)")
    jv.add_argument("--on", default=None, nargs="+", metavar="LCOL=RCOL",
                    help="equi-join column pairs; the right side must be "
                         "exactly the right table's key columns (required "
                         "on create)")
    jv.add_argument("--right-cols", default=None, nargs="+",
                    metavar="OUT=RCOL",
                    help="dim columns to carry into the view (default: all "
                         "right non-key columns under their own names)")
    jv.add_argument("--how", default="inner", choices=["inner", "left"],
                    help="join type (left keeps unmatched fact rows with "
                         "null dim columns)")
    jv.add_argument("--on-rewrite", default="error",
                    choices=["error", "skip"],
                    help="changelog behavior across state-rewrite commits")
    jv.add_argument("--lag", action="store_true",
                    help="report staleness vs both upstreams without "
                         "refreshing")
    jv.add_argument("--cores", default=None)

    cdc = sub.add_parser(
        "cdcout",
        help="publish a table's changelog as Debezium JSON-lines commit dirs",
    )
    cdc.add_argument("upstream", help="upstream lake table location")
    cdc.add_argument("out", help="output directory (one "
                                 "_commit_version=<v>/ dir per commit; "
                                 "re-running resumes from the last one)")
    cdc.add_argument("--db", default="lake", help="source.db field value")
    cdc.add_argument("--name", default=None,
                     help="source.table field value (default: table dirname)")
    cdc.add_argument("--on-rewrite", default="error",
                     choices=["error", "skip"],
                     help="changelog behavior across compaction/rewrite "
                          "commits")
    cdc.add_argument("--bootstrap", action="store_true",
                     help="on an empty output dir, publish a snapshot "
                          "bootstrap (op:'r' records) before following "
                          "the changelog")
    cdc.add_argument("--incremental-snapshot", action="store_true",
                     help="DBLog-shaped chunked bootstrap: publish PK-range "
                          "snapshot chunks interleaved with the changes "
                          "pass instead of a stop-the-world snapshot; "
                          "re-running resumes the persisted chunk plan")
    cdc.add_argument("--snapshot-chunks", type=int, default=None,
                     help="max chunks per invocation (default: all "
                          "remaining)")
    cdc.add_argument("--snapshot-chunk-rows", type=int, default=100_000,
                     help="target rows per snapshot chunk")
    cdc.add_argument("--cores", default=None)

    srch = sub.add_parser(
        "search",
        help="term search against a maintained inverted-index view",
    )
    srch.add_argument("index", help="index view location (lake/indexview)")
    srch.add_argument("terms", nargs="+", help="query terms")
    srch.add_argument("--topk", type=int, default=10)
    srch.add_argument("--bm25", action="store_true",
                      help="rank by Okapi BM25 instead of matched-term "
                           "count + summed tf")
    srch.add_argument("--doclen", default=None, metavar="PATH",
                      help="doc-length rollup view (an agg view over the "
                           "index, sums=['tf']) — avoids the one-shot "
                           "length aggregate on a big index")
    srch.add_argument("--cores", default=None)

    dlq = sub.add_parser(
        "dlq",
        help="replay a job's quarantined rows through its (fixed) "
             "transform chain back into the target",
    )
    dlq.add_argument("job", help="path to the job spec JSON — supplies the "
                                 "quarantine path, validation rules, and "
                                 "target table")
    dlq.add_argument("--fix-chain", default=None, metavar="JSON",
                     help="transform chain (JSON list, dx_* specs) applied "
                          "to the STORED quarantined rows before "
                          "re-validation — distinct from the job's feed "
                          "transforms, which already ran before quarantine")
    dlq.add_argument("--cores", default=None)

    argv = list(sys.argv[1:] if argv is None else argv)
    # back-compat: bare `cli.py job.json [flags]` == the run subcommand
    if argv and argv[0] not in ("run", "maintain", "relay", "aggview",
                                "joinview", "cdcout", "search", "dlq",
                                "-h", "--help"):
        argv = ["run", *argv]
    args = p.parse_args(argv)
    if args.cmd == "maintain":
        return _maintain_cmd(args)
    if args.cmd == "relay":
        return _relay_cmd(args)
    if args.cmd == "aggview":
        return _aggview_cmd(args)
    if args.cmd == "joinview":
        return _joinview_cmd(args)
    if args.cmd == "search":
        return _search_cmd(args)
    if args.cmd == "cdcout":
        return _cdcout_cmd(args)
    if args.cmd == "dlq":
        return _dlq_cmd(args)
    return _run_cmd(args)


if __name__ == "__main__":
    sys.exit(main())
