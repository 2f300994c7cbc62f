"""Benchmark harness — the driver runs this per-round (BENCH_r{N}.json).

Headline metric: sustained CDC upsert throughput (change-events/sec) through
the full engine path — deterministic synthetic feed (fixtures.change_events)
→ envelope → incremental MERGE batches into a LakeTable — plus wall-clock
for each suite query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "cdc_upsert_events_per_sec", "value": N, "unit": "events/sec",
   "queries": {...secs...}, "sf": 0.1, ...}

Env knobs: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32), DX_BENCH_EVENTS (default 200_000).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F  # noqa: F401 (bench queries may use)


def bench_cdc_ingest(
    spark, n_events: int, n_batches: int = 4, mode: str = "mor",
    dedup_batch: bool = True, lineage_detail: str = "shards",
    bucket_deltas: bool = True, verify: bool = True,
) -> dict:
    """Full-sync + incremental MERGE replay of a synthetic feed; returns
    events/sec over the incremental (steady-state) phase, plus compaction
    cost and the read-path wall-clock before/after compaction (the
    merge-on-read amplification the auto-compactor bounds)."""
    from datax_spark import fixtures
    from datax_spark.cdc.runner import create_repo_table, full_sync, run_incremental

    work = tempfile.mkdtemp(prefix="dx_bench_")
    try:
        feed_dir = os.path.join(work, "feed")
        fixtures.change_events(
            spark, n_events, n_keys=max(1, n_events // 3), seed=42,
            partitions=max(8, int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        ).write.mode("overwrite").parquet(feed_dir)
        feed = spark.read.parquet(feed_dir)

        t = create_repo_table(
            spark, os.path.join(work, "table"), num_buckets=32
        )
        t0 = time.monotonic()
        full_sync(t, fixtures.repo_files(spark, n_events // 4, seed=42))
        full_sync_s = time.monotonic() - t0

        t1 = time.monotonic()
        lineages = run_incremental(
            t, feed, batch_lsns=(n_events + n_batches - 1) // n_batches,
            mode=mode, dedup_batch=dedup_batch, lineage_detail=lineage_detail,
            bucket_deltas=bucket_deltas,
            # compaction is timed separately below; leaving the default
            # auto_compact on would full-rewrite after every L0 batch
            # (32 files/batch >> the 8-file budget) and time THAT instead
            auto_compact=None,
        )
        inc_s = time.monotonic() - t1
        rows = sum(l["rows"] for l in lineages)

        if not verify:
            # scaling children time only the ingest phase — the MOR-read /
            # compact verification below is not part of the throughput
            # metric and would triple the wall-clock of each run
            return {
                "mode": mode,
                "dedup_batch": dedup_batch,
                "lineage_detail": lineage_detail,
                "bucket_deltas": bucket_deltas,
                "events": rows,
                "full_sync_sec": round(full_sync_s, 3),
                "incremental_sec": round(inc_s, 3),
                "events_per_sec": round(rows / inc_s, 1),
                "batches": len(lineages),
            }
        t2 = time.monotonic()
        n_before = t.read().count()
        read_mor_s = time.monotonic() - t2
        t3 = time.monotonic()
        t.compact()
        compact_s = time.monotonic() - t3
        t4 = time.monotonic()
        n_after = t.read().count()
        read_base_s = time.monotonic() - t4
        assert n_before == n_after
        return {
            "mode": mode,
            "dedup_batch": dedup_batch,
            "lineage_detail": lineage_detail,
            "bucket_deltas": bucket_deltas,
            "events": rows,
            "full_sync_sec": round(full_sync_s, 3),
            "incremental_sec": round(inc_s, 3),
            "events_per_sec": round(rows / inc_s, 1),
            "batches": len(lineages),
            "final_rows": n_after,
            "read_mor_sec": round(read_mor_s, 3),
            "compact_sec": round(compact_s, 3),
            "read_after_compact_sec": round(read_base_s, 3),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_multitable(spark, n_events: int = 150_000,
                     n_batches: int = 3) -> dict:
    """O(batch) routing claim (round-4 verdict Next #3): the SAME feed
    applied through MultiTableApplier at 2 vs 16 declared tables.  The
    micro-batch is pinned once per apply (cdc/multitable.py), so the
    source is scanned once regardless of width; the residual wall growth
    (measured ratio ~3-4× for 8× the tables at a 50k-row batch) is the
    per-table MERGE job floor (~0.3 s/commit × 48 vs 6 commits), the same
    fixed cost the agg-view profiling bounded — it amortizes with batch
    size, while the cost the pin removes (per-table SOURCE scans) would
    grow with batch size.  A/B with persist no-opped measured the pin
    neutral-at-noise on a re-scannable 150k-row parquet batch (3.3 vs
    3.6 ratio across runs, inside host drift) — its payoff is streaming
    batches that cannot be re-scanned for free.  Reports wall at both
    widths and the ratio."""
    from pyspark.sql import functions as F

    from datax_spark import fixtures
    from datax_spark.cdc.multitable import MultiTableApplier
    from datax_spark.cdc.runner import REPO_SCHEMA, create_repo_table

    out: dict = {"events": n_events, "batches": n_batches}
    work = tempfile.mkdtemp(prefix="dx_mtb_")
    try:
        feed_dir = os.path.join(work, "feed")
        fixtures.change_events(
            spark, n_events, n_keys=max(1, n_events // 3), seed=7,
        ).write.mode("overwrite").parquet(feed_dir)
        for n_tables in (2, 16):
            feed = spark.read.parquet(feed_dir).withColumn(
                "tbl",
                F.concat(
                    F.lit("t"),
                    F.pmod(F.xxhash64("repo", F.lit(99)),
                           F.lit(n_tables)).cast("string"),
                ),
            )
            tables = {
                f"t{i}": create_repo_table(
                    spark, os.path.join(work, f"w{n_tables}", f"t{i}"),
                    num_buckets=4, schema=REPO_SCHEMA,
                )
                for i in range(n_tables)
            }
            ap = MultiTableApplier(
                tables, table_col="tbl",
                ledger_dir=os.path.join(work, f"w{n_tables}", "ledger"),
            )
            step = (n_events + n_batches - 1) // n_batches
            t0 = time.monotonic()
            for i in range(n_batches):
                ap.apply_batch(
                    feed.filter((F.col("lsn") >= i * step)
                                & (F.col("lsn") < (i + 1) * step)),
                    i,
                )
            out[f"tables_{n_tables}_sec"] = round(time.monotonic() - t0, 2)
            if len(ap._epochs()) != n_batches:
                raise AssertionError("not every batch published an epoch")
        out["ratio_16v2"] = round(
            out["tables_16_sec"] / out["tables_2_sec"], 2
        )
        return out
    finally:
        shutil.rmtree(work, ignore_errors=True)


def bench_index_scale(spark, sf_dir: str) -> dict:
    """Index-view scale probe (round-4 verdict Next #7): build the
    maintained inverted index over THIS sf's documents corpus, token-
    cluster it, and measure BM25 lookup latency plus the file-skipping
    ratio — lookup cost must track O(matching files), visibly, as the
    corpus scales."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datax_spark.lake.indexview import create_index_view, search_bm25
    from datax_spark.lake.merge import merge_into
    from datax_spark.lake.table import LakeTable

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    work = tempfile.mkdtemp(prefix="dx_ixb_")
    try:
        table = LakeTable.create(
            spark, os.path.join(work, "docs"),
            schema=T.StructType([
                T.StructField("doc_id", T.LongType()),
                T.StructField("body", T.StringType()),
            ]),
            key_cols=["doc_id"], bucket_col="doc_id", num_buckets=16,
        )
        d = F.col("doc_id").cast("long")
        merge_into(
            table,
            docs.select(d.alias("doc_id"), F.col("text").alias("body"),
                        d.alias("lsn"), F.lit("insert").alias("op")),
            op_col="op", order_col="lsn", mode="mor", auto_compact=None,
            keys_unique=True,
        )
        n_docs = table.read().count()
        t0 = time.monotonic()
        view = create_index_view(table, os.path.join(work, "ix"), "body",
                                 num_buckets=32)
        build_sec = round(time.monotonic() - t0, 2)
        # token-cluster the postings so the point read prunes files
        view.compact(sort_cols=["token"], files_per_bucket=2)
        terms = ["data", "pipeline", "quality"]
        plan = view.scan_plan(where=[("token", "in", terms)])
        t0 = time.monotonic()
        hits = search_bm25(view, terms, k=10).collect()
        lookup_sec = round(time.monotonic() - t0, 2)
        return {
            "docs": n_docs,
            "postings": view.read().count(),
            "build_sec": build_sec,
            "lookup_sec": lookup_sec,
            "lookup_hits": len(hits),
            "files_kept": plan["files_kept"],
            "files_total": plan["files_total"],
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


# Suite queries that represent the operator surface; heavy all-pairs ops are
# included — they are the training-data path and must stay fast at sf0.1.
BENCH_QUERIES = [
    "cdc_shard_lineage",
    "cdc_dedup_last_per_key",
    "skew_salted_agg",
    "events_sessionize",
    "tx_chain_docs",
    "text_quality",
    "text_fingerprint",
    "q1_pricing_summary",
    "q3_top_shipping",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_lsh",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embed_cosine_topk",
    "ann_bucketed_topk",
    "cdc_merge_apply_e2e",
    "cdc_partial_update",
    # round-2 third pass: changelog out, relay, zone-map pruned read, WAP
    "cdc_changelog_read",
    "cdc_mirror_relay",
    "lake_prune_read",
    "lake_zorder_read",
    "cdc_wap_publish",
    # round-2 fifth pass: temporal joins + incremental aggregate view
    "asof_purchase_attrib",
    "asof_forward_next_purchase",
    "range_error_window",
    "temporal_dim_join",
    "cdc_agg_view",
    # round-3: real BMP decode through the Arrow kernel
    "multimodal_decode_image",
    # round-3: row-level DML, near-dup clustering, int8 quantization
    "cdc_dml_delete_update",
    "dedup_cluster_keep_one",
    "embed_quantize",
    # round-3: low-churn incremental aggview (the 100-TB steady state),
    # BM25 retrieval, real WAV/AVI decode through the Arrow kernels
    "cdc_agg_view_incr",
    "text_bm25_topk",
    "multimodal_decode_audio",
    "multimodal_decode_video",
    # round-3 late pass: PII scrub + repetition signals, BPE-ish token
    # accounting, paragraph dedup, and the reliability semantics
    # (mid-stream schema evolution, dirty-record quarantine)
    "text_pii_scrub",
    "text_repetition",
    "text_token_stats",
    "dedup_paragraphs",
    "cdc_schema_evolution",
    "cdc_quarantine",
    # round-3 final pass: live continuous tail, file-scoped COW on a
    # clustered table, benchmark-contamination hygiene
    "cdc_stream_continuous",
    "cdc_merge_cow_clustered",
    "text_contamination",
    # round-4: WHEN-clause merge, exact-distinct views, txn-consistent
    # apply, multi-table epochs, weighted sampling, retention gate,
    # bloom file skipping, SCD2 history (+ no-op suppression), DLQ replay
    "cdc_merge_when_clauses",
    "cdc_agg_view_distinct",
    "cdc_txn_boundary",
    "cdc_multi_table",
    "sample_weighted",
    "lake_snapshot_expiry",
    "lake_bloom_lookup",
    "cdc_scd2_history",
    "cdc_scd2_suppress",
    "cdc_quarantine_replay",
    "cdc_enrich_dim",
    # round-4 late pass: history-preserving minor compaction under ingest.
    # (cdc_incremental_snapshot stays OUT of the bench list: a chunked
    # bootstrap is a one-time operation of ~10 interleaved publish/apply
    # rounds — ~60+ Spark actions that are pure job-scheduling floor at
    # bench scale (40-70s of noise that would dwarf every steady-state
    # query); the driver's sf0.01 correctness gate still runs it.)
    "cdc_minor_compact_fold",
    # round-4 continuation: incremental join views (delta-join dynamic
    # tables — fact-side and dim-side partial recompute per refresh),
    # history-reaching key purge, and the maintained inverted index
    "cdc_join_view",
    "cdc_join_view_left",
    "cdc_star_view",
    "cdc_view_pipeline",
    "lake_purge_key",
    "text_index_view",
    "text_index_bm25",
    # round-5: snowflake chain as composed incremental views
    "cdc_snowflake_view",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_events = int(os.environ.get("DX_BENCH_EVENTS", "1000000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1

    from datax_spark import suite
    from datax_spark.session import get_session

    spark = get_session("datax-spark-bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qtimes: dict[str, float] = {}
    qs = suite.queries()
    # one untimed warmup pass: JVM + codegen + parquet-footer warmup would
    # otherwise be absorbed by whichever measurement runs first (~9s
    # misattributed to an 8-row groupBy in round 1)
    t0 = time.monotonic()
    qs["cdc_shard_lineage"](spark, sf_dir).count()
    qs["q6_forecast_revenue"](spark, sf_dir).count()
    print(f"# warmup: {round(time.monotonic() - t0, 3)}s (untimed)",
          file=sys.stderr)

    # headline FIRST, on the freshest JVM (measured: running it after 17
    # suite queries costs up to 4x in accumulated GC/codegen state):
    # sustained MOR ingest with dedup deferred to compaction — the
    # 10^10-event configuration; the dedup-per-batch variant is reported
    # alongside for the update-heavy-feed trade-off.  The host VM is
    # measurably non-stationary (identical runs vary up to 1.5-3x minutes
    # apart — see BENCH/BASELINE.md findings), so the headline is the
    # MEDIAN of DX_BENCH_REPS identical reps, all reps reported.
    # 5 reps (was 3): this host's weather swings single reps 1.5-4x —
    # with 5, the cold-JVM first rep AND one bad-weather window both fall
    # out of the median (r3 saw reps [78k, 169k, 287k] in one run)
    n_reps = max(1, int(os.environ.get("DX_BENCH_REPS", "5")))
    reps = []
    for i in range(n_reps):
        r = bench_cdc_ingest(
            spark, n_events, mode="mor", dedup_batch=False,
            lineage_detail="global", bucket_deltas=False,
            verify=(i == n_reps - 1),  # read/compact verification once
        )
        reps.append(r)
        print(f"# cdc_ingest(mor) rep {i}: {r}", file=sys.stderr)
    # headline = the MEDIAN-rate rep's own numbers (rate and wall time stay
    # mutually consistent); verify-only fields come from the last rep
    by_rate = sorted(reps, key=lambda r: r["events_per_sec"])
    median_rep = by_rate[len(by_rate) // 2]
    ingest = {**reps[-1], **median_rep}
    ingest["events_per_sec_reps"] = [r["events_per_sec"] for r in by_rate]
    # full-featured config (dedup + per-shard lineage + auto delta
    # placement) at the SAME rep as the headline — the r3 verdict showed
    # the old 200k-event rep let fixed per-batch cost dominate (38k ev/s
    # reported vs 240k+ measured at the headline rep; breakdown in
    # BENCH/dedup_gap_profile.json).  Median of 3, like the queries.
    dd_reps = []
    for i in range(3):
        r = bench_cdc_ingest(
            spark, n_events, mode="mor", dedup_batch=True,
            lineage_detail="shards", bucket_deltas="auto",
            verify=(i == 2),
        )
        dd_reps.append(r)
        print(f"# cdc_ingest(mor+dedup) rep {i}: {r}", file=sys.stderr)
    dd_by_rate = sorted(dd_reps, key=lambda r: r["events_per_sec"])
    ingest_dedup = {**dd_reps[-1], **dd_by_rate[len(dd_by_rate) // 2]}
    ingest_dedup["events_per_sec_reps"] = [
        r["events_per_sec"] for r in dd_by_rate
    ]

    # per-query numbers are MEDIANS of DX_BENCH_QUERY_REPS reps (same
    # host-noise rationale as the headline: the 1.5-3x drift band makes a
    # single sample indistinguishable from a real regression); all reps
    # ride along under "query_reps" so the drift stays visible.
    q_reps = max(1, int(os.environ.get("DX_BENCH_QUERY_REPS", "3")))
    query_reps: dict[str, list[float]] = {}
    for name in BENCH_QUERIES:
        samples = []
        for _ in range(q_reps):
            t0 = time.monotonic()
            df = qs[name](spark, sf_dir)
            n = df.count()
            samples.append(round(time.monotonic() - t0, 3))
            # dedup/similarity ops cache their (small) result frames; drop
            # them so later timings never ride an earlier query's cache —
            # and so each rep re-executes the full plan
            spark.catalog.clearCache()
        samples.sort()
        query_reps[name] = samples
        qtimes[name] = samples[len(samples) // 2]
        print(f"# {name}: {qtimes[name]}s median of {samples} ({n} rows)",
              file=sys.stderr)

    # LSH-vs-exact crossover point (round-3 done-bar): a boilerplate-heavy
    # corpus (scaled_documents) in EXACT-FIDELITY mode (max_df=None — no
    # hub cap, full jaccard against every shingle) where the exact shingle
    # self-join goes quadratic on the high-df shingles while the MinHash-
    # band prefilter stays linear.  The suite default remains the exact
    # variant WITH the hub cap, which is linear and faster at sf0.1 — this
    # section demonstrates the regime where the prefilter is the only
    # viable plan.  Pair counts differ by design: banded LSH recall is
    # 1-(1-j^r)^b, so low-jaccard boilerplate pairs are skipped.
    crossover = None
    x_copies = int(os.environ.get("DX_BENCH_CROSSOVER_COPIES", "3"))
    if x_copies > 0:
        from datax_spark import fixtures
        from datax_spark.functions import dedup as DD

        corpus = fixtures.scaled_documents(
            spark, spark.read.parquet(os.path.join(sf_dir,
                                                   "documents.parquet")),
            x_copies, boilerplate="standard header notice applies here",
        ).persist()
        n_docs = corpus.count()
        xres = {}
        for tag, kw in (("lsh_sec", dict(prefilter_k=8, prefilter_bands=4)),
                        ("exact_sec", {})):
            t0 = time.monotonic()
            xres[tag.replace("_sec", "_pairs")] = DD.ngram_jaccard_pairs(
                corpus, "doc_id", "text", n=3, threshold=0.12, max_df=None,
                **kw).count()
            xres[tag] = round(time.monotonic() - t0, 2)
            spark.catalog.clearCache()
            corpus = corpus.persist()
            corpus.count()
        corpus.unpersist()
        crossover = {"copies": x_copies, "docs": n_docs, **xres,
                     "speedup": round(xres["exact_sec"] / xres["lsh_sec"], 2)}
        print(f"# ngram jaccard crossover: {crossover}", file=sys.stderr)

    # multi-table routing stays O(batch) as declared tables grow 2→16
    multitable = None
    if int(os.environ.get("DX_BENCH_MULTITABLE", "1")):
        multitable = bench_multitable(spark)
        print(f"# multitable scaling: {multitable}", file=sys.stderr)

    # index build + pruned BM25 lookup at THIS sf (scale visibility)
    index_scale = None
    if int(os.environ.get("DX_BENCH_INDEX_SCALE", "1")):
        index_scale = bench_index_scale(spark, sf_dir)
        print(f"# index scale probe: {index_scale}", file=sys.stderr)

    detail = {
        "metric": "cdc_upsert_events_per_sec",
        "value": ingest["events_per_sec"],
        "unit": "events/sec",
        "queries": qtimes,
        "query_reps": query_reps,
        "sf": sf,
        "cdc_ingest": ingest,
        "cdc_ingest_dedup_batch": ingest_dedup,
        "ngram_lsh_crossover": crossover,
        "multitable_scaling": multitable,
        "index_scale": index_scale,
        "cores": int(cpus) if str(cpus).isdigit() else cpus,
    }
    # The driver captures only the TAIL of stdout, so the final line must
    # stay small (round 3's single giant JSON line overflowed the capture
    # and BENCH_r03.json::parsed came back null).  Full detail — per-query
    # rep arrays, ingest rep lists, crossover — goes to a side file; the
    # final stdout line carries the headline plus the per-query MEDIANS
    # only (~2 KB), which is the machine-parseable record of note.
    detail_file = os.environ.get(
        "DX_BENCH_DETAIL_FILE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH", "queries_latest.json"),
    )
    try:
        os.makedirs(os.path.dirname(detail_file), exist_ok=True)
        with open(detail_file, "w", encoding="utf-8") as f:
            json.dump(detail, f, indent=1)
        print(f"# full detail written to {detail_file}", file=sys.stderr)
    except OSError as e:  # never let the side file kill the headline
        print(f"# detail file write failed: {e}", file=sys.stderr)
    out = {
        "metric": detail["metric"],
        "value": detail["value"],
        "unit": detail["unit"],
        "sf": sf,
        "cores": detail["cores"],
        "queries": qtimes,
        "cdc_ingest": {
            k: ingest[k]
            for k in ("events", "incremental_sec", "events_per_sec",
                      "batches")
            if k in ingest
        },
        "cdc_ingest_dedup_batch_eps": ingest_dedup.get("events_per_sec"),
        "multitable_ratio_16v2": (multitable or {}).get("ratio_16v2"),
        "text_index_build_sf_sec": (index_scale or {}).get("build_sec"),
        "text_index_lookup_sf_sec": (index_scale or {}).get("lookup_sec"),
        "text_index_files_kept": (index_scale or {}).get("files_kept"),
        "text_index_files_total": (index_scale or {}).get("files_total"),
        "detail_file": os.path.relpath(
            detail_file, os.path.dirname(os.path.abspath(__file__))),
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
