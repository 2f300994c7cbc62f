"""Scaling-efficiency evidence for the north rule (N vs 4N parallelism).

The rule demands ≥0.8 throughput scaling efficiency from N to 4N
executors.  No multi-node cluster exists in this sandbox, so the job runs
at two LOCAL parallelism levels.  Getting a MEANINGFUL number out of this
box required nailing down three measured facts (kept here so the next
round doesn't rediscover them):

1. **`local[N]` does not bound a JVM to N cores** — GC/shuffle/IO/py4j
   threads spill onto extra host cores, structurally flattering low-N
   runs.  Fix: `taskset`-pin each child JVM so "N cores" bounds
   EVERYTHING, exactly like an N-core executor host.
2. **Concurrent measurement JVMs poison each other** far beyond cpuset
   separation (page cache, memory bus, host scheduler): an 8-core child
   measured 98k ev/s next to a 2-core sibling vs 964k solo.  Fix: solo,
   sequential children; repeated; medians.  Solo pinned runs are stable
   (±4% over 3 reps) — the wild 3-4x variance in earlier protocols came
   from concurrency and from oversized heaps (a 24-48g driver heap is
   actively WORSE than 8g here and unstable; children force 8g).
3. **Per-rep fixed driver cost is ~4.5s** (4 commits + job submissions +
   table create — the known ~1s/batch commit floor), independent of
   cores.  With small reps this dominates 4N runs and caps measured
   efficiency regardless of engine quality; the rep size below (24M
   events, 6M/micro-batch) amortizes it the way 10^8-event production
   micro-batches would at the rule's 10^10 scale.

A pure-Python CPU calibration (no Spark/IO) additionally measures what
speedup this VM can physically express between the two worker counts —
vCPU oversubscription caps 8→32 near 0.7 for ANY software, so the
primary gate pair is 2→8 (full per-core speed at both ends) and 8→32 is
reported against its measured ceiling.

Writes/updates ``BENCH/BASELINE.md`` and prints one JSON line.

Usage: python bench_scaling.py [n_events] [reps]
       (defaults 24_000_000 events/rep, 3 reps)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

GEN_FEED = r"""
import sys
sys.path.insert(0, {here!r})
from datax_spark.session import get_session
from datax_spark import fixtures
spark = get_session("scaling-feedgen", cores=16)
spark.sparkContext.setLogLevel("ERROR")
fixtures.change_events(spark, {n}, n_keys={n}//3, seed=42,
                       partitions={parts}) \
    .write.mode("overwrite").parquet({feed!r})
print("FEED_OK")
"""

CHILD = r"""
import json, shutil, sys, time
sys.path.insert(0, {here!r})
from datax_spark.session import get_session
from datax_spark.cdc.runner import create_repo_table, run_incremental
cores, reps = {cores}, {reps}
spark = get_session(f"scaling-{{cores}}", cores=cores)
spark.sparkContext.setLogLevel("ERROR")
feed = spark.read.parquet({feed!r})
n_events = feed.count()

def one_ingest(tag):
    loc = {work!r} + f"/t-{{cores}}-{{tag}}"
    shutil.rmtree(loc, ignore_errors=True)
    t = create_repo_table(spark, loc, num_buckets=32)
    lin = run_incremental(
        t, feed, batch_lsns=(n_events + 3) // 4,
        mode="mor", dedup_batch=False, lineage_detail="global",
        bucket_deltas=False, auto_compact=None,
    )
    shutil.rmtree(loc, ignore_errors=True)
    return sum(l["rows"] for l in lin)

one_ingest("warmup")  # untimed: codegen + scan warmup
secs = []
for r in range(reps):
    t0 = time.monotonic()
    n = one_ingest(f"r{{r}}")
    secs.append(round(time.monotonic() - t0, 2))
print("CHILD_RESULT " + json.dumps(
    {{"cores": cores, "events_per_rep": n, "rep_secs": secs}}))
"""


def _burn_child(k: int) -> int:
    x = 0
    for i in range(k):
        x += i * i
    return x


def calibrate_box(lo: int, hi: int, n: int = 30_000_000) -> dict:
    """Pure-Python CPU burn at 1/lo/hi-way concurrency (identical work per
    worker): wall(lo)/wall(hi) is the best tput(hi)/((hi/lo)*tput(lo)) ANY
    software can reach on this box (1.0 on non-oversubscribed hardware)."""
    import multiprocessing as mp
    import time

    out = {}
    for p in (1, lo, hi):
        t0 = time.monotonic()
        with mp.Pool(p) as pool:
            pool.map(_burn_child, [n] * p)
        out[p] = time.monotonic() - t0
    return {
        "wall_1": round(out[1], 2),
        f"wall_{lo}": round(out[lo], 2),
        f"wall_{hi}": round(out[hi], 2),
        "efficiency_ceiling": round(out[lo] / out[hi], 3),
    }


def run_at(cores: int, cpuset: str, feed: str, work: str, reps: int) -> dict:
    code = CHILD.format(here=HERE, cores=cores, reps=reps,
                        feed=feed, work=work)
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    # 8g default measured BEST at <=24M-event micro-batches; a 48M-event
    # batch needs headroom (per-task write buffers scale with
    # rows/partition x concurrent tasks) — override for big-rep sessions
    env["SPARK_GRAFT_DRIVER_MEM"] = os.environ.get(
        "DX_SCALING_DRIVER_MEM", "8g")
    env.setdefault("TMPDIR", "/dev/shm")
    out = subprocess.run(
        ["taskset", "-c", cpuset, sys.executable, "-c", code],
        capture_output=True, text=True, env=env, cwd=HERE, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            r = json.loads(line[len("CHILD_RESULT "):])
            med = statistics.median(r["rep_secs"])
            r["median_sec"] = med
            r["events_per_sec"] = round(r["events_per_rep"] / med, 1)
            return r
    raise RuntimeError(
        f"child (cores={cores}) produced no result:\n{out.stdout[-2000:]}\n"
        f"{out.stderr[-2000:]}"
    )


def pair(lo_r: dict, hi_r: dict, cal: dict) -> dict:
    """Pair summary against the PRE-RUN calibration (calibrate-first
    protocol: the ceiling that admitted the session is the ceiling the
    session is judged against — no post-hoc re-measurement)."""
    lo, hi = lo_r["cores"], hi_r["cores"]
    eff = hi_r["events_per_sec"] / ((hi / lo) * lo_r["events_per_sec"])
    return {
        "cores_low": lo, "cores_high": hi,
        "events_per_sec_low": lo_r["events_per_sec"],
        "events_per_sec_high": hi_r["events_per_sec"],
        "rep_secs_low": lo_r["rep_secs"], "rep_secs_high": hi_r["rep_secs"],
        "efficiency": round(eff, 3),
        "box_efficiency_ceiling": cal["efficiency_ceiling"],
        "efficiency_vs_box_ceiling": round(
            eff / cal["efficiency_ceiling"], 3),
        "calibration": cal,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_events = int(args[0]) if args else 24_000_000
    reps = int(args[1]) if len(args) > 1 else 3
    # --pairs 8:32[,2:8]  — run only the listed N→4N pairs.  A dedicated
    # big-rep 8→32 session must not burn hours on a 2-core leg it will
    # not report (a 192M-event rep is ~6 min/rep at 2 cores).
    pair_arg = next((a.split("=", 1)[1] if "=" in a else a.split(":", 1)[1]
                     for a in sys.argv[1:]
                     if a.startswith("--pairs=") or a.startswith("--pairs:")),
                    None)
    wanted = ([tuple(int(c) for c in p.split(":")) for p in pair_arg.split(",")]
              if pair_arg else [(2, 8), (8, 32)])

    # ---- calibrate-FIRST stop rule (pre-registered, round-4 verdict #4):
    # measure the pure-CPU parallel-speedup ceiling for each pair BEFORE
    # any Spark runs.  Ceiling < 0.8 ⇒ the HOST cannot express a passing
    # ratio for any software in this window — record a host-verdict row
    # and skip that pair's Spark legs (no Spark number is produced, so
    # none can be discarded).  Ceiling ≥ 0.8 ⇒ the pair runs and counts
    # WHATEVER it posts.  This automates the round-3 stop rule that was
    # previously applied post-hoc.
    cals = {p: calibrate_box(*p) for p in wanted}
    qualified = [p for p in wanted if cals[p]["efficiency_ceiling"] >= 0.8]
    host_verdicts = [
        {"pair": f"{lo}:{hi}",
         "ceiling": cals[(lo, hi)]["efficiency_ceiling"],
         "verdict": "host-unfit (<0.8 pure-CPU ceiling) — Spark run "
                    "skipped by pre-registered stop rule",
         "calibration": cals[(lo, hi)]}
        for lo, hi in wanted if (lo, hi) not in qualified
    ]
    for hv in host_verdicts:
        print(f"# host verdict: {hv['pair']} ceiling {hv['ceiling']} — "
              "skipping Spark legs", file=sys.stderr)

    cores_needed = sorted({c for p in qualified for c in p})
    work = os.environ.get("TMPDIR", "/dev/shm") + "/dx_scaling"
    os.makedirs(work, exist_ok=True)
    feed = os.path.join(work, "feed")

    # feed partition count: fixed across BOTH core counts (same input,
    # same parallelism grain).  Default 64; big reps need more so a
    # single partition's rows fit per-task parquet write buffers at the
    # high-concurrency end (192M events / 64 parts OOMed a 32-core 8g JVM).
    parts = int(os.environ.get("DX_SCALING_PARTITIONS", "64"))
    if qualified:
        gen = subprocess.run(
            [sys.executable, "-c",
             GEN_FEED.format(here=HERE, n=n_events, feed=feed, parts=parts)],
            capture_output=True, text=True, cwd=HERE, timeout=3600,
        )
        if "FEED_OK" not in gen.stdout:
            raise RuntimeError(
                f"feed generation failed:\n{gen.stderr[-2000:]}")

    runs = {c: run_at(c, f"0-{c - 1}", feed, work, reps)
            for c in cores_needed}
    pairs = [pair(runs[lo], runs[hi], cals[(lo, hi)])
             for lo, hi in qualified]
    primary = pairs[0] if pairs else None
    secondary = pairs[1] if len(pairs) > 1 else None

    result = {
        "metric": "scaling_efficiency_N_to_4N",
        "value": primary["efficiency"] if primary else None,
        "unit": "ratio",
        "n_events_per_rep": n_events,
        "reps": reps,
        "primary": primary,
        "secondary": secondary,
        "host_verdicts": host_verdicts or None,
        "protocol": "calibrate-first (ceiling<0.8 skips the Spark legs)",
    }

    def row(label, r):
        return (
            f"| {label} | {r['cores_low']}→{r['cores_high']} | "
            f"{r['events_per_sec_low']:,.0f} | {r['events_per_sec_high']:,.0f} | "
            f"{r['rep_secs_low']} | {r['rep_secs_high']} | "
            f"**{r['efficiency']:.3f}** | {r['box_efficiency_ceiling']:.3f} | "
            f"{r['efficiency_vs_box_ceiling']:.3f} |"
        )

    heap = os.environ.get("DX_SCALING_DRIVER_MEM", "8g")
    hv_rows = "\n".join(
        f"| host-verdict | {hv['pair'].replace(':', '→')} | — | — | — | — | "
        f"SKIPPED | {hv['ceiling']:.3f} | — |"
        for hv in host_verdicts
    )
    gate_line = (
        f"**North-rule gate (≥ 0.8): primary N→4N efficiency = "
        f"{primary['efficiency']:.3f}** (vs its measured host ceiling "
        f"{primary['box_efficiency_ceiling']:.3f}: ratio "
        f"{primary['efficiency_vs_box_ceiling']:.3f})."
        if primary else
        "**North-rule gate: NO Spark pair ran** — the pre-registered "
        "calibrate-first stop rule found every requested pair's pure-CPU "
        "ceiling below 0.8 in this window (host-verdict rows above); the "
        "session is reported, not discarded."
    )
    md = f"""
## Scaling-efficiency run (auto-generated by bench_scaling.py)

Protocol: CALIBRATE-FIRST (pre-registered, round-5). The pure-CPU
parallel-speedup calibration runs BEFORE any Spark leg; a pair whose
ceiling is <0.8 gets a host-verdict row and no Spark run (the host
cannot express a passing ratio for any software in that window); a pair
whose ceiling is ≥0.8 runs and counts whatever it posts.

Same job, same input: MOR L0 ingest of {n_events:,} change events per
rep (seed 42, fixed {parts}-partition feed, RAM-backed), 4 micro-batches of
{n_events // 4:,} events — sized so the ~1s/batch fixed driver/commit
cost amortizes the way 10^8-event production micro-batches would at the
rule's 10^10 scale.  Each JVM is `taskset`-pinned (N cores bounds
everything, GC included, like an N-core executor host), runs SOLO and
sequentially (concurrent measurement JVMs poison each other on this VM),
{heap} heap, {reps} reps,
median.  "Box ceiling" is a pure-Python CPU calibration of the parallel
speedup this VM can physically express between the worker counts (vCPU
oversubscription caps 8→32 near 0.7 for any software — hence the gate
pair is 2→8, where both ends run at full per-core speed).

| pair | cores N→4N | ev/s (N) | ev/s (4N) | rep secs (N) | rep secs (4N) | efficiency | box ceiling | eff/ceiling |
|---|---|---|---|---|---|---|---|---|
{row("primary", primary) if primary else ""}
{row("secondary", secondary) if secondary else ""}
{hv_rows}

{gate_line}
"""
    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    with open(os.path.join(HERE, "BENCH", "BASELINE.md"), "a",
              encoding="utf-8") as f:
        f.write(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
