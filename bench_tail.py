"""Tail-path scaling evidence: live continuous tail vs bounded drain.

bench_scaling.py measures the batch/AvailableNow drain; a production
100-TB CDC deployment runs the CONTINUOUS tail (streaming/runner.py:
run_continuous) with files landing while the query is up.  This session
measures both paths at the same pinned core count on the same feed:

- **drain**: all feed files pre-landed, ``run_available_now`` with
  ``max_files_per_trigger`` sized for 4 micro-batches — the shape
  bench_scaling.py's ``run_incremental`` child times.
- **tail**: the feed dir starts EMPTY; ``run_continuous`` is started
  first and a feeder thread then moves the same files in mtime order,
  keeping a bounded backlog (consumption-limited, not feeder-limited —
  a deeper backlog would degenerate into the drain).  Throughput is
  events / (last-batch-applied − first-file-landed).

Both paths share the identical applier configuration as the headline
(MOR L0, global lineage, dedup deferred) and run in ONE taskset-pinned
solo child JVM per rep session, following the measurement findings
recorded in BENCH/BASELINE.md (pinning, solo children, 8g heap, medians).

Usage: python bench_tail.py [n_events] [cores] [reps]
       (defaults 24_000_000 events, 8 cores, 3 reps)
Prints one JSON line and appends a session log to BENCH/BASELINE.md.
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
from datax_spark.streaming.runner import write_feed_ordered
spark = get_session("tail-feedgen", cores=16)
spark.sparkContext.setLogLevel("ERROR")
# LSN-ordered feed files (write_feed_ordered): the streaming watermark
# filter's delivery contract — an unordered 32-file feed lets one batch
# advance the global watermark past a later batch's whole LSN range,
# which then gets filtered as already-applied (measured: 18M of 24M
# lineage rows, one batch silently dropped)
write_feed_ordered(
    fixtures.change_events(spark, {n}, n_keys={n}//3, seed=42,
                           partitions=32),
    {feed!r}, n_files=32,
)
print("FEED_OK")
"""

CHILD = r"""
import glob, json, os, shutil, sys, threading, time
sys.path.insert(0, {here!r})
from datax_spark.session import get_session
from datax_spark.cdc.runner import create_repo_table
from datax_spark.streaming.runner import run_available_now, run_continuous

cores, reps = {cores}, {reps}
staged = sorted(glob.glob(os.path.join({feed!r}, "part-*.parquet")))
assert len(staged) == 32, staged
spark = get_session(f"tail-{{cores}}", cores=cores)
spark.sparkContext.setLogLevel("ERROR")
n_events = spark.read.parquet({feed!r}).count()
feed_schema = spark.read.parquet({feed!r}).schema
APPLIER = dict(mode="mor", dedup_batch=False, lineage_detail="global",
               bucket_deltas=False, auto_compact=None)
WORK = {work!r}

def fresh(tag):
    loc = os.path.join(WORK, f"t-{{tag}}")
    shutil.rmtree(loc, ignore_errors=True)
    return create_repo_table(spark, loc, num_buckets=32)

def drain_rep(tag):
    t = fresh(f"drain-{{tag}}")
    fd = os.path.join(WORK, f"feed-drain-{{tag}}")
    shutil.rmtree(fd, ignore_errors=True)
    os.makedirs(fd)
    for f in staged:
        os.link(f, os.path.join(fd, os.path.basename(f)))
    ck = os.path.join(WORK, f"ck-drain-{{tag}}")
    shutil.rmtree(ck, ignore_errors=True)
    t0 = time.monotonic()
    lins = run_available_now(
        spark, fd, t, feed_schema=feed_schema, checkpoint_dir=ck,
        max_files_per_trigger=8, **APPLIER,
    )
    el = time.monotonic() - t0
    rows = sum(l["rows"] for l in lins)
    assert rows == n_events, (rows, n_events)
    return el

def tail_rep(tag):
    t = fresh(f"tail-{{tag}}")
    fd = os.path.join(WORK, f"feed-tail-{{tag}}")
    shutil.rmtree(fd, ignore_errors=True)
    os.makedirs(fd)
    ck = os.path.join(WORK, f"ck-tail-{{tag}}")
    shutil.rmtree(ck, ignore_errors=True)
    tail = run_continuous(
        spark, fd, t, feed_schema=feed_schema, checkpoint_dir=ck,
        trigger_interval="200 milliseconds", **APPLIER,
    )
    per_file = n_events // len(staged)
    t0 = time.monotonic()
    # feeder: keep a ~8-file backlog so the tail is consumption-limited
    # (files land LIVE; a full pre-land would just re-measure the drain)
    def feed():
        moved = 0
        for f in staged:
            while (moved - tail.applied_rows() // per_file) >= 8:
                time.sleep(0.02)
            os.link(f, os.path.join(fd, os.path.basename(f)))
            moved += 1
    ft = threading.Thread(target=feed, daemon=True)
    ft.start()
    while tail.applied_rows() < n_events:
        if not tail.is_active:
            raise RuntimeError("tail died early")
        time.sleep(0.05)
    el = time.monotonic() - t0
    tail.stop()
    ft.join(timeout=5)
    return el

drain_rep("warmup")  # untimed: codegen + scan warmup
out = {{"cores": cores, "events_per_rep": n_events}}
for kind, fn in (("drain", drain_rep), ("tail", tail_rep)):
    secs = [round(fn(f"r{{r}}"), 2) for r in range(reps)]
    out[f"{{kind}}_rep_secs"] = secs
print("CHILD_RESULT " + json.dumps(out))
"""


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    work = os.environ.get("TMPDIR", "/dev/shm") + "/dx_tail"
    os.makedirs(work, exist_ok=True)
    feed = os.path.join(work, "feed")

    gen = subprocess.run(
        [sys.executable, "-c",
         GEN_FEED.format(here=HERE, n=n_events, feed=feed)],
        capture_output=True, text=True, cwd=HERE, timeout=1800,
    )
    if "FEED_OK" not in gen.stdout:
        raise RuntimeError(f"feed generation failed:\n{gen.stderr[-2000:]}")

    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    env["SPARK_GRAFT_DRIVER_MEM"] = "8g"
    env.setdefault("TMPDIR", "/dev/shm")
    code = CHILD.format(here=HERE, cores=cores, reps=reps,
                        feed=feed, work=work)
    out = subprocess.run(
        ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code],
        capture_output=True, text=True, env=env, cwd=HERE, timeout=3600,
    )
    r = None
    for line in out.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            r = json.loads(line[len("CHILD_RESULT "):])
    if r is None:
        raise RuntimeError(
            f"child produced no result:\n{out.stdout[-2000:]}\n"
            f"{out.stderr[-2000:]}"
        )
    drain_med = statistics.median(r["drain_rep_secs"])
    tail_med = statistics.median(r["tail_rep_secs"])
    result = {
        "metric": "tail_vs_drain_events_per_sec",
        "cores": cores,
        "n_events_per_rep": n_events,
        "drain_rep_secs": r["drain_rep_secs"],
        "tail_rep_secs": r["tail_rep_secs"],
        "drain_events_per_sec": round(n_events / drain_med, 1),
        "tail_events_per_sec": round(n_events / tail_med, 1),
        "tail_over_drain": round(drain_med / tail_med, 3),
    }
    md = f"""
## Tail-path session (auto-generated by bench_tail.py)

Continuous tail (files landing LIVE behind a bounded 8-file feeder
backlog) vs AvailableNow drain (all files pre-landed, 4 micro-batches),
same {n_events:,}-event feed, same applier config as the headline
(MOR L0, global lineage), one solo `taskset`-pinned {cores}-core JVM,
{len(r["drain_rep_secs"])} reps, medians.

| path | rep secs | median ev/s |
|---|---|---|
| drain (AvailableNow) | {r["drain_rep_secs"]} | {result["drain_events_per_sec"]:,.0f} |
| tail (continuous, live files) | {r["tail_rep_secs"]} | {result["tail_events_per_sec"]:,.0f} |

tail/drain throughput ratio: **{result["tail_over_drain"]:.3f}**
(north-rule context: the production shape is the tail; the drain is the
measurement proxy bench_scaling.py scales — this session ties them
together at the same core count).
"""
    with open(os.path.join(HERE, "BENCH", "BASELINE.md"), "a",
              encoding="utf-8") as f:
        f.write(md)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
