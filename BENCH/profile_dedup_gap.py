"""Attribute the full-featured-ingest vs L0-headline throughput gap.

Round-3 verdict (What's wrong #4): `cdc_ingest_dedup_batch` posted 38k ev/s
vs 401k for L0 global-lineage ingest, with no breakdown of which term —
(a) the in-batch dedup shuffle, (b) the bucketed 32-file delta write,
(c) per-shard lineage — dominates, and the 200k-event rep inflating fixed
costs.  This script runs the SAME bench_cdc_ingest harness at the
headline's event count, toggling one term at a time.

Usage:  python BENCH/profile_dedup_gap.py  [events]
Writes one JSON line per config to stdout and a summary to
BENCH/dedup_gap_profile.json.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_cdc_ingest  # noqa: E402
from datax_spark.session import get_session  # noqa: E402

CONFIGS = [
    # (label, dedup_batch, lineage_detail, bucket_deltas)
    ("L0_headline", False, "global", False),
    ("plus_dedup", True, "global", False),
    ("plus_shard_lineage", False, "shards", False),
    ("plus_bucketed_write", False, "global", True),
    ("full_bucketed", True, "shards", True),
    ("full_auto", True, "shards", "auto"),
]


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else int(
        os.environ.get("DX_BENCH_EVENTS", "1000000"))
    reps = int(os.environ.get("DX_PROFILE_REPS", "3"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session("dx-profile", cores=cpus)
    out: dict[str, dict] = {"events": n_events, "reps": reps, "cores": cpus}
    for label, dd, ld, bd in CONFIGS:
        rates = []
        last = None
        for _ in range(reps):
            r = bench_cdc_ingest(
                spark, n_events, mode="mor", dedup_batch=dd,
                lineage_detail=ld, bucket_deltas=bd, verify=False,
            )
            rates.append(r["events_per_sec"])
            last = r
        rates.sort()
        med = rates[len(rates) // 2]
        out[label] = {**last, "events_per_sec_reps": rates,
                      "events_per_sec_median": med}
        print(json.dumps({"config": label, "median_eps": med,
                          "reps": rates}), flush=True)
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "dedup_gap_profile.json"), "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
