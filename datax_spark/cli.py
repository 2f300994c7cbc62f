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


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="datax-spark")
    p.add_argument("job", help="path to job spec JSON")
    p.add_argument("--dry-run", action="store_true",
                   help="validate only (preCheck), write nothing")
    p.add_argument("--cores", default=None,
                   help="local[N] cores (default: env/all); ignored under "
                        "spark-submit with a real master")
    args = p.parse_args(argv)

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


if __name__ == "__main__":
    sys.exit(main())
