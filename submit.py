"""spark-submit entry point — the cluster-mode launcher of the engine.

    # package the engine once
    python -m datax_spark.package                 # -> dist/datax_spark.zip

    # run a job on a real cluster (the north-rule shape: same job at two
    # executor counts, compare events/sec for scaling efficiency)
    spark-submit --master <cluster> --num-executors N \
        --py-files dist/datax_spark.zip submit.py job.json [--dry-run]

The session factory applies the engine's conf (AQE, Arrow, Kryo) but NOT a
master when spark-submit provided one, so the identical job.json runs on
local[N] for tests and on a multi-executor cluster unchanged.  Summary JSON
(rows/bytes/batches/rows_per_sec + hook results) prints to stdout exactly
like ``python -m datax_spark.cli run``.
"""

import sys

from datax_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(["run", *sys.argv[1:]]))
