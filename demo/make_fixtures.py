"""Build the demo's deterministic inputs (no external data).

Usage: ``python demo/make_fixtures.py [OUT_DIR]`` from the repo root
(default ``demo/out``).  Writes:

- ``OUT/feed``      — a 5,000-event binlog-shaped change feed
  (``fixtures.change_events``, seed 7) plus 20 DIRTY rows whose ``op``
  is the unknown value ``upsert`` → they land in the dead-letter
  quarantine and are replayed later with a one-line fix chain.
- ``OUT/dim_repo``  — a parquet lookup dimension (repo → org) for the
  broadcast lookup-join enrichment.
- ``OUT/dim_lake``  — the same dimension as a LakeTable (keyed by
  ``repo``) feeding the declared incremental JOIN view.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from datax_spark import fixtures
    from datax_spark.lake.table import LakeTable
    from datax_spark.session import get_session

    out = (sys.argv[1] if len(sys.argv) > 1
           else os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "out"))
    spark = get_session("demo-fixtures", cores=4)
    spark.sparkContext.setLogLevel("ERROR")

    feed = fixtures.change_events(spark, 5000, n_keys=800, seed=7)
    dirty = (feed.filter(F.col("op") == "update").limit(20)
             .withColumn("op", F.lit("upsert")))  # unknown op → DLQ
    feed.unionByName(dirty).write.mode("overwrite") \
        .parquet(os.path.join(out, "feed"))

    dim = (spark.read.parquet(os.path.join(out, "feed"))
           .select("repo").distinct()
           .withColumn("org", F.concat(F.lit("org-"),
                                       F.pmod(F.xxhash64("repo"), F.lit(7))
                                       .cast("string"))))
    dim.write.mode("overwrite").parquet(os.path.join(out, "dim_repo"))

    lake_dim_loc = os.path.join(out, "dim_lake")
    if not LakeTable.exists(lake_dim_loc):
        t = LakeTable.create(
            spark, lake_dim_loc,
            schema=T.StructType([
                T.StructField("repo", T.StringType()),
                T.StructField("org", T.StringType()),
            ]),
            key_cols=["repo"], bucket_col="repo", num_buckets=4,
        )
        t.overwrite(dim)
    print("DEMO_FIXTURES_OK", out)


if __name__ == "__main__":
    main()
