"""Hot-key skew handling (FIXTURES.md §5, SURVEY.md §7.4 risk 3).

The fixture's repo popularity is power-law (fixtures._key_cols cubes the
uniform draw), so bucket(repo) alone leaves hot buckets.  files_per_bucket
salts the write shuffle by key-hash so a hot bucket's rows spread over
multiple files/tasks — bounding the max task (straggler defense)."""

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from datax_spark import fixtures
from datax_spark.cdc.runner import create_repo_table, run_incremental


def _file_rows(table):
    m = table.manifest()
    return [
        pq.read_metadata(f"{table.location}/{e[0]}").num_rows
        for entries in m.files.values()
        for e in entries
    ]


def test_feed_is_actually_skewed(spark):
    feed = fixtures.change_events(spark, 5000, n_keys=1000, n_repos=200, seed=42)
    per_repo = feed.groupBy("repo").count().collect()
    counts = sorted((r["count"] for r in per_repo), reverse=True)
    # top 10% of repos carry > 40% of events — the hot-repo regime
    assert sum(counts[: max(1, len(counts) // 10)]) > 0.4 * sum(counts)


def test_salted_write_bounds_max_file(spark, tmp_path):
    feed = fixtures.change_events(spark, 8000, n_keys=1600, n_repos=200, seed=42)
    fp = str(tmp_path / "feed")
    feed.write.parquet(fp)
    feed = spark.read.parquet(fp)

    # bucket_deltas pinned True: the salting under test is a property of
    # the BUCKETED write layout (auto placement would route a batch this
    # small to a single L0 file, where skew is moot by construction)
    t1 = create_repo_table(spark, str(tmp_path / "plain"), num_buckets=8)
    run_incremental(t1, feed, batch_lsns=8000, mode="mor", auto_compact=None,
                    bucket_deltas=True)
    plain = _file_rows(t1)
    assert max(plain) > 2 * (sum(plain) / len(plain))  # skew visible

    # salted delta write: 4 files per bucket spread the hot bucket
    t5 = create_repo_table(spark, str(tmp_path / "salted"), num_buckets=8)
    from datax_spark.cdc.apply import CdcApplier

    CdcApplier(t5, files_per_bucket=4, auto_compact=None,
               bucket_deltas=True).apply_batch(feed, 0)
    salted = _file_rows(t5)
    assert len(salted) > len(plain)
    # max file shrinks materially vs the unsalted hot bucket
    assert max(salted) < max(plain) * 0.6
    # state identical
    a = sorted(tuple(r) for r in t1.read().select("repo", "path", "commit").collect())
    b = sorted(tuple(r) for r in t5.read().select("repo", "path", "commit").collect())
    assert a == b