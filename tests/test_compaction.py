"""Cost-based compaction scheduling + manifest-recorded file stats.

The pick rule: a bucket compacts when its accumulated delta BYTES exceed
``delta_ratio`` x its base bytes (read-amplification vs rewrite cost), with
the old file-count threshold as a small-file backstop.  Planning runs off
sizes recorded in the manifest at commit — zero filesystem listing."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark import fixtures
from datax_spark.cdc.runner import create_repo_table, run_incremental
from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)
KEYS = ["repo", "path", "commit"]


def _rows(n, start=0, body="x" * 50):
    return [
        (f"org/r{i % 4}", f"p{i}", f"c{i}", "py", f"{body}{i}")
        for i in range(start, start + n)
    ]


def _mk(spark, tmp_path, n=200):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=4)
    t.overwrite(spark.createDataFrame(_rows(n), SCHEMA))
    return t


def test_manifest_records_file_stats(spark, tmp_path):
    t = _mk(spark, tmp_path)
    m = t.manifest()
    total_rows = 0
    for entries in m.files.values():
        for e in entries:
            assert len(e) == 6, e
            path, _, kind, nbytes, nrows, col_stats = e
            assert kind == "base"
            assert nbytes == os.path.getsize(os.path.join(t.location, path))
            # zone maps recorded per column (min <= max)
            assert isinstance(col_stats, dict) and "repo" in col_stats
            lo, hi = col_stats["repo"]
            assert lo <= hi
            total_rows += nrows
    assert total_rows == 200
    # file_stats now answers from the manifest (same numbers, no listing)
    stats = t.file_stats()
    assert stats["rows"] == 200
    assert stats["bytes"] == sum(
        int(e[3]) for v in m.files.values() for e in v
    )


def test_candidates_ratio_vs_backstop(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # one small MOR delta against a comparatively big base
    merge_into(
        t, spark.createDataFrame(_rows(4, start=1000), SCHEMA)
        .withColumn("lsn", F.monotonically_increasing_id()),
        op_col=None, order_col="lsn", mode="mor", auto_compact=None,
    )
    assert t.file_stats()["delta_files"] > 0
    # tiny delta vs large ratio: not worth rewriting
    assert t.compaction_candidates(delta_ratio=10.0) == []
    # ratio 0: any delta-bearing bucket qualifies
    assert t.compaction_candidates(delta_ratio=0.0) != []
    # file-count backstop fires even when the byte ratio does not
    assert t.compaction_candidates(
        max_delta_files=0, delta_ratio=10.0
    ) != []


def test_ratio_compacts_when_deltas_dominate(spark, tmp_path):
    t = _mk(spark, tmp_path, n=20)  # small base
    # deltas several times the base
    merge_into(
        t, spark.createDataFrame(_rows(200, start=100), SCHEMA)
        .withColumn("lsn", F.monotonically_increasing_id()),
        op_col=None, order_col="lsn", mode="mor", auto_compact=None,
    )
    cand = t.compaction_candidates(delta_ratio=0.5)
    assert cand, "delta-dominated buckets must be picked"
    t.compact(cand)
    assert t.file_stats()["delta_files"] == 0
    assert t.read().count() == 220


def test_run_incremental_cost_based_autocompact(spark, tmp_path):
    feed_path = str(tmp_path / "feed")
    fixtures.change_events(spark, 3000, n_keys=600, seed=42).write.parquet(feed_path)
    feed = spark.read.parquet(feed_path)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    run_incremental(
        t, feed, batch_lsns=1000, auto_compact=None, compact_ratio=0.01
    )
    # an aggressive ratio keeps read amplification at ~zero throughout
    assert t.file_stats()["delta_files"] == 0
    expected = fixtures.expected_state(feed_path)
    got = {
        (r.repo, r.path, r.commit)
        for r in t.read().select("repo", "path", "commit").collect()
    }
    assert got == set(expected)


def test_cli_maintain_compact_ratio(spark, tmp_path, capsys):
    import json

    from datax_spark import cli

    t = _mk(spark, tmp_path, n=20)
    merge_into(
        t, spark.createDataFrame(_rows(100, start=100), SCHEMA)
        .withColumn("lsn", F.monotonically_increasing_id()),
        op_col=None, order_col="lsn", mode="mor", auto_compact=None,
    )
    rc = cli.main(
        ["maintain", str(tmp_path / "t"), "--compact-ratio", "0.5", "--cores", "4"]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["ok"] and out["compacted"]
    assert out["compaction_candidates"]
    assert LakeTable(spark, str(tmp_path / "t")).file_stats()["delta_files"] == 0
