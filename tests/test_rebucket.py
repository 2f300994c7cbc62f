"""Bucket-count evolution: rewrite into 2x (or explicit N) buckets in one
atomic commit; layout is versioned per manifest, so old snapshots read with
the old bucket count and incremental MERGE keeps working after the change."""

import json

from pyspark.sql import functions as F

from datax_spark import fixtures
from datax_spark.cdc.runner import create_repo_table, run_incremental
from datax_spark.lake.table import LakeTable


def _state(t, version=None):
    return {
        (r.repo, r.path, r.commit, r.content)
        for r in t.read(version=version).select(
            "repo", "path", "commit", "content"
        ).collect()
    }


def test_rebucket_preserves_state_and_lineage(spark, tmp_path):
    feed_path = str(tmp_path / "feed")
    fixtures.change_events(spark, 3000, n_keys=600, seed=42).write.parquet(feed_path)
    feed = spark.read.parquet(feed_path)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=4)
    run_incremental(t, feed, batch_lsns=1500)
    before = _state(t)
    v_before = t.current_version()
    wm = dict(t.manifest().shard_lsns)

    m = t.rebucket()  # default: 2x
    assert m is not None and m.num_buckets == 8
    assert _state(t) == before
    # deltas collapsed by the rewrite
    assert t.file_stats()["delta_files"] == 0
    assert t.file_stats()["buckets"] <= 8
    # exactly-once metadata carries over: watermarks + replay guard intact
    assert dict(t.manifest().shard_lsns) == wm
    assert run_incremental(t, feed, batch_lsns=1500) == []
    # time travel to the pre-rebucket layout still reads correctly
    assert _state(t, version=v_before) == before


def test_merge_after_rebucket_uses_new_layout(spark, tmp_path):
    feed_path = str(tmp_path / "feed")
    fixtures.change_events(spark, 2000, n_keys=400, seed=42).write.parquet(feed_path)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=4)
    run_incremental(t, spark.read.parquet(feed_path), batch_lsns=1000)
    t.rebucket(num_buckets=16)
    # continue the stream beyond the applied watermark
    more_path = str(tmp_path / "feed2")
    fixtures.change_events(spark, 5000, n_keys=400, seed=42).write.parquet(more_path)
    run_incremental(t, spark.read.parquet(more_path), batch_lsns=1000)
    expected = fixtures.expected_state(more_path)
    got = {
        (r.repo, r.path, r.commit): r.h
        for r in t.read().select(
            "repo", "path", "commit",
            F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("h"),
        ).collect()
    }
    assert set(got) == set(expected)
    assert all(got[k] == v["sha256"] for k, v in expected.items())


def test_suggest_num_buckets_and_noop(spark, tmp_path):
    feed_path = str(tmp_path / "feed")
    fixtures.change_events(spark, 1000, n_keys=300, seed=42).write.parquet(feed_path)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=4)
    run_incremental(t, spark.read.parquet(feed_path), batch_lsns=1000)
    t.compact()  # advice is on BASE bytes — fold deltas first
    total = t.file_stats()["bytes"]
    # generous target: layout fine, rebucket is a no-op
    assert t.suggest_num_buckets(total) is None
    assert t.rebucket(num_buckets=4) is None
    # tight target: next power-of-2 multiple that satisfies it
    n = t.suggest_num_buckets(max(1, total // 7))
    assert n == 8  # first power-of-2 multiple with total/n <= total/7


def test_cli_maintain_rebucket(spark, tmp_path, capsys):
    from datax_spark import cli

    feed_path = str(tmp_path / "feed")
    fixtures.change_events(spark, 1000, n_keys=300, seed=42).write.parquet(feed_path)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=4)
    run_incremental(t, spark.read.parquet(feed_path), batch_lsns=1000)
    t.compact()  # advice is on BASE bytes — fold deltas first
    total = t.file_stats()["bytes"]
    rc = cli.main(
        ["maintain", str(tmp_path / "t"),
         "--rebucket-target-bytes", str(max(1, total // 10)), "--cores", "4"]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["ok"] and out["rebucketed"]
    assert out["num_buckets"] == 16
    assert LakeTable(spark, str(tmp_path / "t")).manifest().num_buckets == 16


def test_suggest_num_buckets_ignores_delta_and_dv_bytes(spark, tmp_path):
    """A delta-heavy table must not trigger a premature full-table rebucket:
    the advice contract is average BASE bytes per bucket (delta mass is
    transient — compaction's job, not rebucket's)."""
    from pyspark.sql import Row

    from datax_spark.lake.merge import merge_into
    from datax_spark.lake.table import LakeTable
    import pyspark.sql.types as T

    t = LakeTable.create(
        spark, str(tmp_path / "dd"),
        schema=T.StructType([
            T.StructField("k", T.LongType()), T.StructField("v", T.StringType()),
        ]),
        key_cols=["k"], bucket_col="k", num_buckets=2,
    )
    t.append(spark.createDataFrame([Row(k=i, v="x" * 10) for i in range(50)]))
    base_bytes = t.file_stats()["bytes"]
    # pile on deltas worth several times the base without compacting
    for b in range(6):
        df = spark.createDataFrame(
            [Row(k=i, v="y" * 200, op="insert", lsn=b * 100 + i)
             for i in range(50)]
        )
        merge_into(t, df, op_col="op", order_col="lsn", mode="mor",
                   auto_compact=None)
    stats = t.file_stats()
    assert stats["bytes"] > 2 * base_bytes  # deltas dominate
    # target sized between base and total: base-only accounting says fine
    assert t.suggest_num_buckets(base_bytes) is None
