"""Merge-on-read specifics: delta accumulation, reconstruction parity with
COW, compaction, auto-compaction bounds, and dedup_batch=False parity."""

import pytest
from pyspark.sql import functions as F

from datax_spark import fixtures
from datax_spark.cdc.runner import create_repo_table, run_incremental

N_EVENTS = 3000


def _feed(spark, tmp_path):
    path = str(tmp_path / "feed")
    fixtures.change_events(spark, N_EVENTS, n_keys=600, seed=42) \
        .write.mode("overwrite").parquet(path)
    return spark.read.parquet(path), path


def _state(table):
    return {
        (r.repo, r.path, r.commit): r.sha
        for r in table.read()
        .select("repo", "path", "commit",
                F.sha2(F.coalesce("content", F.lit("")), 256).alias("sha"))
        .collect()
    }


@pytest.mark.parametrize("dedup_batch", [True, False])
def test_mor_matches_fold_and_cow(spark, tmp_path, dedup_batch):
    feed, feed_path = _feed(spark, tmp_path)
    t_mor = create_repo_table(spark, str(tmp_path / "mor"), num_buckets=8)
    run_incremental(t_mor, feed, batch_lsns=1000, mode="mor",
                    auto_compact=None, dedup_batch=dedup_batch)
    t_cow = create_repo_table(spark, str(tmp_path / "cow"), num_buckets=8)
    run_incremental(t_cow, feed, batch_lsns=1000, mode="cow")

    expected = fixtures.expected_state(feed_path)
    got = _state(t_mor)
    assert set(got) == set(expected)
    for k, sha in got.items():
        assert sha == expected[k]["sha256"]
    assert got == _state(t_cow)

    # MOR wrote only delta files; COW only base
    assert t_mor.file_stats()["delta_files"] > 0
    assert t_cow.file_stats()["delta_files"] == 0


def test_compact_collapses_deltas_preserving_state(spark, tmp_path):
    feed, feed_path = _feed(spark, tmp_path)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    run_incremental(t, feed, batch_lsns=500, mode="mor", auto_compact=None)
    before = _state(t)
    stats = t.file_stats()
    assert stats["delta_files"] > 0
    t.compact()
    after_stats = t.file_stats()
    assert after_stats["delta_files"] == 0
    assert _state(t) == before
    # tombstones physically gone: row count == live keys
    assert after_stats["rows"] == len(before)
    # lineage survived compaction (exactly-once guard intact)
    assert t.last_lsn() == N_EVENTS - 1
    lineages = run_incremental(t, feed, batch_lsns=500, mode="mor")
    assert lineages == []  # full replay still a no-op


def test_auto_compact_bounds_delta_files(spark, tmp_path):
    feed, _ = _feed(spark, tmp_path)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=4)
    # 6 batches with a budget of 3 delta files per bucket
    run_incremental(t, feed, batch_lsns=500, mode="mor", auto_compact=3)
    assert not t.delta_heavy_buckets(3)
    # state still correct after interleaved compactions
    expected = fixtures.expected_state(str(tmp_path / "feed"))
    assert set(_state(t)) == set(expected)


def test_mor_schema_evolution_in_deltas(spark, tmp_path):
    feed, _ = _feed(spark, tmp_path)
    v2 = fixtures.change_events(
        spark, N_EVENTS * 2, n_keys=600, seed=42, schema_v2_from_lsn=N_EVENTS
    )
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=8)
    run_incremental(t, feed, batch_lsns=1500, mode="mor", auto_compact=None)
    run_incremental(t, v2, batch_lsns=1500, mode="mor", auto_compact=None)
    sch = {f.name: f.dataType.typeName() for f in t.schema().fields}
    assert sch["stars"] == "integer" and sch["size"] == "long"
    # old delta rows surface with null stars; new ones carry values
    rows = t.read().select("stars").collect()
    assert any(r.stars is not None for r in rows)
    # compaction preserves the evolved schema
    t.compact()
    sch2 = {f.name: f.dataType.typeName() for f in t.schema().fields}
    assert sch2 == sch

def test_l0_unbucketed_deltas_parity_and_compact(spark, tmp_path):
    """LSM L0 path: shuffle-free delta appends; reads include L0 with
    bucket filtering; compaction re-buckets the whole table."""
    feed, feed_path = _feed(spark, tmp_path)
    t = create_repo_table(spark, str(tmp_path / "l0"), num_buckets=8)
    run_incremental(t, feed, batch_lsns=1000, mode="mor",
                    auto_compact=None, dedup_batch=False, bucket_deltas=False)
    m = t.manifest()
    from datax_spark.lake.table import L0_BUCKET
    assert L0_BUCKET in m.files and len(m.files) == 1  # only L0 so far
    expected = fixtures.expected_state(feed_path)
    got = _state(t)
    assert set(got) == set(expected)
    for k, sha in got.items():
        assert sha == expected[k]["sha256"]
    # bucket-pruned read over L0 filters to the right rows
    some_bucket = 3
    sub = t.read(buckets=[some_bucket]).select("repo").distinct().collect()
    bexpr_hits = {
        r.repo
        for r in t.read()
        .select("repo", t.bucket_expr("repo", 8).alias("b"))
        .filter("b = 3").distinct().collect()
    }
    assert {r.repo for r in sub} == bexpr_hits
    # full compact removes L0, preserves state + lineage
    t.compact()
    m2 = t.manifest()
    assert L0_BUCKET not in m2.files
    assert m2.files and all(
        e[2] == "base" for es in m2.files.values() for e in es
    )
    assert _state(t) == got
    assert run_incremental(t, feed, batch_lsns=1000, mode="mor") == []


def test_cow_refuses_l0_table(spark, tmp_path):
    feed, _ = _feed(spark, tmp_path)
    t = create_repo_table(spark, str(tmp_path / "l0cow"), num_buckets=8)
    run_incremental(t, feed, batch_lsns=4000, mode="mor",
                    auto_compact=None, bucket_deltas=False)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="L0"):
        run_incremental(t, feed.withColumn("lsn", feed.lsn + 10000),
                        batch_lsns=4000, mode="cow")
    # and a rerun that changes batch_lsns while new events remain is refused
    # outright (lsn//batch_lsns ids would collide with applied ids)
    with _pytest.raises(ValueError, match="batch_lsns"):
        run_incremental(t, feed.withColumn("lsn", feed.lsn + 10000),
                        batch_lsns=20000, mode="mor")


def test_null_key_rows_survive_all_paths(spark, tmp_path):
    """A NULL key column must behave as a real key value in BOTH merge
    modes (null-safe joins): round 1 dropped such rows from every
    delta-bearing MOR read while COW kept them — state diverged by mode,
    and compact() made the loss permanent."""
    from pyspark.sql import types as T

    from datax_spark.lake.merge import merge_into
    from datax_spark.lake.table import LakeTable

    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("v", T.LongType()),
    ])

    def mk(loc):
        return LakeTable.create(
            spark, str(tmp_path / loc), schema=schema,
            key_cols=["k"], num_buckets=4,
        )

    def batch(rows):
        return spark.createDataFrame(
            rows, "k string, v long, op string, lsn long"
        )

    for mode in ("mor", "cow"):
        t = mk(f"t_{mode}")
        merge_into(t, batch([("a", 1, "insert", 1), (None, 10, "insert", 2)]),
                   op_col="op", order_col="lsn", lineage={"batch_id": 0,
                   "rows": 2, "bytes": 0, "shard_lsns": {}}, mode=mode)
        # upsert the NULL key: last-writer-wins must REPLACE, not duplicate
        merge_into(t, batch([(None, 20, "insert", 3)]),
                   op_col="op", order_col="lsn", lineage={"batch_id": 1,
                   "rows": 1, "bytes": 0, "shard_lsns": {}}, mode=mode)
        rows = {r.k: r.v for r in t.read().collect()}
        assert rows == {"a": 1, None: 20}, (mode, rows)
        if mode == "mor":
            t.compact()  # compaction must not lose the NULL-key row either
            rows = {r.k: r.v for r in t.read().collect()}
            assert rows == {"a": 1, None: 20}, ("compacted", rows)
        # delete the NULL key
        merge_into(t, batch([(None, 0, "delete", 4)]),
                   op_col="op", order_col="lsn", lineage={"batch_id": 2,
                   "rows": 1, "bytes": 0, "shard_lsns": {}}, mode=mode)
        assert {r.k for r in t.read().collect()} == {"a"}, mode
