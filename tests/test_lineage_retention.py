"""Manifest lineage must not grow without bound (the 10^10-event killer):
applied-batch entries beyond the retention window are folded into a
per-namespace retired-id frontier + totals, keeping every commit O(K).

Ref for the counters being summarized: DataX Communication counters
(core/src/main/java/com/alibaba/datax/core/statistics/communication/
CommunicationTool.java:17-53) — DataX also reports totals, not history.
"""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.cdc.apply import CdcApplier
from datax_spark.cdc.runner import create_repo_table, run_incremental
from datax_spark import fixtures
from datax_spark.lake.table import LakeTable


def _synthetic_lineage(i: int, ns: str = "") -> dict:
    return {
        "batch_id": f"{ns}{i}",
        "rows": 10,
        "bytes": 100,
        "shard_lsns": {0: i},
        "partitions": [
            {"partition_id": 0, "last_lsn": i, "rows": 10, "bytes": 100}
        ],
    }


def _mk_table(spark, path, retention: int) -> LakeTable:
    t = LakeTable.create(
        spark,
        str(path),
        schema=T.StructType([T.StructField("k", T.LongType())]),
        key_cols=["k"],
    )
    t.set_properties(lineage_retention=retention)
    return t


def test_manifest_size_plateaus_and_frontier_guards(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "t", retention=50)
    sizes = []
    for i in range(600):
        base = t.manifest()
        t._commit(base, {}, set(), lineage=_synthetic_lineage(i))
        if i in (299, 599):
            v = t.current_version()
            sizes.append(
                os.path.getsize(os.path.join(t.meta_dir, f"v{v:08d}.json"))
            )
    # size at batch 600 within 1% of size at batch 300 — a plateau, not growth
    assert abs(sizes[1] - sizes[0]) <= 0.01 * sizes[0] + 64, sizes

    m = t.manifest()
    assert len(m.applied_batches) == 50
    # every pruned id still counts as applied via the retired frontier
    assert t.is_batch_applied(0)
    assert t.is_batch_applied(549)
    assert "550" in m.applied_batches and t.is_batch_applied(550)
    assert not t.is_batch_applied(600)  # never applied
    totals = m.properties["lineage_totals"]
    assert totals["batches"] == 550
    assert totals["rows"] == 5500
    assert totals["bytes"] == 55000
    # watermark unaffected by pruning
    assert t.last_lsn(0) == 599


def test_frontier_is_per_namespace(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "ns", retention=3)
    for i in range(6):
        t._commit(t.manifest(), {}, set(), lineage=_synthetic_lineage(i))
    for i in range(6):
        t._commit(t.manifest(), {}, set(), lineage=_synthetic_lineage(i, ns="s"))
    assert t.is_batch_applied(2)      # pruned batch-mode id
    assert t.is_batch_applied("s2")   # pruned stream id
    assert not t.is_batch_applied(100)
    assert not t.is_batch_applied("s100")
    retired = t.manifest().properties["lineage_retired"]
    assert set(retired) == {"", "s"}


def test_pruned_batch_replay_is_noop_end_to_end(spark, tmp_path):
    fp = str(tmp_path / "feed")
    fixtures.change_events(spark, 2000, n_keys=300, seed=7).write.parquet(fp)
    feed = spark.read.parquet(fp)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=4)
    t.set_properties(lineage_retention=2)
    run_incremental(t, feed, batch_lsns=250, auto_compact=None)
    m = t.manifest()
    assert len(m.applied_batches) <= 2
    assert m.properties["lineage_retired"][""] >= 0
    # replaying a PRUNED batch id is still an exactly-once no-op
    applier = CdcApplier(t, auto_compact=None)
    v0 = t.current_version()
    out = applier.apply_batch(feed.filter(F.col("lsn") < 250), 0)
    assert out is None
    assert t.current_version() == v0
    # and the end state still matches the pure fold
    expected = fixtures.expected_state(fp)
    got = {(r.repo, r.path, r.commit) for r in
           t.read().select("repo", "path", "commit").collect()}
    assert got == set(expected)


def test_expire_snapshots(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "exp", retention=100)
    for i in range(10):
        t._commit(t.manifest(), {}, set(), lineage=_synthetic_lineage(i))
    cur = t.current_version()
    removed = t.expire_snapshots(keep_versions=3)
    assert removed == cur - 2  # v0..v(cur-3) gone
    assert t.current_version() == cur
    assert t.manifest() is not None  # current still readable
    with pytest.raises(FileNotFoundError):
        t.manifest(version=0)
    # expired manifests are really gone from meta/
    metas = [f for f in os.listdir(t.meta_dir) if f.endswith(".json")]
    assert len(metas) == 3


def test_unparsable_batch_ids_never_pruned(spark, tmp_path):
    t = _mk_table(spark, tmp_path / "odd", retention=2)
    t._commit(t.manifest(), {}, set(), lineage=_synthetic_lineage(0))
    odd = dict(_synthetic_lineage(1))
    odd["batch_id"] = "backfill-final"  # no numeric tail
    t._commit(t.manifest(), {}, set(), lineage=odd)
    for i in range(2, 8):
        t._commit(t.manifest(), {}, set(), lineage=_synthetic_lineage(i))
    m = t.manifest()
    assert "backfill-final" in m.applied_batches  # kept verbatim forever
    assert t.is_batch_applied("backfill-final")
    assert t.is_batch_applied(0)  # via frontier


def test_expire_snapshots_older_than(spark, tmp_path):
    """Age-gated expiry: only snapshots committed before the instant are
    expired, regardless of how many versions exceed keep_versions."""
    import time as _time

    from pyspark.sql import Row
    from pyspark.sql import types as T

    from datax_spark.lake.table import LakeTable

    schema = T.StructType([
        T.StructField("k", T.LongType()), T.StructField("v", T.LongType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "age"), schema=schema,
                         key_cols=["k"], bucket_col="k", num_buckets=2)
    for i in range(3):
        t.overwrite(spark.createDataFrame([Row(k=1, v=i)], schema))
    _time.sleep(0.05)
    mid = _time.time()
    _time.sleep(0.05)
    t.overwrite(spark.createDataFrame([Row(k=1, v=99)], schema))

    # create(v0) + 3 overwrites predate mid; the final overwrite (v4) is
    # newer AND inside the kept window
    removed = t.expire_snapshots(keep_versions=1, older_than=mid)
    assert removed == 4  # v0-v3 expired; v4 survives
    # nothing old remains to expire
    assert t.expire_snapshots(keep_versions=1, older_than=mid) == 0
    assert t.read().collect()[0]["v"] == 99
