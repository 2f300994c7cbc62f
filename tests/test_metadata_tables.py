"""Metadata tables: LakeTable.snapshots_df / files_df (Iceberg
table.snapshots / table.files analogue) — history and file inventory as
DataFrames, answered purely from manifests (no data files opened)."""

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
    ]
)


def _mk(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema=SCHEMA, key_cols=["k"],
        bucket_col="k", num_buckets=4,
    )
    t.overwrite(spark.createDataFrame([Row(k=i, v=i) for i in range(20)]))
    merge_into(
        t, spark.createDataFrame([Row(k=1, v=99, op="insert", lsn=1)]),
        op_col="op", order_col="lsn", mode="mor", auto_compact=None,
    )
    return t


def test_snapshots_df_tracks_operations(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.compact()
    snaps = {r["version"]: r for r in t.snapshots_df().collect()}
    assert snaps[0]["operation"] == "create" and snaps[0]["files"] == 0
    assert snaps[1]["operation"] == "overwrite"
    assert snaps[2]["operation"] == "merge-mor" and snaps[2]["delta_files"] >= 1
    assert snaps[3]["operation"] == "compact" and snaps[3]["delta_files"] == 0
    # totals agree with file_stats (same manifest numbers)
    fs = t.file_stats()
    assert snaps[3]["bytes"] == fs["bytes"] and snaps[3]["rows"] == fs["rows"]


def test_snapshots_df_skips_expired(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.compact()
    t.expire_snapshots(keep_versions=1)
    vs = [r["version"] for r in t.snapshots_df().collect()]
    assert vs and max(vs) == t.current_version()
    assert 1 not in vs  # expired history is gone, survivors still listed


def test_files_df_inventory(spark, tmp_path):
    t = _mk(spark, tmp_path)
    files = t.files_df().collect()
    kinds = {r["kind"] for r in files}
    assert kinds == {"base", "delta"}
    for r in files:
        assert r["bytes"] > 0 and r["rows"] > 0
        assert r["bounds"] is not None and "k" in r["bounds"]
        lo, hi = r["bounds"]["k"]
        assert int(lo) <= int(hi)
    # totals agree with the aggregate view
    assert sum(r["rows"] for r in files) == t.file_stats()["rows"]
    # historical snapshot inventory still resolvable
    v1 = t.files_df(version=1).collect()
    assert {r["kind"] for r in v1} == {"base"}
