"""History-preserving minor compaction (`LakeTable.compact_minor`):
delta files consolidate per bucket with ``__lsn``/``__deleted`` kept, so
the read fold, the changelog, AND an in-flight incremental-snapshot
bootstrap all see identical state — the file-count bound for the window
where full compaction is refused (tests/test_incremental_snapshot.py)."""

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.merge import merge_into
from datax_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, op string, lsn long")


def _mk(spark, tmp_path, name="t", bucket_deltas=True, n_batches=4):
    t = LakeTable.create(spark, str(tmp_path / name), schema=SCHEMA,
                         key_cols=["k"], bucket_col="k", num_buckets=2)
    lsn = 0
    for b in range(n_batches):
        rows = [(k, f"v{lsn + k}", "insert", lsn + k) for k in range(8)]
        if b == n_batches - 1:
            rows.append((3, None, "delete", lsn + 100))
        lsn += 200
        merge_into(t, _ev(spark, rows), op_col="op", order_col="lsn",
                   mode="mor", auto_compact=None,
                   bucket_deltas=bucket_deltas)
    return t


def _state(t):
    return {r.k: r.v for r in t.read().collect()}


def _counts(t):
    s = t.file_stats()
    return s["delta_files"], s["files"]


def test_minor_compaction_preserves_fold_and_history(spark, tmp_path):
    t = _mk(spark, tmp_path)
    before = _state(t)
    d0, _ = _counts(t)
    assert d0 >= 8, "needs several delta files per bucket"
    m = t.compact_minor()
    assert m is not None and m.operation == "compact-minor"
    d1, _ = _counts(t)
    assert d1 == 2, f"one consolidated delta per bucket, got {d1}"
    assert _state(t) == before
    assert 3 not in _state(t), "the folded tombstone must still delete"
    # a second pass has nothing above min_files
    assert t.compact_minor() is None
    # the winner rows keep their REAL LSNs (not base -1): a later merge at
    # a lower LSN must still lose
    merge_into(t, _ev(spark, [(4, "stale", "insert", 1)]), op_col="op",
               order_col="lsn", mode="mor", auto_compact=None)
    assert _state(t)[4] == before[4]


def test_minor_compaction_consolidates_l0(spark, tmp_path):
    t = _mk(spark, tmp_path, bucket_deltas=False)
    before = _state(t)
    m0 = t.manifest()
    l0 = [e for e in m0.files.get("L0", []) if len(e) > 2 and e[2] == "delta"]
    assert len(l0) >= 2, "needs several L0 files"
    m = t.compact_minor()
    assert m is not None
    l1 = [e for e in m.files.get("L0", []) if len(e) > 2 and e[2] == "delta"]
    assert len(l1) <= 1
    assert _state(t) == before


def test_minor_compaction_safe_during_bootstrap(spark, tmp_path):
    """The scenario the feature exists for: mid-bootstrap, full compaction
    refuses but minor compaction keeps file counts bounded — and a late
    sentinel snapshot chunk still loses to the consolidated winners."""
    from datax_spark.cdc.apply import CdcApplier

    t = _mk(spark, tmp_path)
    t.set_properties(bootstrap_active=True)
    with pytest.raises(RuntimeError):
        t.compact()
    before = _state(t)
    assert t.compact_minor() is not None
    # a late snapshot chunk row (sentinel lsn=-1) with STALE content must
    # lose to the consolidated delta rows' real LSNs
    stale = spark.createDataFrame(
        [(0, "stale-chunk", 4, "insert", -1)],
        "k long, v string, shard long, op string, lsn long",
    ).withColumn("ts", F.current_timestamp())
    CdcApplier(t, dedup_batch=False, auto_compact=None).apply_batch(
        stale, "late-chunk")
    assert _state(t)[0] == before[0]
    t.set_properties(bootstrap_active=None)


def test_auto_compact_falls_back_to_minor_during_bootstrap(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "ab"), schema=SCHEMA,
                         key_cols=["k"], bucket_col="k", num_buckets=2)
    t.set_properties(bootstrap_active=True)
    for b in range(4):
        merge_into(t, _ev(spark, [(k, f"v{b}", "insert", b * 10 + k)
                                  for k in range(6)]),
                   op_col="op", order_col="lsn", mode="mor", auto_compact=2)
    d, _ = _counts(t)
    # full compaction deferred, minor kept the count at the threshold
    assert d <= 4, f"minor fallback should bound delta files, got {d}"
    assert _state(t) == {k: "v3" for k in range(6)}


def test_pdelta_buckets_are_skipped(spark, tmp_path):
    t = _mk(spark, tmp_path, n_batches=3)
    # land a partial update → pdelta files in touched buckets
    pu = spark.createDataFrame([(1, "patched", "update", 9000)],
                               "k long, v string, op string, lsn long")
    merge_into(t, pu, op_col="op", order_col="lsn", mode="mor",
               auto_compact=None, partial_update=True)
    m0 = t.manifest()
    pdelta_buckets = {
        b for b, es in m0.files.items()
        if any(len(e) > 2 and e[2] == "pdelta" for e in es)
    }
    assert pdelta_buckets
    before = _state(t)
    m = t.compact_minor()
    target = m if m is not None else t.manifest()
    for b in pdelta_buckets:  # untouched, entry-for-entry
        assert target.files[b] == m0.files[b]
    assert _state(t) == before


def test_cli_maintain_compact_minor(spark, tmp_path, capsys):
    import json

    from datax_spark import cli

    _mk(spark, tmp_path, name="clit")
    rc = cli.main(["maintain", str(tmp_path / "clit"),
                   "--compact-minor", "2", "--cores", "4"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["ok"] and out["compacted_minor"]
    t = LakeTable(spark, str(tmp_path / "clit"))
    assert t.file_stats()["delta_files"] == 2
