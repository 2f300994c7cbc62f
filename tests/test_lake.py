"""LakeTable: atomic snapshots, bucketed layout, schema evolution, vacuum."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.merge import dedup_last_per_key, merge_into
from datax_spark.lake.table import LakeTable, merge_schemas

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


def _mk(spark, tmp_path, rows, num_buckets=4):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, KEYS, num_buckets=num_buckets
    )
    if rows:
        t.overwrite(spark.createDataFrame(rows, SCHEMA))
    return t


def test_create_overwrite_read(spark, tmp_path):
    rows = [(f"org/r{i%3}", f"p{i}", f"c{i}", "py", f"body{i}") for i in range(50)]
    t = _mk(spark, tmp_path, rows)
    got = {(r.repo, r.path, r.commit, r.lang, r.content) for r in t.read().collect()}
    assert got == set(rows)
    assert t.current_version() == 1
    stats = t.file_stats()
    assert stats["rows"] == 50 and stats["buckets"] <= 4


def test_bucket_layout_prunes(spark, tmp_path):
    rows = [(f"org/r{i}", "p", f"c{i}", "py", "x") for i in range(40)]
    t = _mk(spark, tmp_path, rows)
    m = t.manifest()
    # reading a bucket subset returns exactly that subset's rows
    some = [int(b) for b in list(m.files.keys())[:2]]
    sub = t.read(buckets=some)
    bexpr = t.bucket_expr("repo", m.num_buckets)
    assert sub.filter(~bexpr.isin(some)).count() == 0
    assert sub.count() > 0


def test_append_and_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path, [("a/r", "p1", "c1", "py", "v1")])
    t.append(spark.createDataFrame([("b/r", "p2", "c2", "go", "v2")], SCHEMA))
    assert t.read().count() == 2
    assert t.read(version=1).count() == 1  # snapshot isolation / time travel


def test_merge_upsert_delete(spark, tmp_path):
    t = _mk(spark, tmp_path, [("a/r", "p", "c1", "py", "old"), ("a/r", "p", "c2", "py", "keep")])
    batch = spark.createDataFrame(
        [
            ("update", "a/r", "p", "c1", "py", "new", 10),
            ("delete", "a/r", "p", "c2", None, None, 11),
            ("insert", "z/r", "p", "c3", "go", "fresh", 12),
        ],
        "op string, repo string, path string, commit string, lang string, content string, lsn long",
    )
    merge_into(t, batch, op_col="op", order_col="lsn",
               payload_cols=["repo", "path", "commit", "lang", "content"])
    got = {(r.commit, r.content) for r in t.read().collect()}
    assert got == {("c1", "new"), ("c3", "fresh")}


def test_merge_dedup_last_wins(spark, tmp_path):
    t = _mk(spark, tmp_path, [])
    batch = spark.createDataFrame(
        [
            ("insert", "a/r", "p", "c", "py", "v1", 1),
            ("update", "a/r", "p", "c", "py", "v3", 3),
            ("update", "a/r", "p", "c", "py", "v2", 2),
        ],
        "op string, repo string, path string, commit string, lang string, content string, lsn long",
    )
    merge_into(t, batch, op_col="op", order_col="lsn",
               payload_cols=["repo", "path", "commit", "lang", "content"])
    assert [r.content for r in t.read().collect()] == ["v3"]


def test_dedup_delete_then_reinsert(spark, tmp_path):
    t = _mk(spark, tmp_path, [("a/r", "p", "c", "py", "orig")])
    batch = spark.createDataFrame(
        [
            ("delete", "a/r", "p", "c", None, None, 5),
            ("insert", "a/r", "p", "c", "py", "reborn", 6),
        ],
        "op string, repo string, path string, commit string, lang string, content string, lsn long",
    )
    merge_into(t, batch, op_col="op", order_col="lsn",
               payload_cols=["repo", "path", "commit", "lang", "content"])
    assert [r.content for r in t.read().collect()] == ["reborn"]


def test_merge_schemas_widen_and_add():
    a = T.StructType([T.StructField("x", T.IntegerType()), T.StructField("s", T.StringType())])
    b = T.StructType([T.StructField("x", T.LongType()), T.StructField("n", T.FloatType())])
    m = merge_schemas(a, b)
    assert dict((f.name, f.dataType.typeName()) for f in m.fields) == {
        "x": "long", "s": "string", "n": "float",
    }
    import pytest
    with pytest.raises(ValueError):
        merge_schemas(
            T.StructType([T.StructField("x", T.StringType())]),
            T.StructType([T.StructField("x", T.LongType())]),
        )


def test_schema_evolution_on_merge(spark, tmp_path):
    t = _mk(spark, tmp_path, [("a/r", "p", "c0", "py", "base")])
    batch = spark.createDataFrame(
        [("insert", "a/r", "p", "c1", "py", "evolved", 1, 777)],
        "op string, repo string, path string, commit string, lang string, content string, lsn long, stars int",
    )
    merge_into(t, batch, op_col="op", order_col="lsn",
               payload_cols=["repo", "path", "commit", "lang", "content", "stars"])
    df = t.read()
    assert "stars" in df.columns
    rows = {r.commit: r.stars for r in df.collect()}
    assert rows == {"c0": None, "c1": 777}  # old files padded with null


def test_vacuum_removes_rewritten_files(spark, tmp_path):
    rows = [(f"org/r{i}", "p", f"c{i}", "py", "x") for i in range(20)]
    t = _mk(spark, tmp_path, rows, num_buckets=2)
    for i in range(3):
        t.overwrite(spark.createDataFrame(rows, SCHEMA))
    before = sum(len(os.listdir(os.path.join(t.data_dir, d)))
                 for d in os.listdir(t.data_dir))
    removed = t.vacuum(keep_versions=1)
    assert removed > 0
    after = sum(len(os.listdir(os.path.join(t.data_dir, d)))
                for d in os.listdir(t.data_dir))
    assert after == before - removed
    assert t.read().count() == 20  # current snapshot intact


def test_dedup_last_per_key_unit(spark):
    df = spark.createDataFrame(
        [("k", 1, "a"), ("k", 3, "c"), ("k", 2, "b"), ("j", 9, "z")],
        "key string, lsn long, v string",
    )
    out = {(r.key, r.v) for r in dedup_last_per_key(df, ["key"], "lsn").collect()}
    assert out == {("k", "c"), ("j", "z")}


def test_sql_view_over_lake_table(spark, tmp_path):
    from datax_spark import fixtures
    from datax_spark.cdc.runner import create_repo_table, run_incremental

    feed = fixtures.change_events(spark, 1000, n_keys=200, seed=42)
    fp = str(tmp_path / "feed")
    feed.write.parquet(fp)
    t = create_repo_table(spark, str(tmp_path / "t"), num_buckets=4)
    run_incremental(t, spark.read.parquet(fp), batch_lsns=1000)
    t.create_view("repo_files_v")
    n_sql = spark.sql(
        "SELECT count(*) AS n FROM repo_files_v WHERE lang = 'python'"
    ).collect()[0]["n"]
    n_df = t.read().filter("lang = 'python'").count()
    assert n_sql == n_df and n_sql > 0


def test_changed_buckets_from_manifest_diff(spark, tmp_path):
    """changed_buckets derives the changed-key bucket set from the manifest
    diff alone: bucketed deltas → their bucket ids; L0 placement → None
    (all buckets); physical rewrites contribute nothing; a rebucket in
    range → None (ids don't map to one layout)."""
    rows = [
        {"repo": f"r{i}", "path": "p", "commit": "c", "lang": "py",
         "content": "x"}
        for i in range(40)
    ]
    t = _mk(spark, tmp_path, rows, num_buckets=4)
    v0 = t.current_version()

    def upd(i, lsn, **kw):
        from pyspark.sql import Row
        return spark.createDataFrame(
            [Row(repo=f"r{i}", path="p", commit="c", lang="py",
                 content=f"v{lsn}", lsn=lsn, op="insert")]
        )

    merge_into(t, upd(3, 10), op_col="op", order_col="lsn", mode="mor",
               bucket_deltas=True)
    v1 = t.current_version()
    got = t.changed_buckets(v0, v1)
    bexpr = t.bucket_expr("repo", 4)
    want = spark.createDataFrame([("r3",)], "repo string") \
        .select(bexpr.alias("b")).collect()[0]["b"]
    assert got == [int(want)]

    # a compaction (physical rewrite) adds no changed bucket
    t.compact()
    assert t.changed_buckets(v1) == []

    # L0 placement → unknown → None
    merge_into(t, upd(7, 20), op_col="op", order_col="lsn", mode="mor",
               bucket_deltas=False)
    assert t.changed_buckets(v1) is None

    # bucket-count evolution inside the range → None
    t.compact()
    v2 = t.current_version()
    t.rebucket(num_buckets=8)
    merge_into(t, upd(9, 30), op_col="op", order_col="lsn", mode="mor",
               bucket_deltas=True)
    assert t.changed_buckets(v2) is None


def test_delete_where_and_update_where(spark, tmp_path):
    """Row-level DML: update_where rewrites matching rows column-wise (SET
    sees current values), delete_where tombstones them; both are ACID
    merges — state, time travel, and further merges keep working."""
    from datax_spark.lake.merge import delete_where, update_where

    rows = [
        {"repo": f"r{i}", "path": "p", "commit": "c",
         "lang": "py" if i % 2 else "go", "content": f"v{i}"}
        for i in range(10)
    ]
    t = _mk(spark, tmp_path, rows, num_buckets=4)
    v0 = t.current_version()

    n = update_where(
        t, [("lang", "=", "go")],
        {"content": F.concat(F.col("content"), F.lit("!"))},
    )
    assert n == 5
    got = {r.repo: r.content for r in t.read().collect()}
    assert got["r0"] == "v0!" and got["r1"] == "v1"

    n = delete_where(t, [("lang", "=", "go")])
    assert n == 5
    assert t.read().count() == 5
    assert {r.lang for r in t.read().collect()} == {"py"}
    # zero-match DML is a no-op (no commit)
    v1 = t.current_version()
    assert delete_where(t, [("lang", "=", "rust")]) == 0
    assert t.current_version() == v1
    # time travel still sees the pre-DML state
    assert t.read(version=v0).count() == 10
    # SET on a key column refuses
    import pytest as _pytest

    with _pytest.raises(ValueError, match="key columns"):
        update_where(t, [("lang", "=", "py")], {"repo": "x"})
    with _pytest.raises(ValueError, match="unknown columns"):
        update_where(t, [("lang", "=", "py")], {"nope": 1})


def test_update_where_column_predicate(spark, tmp_path):
    from pyspark.sql import functions as SF

    from datax_spark.lake.merge import update_where

    t = _mk(spark, tmp_path, [
        {"repo": "a", "path": "p", "commit": "c", "lang": "py",
         "content": "xx"},
        {"repo": "b", "path": "p", "commit": "c", "lang": "py",
         "content": "yyy"},
    ])
    n = update_where(t, SF.length("content") > 2, {"lang": "long"})
    assert n == 1
    assert {r.repo: r.lang for r in t.read().collect()} == {
        "a": "py", "b": "long"}


def _cow_cluster_table(spark, tmp_path):
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "fc"), schema, ["k"], bucket_col="k",
        num_buckets=1,
    )
    rows = [(i, f"v{i}") for i in range(1000)]
    t.overwrite(spark.createDataFrame(rows, schema))
    # sort-clustered layout: 4 files covering narrow disjoint k ranges
    t.compact(sort_cols=["k"], files_per_bucket=4)
    return t, dict(rows)


def test_cow_merge_keeps_disjoint_files(spark, tmp_path):
    """File-granularity COW: a batch confined to one end of a k-clustered
    bucket rewrites only the overlapping file(s); the others' manifest
    entries carry over VERBATIM (same path), and state stays exact."""
    t, expect = _cow_cluster_table(spark, tmp_path)
    before = {e[0] for es in t.manifest().files.values() for e in es}
    assert len(before) == 4
    batch = spark.createDataFrame(
        [(i, f"new{i}", "insert", 1) for i in range(40)]
        + [(5, None, "delete", 2)],
        "k long, v string, op string, lsn long",
    )
    merge_into(t, batch, op_col="op", order_col="lsn", mode="cow")
    after = {e[0] for es in t.manifest().files.values() for e in es}
    kept = before & after
    assert len(kept) == 3  # only the low-range file was rewritten
    for i in range(40):
        expect[i] = f"new{i}"
    del expect[5]
    got = {r.k: r.v for r in t.read().collect()}
    assert got == expect


def test_cow_keep_pass_skips_delta_and_null_batches(spark, tmp_path):
    """Buckets holding MOR deltas — and batches with NULL keys — take the
    whole-bucket rewrite (keeping a base file beside deltas could
    duplicate keys; NULL keys escape the bounding box)."""
    t, expect = _cow_cluster_table(spark, tmp_path)
    # introduce a delta layer into the (single) bucket
    merge_into(
        t,
        spark.createDataFrame([(999, "d999", "insert", 10)],
                              "k long, v string, op string, lsn long"),
        op_col="op", order_col="lsn", mode="mor",
    )
    before = {e[0] for es in t.manifest().files.values() for e in es}
    merge_into(
        t,
        spark.createDataFrame([(0, "z0", "insert", 11)],
                              "k long, v string, op string, lsn long"),
        op_col="op", order_col="lsn", mode="cow",
    )
    after = {e[0] for es in t.manifest().files.values() for e in es}
    assert not (before & after)  # delta-bearing bucket: full rewrite
    expect[999] = "d999"
    expect[0] = "z0"
    got = {r.k: r.v for r in t.read().collect()}
    assert got == expect


def test_vacuum_preserves_kept_cow_files(spark, tmp_path):
    """After a file-scoped COW merge, vacuum removes the REWRITTEN files
    but must keep the carried-over (still referenced) entries readable;
    lineage records how many entries the zone maps saved."""
    t, expect = _cow_cluster_table(spark, tmp_path)
    before = {e[0] for es in t.manifest().files.values() for e in es}
    batch = spark.createDataFrame(
        [(i, f"new{i}", "insert", 1) for i in range(40)],
        "k long, v string, op string, lsn long",
    )
    merge_into(t, batch, op_col="op", order_col="lsn", mode="cow",
               lineage={"batch_id": "fc1", "rows": 40, "bytes": 0})
    kept = before & {e[0] for es in t.manifest().files.values() for e in es}
    assert len(kept) == 3
    assert t.manifest().applied_batches["fc1"]["cow_files_kept"] == 3
    removed = t.vacuum(keep_versions=1)
    assert removed >= 1  # the replaced low-range file is reclaimed
    for rel in kept:  # carried-over entries are live and still on disk
        assert os.path.exists(os.path.join(t.location, rel))
    for i in range(40):
        expect[i] = f"new{i}"
    got = {r.k: r.v for r in t.read().collect()}
    assert got == expect


def test_cow_file_scoping_with_schema_evolution(spark, tmp_path):
    """A file-scoped COW merge that ADDS a column: kept (unrewritten)
    files stay on their old schema id and null-fill the new column at
    read; rewritten files carry it."""
    t, expect = _cow_cluster_table(spark, tmp_path)
    before = {e[0] for es in t.manifest().files.values() for e in es}
    batch = spark.createDataFrame(
        [(i, f"new{i}", f"x{i}", "insert", 1) for i in range(30)],
        "k long, v string, extra string, op string, lsn long",
    )
    merge_into(t, batch, op_col="op", order_col="lsn", mode="cow")
    after = {e[0] for es in t.manifest().files.values() for e in es}
    assert before & after  # scoping fired despite the evolution
    got = {r.k: (r.v, r.extra) for r in t.read().collect()}
    for i in range(1000):
        if i < 30:
            assert got[i] == (f"new{i}", f"x{i}")
        else:
            assert got[i] == (f"v{i}", None)  # kept files null-fill
