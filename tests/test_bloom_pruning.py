"""Per-file bloom-filter file skipping (lake/table.py BLOOM_PROP):
JVM-vs-driver hash parity, non-vacuous pruning, MOR safety, and the
saturation / type-mismatch fallbacks."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datax_spark.lake.table import (
    LakeTable,
    _bloom_may_match,
    _bloom_positions_py,
)

M_BITS = 1024
K = 3


@pytest.mark.parametrize(
    "value,dtype",
    [
        ("", "string"),
        ("hello", "string"),
        ("héllo wörld — ünïcode ✓", "string"),
        (0, "bigint"),
        (-1, "bigint"),
        (2**62, "bigint"),
        (-(2**31), "int"),
        (12345, "int"),
    ],
)

def test_bloom_positions_match_jvm(spark, value, dtype):
    """pmod(F.hash(col, lit(i)), m) must equal the driver mirror bit for
    bit — the whole pruning correctness rests on this parity."""
    df = spark.createDataFrame(
        [(value,)],
        T.StructType([T.StructField("c", T.StructType.fromDDL(
            f"c {dtype}")["c"].dataType)]),
    )
    jvm = df.select(
        *[
            F.pmod(F.hash(F.col("c"), F.lit(i)), F.lit(M_BITS)).alias(f"p{i}")
            for i in range(K)
        ]
    ).collect()[0]
    assert list(jvm) == _bloom_positions_py(value, dtype, K, M_BITS)


def _mk(spark, tmp_path, rows, name="t", buckets=2):
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("tag", T.StringType()),
        T.StructField("v", T.LongType()),
    ])
    t = LakeTable.create(
        spark, str(tmp_path / name), schema=schema,
        key_cols=["k"], bucket_col="k", num_buckets=buckets,
    )
    t.set_bloom_filters(["tag"], m_bits=M_BITS, k=K)
    df = spark.createDataFrame(rows, schema)
    t.overwrite(df, files_per_bucket=4)
    return t


def test_bloom_prunes_files_and_results_exact(spark, tmp_path):
    # a handful of rare tags (each living in one file) over a filler mass —
    # the needle-in-haystack lookup blooms exist for
    rows = [
        (i, f"rare{i}" if i < 8 else "filler", i * 10) for i in range(2000)
    ]
    t = _mk(spark, tmp_path, rows)
    plan = t.scan_plan(where=[("tag", "=", "rare3")])
    assert plan["bloom_skipped"] > 0, "bloom pruning was vacuous"
    got = sorted(
        (r.k, r.tag, r.v)
        for r in t.read(where=[("tag", "=", "rare3")]).collect()
    )
    want = sorted(r for r in rows if r[1] == "rare3")
    assert got == want
    # IN-list lookups prune too, and a missing value prunes everything
    assert t.scan_plan(where=[("tag", "in", ["rare3", "rare5"])])[
        "bloom_skipped"] > 0
    none = t.scan_plan(where=[("tag", "=", "no-such-tag")])
    assert none["files_kept"] == 0 or none["bloom_skipped"] > 0
    assert t.read(where=[("tag", "=", "no-such-tag")]).count() == 0


def test_bloom_mor_delta_safety(spark, tmp_path):
    """Non-key predicates never skip delta files (the zone-map rule), and
    bloom pruning under MOR still folds the newest version."""
    from datax_spark.lake.merge import merge_into

    rows = [(i, f"tag{i % 16}", i) for i in range(400)]
    t = _mk(spark, tmp_path, rows, name="mor")
    up = spark.createDataFrame(
        [(7, "retagged", 777)],
        T.StructType([
            T.StructField("k", T.LongType()),
            T.StructField("tag", T.StringType()),
            T.StructField("v", T.LongType()),
        ]),
    ).withColumn("op", F.lit("update")).withColumn("lsn", F.lit(1).cast("long"))
    merge_into(t, up, mode="mor", order_col="lsn")
    got = t.read(where=[("tag", "=", "retagged")]).collect()
    assert [(r.k, r.tag, r.v) for r in got] == [(7, "retagged", 777)]
    # key 7's OLD row must not resurface under its old tag
    old = t.read(where=[("tag", "=", "tag7")]).collect()
    assert all(r.k != 7 for r in old)
    assert len(old) == len([r for r in rows if r[1] == "tag7"]) - 1


def test_bloom_saturation_falls_back_to_none(spark, tmp_path):
    # >m/2 distinct positions per file → stored as None, never prunes
    rows = [(i, f"u{i}", i) for i in range(3000)]  # ~unique tags
    t = _mk(spark, tmp_path, rows, name="sat", buckets=1)
    m = t.manifest()
    recs = [
        e[6]["tag"] for es in m.files.values() for e in es if len(e) > 6
    ]
    assert recs and all(r is None for r in recs)
    assert t.scan_plan(where=[("tag", "=", "u5")])["bloom_skipped"] == 0
    assert t.read(where=[("tag", "=", "u5")]).count() == 1


def test_bloom_type_mismatch_keeps_file(spark):
    rec = {"tag": {"b": "AA==", "t": "int", "m": 8, "k": 1}}
    schema = T.StructType([T.StructField("tag", T.StringType())])
    # recorded under int, schema says string → never prune
    assert _bloom_may_match(rec, [("tag", "=", "x")], schema)


def test_bloom_all_null_column_prunes_everything(spark, tmp_path):
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("tag", T.StringType()),
        T.StructField("v", T.LongType()),
    ])
    t = LakeTable.create(
        spark, str(tmp_path / "nulls"), schema=schema,
        key_cols=["k"], bucket_col="k", num_buckets=1,
    )
    t.set_bloom_filters(["tag"], m_bits=M_BITS, k=K)
    t.overwrite(spark.createDataFrame(
        [(i, None, i) for i in range(50)], schema))
    plan = t.scan_plan(where=[("tag", "=", "anything")])
    assert plan["files_kept"] == 0
    assert t.read(where=[("tag", "=", "anything")]).count() == 0


def test_bloom_rejects_unsupported_config(spark, tmp_path):
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("arr", T.ArrayType(T.LongType())),
    ])
    t = LakeTable.create(
        spark, str(tmp_path / "bad"), schema=schema,
        key_cols=["k"], bucket_col="k", num_buckets=1,
    )
    with pytest.raises(ValueError, match="hash mirror"):
        t.set_bloom_filters(["arr"])
    with pytest.raises(ValueError, match="not in schema"):
        t.set_bloom_filters(["ghost"])
    with pytest.raises(ValueError, match="m_bits"):
        t.set_bloom_filters(["k"], m_bits=63)


def test_cli_maintain_bloom_cols_backfill(spark, tmp_path, capsys):
    """`maintain --bloom-cols tag --compact` enables blooms and backfills
    the existing files in one invocation."""
    import json

    from datax_spark.cli import main

    rows = [(i, f"rare{i}" if i < 8 else "filler", i) for i in range(2000)]
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("tag", T.StringType()),
        T.StructField("v", T.LongType()),
    ])
    t = LakeTable.create(
        spark, str(tmp_path / "cli"), schema=schema, key_cols=["k"],
        bucket_col="k", num_buckets=2,
    )
    t.overwrite(spark.createDataFrame(rows, schema), files_per_bucket=4)
    # a delta so --compact has something to rewrite (a fully-compacted
    # table backfills via --sort-cols, which forces the re-cluster)
    from datax_spark.lake.merge import merge_into
    from pyspark.sql import functions as F

    up = spark.createDataFrame([(1, "rare1", 999)], schema) \
        .withColumn("op", F.lit("update")) \
        .withColumn("lsn", F.lit(1).cast("long"))
    merge_into(t, up, mode="mor", order_col="lsn")
    rc = main(["maintain", str(tmp_path / "cli"),
               "--bloom-cols", "tag", f"--bloom-bits", str(M_BITS),
               "--compact", "--files-per-bucket", "4"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["ok"] and res["bloom_cols"] == ["tag"] and res["compacted"]
    t2 = LakeTable(spark, str(tmp_path / "cli"))
    assert t2.scan_plan(where=[("tag", "=", "rare5")])["bloom_skipped"] > 0


def test_bloom_positions_match_jvm_for_dates(spark, tmp_path):
    """DateType hashes as its physical int (days since epoch) — the
    driver mirror must accept real datetime.date probe values."""
    import datetime

    for d in (datetime.date(2024, 1, 15), datetime.date(1969, 12, 31),
              datetime.date(1970, 1, 1)):
        df = spark.createDataFrame([(d,)], "c date")
        jvm = df.select(
            *[F.pmod(F.hash(F.col("c"), F.lit(i)), F.lit(M_BITS))
              .alias(f"p{i}") for i in range(K)]
        ).collect()[0]
        assert list(jvm) == _bloom_positions_py(d, "date", K, M_BITS), d
    # end-to-end: bloom on a date column prunes and stays exact
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("d", T.DateType()),
        T.StructField("v", T.LongType()),
    ])
    t = LakeTable.create(
        spark, str(tmp_path / "dates"), schema=schema, key_cols=["k"],
        bucket_col="k", num_buckets=2,
    )
    t.set_bloom_filters(["d"], m_bits=M_BITS, k=K)
    base = datetime.date(2020, 1, 1)
    rows = [(i, base + datetime.timedelta(days=i % 16), i)
            for i in range(400)]
    t.overwrite(spark.createDataFrame(rows, schema), files_per_bucket=4)
    needle = base + datetime.timedelta(days=3)
    got = t.read(where=[("d", "=", needle)]).count()
    assert got == len([r for r in rows if r[1] == needle])


def test_bloom_planning_payload_bounded_at_many_files(spark, tmp_path):
    """Bitmaps are packed EXECUTOR-side: the planning collect for a
    ≥500-file write with 2 bloom columns must hand the driver
    O(files × cols) fixed-width blobs (files × cols × m/8 bytes), not
    O(files × cols × m/2) position ints — the round-4 verdict's 100-TB
    watch item.  Pruning must stay green on the result."""
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("tag", T.StringType()),
        T.StructField("uid", T.LongType()),
    ])
    buckets = 64
    t = LakeTable.create(
        spark, str(tmp_path / "many"), schema=schema,
        key_cols=["k"], bucket_col="k", num_buckets=buckets,
    )
    t.set_bloom_filters(["tag", "uid"], m_bits=M_BITS, k=K)
    n = 20_000
    payload = 0
    for part in range(8):  # 8 appends × 64 buckets = 512 files
        df = spark.range(part * n // 8, (part + 1) * n // 8).select(
            F.col("id").alias("k"),
            F.concat(F.lit("tag"), (F.col("id") % 5000).cast("string"))
            .alias("tag"),
            (F.col("id") * 7919 % 100_000).alias("uid"),
        )
        t.append(df)
        payload = max(payload, t._last_bloom_payload_bytes * 8)
    n_files = sum(len(es) for es in t.manifest().files.values())
    assert n_files >= 500
    # every (file, col) blob is m/8 bytes; the whole planning payload for
    # 512 files × 2 cols at the DEFAULT m (32768) would be 4 MiB — here
    # (m=1024) it must be exactly ≤ files × cols × m/8
    assert payload <= n_files * 2 * (M_BITS // 8), payload
    # and the bitmaps it produced actually prune a needle lookup
    needle_k = 12_345
    needle_tag = f"tag{needle_k % 5000}"
    plan = t.scan_plan(where=[("tag", "=", needle_tag)])
    assert plan["bloom_skipped"] > 0, "bloom pruning was vacuous"
    got = sorted(r.k for r in
                 t.read(where=[("tag", "=", needle_tag)]).collect())
    want = sorted(k for k in range(n) if k % 5000 == needle_k % 5000)
    assert got == want
