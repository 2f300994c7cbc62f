"""Transformer chain semantics vs hand-computed rows (SURVEY.md §5 layer 1),
mirroring the reference's six built-ins (TransformerRegistry.java:34-39)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datax_spark import transforms as tx
from datax_spark.plans import checks


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame(
        [
            (1, "hello world", 42.0),
            (2, "abc", -1.0),
            (3, None, 0.0),
            (4, "", 99.5),
        ],
        "id int, s string, v double",
    )


def rows(df, *cols):
    return [tuple(r) for r in df.select(*cols).orderBy("id").collect()]


def test_dx_substr(sdf):
    out = rows(sdf.withColumn("o", tx.dx_substr("s", 1, 3)), "o")
    # 0-based start, len 3; null passthrough; start past end → null (dirty)
    assert out == [("ell",), ("bc",), (None,), (None,)]


def test_dx_substr_start_past_end_is_null(sdf):
    out = rows(sdf.withColumn("o", tx.dx_substr("s", 5, 3)), "o")
    assert out == [(" wo",), (None,), (None,), (None,)]


def test_dx_pad(sdf):
    left = rows(sdf.withColumn("o", tx.dx_pad("s", "l", 5, "*")), "o")
    assert left == [("hello",), ("**abc",), ("*****",), ("*****",)]
    right = rows(sdf.withColumn("o", tx.dx_pad("s", "r", 4, "xy")), "o")
    assert right == [("hell",), ("abcx",), ("xyxy",), ("xyxy",)]


def test_dx_replace(sdf):
    out = rows(sdf.withColumn("o", tx.dx_replace("s", 1, 3, "_")), "o")
    assert out == [("h_o world",), ("a_",), (None,), ("_",)]


def test_dx_filter_compare_and_null_semantics(sdf):
    kept = tx.dx_filter(sdf, "v", ">", 0)  # drop v>0
    assert {r.id for r in kept.collect()} == {2, 3}
    # like = anchored Java regex full-match (FilterTransformer.java:294-310)
    kept = tx.dx_filter(sdf, "s", "like", "h.*")
    assert {r.id for r in kept.collect()} == {2, 3, 4}
    kept = tx.dx_filter(sdf, "s", "not like", "h.*")
    assert {r.id for r in kept.collect()} == {1, 3}
    # '= "null"' matches SQL NULL (FilterTransformer.java:205-212)
    kept = tx.dx_filter(sdf, "s", "=", "null")
    assert {r.id for r in kept.collect()} == {1, 2, 4}


def test_dx_digest(sdf):
    import hashlib

    out = rows(sdf.withColumn("o", tx.dx_digest("s", "md5", "toUpper")), "o")
    exp = [
        hashlib.md5(x.encode()).hexdigest().upper()
        for x in ["hello world", "abc", "", ""]
    ]
    assert [o for (o,) in out] == exp
    sha = rows(sdf.withColumn("o", tx.content_sha256("s")), "o")
    assert sha[0][0] == hashlib.sha256(b"hello world").hexdigest()


def test_registry_chain_stays_codegen(spark, sdf):
    reg = tx.TransformerRegistry()
    chain = [
        {"name": "dx_substr", "column": "s", "parameters": [0, 5], "as": "head"},
        {"name": "dx_digest", "column": "head", "parameters": ["md5", "toLower"]},
        {"name": "dx_filter", "column": "v", "parameters": ["<", 0.0]},
    ]
    out = reg.apply_chain(sdf, chain)
    assert {r.id for r in out.collect()} == {1, 3, 4}
    checks.assert_no_python_row_udf(out)
    checks.assert_whole_stage_codegen(out)


def test_registry_rejects_plain_python_udf():
    reg = tx.TransformerRegistry()
    bad = F.udf(lambda x: x, "string")
    with pytest.raises(ValueError, match="pandas_udf"):
        reg.register_pandas_udf("bad", bad)


def test_registry_pandas_udf_is_arrow(spark, sdf):
    reg = tx.TransformerRegistry()

    @F.pandas_udf("int")
    def slen(s: pd.Series) -> pd.Series:
        return s.fillna("").str.len()

    reg.register_pandas_udf("slen", slen)
    out = reg.apply_chain(
        sdf, [{"name": "slen", "column": "s", "as": "n"}]
    )
    assert rows(out, "n") == [(11,), (3,), (0,), (0,)]
    plan = checks.physical_plan(out)
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan


def test_scan_pushdown_helpers(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    q = df.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    checks.assert_filter_pushed(q, "l_quantity")
    checks.assert_read_schema_pruned(q, 2)
