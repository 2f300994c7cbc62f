"""Mirror of the driver's correctness gate: run every suite query on Spark
at sf0.001 and its oracle SQL in DuckDB over the same parquet; compare
row-count, column names, and order-insensitive values (SURVEY.md §5.6)."""

import math
import os

import duckdb
import pytest

from datax_spark import suite

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    return v


def _sort_key(t):
    # None-safe total order (rollup/cube rows carry NULL group keys)
    return tuple((v is None, str(v)) for v in t)


def _rows(rows, cols):
    return sorted(
        (
            tuple(
                _norm(r[c] if isinstance(r, dict) else r[i])
                for i, c in enumerate(cols)
            )
            for r in rows
        ),
        key=_sort_key,
    )


@pytest.mark.parametrize("name", sorted(suite.oracle_sql().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = suite.queries()[name]
    df = q(spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = _rows([tuple(r) for r in df.collect()], spark_cols)

    cur = ddb.execute(suite.oracle_sql()[name])
    duck_cols = [d[0] for d in cur.description]
    duck_rows = _rows(cur.fetchall(), duck_cols)

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    # reorder spark tuples to duckdb column order for value compare
    if spark_cols != duck_cols:
        idx = [spark_cols.index(c) for c in duck_cols]
        spark_rows = sorted(
            (tuple(t[i] for i in idx) for t in spark_rows), key=_sort_key
        )
    assert len(spark_rows) == len(duck_rows), (
        name, len(spark_rows), len(duck_rows)
    )
    assert spark_rows == duck_rows, name


# Spark result dtype -> acceptable DuckDB Arrow types.  The driver's gate
# hashes *typed* values, so a DuckDB HUGEINT/decimal128 `sum(...)` vs a Spark
# int64 is a hash mismatch even when every value is equal (the round-1
# failure mode for 7 queries).  This test pins the oracle output types.
_TYPE_OK = {
    "bigint": {"int64"},
    "int": {"int32"},
    "double": {"double"},
    "float": {"float"},
    "string": {"string", "large_string", "string_view"},
    "boolean": {"bool"},
}


@pytest.mark.parametrize("name", sorted(suite.oracle_sql().keys()))
def test_oracle_output_types_align(spark, ddb, name):
    df = suite.queries()[name](spark, SF_DIR)
    spark_types = dict(df.dtypes)
    tbl = ddb.execute(suite.oracle_sql()[name]).fetch_arrow_table()
    for field in tbl.schema:
        duck_t = str(field.type)
        assert not duck_t.startswith("decimal"), (
            name, field.name, duck_t,
            "oracle emits decimal/HUGEINT — wrap in CAST(... AS BIGINT)",
        )
        spark_t = spark_types.get(field.name)
        allowed = _TYPE_OK.get(spark_t)
        if allowed is not None:
            assert duck_t in allowed, (name, field.name, spark_t, duck_t)


# Every suite query now has a DuckDB value oracle (the multimodal Arrow
# kernels are deterministic and blob-expressible — r1 VERDICT "What's wrong"
# #3).  Keep the escape hatch explicit for future genuinely-non-SQL ops.
NO_ORACLE_ALLOWED: set[str] = set()


def test_every_query_has_oracle_or_is_documented():
    missing = set(suite.queries()) - set(suite.oracle_sql())
    # non-SQL-expressible ops may omit oracles; keep the list explicit
    assert missing == NO_ORACLE_ALLOWED, missing


def test_no_oracle_queries_still_run(spark):
    for name in NO_ORACLE_ALLOWED:
        df = suite.queries()[name](spark, SF_DIR)
        assert df.count() > 0
