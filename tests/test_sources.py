"""Split planning properties (hypothesis) + file source/sink config
semantics vs the reference's reader/writer contracts."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datax_spark.sources import file as FS
from datax_spark.sources import split as SP


# ------------------------------------------------------------ split planning
@given(
    lo=st.integers(-(10**12), 10**12),
    width=st.integers(0, 10**12),
    n=st.integers(1, 64),
)
@settings(max_examples=200, deadline=None)
def test_long_split_partitions_exactly(lo, width, n):
    hi = lo + width
    ranges = SP.split_long_range(lo, hi, n)
    # complete, adjacent, non-overlapping, ordered
    assert ranges[0][0] == lo and ranges[-1][1] == hi
    for (a, b), (c, _) in zip(ranges, ranges[1:]):
        assert b + 1 == c
    for a, b in ranges:
        assert a <= b
    # balanced: widths differ by at most 1
    widths = [b - a + 1 for a, b in ranges]
    assert max(widths) - min(widths) <= 1


def test_big_split_handles_beyond_int64():
    ranges = SP.split_big_range(0, 2**80, 7)
    assert ranges[0][0] == 0 and ranges[-1][1] == 2**80
    assert len(ranges) == 7


@given(
    s=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=6),
    t=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=6),
    n=st.integers(2, 10),
)
@settings(max_examples=100, deadline=None)
def test_string_split_bounds_are_ordered(s, t, n):
    bounds = SP.split_string_range(s, t, n)
    assert bounds[0] == min(s, t, key=SP._str_to_num)
    assert bounds[-1] == max(s, t, key=SP._str_to_num)
    nums = [SP._str_to_num(b) for b in bounds]
    assert nums == sorted(nums)


def test_pk_predicates_shape():
    preds = SP.pk_predicates("id", 0, 99, 4)
    assert len(preds) == 5  # 4 ranges + NULL tail
    assert preds[-1] == "id IS NULL"
    assert preds[0] == "id >= 0 AND id < 25"
    assert preds[3] == "id >= 75 AND id <= 99"


def test_split_factor():
    assert SP.split_factor_advice(8) == 40  # 5x oversplit, ReaderSplitUtil


# ---------------------------------------------------------------- file source
@pytest.fixture(scope="module")
def csv_dir(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("csv")
    (p / "a.csv").write_text(
        "1;alice;2020-01-02 03:04:05;9.5\n"
        "2;\\N;2021-06-07 08:09:10;1.25\n"
    )
    return str(p)


def test_read_delimited_projection_cast_const(spark, csv_dir):
    df = FS.read_delimited(
        spark,
        csv_dir,
        columns=[
            {"index": 0, "type": "long", "name": "id"},
            {"index": 1, "type": "string", "name": "who"},
            {"index": 2, "type": "date", "format": "yyyy-MM-dd HH:mm:ss", "name": "ts"},
            {"index": 3, "type": "double", "name": "score"},
            {"value": "fixed", "type": "string", "name": "tag"},
        ],
        field_delimiter=";",
    )
    rows = {r.id: r for r in df.collect()}
    assert rows[1].who == "alice" and rows[2].who is None  # nullFormat \N
    assert rows[1].ts.year == 2020 and rows[2].score == 1.25
    assert rows[1].tag == "fixed"


def test_read_delimited_gzip_by_extension(spark, tmp_path):
    # Read-side decompression is extension-driven (Hadoop codec factory);
    # the compression= arg is validated but never becomes a read option.
    import gzip

    p = tmp_path / "gz"
    p.mkdir()
    with gzip.open(p / "a.csv.gz", "wt") as f:
        f.write("1;alice\n2;bob\n")
    df = FS.read_delimited(
        spark, str(p),
        columns=[{"index": 0, "type": "long", "name": "id"},
                 {"index": 1, "type": "string", "name": "who"}],
        field_delimiter=";", compression="gzip",
    )
    rows = {r.id: r.who for r in df.collect()}
    assert rows == {1: "alice", 2: "bob"}
    with pytest.raises(ValueError, match="extension"):
        FS.read_delimited(spark, str(p), field_delimiter=";",
                          compression="zip")


def test_read_delimited_bad_index(spark, csv_dir):
    with pytest.raises(IndexError):
        FS.read_delimited(
            spark, csv_dir, columns=[{"index": 9, "type": "string"}],
            field_delimiter=";",
        )


def test_write_modes(spark, tmp_path, csv_dir):
    df = FS.read_delimited(spark, csv_dir, field_delimiter=";")
    out = str(tmp_path / "out")
    FS.write_delimited(df, out, write_mode="append", field_delimiter="|")
    with pytest.raises(FileExistsError):
        FS.write_delimited(df, out, write_mode="nonConflict")
    FS.write_delimited(df, out, write_mode="truncate", field_delimiter="|")
    back = spark.read.option("sep", "|").csv(out)
    assert back.count() == 2

# ---------------------------------------------------------------- jdbc specs
def test_jdbc_read_spec_options_and_predicates():
    from datax_spark.sources.jdbc import JdbcReadSpec

    spec = JdbcReadSpec(
        url="jdbc:mysql://db:3306/x",
        table="orders",
        columns=["o_orderkey", "o_totalprice"],
        where="o_totalprice > 0",
        split_pk="o_orderkey",
        num_splits=4,
        fetch_size=5000,
        session=["set session sql_mode=ANSI"],
    )
    opts = spec.options()
    assert opts["dbtable"] == (
        "(SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice > 0) AS __dx_src"
    )
    assert opts["fetchsize"] == "5000"
    assert opts["sessionInitStatement"] == "set session sql_mode=ANSI"
    preds = spec.predicates(0, 99)
    assert len(preds) == 5 and preds[-1] == "o_orderkey IS NULL"
    # no split pk → no predicates (querySql passthrough mode)
    assert JdbcReadSpec(url="u", table="t").predicates(0, 9) == []


def test_jdbc_write_spec_options():
    from datax_spark.sources.jdbc import JdbcWriteSpec

    w = JdbcWriteSpec(url="jdbc:postgresql://db/x", table="t",
                      batch_size=4096, write_mode="truncate")
    opts = w.options()
    assert opts["batchsize"] == "4096"
    assert opts["truncate"] == "true"
    assert JdbcWriteSpec(url="u", table="t").options()["truncate"] == "false"


# ------------------------------------------- multi-table / multi-URL fan-out
def test_expand_table_pattern():
    from datax_spark.sources.jdbc import expand_table_pattern

    assert expand_table_pattern("tbl") == ["tbl"]
    assert expand_table_pattern("tbl_[0-3]") == [
        "tbl_0", "tbl_1", "tbl_2", "tbl_3"
    ]
    # zero-padding preserved (TableExpandUtil semantics)
    assert expand_table_pattern("t_[00-02]_x") == ["t_00_x", "t_01_x", "t_02_x"]
    with pytest.raises(ValueError):
        expand_table_pattern("t_[9-3]")


def test_multi_read_spec_fanout():
    from datax_spark.sources.jdbc import JdbcMultiReadSpec

    multi = JdbcMultiReadSpec(
        urls=["jdbc:mysql://h1/db", "jdbc:mysql://h2/db"],
        tables=["orders_[0-2]", "orders_extra"],
        columns=["id", "v"],
        where="v > 0",
        split_pk="id",
        num_splits=4,
    )
    specs = multi.expand()
    # 2 urls x (3 expanded + 1 literal) tables = 8 per-shard read specs
    assert len(specs) == 8
    assert {s.table for s in specs} == {
        "orders_0", "orders_1", "orders_2", "orders_extra"
    }
    assert {s.url for s in specs} == {"jdbc:mysql://h1/db", "jdbc:mysql://h2/db"}
    # shared config propagates to every shard
    for s in specs:
        assert s.query() == "SELECT id, v FROM " + s.table + " WHERE v > 0"
        assert len(s.predicates(0, 100)) == 5  # 4 ranges + NULL tail


# --------------------------------------------------- preSql / postSql writer
class _LogWriter:
    """Stands in for df.write: records the write event in the shared log."""

    def __init__(self, log):
        self.log = log

    def format(self, _):
        return self

    def mode(self, m):
        return self

    def option(self, k, v):
        return self

    def save(self):
        self.log.append("WRITE")


class _LogDF:
    def __init__(self, log):
        self.log = log

    @property
    def write(self):
        return _LogWriter(self.log)


def test_write_spec_pre_post_sql_order_and_placeholder():
    from datax_spark.sources.jdbc import JdbcWriteSpec

    log = []
    spec = JdbcWriteSpec(
        url="jdbc:mysql://h/db", table="tgt",
        pre_sql=["TRUNCATE TABLE @table_stage", "DELETE FROM @table WHERE 1=0"],
        post_sql=["ANALYZE TABLE @table"],
    )
    spec.save(_LogDF(log), sql_executor=log.append)
    assert log == [
        "TRUNCATE TABLE tgt_stage",
        "DELETE FROM tgt WHERE 1=0",
        "WRITE",
        "ANALYZE TABLE tgt",
    ]


def test_write_spec_pre_sql_failure_aborts_before_write():
    from datax_spark.sources.jdbc import JdbcWriteSpec

    log = []

    def boom(sql):
        raise RuntimeError("no grants")

    spec = JdbcWriteSpec(url="u", table="t", pre_sql=["TRUNCATE @table"])
    with pytest.raises(RuntimeError, match="no grants"):
        spec.save(_LogDF(log), sql_executor=boom)
    assert log == []  # nothing written

    # configured pre/post sql without an executor refuses up front
    with pytest.raises(ValueError, match="sql_executor"):
        spec.save(_LogDF(log))
    assert log == []


# ------------------------------------------------------------ quantile split
def test_quantile_split_balances_skewed_pk(spark):
    from pyspark.sql import functions as F

    # quadratically skewed PK: even bisection would put ~97% of rows in the
    # first range; quantile split must keep ranges within ~25% of each other
    df = spark.range(4000).select((F.col("id") * F.col("id")).alias("pk"))
    bounds = SP.quantile_split_bounds(df, "pk", 8, relative_error=0.0)
    preds = SP.bounded_predicates("pk", 0, 3999 * 3999, bounds)
    assert preds[-1] == "pk IS NULL"
    counts = [df.filter(F.expr(p)).count() for p in preds[:-1]]
    assert sum(counts) == 4000  # complete, non-overlapping coverage
    assert max(counts) <= 1.25 * (4000 / len(counts))
    # contrast: even bisection on the same key is pathologically skewed
    even = SP.pk_predicates("pk", 0, 3999 * 3999, 8)
    even_counts = [df.filter(F.expr(p)).count() for p in even[:-1]]
    assert max(even_counts) > 0.3 * 4000


def test_bounded_predicates_edges():
    preds = SP.bounded_predicates("id", 10, 99, [30, 60], null_tail=False)
    assert preds == [
        "id >= 10 AND id < 30",
        "id >= 30 AND id < 60",
        "id >= 60 AND id <= 99",
    ]
    # out-of-range interior bounds are dropped, never produce empty ranges
    assert SP.bounded_predicates("id", 10, 99, [5, 200], null_tail=False) == [
        "id >= 10 AND id <= 99"
    ]


# ------------------------------------------------- SEQ legacy format reader
def test_read_sequence_text_roundtrip(spark, tmp_path):
    seq_dir = str(tmp_path / "seq")
    lines = [f"{i},name{i},{i * 1.5}" for i in range(50)]
    spark.sparkContext.parallelize(
        [(i, l) for i, l in enumerate(lines)], 2
    ).saveAsSequenceFile(seq_dir)

    out = FS.read_sequence_text(
        spark, seq_dir,
        columns=[
            {"index": 0, "type": "long", "name": "id"},
            {"index": 1, "type": "string", "name": "name"},
            {"index": 2, "type": "double", "name": "score"},
            {"value": "seq", "type": "string", "name": "src"},
        ],
    )
    rows = {r.id: r for r in out.collect()}
    assert len(rows) == 50
    assert rows[7].name == "name7" and rows[7].score == 10.5
    assert rows[7].src == "seq"
    assert dict(out.dtypes) == {
        "id": "bigint", "name": "string", "score": "double", "src": "string"
    }


def test_rcfile_raises_actionable_error(spark):
    """RC is formally wontfix (needs Hive SerDes this runtime doesn't
    ship): the error must name the blocker and the migration path."""
    import pytest as _pytest

    from datax_spark.sources import file as FS

    with _pytest.raises(NotImplementedError, match="RCFile.*ORC"):
        FS.read_rcfile(spark, "/tmp/whatever.rc")


def test_read_orc_projection_cast_const(spark, tmp_path):
    orc_dir = str(tmp_path / "orc")
    df = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 200)], "k long, s string, v long"
    )
    FS.write_orc(df, orc_dir, write_mode="truncate")
    out = FS.read_orc(
        spark, orc_dir,
        columns=[
            {"index": 0, "type": "long", "name": "k"},
            {"field": "s", "type": "string"},
            {"index": 2, "type": "double", "name": "v"},
            {"value": "orc", "type": "string", "name": "src"},
        ],
    )
    rows = {r.k: r for r in out.collect()}
    assert rows[2].s == "b" and rows[2].v == 200.0 and rows[2].src == "orc"
    assert dict(out.dtypes) == {
        "k": "bigint", "s": "string", "v": "double", "src": "string"
    }
    # no spec = all columns as stored
    assert FS.read_orc(spark, orc_dir).columns == ["k", "s", "v"]


def test_read_jsonl_pinned_schema_dotted_fields(spark, tmp_path):
    jdir = str(tmp_path / "jsonl")
    df = spark.createDataFrame(
        [(1, ("x", 10)), (2, (None, 20))],
        "id long, payload struct<tag: string, amt: long>",
    )
    FS.write_jsonl(df, jdir, write_mode="truncate")
    out = FS.read_jsonl(
        spark, jdir,
        schema="id bigint, payload struct<tag: string, amt: bigint>",
        columns=[
            {"field": "id", "type": "long"},
            {"field": "payload.tag", "type": "string"},
            {"field": "payload.amt", "type": "long", "name": "amount"},
        ],
    )
    rows = {r.id: r for r in out.collect()}
    assert rows[1].tag == "x" and rows[1].amount == 10
    # Spark's JSON writer drops null fields; the pinned schema restores
    # them as nulls on read
    assert rows[2].tag is None and rows[2].amount == 20


def test_write_jsonl_nonconflict(spark, tmp_path):
    jdir = str(tmp_path / "jnc")
    df = spark.createDataFrame([(1,)], "id long")
    FS.write_jsonl(df, jdir, write_mode="truncate")
    with pytest.raises(Exception):
        FS.write_jsonl(df, jdir, write_mode="nonConflict")


def test_read_avro_gated_or_native(spark, tmp_path):
    """Avro is an external Spark module this runtime doesn't bundle: the
    reader must either work natively (jar present) or fail with the
    actionable contract naming the module and the migration path."""
    import pytest as _pytest

    try:
        out = FS.read_avro(spark, str(tmp_path / "nope"))
        # jar present: a missing path is a normal AnalysisException, so
        # reaching here means the capability probe passed unexpectedly
        assert out is not None
    except NotImplementedError as e:
        assert "spark-avro" in str(e) and "parquet" in str(e)
    except Exception:
        _pytest.fail("read_avro must gate on the missing module, not "
                     "leak a raw datasource error")
