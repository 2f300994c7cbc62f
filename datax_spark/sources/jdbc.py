"""JDBC reader/writer option assembly — DataX's rdbms plugin config on
``spark.read.jdbc`` / ``df.write.jdbc``.

No database ships in this container, so this module is the *config
translation layer* (unit-tested): it turns a DataX-style rdbms reader/writer
parameter block into the exact option dict + predicates list Spark's JDBC
source consumes.  The split semantics come from ``sources.split``
(SingleTableSplitUtil rebuild); the option mapping mirrors:

- reader: column projection + where → generated query; splitPk → per-split
  predicates; fetchSize (MySQL streams with Integer.MIN_VALUE —
  mysqlreader/src/main/java/.../MysqlReader.java:29-34); session init
  (DBUtil.dealWithSessionConfig).
- writer: batchSize (default 2048 —
  plugin-rdbms-util/.../writer/CommonRdbmsWriter.java:226-227),
  isolation, truncate-vs-append writeMode.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from datax_spark.sources.split import pk_predicates


@dataclass
class JdbcReadSpec:
    """≈ mysqlreader parameter block (mysqlreader/doc/mysqlreader.md)."""

    url: str
    table: str
    columns: list[str] = field(default_factory=lambda: ["*"])
    where: str | None = None
    split_pk: str | None = None
    num_splits: int = 1
    fetch_size: int = 10_000
    session: list[str] = field(default_factory=list)
    properties: dict[str, str] = field(default_factory=dict)

    def query(self) -> str:
        cols = ", ".join(self.columns)
        q = f"SELECT {cols} FROM {self.table}"
        if self.where:
            q += f" WHERE {self.where}"
        return q

    def options(self) -> dict[str, str]:
        opts = {
            "url": self.url,
            "dbtable": f"({self.query()}) AS __dx_src",
            "fetchsize": str(self.fetch_size),
            **self.properties,
        }
        if self.session:
            # DataX runs session config before reading
            # (DBUtil.dealWithSessionConfig); Spark's equivalent option:
            opts["sessionInitStatement"] = "; ".join(self.session)
        return opts

    def predicates(self, lo: int, hi: int) -> list[str]:
        """Per-split WHERE fragments (requires the min/max planning scan —
        SingleTableSplitUtil.java:286-300 — done by the caller)."""
        if self.split_pk is None or self.num_splits <= 1:
            return []
        return pk_predicates(self.split_pk, lo, hi, self.num_splits)

    def load(self, spark: SparkSession, lo: int | None = None,
             hi: int | None = None) -> DataFrame:
        reader = spark.read.format("jdbc")
        for k, v in self.options().items():
            reader = reader.option(k, v)
        preds = self.predicates(lo, hi) if lo is not None and hi is not None else []
        if preds:
            return spark.read.jdbc(
                self.url, self.options()["dbtable"], predicates=preds,
                properties={**self.properties, "fetchsize": str(self.fetch_size)},
            )
        return reader.load()


def expand_table_pattern(pattern: str) -> list[str]:
    """Expand a sharding-suffix table pattern — the TableExpandUtil rebuild
    (plugin-rdbms-util/.../util/TableExpandUtil.java:34-68): ``tbl_[0-31]``
    → tbl_0..tbl_31, zero-padding preserved (``tbl_[00-31]`` → tbl_00…).
    Patterns without a range pass through unchanged."""
    import re

    m = re.fullmatch(r"(.*)\[(\d+)-(\d+)\](.*)", pattern)
    if m is None:
        return [pattern]
    head, lo_s, hi_s, tail = m.groups()
    lo, hi = int(lo_s), int(hi_s)
    if lo > hi:
        raise ValueError(f"bad table range in {pattern!r}: {lo} > {hi}")
    width = len(lo_s) if lo_s.startswith("0") and len(lo_s) > 1 else 0
    return [f"{head}{str(i).zfill(width)}{tail}" for i in range(lo, hi + 1)]


@dataclass
class JdbcMultiReadSpec:
    """Multi-table × multi-URL fan-out — the most common DataX reader mode
    after single-table (ReaderSplitUtil.java:19-108: the task list is the
    cross product of jdbcUrls × expanded tables, each carrying the shared
    column/where config).  The Spark analogue: one ``JdbcReadSpec`` per
    (url, table), unioned by name — Catalyst pushes the shared projection
    and WHERE into every per-shard scan, and each spec can still carry its
    own PK-range predicates (scan partitions multiply, not serialize)."""

    urls: list[str]
    tables: list[str]  # each entry may be a [lo-hi] sharding pattern
    columns: list[str] = field(default_factory=lambda: ["*"])
    where: str | None = None
    split_pk: str | None = None
    num_splits: int = 1
    fetch_size: int = 10_000
    session: list[str] = field(default_factory=list)
    properties: dict[str, str] = field(default_factory=dict)

    def expand(self) -> list[JdbcReadSpec]:
        specs = []
        for url in self.urls:
            for pat in self.tables:
                for tbl in expand_table_pattern(pat):
                    specs.append(
                        JdbcReadSpec(
                            url=url,
                            table=tbl,
                            columns=list(self.columns),
                            where=self.where,
                            split_pk=self.split_pk,
                            num_splits=self.num_splits,
                            fetch_size=self.fetch_size,
                            session=list(self.session),
                            properties=dict(self.properties),
                        )
                    )
        return specs

    def load(self, spark: SparkSession, bounds: dict | None = None) -> DataFrame:
        """Union of every (url, table) shard scan.  ``bounds`` optionally
        maps table name → (lo, hi) for per-shard PK-split predicates."""
        frames = []
        for spec in self.expand():
            lo_hi = (bounds or {}).get(spec.table)
            frames.append(
                spec.load(spark, *(lo_hi if lo_hi else (None, None)))
            )
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out


@dataclass
class JdbcWriteSpec:
    """≈ mysqlwriter parameter block: batched inserts, writeMode."""

    url: str
    table: str
    batch_size: int = 2048  # CommonRdbmsWriter default
    write_mode: str = "insert"  # insert | truncate (replace/update need MERGE)
    isolation: str = "READ_UNCOMMITTED"  # bulk-load friendly
    properties: dict[str, str] = field(default_factory=dict)
    # preSql/postSql around the write, with DataX's @table placeholder
    # (WriterUtil.java:78-108 renderPreOrPostSqls + job-level variants
    # CommonRdbmsWriter.java:86-161): truncate staging, swap views, etc.
    pre_sql: list[str] = field(default_factory=list)
    post_sql: list[str] = field(default_factory=list)

    def options(self) -> dict[str, str]:
        return {
            "url": self.url,
            "dbtable": self.table,
            "batchsize": str(self.batch_size),
            "isolationLevel": self.isolation,
            "truncate": str(self.write_mode == "truncate").lower(),
            **self.properties,
        }

    def rendered_pre_sql(self) -> list[str]:
        return [s.replace("@table", self.table) for s in self.pre_sql]

    def rendered_post_sql(self) -> list[str]:
        return [s.replace("@table", self.table) for s in self.post_sql]

    def save(self, df: DataFrame, sql_executor=None) -> None:
        """Write with preSql → data → postSql ordering (WriterUtil.java
        contract: preSql failure aborts before any data lands; postSql
        failure raises after the write so the caller can retry/clean up).

        ``sql_executor(sql: str)`` runs each statement on the target DB —
        injectable because this container ships no database; production
        callers pass a JDBC-connection lambda."""
        if sql_executor is None and (self.pre_sql or self.post_sql):
            # fail BEFORE any data lands, not between write and postSql
            raise ValueError(
                "pre_sql/post_sql configured but no sql_executor provided"
            )
        if sql_executor is not None:
            for s in self.rendered_pre_sql():
                sql_executor(s)
        mode = "overwrite" if self.write_mode == "truncate" else "append"
        w = df.write.format("jdbc").mode(mode)
        for k, v in self.options().items():
            w = w.option(k, v)
        w.save()
        if sql_executor is not None:
            for s in self.rendered_post_sql():
                sql_executor(s)
