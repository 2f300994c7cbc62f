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


@dataclass
class JdbcWriteSpec:
    """≈ mysqlwriter parameter block: batched inserts, writeMode."""

    url: str
    table: str
    batch_size: int = 2048  # CommonRdbmsWriter default
    write_mode: str = "insert"  # insert | truncate (replace/update need MERGE)
    isolation: str = "READ_UNCOMMITTED"  # bulk-load friendly
    properties: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        return {
            "url": self.url,
            "dbtable": self.table,
            "batchsize": str(self.batch_size),
            "isolationLevel": self.isolation,
            "truncate": str(self.write_mode == "truncate").lower(),
            **self.properties,
        }

    def save(self, df: DataFrame) -> None:
        mode = "overwrite" if self.write_mode == "truncate" else "append"
        w = df.write.format("jdbc").mode(mode)
        for k, v in self.options().items():
            w = w.option(k, v)
        w.save()
