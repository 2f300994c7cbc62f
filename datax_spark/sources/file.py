"""File sources/sinks with the reference's reader/writer config semantics.

Rebuilds the shared unstructured-storage contract DataX's txt/hdfs/oss/ftp
plugins delegate to (plugin-unstructured-storage-util/.../reader/
UnstructuredStorageReaderUtil.java:230-470) on top of ``spark.read``:

reader config per column: ``{"index": i, "type": t, "format": fmt}`` or
``{"value": const, "type": t}`` — positional projection, type cast, date
formats, constant columns; file-level: delimiter, encoding, skipHeader,
nullFormat, compression (compression/encoding are handled natively by
Spark's csv/text readers).

writer side (hdfswriter/.../HdfsWriter.java:84-92,159-185): writeMode
``append`` / ``nonConflict`` (fail if target has files) / ``truncate``
(overwrite) with the two-phase temp-dir publish Spark's committer already
provides.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TYPE_MAP = {
    "long": "long",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
    "bool": "boolean",
    "date": "timestamp",
    "bytes": "binary",
}


def read_delimited(
    spark: SparkSession,
    path: str,
    columns: list[dict[str, Any]] | None = None,
    field_delimiter: str = ",",
    skip_header: bool = False,
    null_format: str | None = "\\N",
    compression: str | None = None,
    encoding: str = "UTF-8",
) -> DataFrame:
    """DataX delimited-file reader semantics on spark.read.csv.

    ``columns`` follows the reference's column spec exactly: a list of
    ``{"index": i, "type": t[, "format": f]}`` (projection+cast of source
    field i) or ``{"value": v, "type": t}`` (constant column, DataX's
    ``value`` — UnstructuredStorageReaderUtil.java:391-443).  None means
    all columns as strings (DataX ``column: ["*"]``)."""
    return _read_csv_like(
        spark, path, columns, field_delimiter, skip_header,
        null_format, compression, encoding,
    )


def read_sequence_text(
    spark: SparkSession,
    path: str,
    columns: list[dict[str, Any]] | None = None,
    field_delimiter: str = ",",
    null_format: str | None = "\\N",
) -> DataFrame:
    """Legacy Hadoop SequenceFile-of-text reader — the SEQ branch of
    hdfsreader (HdfsReader.java:80-86; DFSUtil.sequenceFileStartRead reads
    only the Text VALUE of each record, key ignored; the value is a
    delimited line parsed with the shared column spec).

    The one sanctioned RDD hop in the engine: Spark has no DataFrame
    SequenceFile source, so ``sc.sequenceFile(...).values()`` lifts the
    lines and they immediately re-enter the csv/column-spec DataFrame
    path shared with ``read_delimited`` (same projection/cast/constant
    semantics, same Catalyst plan from there on)."""
    lines = spark.sparkContext.sequenceFile(path).values().map(
        lambda v: v.decode("utf-8")
        if isinstance(v, (bytes, bytearray)) else str(v)
    )
    return _read_csv_like(
        spark, lines, columns, field_delimiter, False, null_format,
        None, "UTF-8",
    )


def read_avro(
    spark: SparkSession,
    path: str,
    columns: list[dict[str, Any]] | None = None,
) -> DataFrame:
    """Avro scan (the Kafka-ecosystem container format).  Spark ships
    Avro as an EXTERNAL module (`spark-avro`) since 2.4; this runtime
    does not bundle the jar, so the capability is probed and the failure
    is a loud, actionable contract instead of a ClassNotFoundException
    deep inside a job.  On a cluster with the jar
    (`--packages org.apache.spark:spark-avro_2.13:<spark-version>`), the
    same call reads natively and the shared column spec applies."""
    try:
        df = spark.read.format("avro").load(path)
    except Exception as e:
        if "Failed to find data source: avro" in str(e):
            raise NotImplementedError(
                "Avro needs Spark's external spark-avro module, which "
                "this runtime does not ship.  Submit with `--packages "
                "org.apache.spark:spark-avro_2.13:<spark-version>` on a "
                "real cluster, or convert the data once to parquet "
                "(first-class here)."
            ) from e
        raise
    return _project_columns(df, columns)


def read_rcfile(spark: SparkSession, path: str, **_kwargs) -> DataFrame:
    """RCFile (the RC branch of hdfsreader, HdfsReader.java:80-86):
    FORMALLY UNSUPPORTED — decided wontfix, not pending.

    RCFile is a Hive-era columnar container readable only through Hive's
    ``RCFileInputFormat`` + ``ColumnarSerDe``; neither Hive jars nor a
    metastore ship in this engine's runtime, and the format has been
    deprecated in favor of ORC since Hive 0.12 (2013).  Every modern
    migration path (Hive's own included) rewrites RC data to ORC/parquet
    — both first-class here.  This stub exists so the failure is a loud,
    actionable contract instead of a ClassNotFoundException deep inside a
    Spark job."""
    raise NotImplementedError(
        "RCFile is not supported: reading it requires Hive's "
        "RCFileInputFormat/ColumnarSerDe, which this runtime does not "
        "ship and the engine does not depend on.  Convert the data once "
        "with Hive/Spark-with-Hive (`CREATE TABLE ... STORED AS ORC AS "
        "SELECT * FROM rc_table`) and read it via the ORC/parquet path."
    )


def _read_csv_like(
    spark: SparkSession,
    source,  # path str, or RDD[str] of raw lines (SEQ values)
    columns: list[dict[str, Any]] | None,
    field_delimiter: str,
    skip_header: bool,
    null_format: str | None,
    compression: str | None,
    encoding: str,
) -> DataFrame:
    reader = (
        spark.read.option("sep", field_delimiter)
        .option("header", str(skip_header).lower())
        .option("encoding", encoding)
        .option("mode", "PERMISSIVE")
    )
    if null_format is not None:
        reader = reader.option("nullValue", null_format)
    # Read-side decompression is EXTENSION-DRIVEN in Spark (.gz/.bz2/...
    # are decoded by the Hadoop codec factory from the file name); the
    # "compression" option only exists on the WRITE path.  Setting it on a
    # read is a silent no-op, so a passed value is validated against the
    # codecs Spark actually auto-detects instead of implying a knob.
    if compression and str(compression).lower() not in (
        "none", "gzip", "gz", "bzip2", "bz2", "deflate", "lz4", "snappy",
        "zstd", "zstandard",
    ):
        raise ValueError(
            f"unknown compression {compression!r}: delimited reads "
            "decompress by file extension (.gz/.bz2/.deflate/.lz4/.zst); "
            "rename the files to carry the codec extension"
        )
    df = reader.csv(source)
    return _project_columns(df, columns)


def _project_columns(
    df: DataFrame, columns: list[dict[str, Any]] | None,
) -> DataFrame:
    """The reference's column-spec projection
    (UnstructuredStorageReaderUtil.java:321-470), shared by every file
    format: ``{"index": i}`` selects the file's i-th column, ``{"field":
    name}`` selects by (dotted) name — the named-format variant for
    ORC/JSON where files carry real column names — and ``{"value": v}``
    emits a constant.  ``type`` casts, ``format`` parses timestamps,
    ``name`` sets the output name.  None = all columns as read."""
    if columns is None:
        return df
    src = df.columns
    out = []
    for i, spec in enumerate(columns):
        t = _TYPE_MAP.get(str(spec.get("type", "string")).lower(), "string")
        name = spec.get("name")
        if "value" in spec:  # constant column
            col = F.lit(spec["value"]).cast(t)
        elif "field" in spec:  # by (dotted) source-field name
            col = F.col(str(spec["field"]))
            name = name or str(spec["field"]).rsplit(".", 1)[-1]
            if t == "timestamp" and spec.get("format"):
                col = F.to_timestamp(col, _java_to_spark_fmt(spec["format"]))
            else:
                col = col.cast(t)
        else:
            idx = int(spec["index"])
            if idx >= len(src):
                raise IndexError(
                    f"column index {idx} out of range ({len(src)} fields)"
                )
            col = F.col(src[idx])
            if t == "timestamp" and spec.get("format"):
                col = F.to_timestamp(col, _java_to_spark_fmt(spec["format"]))
            else:
                col = col.cast(t)
        out.append(col.alias(name or f"c{i}"))
    return df.select(*out)


def read_orc(
    spark: SparkSession,
    path: str,
    columns: list[dict[str, Any]] | None = None,
) -> DataFrame:
    """ORC scan — the ORC branch of hdfsreader (HdfsReader.java:80-86;
    DFSUtil orcFileStartRead projects the configured column indexes out of
    the OrcSerde row).  Spark's native ORC reader does the scan
    (predicate pushdown + column pruning built in); the shared column
    spec adds the reference's index/field projection, casts, and constant
    columns on top."""
    return _project_columns(spark.read.orc(path), columns)


def read_jsonl(
    spark: SparkSession,
    path: str,
    columns: list[dict[str, Any]] | None = None,
    schema: str | None = None,
) -> DataFrame:
    """JSON-lines scan (one JSON object per line — the interchange format
    of every public web-scale training corpus, and the shape DataX's
    hdfsreader TEXT branch would carry JSON in).  ``schema`` (DDL string)
    pins field types and KEEPS SCHEMA INFERENCE OFF the scan path — at
    100 TB an unpinned read costs a full extra pass over the data just to
    infer; always pass it in production.  The shared column spec selects
    fields by (dotted) name for nested payloads."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return _project_columns(reader.json(path), columns)


def write_jsonl(df: DataFrame, path: str, write_mode: str = "append",
                compression: str | None = None) -> None:
    """JSON-lines emit with the writer's writeMode contract
    (HdfsWriter.java:84-92): append | nonConflict | truncate."""
    modes = {"append": "append", "nonConflict": "error", "truncate": "overwrite"}
    if write_mode not in modes:
        raise ValueError(f"unknown writeMode {write_mode!r}")
    w = df.write.mode(modes[write_mode])
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def _java_to_spark_fmt(fmt: str) -> str:
    # DataX uses Java SimpleDateFormat; Spark uses DateTimeFormatter —
    # identical for the common yyyy/MM/dd/HH/mm/ss tokens.
    return fmt


def write_delimited(
    df: DataFrame,
    path: str,
    write_mode: str = "append",
    field_delimiter: str = ",",
    compression: str | None = None,
    header: bool = False,
) -> None:
    """DataX writer writeMode semantics (HdfsWriter.java:84-92):
    append | nonConflict (error if files exist) | truncate (overwrite)."""
    modes = {"append": "append", "nonConflict": "error", "truncate": "overwrite"}
    if write_mode not in modes:
        raise ValueError(f"unknown writeMode {write_mode!r}")
    if write_mode == "nonConflict" and os.path.isdir(path) and any(
        not f.startswith(("_", ".")) for f in os.listdir(path)
    ):
        raise FileExistsError(
            f"writeMode=nonConflict and target {path} is not empty"
        )
    w = (
        df.write.mode(modes[write_mode])
        .option("sep", field_delimiter)
        .option("header", str(header).lower())
    )
    if compression:
        w = w.option("compression", compression)
    w.csv(path)


def write_orc(df: DataFrame, path: str, write_mode: str = "append") -> None:
    """ORC emit (hdfswriter fileType=orc, HdfsWriter.java:54-57)."""
    modes = {"append": "append", "nonConflict": "error", "truncate": "overwrite"}
    df.write.mode(modes[write_mode]).orc(path)
