"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``datax_spark.suite`` (the operator suite of
SURVEY.md §2 + training-data ops) — this file is the thin contract shim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datax_spark import suite


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full CDC engine end-to-end (events feed → envelope →
    incremental MERGE batches into a LakeTable → final state)."""
    return suite.q_cdc_merge_apply_e2e(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return suite.queries()


def oracle_sql() -> dict[str, str]:
    return suite.oracle_sql()
