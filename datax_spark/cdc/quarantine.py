"""Dirty-record routing + error limits — DataX's data-quality machinery.

Reference semantics rebuilt (SURVEY.md §2.8):
- readers/writers/transformers route unconvertible rows to a dirty
  collector instead of failing the job
  (core/.../statistics/plugin/task/AbstractTaskPluginCollector.java:41-57);
- the job fails when dirty count exceeds ``errorLimit.record`` or dirty
  ratio exceeds ``errorLimit.percentage``
  (core/.../util/ErrorRecordChecker.java:18-82, invoked
  JobContainer.java:868-872).

Spark-native shape: validation predicates are Column expressions evaluated
in the same scan (one pass, codegen); dirty rows are routed to a quarantine
parquet table with a reason column; limits are enforced from the split
counts.  ``try_cast`` replaces DataX's throw-on-convert
(Column.asLong CONVERT_NOT_SUPPORT → null + reason here).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ERROR_COL = "__dx_error"


class DirtyLimitExceeded(RuntimeError):
    pass


@dataclass
class ErrorLimits:
    """≈ job.setting.errorLimit {record, percentage}
    (reference smoke job core/src/main/job/job.json:7-10)."""

    record: int | None = None
    percentage: float | None = None

    def check(self, dirty: int, total: int) -> None:
        if self.record is not None and dirty > self.record:
            raise DirtyLimitExceeded(
                f"dirty records {dirty} > errorLimit.record {self.record}"
            )
        if self.percentage is not None and total > 0:
            ratio = dirty / total
            if ratio > self.percentage:
                raise DirtyLimitExceeded(
                    f"dirty ratio {ratio:.4f} > errorLimit.percentage "
                    f"{self.percentage}"
                )


def rule(name: str, predicate: Column) -> tuple[str, Column]:
    """A validation rule: rows violating ``predicate`` are dirty with
    reason ``name``."""
    return (name, predicate)


def try_cast_rule(col: str, dtype: str) -> tuple[str, Column]:
    """Dirty when the value is present but not convertible — the analogue
    of DataX's Column.asX CONVERT_NOT_SUPPORT throw."""
    c = F.col(col)
    return (
        f"uncastable:{col}->{dtype}",
        c.isNull() | F.expr(f"try_cast({col} AS {dtype})").isNotNull(),
    )


def envelope_rules(key_cols: list[str]) -> list[tuple[str, Column]]:
    """Baseline validity for the CDC envelope: LSN present, known op,
    non-null key columns."""
    rules = [
        rule("null_lsn", F.col("lsn").isNotNull()),
        rule("bad_op", F.col("op").isin("insert", "update", "delete")),
    ]
    for k in key_cols:
        rules.append(rule(f"null_key:{k}", F.col(k).isNotNull()))
    return rules


def split_dirty(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """One-pass split into (clean, dirty-with-reason).

    The reason is the FIRST violated rule (DataX logs one throwable per
    dirty record).  Both frames derive from the same plan — Spark evaluates
    the predicate expressions once per row within each branch scan."""
    reason = F.lit(None).cast("string")
    for name, pred in reversed(rules):
        reason = F.when(~F.coalesce(pred, F.lit(False)), F.lit(name)).otherwise(
            reason
        )
    tagged = df.withColumn(ERROR_COL, reason)
    clean = tagged.filter(F.col(ERROR_COL).isNull()).drop(ERROR_COL)
    dirty = tagged.filter(F.col(ERROR_COL).isNotNull())
    return clean, dirty


def quarantine(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    quarantine_path: str | None = None,
    limits: ErrorLimits | None = None,
) -> DataFrame:
    """Route dirty rows out of ``df``; optionally persist them and enforce
    error limits.  Returns the clean frame.

    At scale the dirty side is almost-empty; the count+write cost is one
    extra pass over the (tiny) dirty branch only."""
    clean, dirty = split_dirty(df, rules)
    n_dirty = dirty.count()
    if n_dirty and quarantine_path is not None:
        dirty.write.mode("append").parquet(quarantine_path)
    if limits is not None and n_dirty:
        total = n_dirty + clean.count()
        limits.check(n_dirty, total)
    return clean
