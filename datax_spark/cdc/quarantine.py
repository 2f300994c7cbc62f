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


def replay_quarantine(
    spark,
    quarantine_path: str,
    table,
    rules: list[tuple[str, Column]],
    fix=None,
    order_col: str = "lsn",
    op_col: str = "op",
    **merge_kw,
) -> dict:
    """Reprocess the dead-letter queue: read the quarantined rows, run the
    caller's ``fix`` (the corrected transform/mapping that addresses the
    root cause), re-validate against ``rules``, and MERGE the now-clean
    rows into ``table`` — the DataX dirty-collector story completed (the
    reference only *collects* dirty records,
    ``AbstractTaskPluginCollector.java:41-57``; operators then re-run the
    job — here the repaired rows rejoin the table without one).

    Exactly-once + ordering:

    - The replay batch id is derived from the quarantine dir's file set
      (name+size), so a retried replay of the same backlog no-ops via the
      table's ordinary lineage guard.
    - Rows keep their ORIGINAL LSNs and the merge runs in MOR mode
      UNCONDITIONALLY (no mode knob): the fold's last-writer-wins means a
      repaired event older than the key's current row loses, exactly as
      if it had never been quarantined — replay is effect-idempotent even
      if a crash between merge and archive re-merges a subset.  A COW/DV
      replay would replace matched keys with the stale repaired row
      (whole-row replace carries no per-row LSN at read), silently
      rolling back newer data — hence no mode parameter.  MOR deltas
      compose fine on tables otherwise maintained in cow/dv mode.
    - The per-shard resume watermarks are untouched (commit takes
      ``max``), so replaying old LSNs can never regress the live feed.

    Rows still dirty after ``fix`` move to ``_dead/<token>/`` under the
    quarantine dir; consumed source files move to ``_replayed/<token>/``.
    Both subdirs are invisible to the next replay, so the active DLQ
    drains monotonically.  Returns a summary dict.
    """
    import hashlib
    import os
    import shutil

    from datax_spark.lake.merge import merge_into

    files = sorted(
        e.name for e in os.scandir(quarantine_path)
        if e.is_file() and e.name.endswith(".parquet")
    ) if os.path.isdir(quarantine_path) else []
    if not files:
        return {"replayed": 0, "still_dirty": 0, "token": None,
                "files": 0}
    sizes = [os.path.getsize(os.path.join(quarantine_path, f))
             for f in files]
    token = "dlq:" + hashlib.sha256(
        "\n".join(f"{f}:{s}" for f, s in zip(files, sizes)).encode()
    ).hexdigest()[:16]
    df = spark.read.parquet(
        *[os.path.join(quarantine_path, f) for f in files]
    ).drop(ERROR_COL)
    if fix is not None:
        df = fix(df)
    df = df.persist()  # read once: dead count/write + clean count/merge
    payload = [f.name for f in table.schema().fields]
    missing = [c for c in (*payload, op_col, order_col)
               if c not in df.columns]
    if missing:
        raise ValueError(
            f"fixed rows are missing table/envelope columns {missing}")
    clean, dead = split_dirty(df, rules)
    n_dead = dead.count()
    dead_dir = os.path.join(quarantine_path, "_dead", token.split(":")[1])
    if n_dead:
        # overwrite keyed by token: a crash-retry rewrites, never doubles
        dead.write.mode("overwrite").parquet(dead_dir)
    n_clean = clean.count()
    if n_clean:
        merge_into(
            table,
            clean.select(*payload, op_col, order_col),
            op_col=op_col, order_col=order_col,
            lineage={"batch_id": token, "rows": n_clean},
            mode="mor", **merge_kw,
        )
    df.unpersist()
    replay_dir = os.path.join(
        quarantine_path, "_replayed", token.split(":")[1])
    os.makedirs(replay_dir, exist_ok=True)
    for f in files:
        shutil.move(os.path.join(quarantine_path, f),
                    os.path.join(replay_dir, f))
    return {"replayed": int(n_clean), "still_dirty": int(n_dead),
            "token": token, "files": len(files)}


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
