"""Physical-plan assertions — the engine's performance contracts as tests.

DataX has no optimizer to inspect (SURVEY.md §4); on Spark the equivalents of
its hand-built efficiencies (column pruning / predicate pushdown by SQL
construction, SingleTableSplitUtil.buildQuerySql:132-142) are Catalyst
behaviors we must *not* accidentally defeat.  These helpers let tests assert:

- no per-row Python in the plan (``BatchEvalPython``) — BASELINE.json
  input_hint mandates vectorized pandas/Arrow UDFs only;
- filters/projections actually reached the parquet scan
  (``PushedFilters`` / ``ReadSchema``);
- the hot path runs in WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def assert_no_python_row_udf(df: DataFrame) -> None:
    """Fail if the plan contains a row-at-a-time Python eval node.

    ``ArrowEvalPython`` (pandas UDF) is allowed; ``BatchEvalPython`` (plain
    Python UDF, per-row pickling) is the banned slow path.
    """
    plan = physical_plan(df)
    assert "BatchEvalPython" not in plan, (
        "plan contains a row-at-a-time Python UDF (BatchEvalPython):\n" + plan
    )


def assert_whole_stage_codegen(df: DataFrame) -> None:
    # executedPlan().toString() marks codegen stages with "*(n)"; the
    # formatted explain spells out "WholeStageCodegen" — accept either.
    # Under AQE the final plan (with codegen annotations) only exists after
    # execution, so materialize adaptive plans first.
    plan = physical_plan(df)
    if "AdaptiveSparkPlan" in plan and "*(" not in plan:
        # count()/write would build a NEW query execution; collect() runs
        # THIS one, flipping the adaptive plan to its final (annotated) form
        df.collect()
        plan = physical_plan(df)
    assert "*(" in plan or "WholeStageCodegen" in formatted_plan(df), (
        "no WholeStageCodegen span:\n" + plan
    )


def scan_pushed_filters(df: DataFrame) -> str:
    """The parquet-scan PushedFilters fragment ('' if no scan/pushdown)."""
    for line in formatted_plan(df).splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:"):
            return s
    return ""


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    pushed = scan_pushed_filters(df)
    assert fragment in pushed, (
        f"expected pushed filter containing {fragment!r}, got: {pushed}\n"
        + formatted_plan(df)
    )


def assert_read_schema_pruned(df: DataFrame, max_cols: int) -> None:
    """Assert column pruning reached the scan: ReadSchema lists ≤ max_cols."""
    for line in formatted_plan(df).splitlines():
        s = line.strip()
        if s.startswith("ReadSchema:"):
            ncols = s.count(":") - 1  # struct<a:int,b:string> → field count
            assert ncols <= max_cols, f"scan reads {ncols} cols (> {max_cols}): {s}"
            return
    raise AssertionError("no ReadSchema found in plan:\n" + formatted_plan(df))
