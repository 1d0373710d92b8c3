"""Physical-plan audits: assert the plan we designed is the plan we got.

Used by tests and by engineers iterating on operators: a query that
stops pushing filters down or falls out of whole-stage codegen is a
regression even when results stay correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same as .explain("formatted")
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the scan node ('' if none)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line:
            return line.strip()
    return ""


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    return fragment in pushed_filters(df)


def wholestage_codegen_ids(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans in the plan (wider is better)."""
    return formatted_plan(df).count("WholeStageCodegen")


def python_eval_nodes(df: DataFrame) -> list[str]:
    """Names of Python-eval operators in the plan. The engine allows only
    Arrow-vectorized ones (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas)
    — a BatchEvalPython node means a row-at-a-time Python UDF snuck in."""
    plan = formatted_plan(df)
    names = []
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas",
                   "FlatMapGroupsInPandas", "MapInArrow"):
        if marker in plan:
            names.append(marker)
    return names


def assert_no_rowwise_python(df: DataFrame) -> None:
    nodes = python_eval_nodes(df)
    if "BatchEvalPython" in nodes:
        raise AssertionError(f"row-at-a-time Python UDF in plan: {nodes}")
