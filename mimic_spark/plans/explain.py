"""Plan introspection helpers — the engine's `.explain` discipline.

The reference delegates all planning to DuckDB (SURVEY.md §4); in Spark the
equivalent responsibility is *verifying* that Catalyst produced the plan you
designed for: filters pushed to the parquet scan, columns pruned, dims
broadcast, no row-at-a-time Python, no accidental nested-loop joins.  Tests
and tools/plan_report.py use these helpers so plan quality is asserted, not
assumed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().explainString("formatted")


def pushed_filters(df: DataFrame) -> list[str]:
    plan = physical_plan(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def read_schemas(df: DataFrame) -> list[str]:
    plan = physical_plan(df)
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df)


def assert_no_row_python(df: DataFrame, name: str = "") -> None:
    plan = physical_plan(df)
    if "BatchEvalPython" in plan:
        raise AssertionError(f"{name}: row-at-a-time Python UDF in plan")


def plan_facts(df: DataFrame) -> dict:
    """Summary of plan properties worth reviewing per operator."""
    plan = physical_plan(df)
    return {
        "broadcast_hash_join": plan.count("BroadcastHashJoin"),
        "sort_merge_join": plan.count("SortMergeJoin"),
        "shuffled_hash_join": plan.count("ShuffledHashJoin"),
        "bnl_join": plan.count("BroadcastNestedLoopJoin"),
        "exchanges": plan.count("Exchange"),
        "hash_aggregates": plan.count("HashAggregate"),
        "object_hash_aggregates": plan.count("ObjectHashAggregate"),
        "sorts": plan.count("Sort "),
        "window": plan.count("Window"),
        "arrow_python": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("MapInArrow"),  # r9: the vectorized numpy kernels
        "row_python": plan.count("BatchEvalPython"),
        # pre-execution AQE plans print no codegen stars; count both forms
        "wholestage_codegen": plan.count("WholeStageCodegen")
        + len(re.findall(r"\*\(\d+\)", plan)),
        "pushed_filters": pushed_filters(df),
        "read_schemas": [s[:120] for s in read_schemas(df)],
    }
