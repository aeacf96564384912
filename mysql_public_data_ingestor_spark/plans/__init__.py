"""Physical-plan inspection and assertion helpers.

The 100 TB posture is only real if the plans prove it: filters reach
the parquet scan (PushedFilters), projections prune the scan schema
(ReadSchema), small dims broadcast (BroadcastHashJoin), and shuffle
counts stay at the theoretical minimum. These helpers make those
properties testable, so plan regressions fail CI instead of melting a
cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of distinct shuffle exchanges in the plan (reused
    exchanges counted once)."""
    plan = physical_plan(df)
    return len(re.findall(r"\bExchange (?:hash|range)partitioning", plan)) - len(
        re.findall(r"\bReusedExchange\b", plan)
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in physical_plan(df) or "BroadcastNestedLoopJoin" in physical_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in physical_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema strings of every file scan (column-pruning evidence)."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    if "CartesianProduct" in plan:
        raise AssertionError(f"plan contains CartesianProduct:\n{plan}")
