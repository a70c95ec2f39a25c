"""Physical-plan assertions: the 100 TB guardrails.

A query that is correct at sf0.01 but broadcasts nothing, pushes no
filters, and prunes no columns will fall over at cluster scale.
These helpers let tests pin the plan shape, not just the results:
dimension joins must be BroadcastHashJoin, scans must show
PushedFilters and a minimal ReadSchema, and nothing may degenerate
into a cartesian product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def assert_broadcast_join(df: DataFrame, at_least: int = 1) -> None:
    plan = physical_plan(df)
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    assert n >= at_least, f"expected >= {at_least} broadcast joins, got {n}:\n{plan[:2000]}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, f"cartesian product in plan:\n{plan[:2000]}"


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """The parquet scan must carry a pushed-down filter mentioning
    `fragment` (e.g. a column name)."""
    plan = physical_plan(df)
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line and fragment in line
    ]
    assert pushed, f"no pushed filter on {fragment!r}:\n{plan[:2000]}"


def assert_read_schema_only(df: DataFrame, table_fragment: str, allowed: set[str]) -> None:
    """Column pruning check: the scan of `table_fragment` must read
    no columns outside `allowed`."""
    plan = physical_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line and table_fragment in line:
            schema_part = line.split("ReadSchema:", 1)[1]
            cols = {
                c.split(":")[0].strip()
                for c in schema_part.split("struct<", 1)[-1].rstrip(">").split(",")
                if c.strip()
            }
            extra = cols - allowed
            assert not extra, f"scan reads unpruned columns {extra}: {line.strip()}"
            return
    raise AssertionError(f"no scan of {table_fragment!r} found:\n{plan[:2000]}")
