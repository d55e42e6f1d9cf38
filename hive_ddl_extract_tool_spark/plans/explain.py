"""Plan-inspection helpers: machine-checkable assertions about the physical
plan (predicate pushdown, column pruning, broadcast join selection, top-k
strategy, no accidental Python in the hot path). Used by tests/test_plans.py
so plan regressions fail CI, not a 100 TB run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """The parquet scan must carry a pushed filter mentioning `fragment`."""
    plan = formatted_plan(df)
    pushed = [line for line in plan.splitlines() if "PushedFilters" in line]
    assert pushed, f"no PushedFilters in plan:\n{plan}"
    assert any(fragment in line for line in pushed), (
        f"filter on {fragment!r} not pushed to scan; PushedFilters lines: {pushed}"
    )


def assert_read_schema_only(df: DataFrame, table_fragment: str, allowed: set[str]) -> None:
    """Column pruning: the scan of `table_fragment` must read no columns
    outside `allowed`."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "ReadSchema" in line and table_fragment in plan:
            cols = {
                c.split(":")[0].strip()
                for c in line.split("struct<", 1)[-1].rstrip(">").split(",")
                if ":" in c
            }
            extra = cols - allowed
            assert not extra or table_fragment not in line, (
                f"scan reads unpruned columns {extra}: {line}"
            )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        f"no broadcast join in plan:\n{plan}"
    )


def assert_top_k_plan(df: DataFrame) -> None:
    """orderBy+limit must plan as TakeOrderedAndProject (per-partition heap +
    driver merge), never a global sort."""
    assert "TakeOrderedAndProject" in formatted_plan(df)


def assert_no_python_udf(df: DataFrame) -> None:
    """JVM-only hot path: no row-at-a-time or Arrow Python evaluation."""
    plan = formatted_plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert marker not in plan, f"unexpected Python stage {marker} in plan"


def count_shuffles(df: DataFrame) -> int:
    return formatted_plan(df).count("Exchange")
