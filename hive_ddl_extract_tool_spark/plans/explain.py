"""Plan-inspection helpers: machine-checkable assertions about the physical
plan (predicate pushdown, column pruning, broadcast join selection, top-k
strategy, no accidental Python in the hot path). Used by tests/test_plans.py
so plan regressions fail CI, not a 100 TB run.
"""

from __future__ import annotations

import re

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
    """Column pruning: every scan whose Location matches `table_fragment`
    must read no columns outside `allowed`. The formatted plan is parsed per
    scan node -- ReadSchema lines are checked only against their own scan's
    Location, and a plan with NO scan of the table fails loudly instead of
    passing vacuously."""
    plan = formatted_plan(df)
    sections = re.split(r"\n(?=\(\d+\) )", plan)
    matched = False
    for sec in sections:
        lines = sec.splitlines()
        if not lines or "Scan" not in lines[0]:
            continue
        loc = next((l for l in lines if l.strip().startswith("Location")), "")
        if table_fragment not in loc:
            continue
        matched = True
        rs = next((l for l in lines if l.strip().startswith("ReadSchema")), None)
        assert rs is not None, f"scan of {table_fragment!r} has no ReadSchema:\n{sec}"
        cols = {
            c.split(":")[0].strip()
            for c in rs.split("struct<", 1)[-1].rstrip(">").split(",")
            if ":" in c
        }
        extra = cols - allowed
        assert not extra, f"scan of {table_fragment!r} reads unpruned columns {extra}: {rs}"
    assert matched, f"no scan with Location matching {table_fragment!r} in plan:\n{plan}"


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


def assert_no_cartesian(df: DataFrame) -> None:
    """Candidate-generation plans (LSH, banding, bucketized range join) must
    never fall back to an all-pairs product."""
    plan = formatted_plan(df)
    for marker in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert marker not in plan, f"all-pairs {marker} in plan:\n{plan}"
