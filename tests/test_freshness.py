"""Registry-freshness invariant (round-8 verdict item 3): the rotation rule
in operators/__init__.py must actually keep driver evidence fresh. The gate
simulates the next driver sweep (45-query conservative budget, below the ~50 historical sweep length, over the registry order)
and fails if any oracle-backed query would end the coming round with its
latest green CORRECTNESS row more than 5 rounds old -- i.e. if the staged
priority prefix forgot a stale query the budget could have covered."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_staged_prefix_keeps_oracle_evidence_fresh():
    from tools.freshness import evaluate

    res = evaluate()
    assert res["ok"], (
        "staged priority prefix leaves oracle-backed queries stale past "
        f"age {res['max_age']}:\n{json.dumps(res, indent=1)}"
    )


def test_priority_prefix_fits_the_measured_driver_budget():
    """The staged prefix must not exceed 50 entries — the MEASURED driver
    sweep budget. Round 9 staged 52 and the driver's wall clock swept
    exactly 50, so the two tail entries (one of them the round's only
    must-refresh query) silently missed their refresh. The evaluate() gate
    catches the OUTCOME with its conservative 45 budget; this pins the
    CAUSE: anything past position 50 is staged theater, park it in module
    order instead and promote it next round."""
    from hive_ddl_extract_tool_spark.operators import _PRIORITY

    assert len(_PRIORITY) <= 50, (
        f"priority prefix staged {len(_PRIORITY)} deep; the driver sweeps "
        "~50 queries per round, so entries past 50 never refresh"
    )


def test_every_registered_query_has_some_driver_history_or_prefix_slot():
    """No oracle-backed query may be invisible to the driver forever: it
    either already has a green row, or sits inside the next sweep's budget
    prefix (the evaluate() gate enforces the union; this pins the stronger
    per-query fact so a registry addition without a prefix slot fails with
    the query's name)."""
    from tools.freshness import BUDGET, latest_green, registry

    green, _ = latest_green()
    order, backed = registry()
    prefix = set(order[:BUDGET])
    missing = [q for q in order if q in backed and q not in green and q not in prefix]
    assert not missing, f"oracle-backed, never driver-checked, not staged: {missing}"
