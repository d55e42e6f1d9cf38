"""True Hive-metastore path (X16 fidelity): enableHiveSupport + embedded
Derby. Runs in a subprocess because spark.sql.catalogImplementation is
static per JVM and the main test session uses the in-memory catalog.

The scenario itself lives in tools/catalog_parity.py so the SAME check
that gates this suite also writes the per-round §2A line into PARITY.md
(drive_driver runs it after the sweep) — the two cannot drift.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.catalog_parity import run_fixpoint


def test_extractor_against_real_hive_metastore(tmp_path):
    res = run_fixpoint(str(tmp_path))
    assert res["ok"], (
        f"stdout:\n{res['stdout_tail']}\nstderr:\n{res['stderr_tail']}"
    )
