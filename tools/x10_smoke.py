"""Full-surface smoke at a 10x-inflated corpus: every registered query
EXECUTES (count()) against the scale_stress x10 directory.

Why: the round-7 scale measurement caught q202/q245 broadcasting a
corpus-sized aggregate (driver OOM at 10x) -- a defect class invisible at
fixture scale because Catalyst's static estimates only cross the broadcast
threshold when the data grows. This tool applies that probe to the WHOLE
surface: any other corpus-scaled build side, driver-side collect, or
unbounded explode shows up as an error or a timeout here, not in
production at 100 TB.

Scope notes:
- Point --sf-dir at a scale_stress inflation. With inflate() output only
  documents/embeddings are 10x (the rounds-7/8 configuration); with
  inflate_all() output (round 9+) EVERY table is 10x -- events and the
  TPC-H facts included -- so the streaming replays, sessionization, and
  join-agg families are probed at volume too, not just the text/vector
  families.
- The declared quadratic audit baselines (SCALE.md's scale-killer tier)
  are skipped by design: their cost is the documented point.
- No oracle compare (DuckDB on the quadratic oracles at 50k docs is the
  bottleneck, and correctness at fixture scale is the driver's gate);
  this is an executes-at-scale gate: no error, no OOM, sane wall-clock.

Usage: python tools/x10_smoke.py [--sf-dir /tmp/scale_stress/x10]
                                 [--out X10_SMOKE.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# SCALE.md's declared quadratic audit tier: all-pairs exact baselines whose
# N^2 cost is the documented property the bucketed twins are audited against.
SKIP = {
    "q43_shingle_jaccard",      # full shingle self-join (q42's exact twin)
    "q49_cosine_neardup",       # all-pairs cosine (q49b's exact twin)
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/scale_stress/x10")
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None,
                    help="comma-separated query-name substrings to run")
    args = ap.parse_args()

    from hive_ddl_extract_tool_spark.operators import all_queries
    from hive_ddl_extract_tool_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="x10-smoke", cpus=cpus,
                      shuffle_partitions=cpus,
                      extra_conf={"spark.driver.memory": "24g"})

    qs = all_queries()
    results, failures = [], 0
    for name, fn in qs.items():
        if name in SKIP:
            results.append({"q": name, "status": "skipped_quadratic_audit"})
            continue
        if args.only and not any(s in name for s in args.only.split(",")):
            continue
        t0 = time.monotonic()
        try:
            n = fn(spark, args.sf_dir).count()
            sec = round(time.monotonic() - t0, 2)
            results.append({"q": name, "status": "ok", "rows": n, "sec": sec})
            print(f"OK   {name} rows={n} ({sec}s)", flush=True)
        except Exception as exc:  # noqa: BLE001 -- the whole point is the census
            sec = round(time.monotonic() - t0, 2)
            failures += 1
            results.append({"q": name, "status": "error", "sec": sec,
                            "error": f"{type(exc).__name__}: {exc}"[:500]})
            print(f"FAIL {name} ({sec}s): {type(exc).__name__}: {exc}",
                  flush=True)
            traceback.print_exc(limit=3)

    ran = [r for r in results if r["status"] == "ok"]
    total = round(sum(r["sec"] for r in ran), 1)
    heavy = sorted(ran, key=lambda r: -r["sec"])[:10]
    summary = {"sf_dir": args.sf_dir, "cpus": cpus, "n_ok": len(ran),
               "n_fail": failures, "total_sec": total,
               "heaviest": [{"q": r["q"], "sec": r["sec"]} for r in heavy],
               "results": results}
    print(json.dumps({k: summary[k] for k in
                      ("n_ok", "n_fail", "total_sec", "heaviest")}))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(summary, fh, indent=1)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
