"""Rebuild SCALE.md's two oracle-gate tables from a round's per-K logs.

Usage:
    python tools/rebuild_scale_tables.py \
        --k1 /tmp/x10_k1.log --k3 /tmp/x10_k3.log \
        --k10 /tmp/x10_k10.log --k30 /tmp/x10_k30.log

Keeps the family/query label cells verbatim (they are stable editorial
content); replaces only the numeric cells. Rows map to log entries by
POSITION — both tables list the gate's families in execution order, so
after adding a family to tools/x10_oracle.py, first insert a placeholder
row at the matching position in BOTH tables (and bump N_FAMILIES), then
run this. A misplaced placeholder cannot silently shift numbers under the
wrong label: every row's label cell is parsed for its query code (e.g.
``q42``) and asserted against the log entry's query name before rewrite. Numbers use the narrow no-break space (U+202F) thousands
separator the rest of SCALE.md uses; the staged-read footnote markers
(¹ on q42/q202/q218, ² on q220, ³ on q40's K=1 warm-up cell) are
re-applied by query name.

Tip from rounds 13–14: if a K-run lands in a host-contention window
(both the Spark AND DuckDB seconds ~2–3× the previous round's), re-run
that K idle before committing — hash matches are unaffected, but the
committed wall-clock series should be the honest idle-box measurement.
"""
from __future__ import annotations

import argparse
import json
import re

N_FAMILIES = 29
SEP = " "
SCALE_MD = "SCALE.md"
STAGED1 = {"q42_minhash_lsh_dedup", "q202_prefix_filter_join",
           "q218_sorted_neighborhood"}  # ¹ staged-artifact read
STAGED2 = {"q220_incremental_equivalence"}  # ² memory-sink read


def fmt(n: int) -> str:
    return f"{n:,}".replace(",", SEP)


_QCODE = re.compile(r"q\d+[a-z]?")


def label_code(*cells: str) -> str:
    """Short query code (``q42``, ``q49b``) from a row's label cells, so a
    misplaced placeholder row cannot silently receive another family's
    numbers (positional zip otherwise trusts row order blindly). The q103
    scaled-cells row's table-1 query cell names the internal helper, so it
    is special-cased."""
    for c in cells:
        if "_semdedup_from_ranked" in c:
            return "q103"
        m = _QCODE.search(c)
        if m:
            return m.group(0)
    raise AssertionError(f"no query code found in label cells {cells!r}")


def load(path: str) -> list[dict]:
    rows = []
    for line in open(path):
        # Spark progress bars can prefix the JSON line with \r fragments
        m = re.search(r'\{"query".*\}', line.strip().replace("\r", ""))
        if m:
            rows.append(json.loads(m.group(0)))
    assert len(rows) == N_FAMILIES, (path, len(rows))
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    for k in (1, 3, 10, 30):
        ap.add_argument(f"--k{k}", required=True,
                        help=f"log of `python tools/x10_oracle.py --k {k}`")
    args = ap.parse_args()
    k1, k3, k10, k30 = (load(p) for p in (args.k1, args.k3, args.k10, args.k30))

    src = open(SCALE_MD).read()

    # table 1: the per-family @10x row/hash/seconds table
    t1 = src.index("| family | query @ 10× | rows (both engines) "
                   "| hash match | Spark / DuckDB sec |")
    body = src.index("\n", src.index("\n", t1) + 1) + 1
    end = src.index("\n\n", body)
    old = [r for r in src[body:end].split("\n") if r.startswith("|")]
    assert len(old) == N_FAMILIES, len(old)
    rows = []
    for o, res in zip(old, k10):
        cells = o.split("|")
        assert res["match"], res
        code = label_code(cells[2], cells[1])
        assert res["query"].startswith(code + "_") or res["query"] == code, \
            (code, res["query"])
        mark = ("¹" if res["query"] in STAGED1
                else "²" if res["query"] in STAGED2 else "")
        txt = fmt(res["rows_spark"])
        if res["query"] == "q103_semdedup_scaled_cells":
            txt += " report rows"
        cells[3] = f" {txt} "
        cells[5] = f" {res['sec_spark']}{mark} / {res['sec_duck']} "
        rows.append("|".join(cells))
    src = src[:body] + "\n".join(rows) + src[end:]

    # table 2: the K-series wall-clock table
    t2 = src.index("| family (query) | K=1 | K=3 | K=10 | K=30 | rows @30× |")
    body = src.index("\n", src.index("\n", t2) + 1) + 1
    end = src.index("\n\n", body)
    old = [r for r in src[body:end].split("\n") if r.startswith("|")]
    assert len(old) == N_FAMILIES, len(old)
    rows = []
    for o, r1, r3, r10, r30 in zip(old, k1, k3, k10, k30):
        cells = o.split("|")
        assert r30["match"] and r1["query"] == r30["query"], (r1, r30)
        code = label_code(cells[1])
        assert r1["query"].startswith(code + "_") or r1["query"] == code, \
            (code, r1["query"])
        for i, rr in zip((2, 3, 4, 5), (r1, r3, r10, r30)):
            cells[i] = f" {rr['sec_spark']} "
        if r1["query"] == "q40_exact_dedup":  # ³ fresh-process warm-up
            cells[2] = f" {r1['sec_spark']}³ "
        cells[6] = f" {fmt(r30['rows_spark'])} "
        rows.append("|".join(cells))
    src = src[:body] + "\n".join(rows) + src[end:]

    open(SCALE_MD, "w").write(src)
    print(f"rebuilt both tables for {N_FAMILIES} families")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
