"""Certification-ledger report: every registry query's latest driver
CORRECTNESS row, the current head-50, and what the next head rotation
should contain.

The evaluation driver records rows for the first 50 entries of
``__spark_entry__.queries()`` each round; this tool replaces the
by-hand ledger audit done at the start of every round.

Usage:
    python tools/rotation_status.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    latest: dict[str, int] = {}
    ok: dict[str, bool] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for name, row in json.load(open(f)).items():
            latest[name] = rnd
            ok[name] = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            )

    import __spark_entry__ as entry

    registry = list(entry.queries())
    head = registry[:50]

    by_round: dict[int | None, list[str]] = {}
    for q in registry:
        by_round.setdefault(latest.get(q), []).append(q)

    print(f"registry: {len(registry)} queries; head-50 = first 50 in order")
    print("latest-driver-row distribution:")
    for rnd in sorted(by_round, key=lambda r: (r is None, r)):
        tag = "NEVER" if rnd is None else f"r{rnd:02d}"
        print(f"  {tag}: {len(by_round[rnd])}")
    red = [q for q in registry if q in ok and not ok[q]]
    if red:
        print("RED at latest certification:", ", ".join(red))
    else:
        print("all certified queries green at their latest driver row")

    never = [q for q in registry if q not in latest]
    stale_cut = max((r for r in by_round if r is not None), default=0) - 3
    stale = [q for q in registry if latest.get(q, 99) <= stale_cut]
    candidates = never + sorted(stale, key=lambda q: latest[q])
    print(f"\nnext-head candidates (never-certified first, then rows <= r{stale_cut:02d}):")
    if not candidates:
        print("  none - ledger is current")
    for q in candidates[:50]:
        tag = "NEVER" if q in never else f"r{latest[q]:02d}"
        print(f"  {tag}  {q}")
    uncovered = [q for q in candidates if q not in head]
    if uncovered:
        print(f"\n{len(uncovered)} candidate(s) NOT in the current head-50:")
        for q in uncovered:
            print(f"  {q}")


if __name__ == "__main__":
    main()
