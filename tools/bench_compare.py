"""Compare two bench JSON outputs per query and flag regressions.

Usage:
    python tools/bench_compare.py BENCH_r01.json BENCH_r02.json [ratio]

Accepts either the raw one-line bench.py output or the driver's
BENCH_r{N}.json wrapper ({"parsed": {...}}).  Flags shared queries whose
time grew by more than ``ratio`` (default 1.3) and prints the shared-set
totals.  Exit code 1 if any query regressed beyond the ratio.
"""

from __future__ import annotations

import json
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc:
        doc = doc["parsed"]
    return doc["queries"]


def main() -> int:
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    shared = sorted(set(old) & set(new))
    flagged = []
    for q in shared:
        r = new[q] / old[q] if old[q] else float("inf")
        mark = " <-- REGRESSION" if r > ratio else ""
        if r > ratio:
            flagged.append(q)
        print(f"{q:40s} {old[q]:8.3f}s -> {new[q]:8.3f}s  ({r:5.2f}x){mark}")
    t_old, t_new = sum(old[q] for q in shared), sum(new[q] for q in shared)
    print(f"{'shared-set total':40s} {t_old:8.3f}s -> {t_new:8.3f}s  "
          f"({t_new / t_old:5.2f}x)")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print("new entries:", ", ".join(f"{q}={new[q]:.3f}s" for q in only_new))
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
