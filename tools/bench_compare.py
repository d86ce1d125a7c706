"""Compare two bench JSON outputs per query and flag regressions.

Usage:
    python tools/bench_compare.py BENCH_full_r06.json BENCH_full_r07.json [ratio]

Accepts the raw one-line bench.py output, the in-repo
``BENCH_full_r{N}.json`` files bench.py now persists, or the driver's
``BENCH_r{N}.json`` wrapper ({"parsed": {...}}).  When the driver
wrapper carries ``parsed: null`` (its stdout capture keeps only a 2 KB
tail, truncating the battery head), warm-query timings are SALVAGED
from the tail by regex — a best-effort partial set, which is exactly
why the full files exist.  Flags shared queries whose time grew by more
than ``ratio`` (default 1.3) and prints the shared-set totals.  Exit
code 1 if any query regressed beyond the ratio.
"""

from __future__ import annotations

import json
import re
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc:
        parsed = doc["parsed"]
        if parsed is None:
            # Truncated driver capture: salvage "name": 1.23 pairs from
            # the tail.  The tail holds the END of the JSON line, so
            # entries from the battery head are simply absent; ratios
            # (sf1 section) are excluded by requiring a time-like value.
            tail = doc.get("tail", "")
            # The warm "queries" map is emitted first, so everything in
            # the tail before the "queries_cold" key is warm entries
            # (minus the first pair, truncated mid-name); past it are
            # cold/scale-guard/sf1 numbers that must NOT be salvaged —
            # duplicate keys there would silently overwrite warm times.
            tail = tail.split('"queries_cold"')[0]
            # A pair truncated mid-name lacks its opening quote, so the
            # regex skips it on its own; every match is complete.
            pairs = re.findall(r'"([a-z][a-z0-9_]+)":\s*([0-9]+\.[0-9]+)', tail)
            print(
                f"note: {path} is a truncated driver capture - salvaged "
                f"{len(pairs)} entries from the tail (head lost)",
                file=sys.stderr,
            )
            return {k: float(v) for k, v in pairs}
        doc = parsed
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
