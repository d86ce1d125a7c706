"""Compare two bench JSON outputs per query and flag regressions.

Usage:
    python tools/bench_compare.py BENCH_full_r06.json BENCH_full_r07.json [ratio]

Accepts the raw one-line bench.py output, the in-repo
``BENCH_full_r{N}.json`` files bench.py now persists, or the driver's
``BENCH_r{N}.json`` wrapper ({"parsed": {...}}).  When the driver
wrapper carries ``parsed: null`` (its stdout capture keeps only a 2 KB
tail, truncating the battery head), timings are SALVAGED from the tail
by regex — a best-effort partial set, which is exactly why the full
files exist.  Salvage identifies WHICH section (warm ``queries`` vs
``queries_cold``) the surviving entries belong to from the key
delimiters still present in the tail; the comparison then uses the
same section from both files (warm preferred) so cold timings are
never silently compared against warm baselines.  Flags shared queries
whose time grew by more than ``ratio`` (default 1.3) and prints the
shared-set totals.  Exit code 1 if any query regressed beyond the
ratio.
"""

from __future__ import annotations

import json
import re
import sys

_PAIR = re.compile(r'"([a-z][a-z0-9_]+)":\s*([0-9]+\.[0-9]+)')


def _salvage(tail: str, path: str) -> dict[str, dict[str, float]]:
    """Best-effort section-labeled salvage from a truncated stdout tail.

    bench.py's JSON line orders keys: metric, value, unit, queries
    (warm), queries_cold, scale_guard, sf, sf1{...}.  The tail is the
    line's END, so the FIRST sections are what get lost.  Strategy:
    drop the sf1 section and scale_guard numbers, then split what is
    left at the top-level '"queries_cold"' key — text before it is the
    warm map's remainder, text after it is the (complete) cold map; if
    the key is absent the tail started inside the cold map already.
    A pair truncated mid-name lacks its opening quote, so the regex
    skips it on its own; every match is complete.
    """
    if '"sf1"' in tail:
        tail = tail.split('"sf1"')[0]
    elif '"sf1_dir"' in tail or '"wall_ratio_warm' in tail:
        # The tail starts INSIDE the sf1 section: its nested maps are
        # sf1-scale timings, not comparable to the other file's sf0.1
        # numbers — refuse rather than mislabel.
        print(
            f"note: {path} tail is entirely inside the sf1 section - "
            "nothing salvageable at sf0.1 scale",
            file=sys.stderr,
        )
        return {"queries": {}, "queries_cold": {}}
    pos_sg = tail.find('"scale_guard"')
    if pos_sg != -1:
        tail = tail[:pos_sg]
    pos_qc = tail.find('"queries_cold"')
    if pos_qc != -1:
        warm_txt, cold_txt = tail[:pos_qc], tail[pos_qc:]
    else:
        warm_txt, cold_txt = "", tail
    # Non-query keys that can leak into a salvage window when the tail
    # boundary lands inside scale_guard (its own key already lost) or
    # before top-level scalars — never timings, always dropped.
    junk = re.compile(
        r"^(games_per_sec_|wall_ratio_|sf$|data_ratio$|max_wall_ratio$|value$)"
    )
    warm = {k: float(v) for k, v in _PAIR.findall(warm_txt) if not junk.match(k)}
    cold = {k: float(v) for k, v in _PAIR.findall(cold_txt) if not junk.match(k)}
    print(
        f"note: {path} is a truncated driver capture - salvaged "
        f"{len(warm)} warm + {len(cold)} cold entries (head lost)",
        file=sys.stderr,
    )
    return {"queries": warm, "queries_cold": cold}


def _load(path: str) -> dict[str, dict[str, float]]:
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc:
        parsed = doc["parsed"]
        if parsed is None:
            return _salvage(doc.get("tail", ""), path)
        doc = parsed
    return {
        "queries": dict(doc.get("queries", {})),
        "queries_cold": dict(doc.get("queries_cold", {})),
    }


def main() -> int:
    old_doc, new_doc = _load(sys.argv[1]), _load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    # Compare like-for-like: warm when both sides have warm entries,
    # else fall back to the cold section (and say so).
    section = "queries"
    if not (old_doc["queries"] and new_doc["queries"]):
        section = "queries_cold"
        print(
            "note: warm section unavailable on one side - comparing "
            "COLD timings from both files",
            file=sys.stderr,
        )
    old, new = old_doc[section], new_doc[section]
    if not old or not new:
        print("error: no comparable section present in both files", file=sys.stderr)
        return 2
    shared = sorted(set(old) & set(new))
    if not shared:
        print("error: the files share no query names in the compared "
              "section - nothing to diff", file=sys.stderr)
        return 2
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
