"""Suggest next round's CHECK_PRIORITY rotation.

The grading driver verifies only the first ~50 queries in
`all_queries()` iteration order (see registry.py). This tool unions the
names already carrying a row across all CORRECTNESS_r*.json artifacts
and prints, in priority order, the queries that should lead the next
round's window: rowless first, then the stalest previously-verified.

    python tools/rotate_priority.py [window_size]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_topic_analyzer_spark.registry import all_queries  # noqa: E402


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: dict[str, int] = {}  # name -> last round with any row
    latest: dict[str, dict] = {}  # name -> the newest row itself
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[-1].split(".")[0])
        try:
            rows = json.load(open(path))
        except Exception:
            continue
        for name, row in rows.items():
            if rnd >= seen.get(name, 0):
                seen[name] = max(seen.get(name, 0), rnd)
                latest[name] = row if isinstance(row, dict) else {}

    # A FAIL/error row is not evidence — a query whose NEWEST driver row
    # is red must lead the next window (r8 lesson: vocab_coverage_curve's
    # hash-fail row made it look "fresh" and the default sort buried it).
    failing = {
        n
        for n, row in latest.items()
        if row.get("err") or (row.get("hash_match") is False)
    }
    for n in failing:
        seen[n] = -1  # sorts before every real round number

    from kafka_topic_analyzer_spark.registry import _REGISTRY

    all_names = list(all_queries())
    # No-oracle queries only ever yield a `no_oracle` driver row — their
    # exact audit twins carry the real evidence — so spending a window
    # slot on them is waste; keep them out of the rotation entirely.
    names = [n for n in all_names if _REGISTRY[n].oracle is not None]
    skipped = [n for n in all_names if _REGISTRY[n].oracle is None]
    if skipped:
        print(f"# skipping no-oracle (audit twins carry evidence): {', '.join(skipped)}")
    rowless = [n for n in names if n not in seen]
    stale = sorted((n for n in names if n in seen), key=lambda n: (seen[n], names.index(n)))
    ordered = rowless + stale
    print(f"# {len(names)} registered; {len(rowless)} rowless; window={window}")
    print("CHECK_PRIORITY = (")
    for n in ordered[:window]:
        if n in failing:
            tag = "  # newest driver row is FAIL/error -> must re-green"
        elif n in seen:
            tag = f"  # last row r{seen[n]}"
        else:
            tag = ""
        print(f'    "{n}",{tag}')
    print(")")
    print("# beyond window:", ", ".join(ordered[window:]))


if __name__ == "__main__":
    main()
