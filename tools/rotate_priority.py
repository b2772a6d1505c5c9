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
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(path.rsplit("_r", 1)[-1].split(".")[0])
        try:
            rows = json.load(open(path))
        except Exception:
            continue
        for name in rows:
            seen[name] = max(seen.get(name, 0), rnd)

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
        tag = "" if n not in seen else f"  # last row r{seen[n]}"
        print(f'    "{n}",{tag}')
    print(")")
    print("# beyond window:", ", ".join(ordered[window:]))


if __name__ == "__main__":
    main()
