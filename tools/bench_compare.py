"""Sentinel-normalized cross-round bench comparison -> BENCH_COMPARE.md.

The r9 judge spent an hour hand-adjudicating a uniform ~1.3x per-query
inflation that turned out to be host drift (two identical-code suite runs
60 min apart measured 131 s vs 169 s). This tool makes that adjudication a
one-read artifact, normalizing every per-query delta by the host-drift
canaries bench.py times each round:

- ``ambient_sentinel_sec`` — CPU/codegen drift (2B-row data-free sum,
  pinned 32 partitions);
- ``overhead_sentinel_sec`` (r10+) — scheduler/shuffle-layer drift (tiny
  two-exchange job). Added after the r10 compare flagged a 2.5-3x cluster
  on small fixed-overhead-dominated queries that a worktree control (r9
  code re-run the same day) proved was host drift the codegen sentinel
  missed entirely (it moved 1.3%).

A query is a REGRESSION CANDIDATE only when its ratio exceeds --bar under
EVERY available sentinel normalization (raw / max(drift factors)) AND both
rounds' min-of-3 spread is below --max-spread — a noisy measurement cannot
testify, and a delta excused by either drift axis is not a code regression.

Usage:
    python tools/bench_compare.py --old-ref <git-ref> [--new BENCH_DETAIL.json]
    python tools/bench_compare.py --old path/to/old_BENCH_DETAIL.json
    ... [--note "adjudication text appended to the artifact"]

--old-ref reads BENCH_DETAIL.json (and, for rounds before the sentinels
moved into the detail file, BENCH_LOCAL.json) from a committed git ref.
Writes BENCH_COMPARE.md at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git_show(ref: str, path: str) -> dict | None:
    try:
        out = subprocess.run(
            ["git", "show", f"{ref}:{path}"],
            cwd=ROOT,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out)
    except (subprocess.CalledProcessError, json.JSONDecodeError):
        return None


def _load_run(detail: dict, local: dict | None) -> dict:
    def field(name):
        v = detail.get(name)
        if v is None and local:
            v = local.get(name)
        return v

    return {
        "sf": detail.get("sf"),
        "sentinel": field("ambient_sentinel_sec"),
        "overhead_sentinel": field("overhead_sentinel_sec"),
        "stream_sentinel": field("stream_sentinel_sec"),
        "io_sentinel": field("io_sentinel_sec"),
        # headline throughput probes (write+scan ~1 GB of parquet — the
        # I/O-exposed figures the io sentinel normalizes, r13)
        "throughput": {
            k: field(k)
            for k in (
                "baseline_sized_msgs_per_sec",
                "baseline_sized_mb_per_sec",
                "steady_state_msgs_per_sec",
                "steady_state_mb_per_sec",
                "report_msgs_per_sec",
            )
            if field(k)
        },
        "queries": detail.get("queries", {}),
        "spread": detail.get("spread", {}),
    }


def compare(old: dict, new: dict, bar: float, max_spread: float) -> tuple[str, list]:
    drifts: dict[str, float] = {}
    notes = []
    if old["sentinel"] and new["sentinel"]:
        drifts["cpu"] = new["sentinel"] / old["sentinel"]
        notes.append(
            f"cpu sentinel {old['sentinel']:.4f}s -> {new['sentinel']:.4f}s "
            f"(drift {drifts['cpu']:.3f}x)"
        )
    if old.get("overhead_sentinel") and new.get("overhead_sentinel"):
        drifts["overhead"] = new["overhead_sentinel"] / old["overhead_sentinel"]
        notes.append(
            f"overhead sentinel {old['overhead_sentinel']:.4f}s -> "
            f"{new['overhead_sentinel']:.4f}s (drift {drifts['overhead']:.3f}x)"
        )
    if old.get("stream_sentinel") and new.get("stream_sentinel"):
        # r12+: micro-batch/checkpoint-layer drift — the axis the other
        # two sentinels are blind to (the r12 compare flagged
        # windowed_counts_streaming 1.30x while BOTH sentinels got
        # faster; a standalone re-run reproduced it on untouched code)
        drifts["stream"] = new["stream_sentinel"] / old["stream_sentinel"]
        notes.append(
            f"stream sentinel {old['stream_sentinel']:.4f}s -> "
            f"{new['stream_sentinel']:.4f}s (drift {drifts['stream']:.3f}x)"
        )
    io_drift = None
    if old.get("io_sentinel") and new.get("io_sentinel"):
        # r13+: disk/page-cache drift — the axis the r12 -22% headline
        # throughput swing exposed (no sentinel covered the ~1 GB
        # parquet write+scan the probes pay). NOT added to the query
        # flag rule (queries read page-cached fixture files); used to
        # normalize the throughput probes below.
        io_drift = new["io_sentinel"] / old["io_sentinel"]
        notes.append(
            f"io sentinel {old['io_sentinel']:.4f}s -> "
            f"{new['io_sentinel']:.4f}s (drift {io_drift:.3f}x)"
        )
    if not drifts:
        notes.append(
            "no sentinel in one of the runs — RAW ratios (pre-sentinel round "
            "or SPARK_GRAFT_SENTINEL_ROWS=0); treat uniform shifts as drift"
        )
    cpu_drift = drifts.get("cpu", 1.0)
    max_drift = max(drifts.values()) if drifts else 1.0

    common = sorted(set(old["queries"]) & set(new["queries"]))
    added = sorted(set(new["queries"]) - set(old["queries"]))
    removed = sorted(set(old["queries"]) - set(new["queries"]))

    rows = []
    for q in common:
        t_old, t_new = old["queries"][q], new["queries"][q]
        if t_old <= 0:
            continue
        raw = t_new / t_old
        norm = raw / cpu_drift  # the reported column: cpu-normalized
        best_norm = raw / max_drift  # the flag test: excused by ANY axis
        sp = max(old["spread"].get(q, 0.0), new["spread"].get(q, 0.0))
        flagged = best_norm > bar and sp < max_spread
        rows.append((q, t_old, t_new, raw, norm, sp, flagged, best_norm))

    flagged = [r for r in rows if r[6]]
    # advisor r10: a delta excused by the WORST axis but over the bar on
    # the cpu axis could be a real cpu-bound regression hiding behind an
    # unrelated overhead drift — surface those (and near-bar noisy ones)
    # so a reviewer still sees them instead of a silent false negative
    excused = [
        r for r in rows if not r[6] and r[4] > bar and r[5] < max_spread
    ]
    noisy = [r for r in rows if not r[6] and r[7] > bar and r[5] >= max_spread]
    norms = sorted(r[4] for r in rows)
    median_norm = norms[len(norms) // 2] if norms else float("nan")

    flag_rule = (
        f"ratio / max(all drift factors) > {bar} AND min-of-3 spread < "
        f"{max_spread} in both rounds"
    )
    lines = [
        "# BENCH_COMPARE — sentinel-normalized cross-round deltas",
        "",
        f"- old sf={old['sf']}, new sf={new['sf']}; {len(common)} common queries"
        f" (+{len(added)} new, -{len(removed)} removed)",
        *[f"- {n}" for n in notes],
        f"- median cpu-normalized ratio: **{median_norm:.3f}x** "
        "(1.0 = same speed after removing host drift)",
        f"- flag rule: {flag_rule} -> **{len(flagged)} regression candidate(s)**",
        "",
    ]
    if flagged:
        lines += [
            "## Regression candidates",
            "",
            "| query | old s | new s | raw x | vs cpu drift | vs worst drift | spread |",
            "|---|---|---|---|---|---|---|",
        ]
        for q, t_old, t_new, raw, norm, sp, _, best in sorted(
            flagged, key=lambda r: -r[7]
        ):
            lines.append(
                f"| {q} | {t_old:.3f} | {t_new:.3f} | {raw:.2f} | {norm:.2f} "
                f"| {best:.2f} | {sp:.2f} |"
            )
        lines.append("")
    else:
        lines += ["## Regression candidates", "", "None.", ""]

    if excused:
        lines += [
            "## Over-bar on the cpu axis but excused by the worst drift axis",
            "",
            "Visibility list (advisor r10): these exceeded the bar after cpu-"
            "sentinel normalization but were excused by a larger drift on "
            "another axis — review before accepting the excuse.",
            "",
            "| query | old s | new s | vs cpu drift | vs worst drift | spread |",
            "|---|---|---|---|---|---|",
        ]
        for q, t_old, t_new, _raw, norm, sp, _, best in sorted(
            excused, key=lambda r: -r[4]
        ):
            lines.append(
                f"| {q} | {t_old:.3f} | {t_new:.3f} | {norm:.2f} | {best:.2f} | {sp:.2f} |"
            )
        lines.append("")
    if noisy:
        lines += [
            "## Over-bar under every axis but too noisy to testify "
            f"(spread >= {max_spread})",
            "",
            "| query | old s | new s | vs cpu drift | vs worst drift | spread |",
            "|---|---|---|---|---|---|",
        ]
        for q, t_old, t_new, _raw, norm, sp, _, best in sorted(
            noisy, key=lambda r: -r[7]
        ):
            lines.append(
                f"| {q} | {t_old:.3f} | {t_new:.3f} | {norm:.2f} | {best:.2f} | {sp:.2f} |"
            )
        lines.append("")

    lines += [
        "## Largest cpu-normalized movers (context, top 10 each way)",
        "",
        "| query | old s | new s | vs cpu drift | vs worst drift | spread |",
        "|---|---|---|---|---|---|",
    ]
    by_norm = sorted(rows, key=lambda r: -r[4])
    for q, t_old, t_new, _raw, norm, sp, _, best in by_norm[:10]:
        lines.append(
            f"| {q} | {t_old:.3f} | {t_new:.3f} | {norm:.2f} | {best:.2f} | {sp:.2f} |"
        )
    lines.append("| … | | | | | |")
    for q, t_old, t_new, _raw, norm, sp, _, best in by_norm[-10:]:
        lines.append(
            f"| {q} | {t_old:.3f} | {t_new:.3f} | {norm:.2f} | {best:.2f} | {sp:.2f} |"
        )
    tp_common = sorted(
        set(old.get("throughput", {})) & set(new.get("throughput", {}))
    )
    if tp_common:
        lines += [
            "",
            "## Throughput probes (rates; I/O-sentinel-normalized, r13)",
            "",
            "Raw ratio = new/old rate (>1 is faster). A host-I/O slowdown "
            "of d multiplies probe time by d and divides the rate by d, so "
            "normalized = raw x io-drift; without an io sentinel on both "
            "sides the raw ratio stands unattributed.",
            "",
            "| probe | old | new | raw x | vs io drift |",
            "|---|---|---|---|---|",
        ]
        for k in tp_common:
            v_old, v_new = old["throughput"][k], new["throughput"][k]
            raw = v_new / v_old if v_old else float("nan")
            norm = f"{raw * io_drift:.2f}" if io_drift else "n/a (no io sentinel)"
            lines.append(
                f"| {k} | {v_old:,.0f} | {v_new:,.0f} | {raw:.2f} | {norm} |"
            )
    if added:
        lines += ["", f"New queries this round: {', '.join(added)}"]
    if removed:
        lines += ["", f"Removed since last round: {', '.join(removed)}"]
    lines.append("")
    return "\n".join(lines), flagged


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old", help="path to the old BENCH_DETAIL.json")
    ap.add_argument("--old-ref", help="git ref holding the old BENCH_DETAIL.json")
    ap.add_argument("--new", default=os.path.join(ROOT, "BENCH_DETAIL.json"))
    ap.add_argument("--out", default=os.path.join(ROOT, "BENCH_COMPARE.md"))
    ap.add_argument("--bar", type=float, default=1.3)
    ap.add_argument("--max-spread", type=float, default=0.3)
    ap.add_argument(
        "--note",
        default=None,
        help="adjudication note appended verbatim as a final section",
    )
    args = ap.parse_args()

    if args.old:
        old_detail = json.load(open(args.old))
        old_local = None
        lp = os.path.join(os.path.dirname(args.old), "BENCH_LOCAL.json")
        if os.path.exists(lp):
            old_local = json.load(open(lp))
    elif args.old_ref:
        old_detail = _git_show(args.old_ref, "BENCH_DETAIL.json")
        old_local = _git_show(args.old_ref, "BENCH_LOCAL.json")
        if old_detail is None:
            sys.exit(f"no BENCH_DETAIL.json at ref {args.old_ref}")
    else:
        sys.exit("need --old or --old-ref")

    new_detail = json.load(open(args.new))
    new_local_path = os.path.join(os.path.dirname(args.new), "BENCH_LOCAL.json")
    new_local = (
        json.load(open(new_local_path)) if os.path.exists(new_local_path) else None
    )

    md, flagged = compare(
        _load_run(old_detail, old_local),
        _load_run(new_detail, new_local),
        args.bar,
        args.max_spread,
    )
    if args.note:
        md += f"\n## Adjudication\n\n{args.note}\n"
    with open(args.out, "w") as f:
        f.write(md)
    print(md.split("\n\n")[1])
    print(f"-> {args.out}; {len(flagged)} regression candidate(s)")


if __name__ == "__main__":
    main()
