"""Re-derive the SQ8 ranges when the corpus has drifted (closed loop).

The registered ``sq8_saturation_audit`` query (and its streaming twin)
measure the re-cut SIGNAL — per-dim clamped-code counts under the
serving range artifact; this tool takes the ACTION: if the saturated
fraction exceeds the bar it derives fresh per-dim [lo, hi] from the
current corpus (operators/sq.maybe_recut_sq8) and writes them as the
NEXT versioned artifact module (operators/sq8_params_v{n+1}.py) — v_n
keeps serving untouched, the same train/serve lifecycle as
tools/ivf_recut.py / tools/pq_recut.py.

Usage:
    python tools/sq8_recut.py [sf_dir] [--version N] [--bar SAT_FRAC] \
        [--drift "a,b"] [--out PATH]

--drift applies the canonical affine drift (v -> a*v + b) before
measuring — the reproducible way to cut a committed drifted-corpus
exemplar.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_sq8_artifact(path: str, ranges, version: int, provenance: str) -> None:
    """Write [lo, hi] as a Python module of repr-exact double literals
    (the tools/train_sq8_params.py format)."""
    lo, hi = ranges
    lines = [
        f'"""Fixed SQ8 per-dim ranges, version {version} (generated artifact).',
        "",
        provenance,
        "repr-exact doubles so Spark and the DuckDB oracle parse identical",
        'IEEE-754 values."""',
        "",
        f"VERSION = {version}",
        f"DIM = {len(lo)}",
        "",
        "LO: tuple[float, ...] = (",
    ]
    lines += [f"    {v!r}," for v in lo]
    lines += [")", "", "HI: tuple[float, ...] = ("]
    lines += [f"    {v!r}," for v in hi]
    lines += [")"]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--version", type=int, default=1, help="serving version")
    ap.add_argument("--bar", type=float, default=0.05, help="saturated fraction bar")
    ap.add_argument("--drift", default=None, help="a,b for v -> a*v + b")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kafka_topic_analyzer_spark.operators.sq import (
        load_sq8_params,
        maybe_recut_sq8,
    )
    from kafka_topic_analyzer_spark.session import get_spark
    from kafka_topic_analyzer_spark.sources.tables import load_table

    spark = get_spark("sq8-recut")
    emb = load_table(spark, args.sf_dir, "embeddings")
    if args.drift:
        a, b = (float(x) for x in args.drift.split(","))
        emb = emb.withColumn(
            "embedding",
            F.expr(f"transform(embedding, x -> CAST({a}*x + {b} AS FLOAT))"),
        )

    serving = load_sq8_params(args.version)
    new, before, after = maybe_recut_sq8(emb, serving, sat_frac_bar=args.bar)
    print(f"serving v{args.version}: {before}")
    if new is None:
        print(f"sat_frac <= {args.bar}: no re-cut needed")
        return
    print(f"re-cut candidate: {after}")
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "kafka_topic_analyzer_spark",
        "operators",
        f"sq8_params_v{args.version + 1}.py",
    )
    drift_note = (
        f"after the canonical affine drift v -> {args.drift.replace(',', '*v + ')}"
        if args.drift
        else "undrifted"
    )
    provenance = (
        f"Re-cut by tools/sq8_recut.py from v{args.version} on {args.sf_dir}\n"
        f"embeddings ({drift_note}): sat_frac {before['sat_frac']}\n"
        f"(mean_recon_err {before['mean_recon_err']}, bar {args.bar}) -> "
        f"{after['sat_frac']} (mean_recon_err {after['mean_recon_err']}).\n"
    )
    write_sq8_artifact(out, new, args.version + 1, provenance)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
