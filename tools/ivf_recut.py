"""Re-cut the IVF quantizer when the corpus has drifted (closed loop).

The registered ``ivf_quantizer_drift_audit`` query measures the re-cut
SIGNAL (occupancy skew of the serving artifact on the current corpus);
this tool takes the ACTION: if skew exceeds the bar it trains a fresh
quantizer on the current corpus (operators/similarity.maybe_recut_quantizer)
and writes it as the NEXT versioned artifact module
(operators/ivf_centroids_v{n+1}.py) — v_n keeps serving untouched, which
is the whole point of the FAISS-style train/serve split: searches against
the old version stay reproducible while the new one rolls out.

Usage:
    python tools/ivf_recut.py [sf_dir] [--version N] [--bar SKEW] \
        [--drift "a,b"] [--out PATH]

--drift applies the scale probe's canonical affine drift (v -> a*v + b)
to the corpus before measuring — the reproducible way to cut the
committed drifted-corpus exemplar (v2 was produced with --drift 0.6,0.5
on sf0.01).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_centroid_artifact(
    path: str, centroids, version: int, provenance: str
) -> None:
    """Write a quantizer as a Python module of repr-exact double literals
    (same format as tools/train_ivf_centroids.py, so Spark and the DuckDB
    oracle parse identical IEEE-754 values)."""
    nlist, dim = len(centroids), len(centroids[0])
    lines = [
        f'"""Fixed IVF coarse-quantizer centroids, version {version} '
        "(generated artifact).",
        "",
        provenance,
        "repr-exact doubles so Spark and the DuckDB oracle parse identical",
        'IEEE-754 values."""',
        "",
        f"VERSION = {version}",
        f"NLIST = {nlist}",
        f"DIM = {dim}",
        "",
        "CENTROIDS: tuple[tuple[float, ...], ...] = (",
    ]
    for row in centroids:
        vals = ", ".join(repr(float(v)) for v in row)
        lines.append(f"    ({vals}),")
    lines.append(")")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--version", type=int, default=1, help="serving version")
    ap.add_argument("--bar", type=float, default=2.0)
    ap.add_argument("--drift", default=None, help="a,b for v -> a*v + b")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kafka_topic_analyzer_spark.operators.similarity import (
        load_quantizer,
        maybe_recut_quantizer,
    )
    from kafka_topic_analyzer_spark.session import get_spark
    from kafka_topic_analyzer_spark.sources.tables import load_table

    spark = get_spark("ivf-recut")
    emb = load_table(spark, args.sf_dir, "embeddings")
    if args.drift:
        a, b = (float(x) for x in args.drift.split(","))
        emb = emb.withColumn(
            "embedding",
            F.expr(f"transform(embedding, x -> CAST({a}*x + {b} AS FLOAT))"),
        )

    serving = load_quantizer(args.version)
    new, before, after = maybe_recut_quantizer(emb, serving, skew_bar=args.bar)
    print(f"serving v{args.version}: {before}")
    if new is None:
        print(f"occupancy_skew <= {args.bar}: no re-cut needed")
        return
    print(f"re-cut candidate: {after}")
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "kafka_topic_analyzer_spark",
        "operators",
        f"ivf_centroids_v{args.version + 1}.py",
    )
    drift_note = (
        f"after the canonical affine drift v -> {args.drift.replace(',', '*v + ')}"
        if args.drift
        else "undrifted"
    )
    provenance = (
        f"Re-cut by tools/ivf_recut.py from v{args.version} on {args.sf_dir}\n"
        f"embeddings ({drift_note}): occupancy_skew "
        f"{before['occupancy_skew']} (bar {args.bar}, "
        f"{before['n_empty_cells']} empty cells) -> "
        f"{after['occupancy_skew']} ({after['n_empty_cells']} empty).\n"
    )
    write_centroid_artifact(out, new, args.version + 1, provenance)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
