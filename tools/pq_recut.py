"""Re-cut the PQ codebooks when the corpus has drifted (closed loop).

The registered ``pq_code_census`` query (and its streaming twin) measure
the re-cut SIGNAL — dead codes and per-code quantization error under the
serving codebook artifact; this tool takes the ACTION: if the dead-code
fraction exceeds the bar it trains fresh codebooks on the current corpus
(operators/pq.maybe_recut_codebooks) and writes them as the NEXT
versioned artifact module (operators/pq_codebooks_v{n+1}.py) — v_n keeps
serving untouched, the same FAISS-style train/serve lifecycle as
tools/ivf_recut.py.

Usage:
    python tools/pq_recut.py [sf_dir] [--version N] [--bar DEAD_FRAC] \
        [--drift "a,b"] [--out PATH]

--drift applies the scale probe's canonical affine drift (v -> a*v + b)
before measuring — the reproducible way to cut the committed
drifted-corpus exemplar (v2 was produced with --drift 0.6,0.5 on sf0.01).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_codebook_artifact(
    path: str, codebooks, version: int, provenance: str
) -> None:
    """Write codebooks as a Python module of repr-exact double literals
    (the tools/train_pq_codebooks.py format — Spark and the DuckDB
    oracle parse identical IEEE-754 values)."""
    m, k, dsub = len(codebooks), len(codebooks[0]), len(codebooks[0][0])
    lines = [
        f'"""Fixed PQ codebooks, version {version} (generated artifact).',
        "",
        provenance,
        "repr-exact doubles so Spark and the DuckDB oracle parse identical",
        'IEEE-754 values."""',
        "",
        f"VERSION = {version}",
        f"M = {m}",
        f"K = {k}",
        f"DSUB = {dsub}",
        "",
        "CODEBOOKS: tuple[tuple[tuple[float, ...], ...], ...] = (",
    ]
    for mi in range(m):
        lines.append("    (")
        for ki in range(k):
            vals = ", ".join(repr(float(v)) for v in codebooks[mi][ki])
            lines.append(f"        ({vals}),")
        lines.append("    ),")
    lines.append(")")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--version", type=int, default=1, help="serving version")
    ap.add_argument("--bar", type=float, default=0.25, help="dead-code fraction bar")
    ap.add_argument("--drift", default=None, help="a,b for v -> a*v + b")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from kafka_topic_analyzer_spark.operators.pq import (
        load_codebooks,
        maybe_recut_codebooks,
    )
    from kafka_topic_analyzer_spark.session import get_spark
    from kafka_topic_analyzer_spark.sources.tables import load_table

    spark = get_spark("pq-recut")
    emb = load_table(spark, args.sf_dir, "embeddings")
    if args.drift:
        a, b = (float(x) for x in args.drift.split(","))
        emb = emb.withColumn(
            "embedding",
            F.expr(f"transform(embedding, x -> CAST({a}*x + {b} AS FLOAT))"),
        )

    serving = load_codebooks(args.version)
    new, before, after = maybe_recut_codebooks(emb, serving, dead_frac_bar=args.bar)
    print(f"serving v{args.version}: {before}")
    if new is None:
        print(f"dead_frac <= {args.bar}: no re-cut needed")
        return
    print(f"re-cut candidate: {after}")
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "kafka_topic_analyzer_spark",
        "operators",
        f"pq_codebooks_v{args.version + 1}.py",
    )
    drift_note = (
        f"after the canonical affine drift v -> {args.drift.replace(',', '*v + ')}"
        if args.drift
        else "undrifted"
    )
    provenance = (
        f"Re-cut by tools/pq_recut.py from v{args.version} on {args.sf_dir}\n"
        f"embeddings ({drift_note}): dead codes "
        f"{before['n_dead_codes']}/{before['n_codes']} "
        f"(mean_qerr {before['mean_qerr']}, bar {args.bar}) -> "
        f"{after['n_dead_codes']}/{after['n_codes']} "
        f"(mean_qerr {after['mean_qerr']}).\n"
    )
    write_codebook_artifact(out, new, args.version + 1, provenance)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
