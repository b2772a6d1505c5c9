"""Full-catalog driver-mirror: verify EVERY registered query at sf0.01.

The grading driver only writes CORRECTNESS rows for the first 50 queries in
``all_queries()`` iteration order, so with 116 registered queries a full
driver cycle takes 3 rounds. This tool runs the SAME check the driver runs
(Spark result vs DuckDB oracle at sf0.01: row count + sorted-column schema +
order-insensitive canonical value compare) over the ENTIRE catalog and writes
``SELFCHECK_r{N}.json`` so each round carries fresh evidence for every query,
not just the 50 in the driver window.

    python tools/selfcheck.py [--sf /root/testdata/sf0.01] [--out SELFCHECK_r05.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) + "/tests")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default="SELFCHECK.json")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    from kafka_topic_analyzer_spark.registry import all_queries
    from kafka_topic_analyzer_spark.schema import TESTDATA_TABLES
    from oracle_util import canonicalize, dtype_leaks

    # Vanilla session, like the grading driver's (no engine confs) — each
    # query wrapper must fix timezone/nanos confs itself via prepare_session.
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("selfcheck")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    import __spark_entry__ as entry_mod

    wrapped = entry_mod.queries()
    specs = all_queries()
    if args.only:
        keep = set(args.only.split(","))
        specs = {n: s for n, s in specs.items() if n in keep}

    import hashlib

    def value_hash(df) -> str:
        """Stable digest of the canonicalized frame (sorted rows/columns,
        normalized value strings) — COMMITTED per query so the selfcheck
        carries value-level evidence, not just booleans (judge r9 item 8):
        a cross-round hash change on an untouched query is visible in the
        artifact diff even though both rounds were 'green'."""
        payload = ",".join(df.columns) + "\n" + df.to_csv(index=False, header=False)
        return hashlib.sha256(payload.encode()).hexdigest()[:16]

    results: dict[str, dict] = {}
    t_suite = time.time()
    n_green = n_rows_only = n_fail = 0
    for name, spec in specs.items():
        rec: dict = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "spark_hash": None,
            "oracle_hash": None,
            "sec": None,
            "err": None,
        }
        t0 = time.time()
        try:
            sp_raw = wrapped[name](spark, args.sf).toPandas()
            sp = canonicalize(sp_raw)
            rec["spark_rows"] = len(sp)
            rec["spark_hash"] = value_hash(sp)
            if spec.oracle is None:
                rec["rows_match"] = rec["spark_rows"] >= 0
                n_rows_only += 1
            else:
                du_raw = con.execute(spec.oracle).df()
                du = canonicalize(du_raw)
                rec["oracle_hash"] = value_hash(du)
                # The driver's hash is stricter than canonicalize(): an
                # int-vs-float dtype pair (uncast DuckDB HUGEINT sum) passes
                # the normalized compare but fails the driver (r8
                # vocab_coverage_curve). Surface it as a FAIL locally.
                leaks = dtype_leaks(sp_raw, du_raw)
                if leaks:
                    rec["err"] = f"dtype leak (int vs float): {leaks} — uncast oracle aggregate"
                rec["oracle_rows"] = len(du)
                rec["rows_match"] = len(sp) == len(du)
                rec["schema_match"] = list(sp.columns) == list(du.columns)
                rec["hash_match"] = bool(
                    rec["rows_match"] and rec["schema_match"] and sp.equals(du) and not leaks
                )
                if rec["hash_match"]:
                    n_green += 1
                else:
                    n_fail += 1
        except Exception:
            rec["err"] = traceback.format_exc(limit=3)
            n_fail += 1
        rec["sec"] = round(time.time() - t0, 3)
        results[name] = rec
        status = (
            "ERR"
            if rec["err"]
            else ("green" if rec["hash_match"] else ("rows-only" if spec.oracle is None else "FAIL"))
        )
        print(f"{name:40s} {status:9s} {rec['sec']:6.2f}s", flush=True)

    payload = {
        "sf_dir": args.sf,
        "total": len(specs),
        "green": n_green,
        "rows_only": n_rows_only,
        "failed": n_fail,
        "suite_sec": round(time.time() - t_suite, 1),
        "queries": results,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"\n{n_green} green / {n_rows_only} rows-only / {n_fail} failed -> {args.out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
