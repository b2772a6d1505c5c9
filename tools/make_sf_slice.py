"""Materialize a scaled testdata slice (e.g. sf1 = sf0.1 x 10) for
oracle spot-sweeps beyond the shipped fixtures (judge r14 item 7).

Each table is replicated MULT x with its primary key offset per replica
(the twin_scale_probe discipline, tools/twin_scale_probe.py:45): per-key
structure stays linear, GROUP sizes and global sums grow — exactly the
axis that exposes scale-dependent semantics (integer overflow at bigger
sums, rounding drift, partition-count sensitivity). Foreign keys are NOT
remapped, so reference-side group sizes grow too; both engines see the
identical rows, which is all a spark-vs-DuckDB hash compare needs.

Written with DuckDB so each table lands as the SINGLE ``{table}.parquet``
file tools/selfcheck.py's oracle views expect.

    python tools/make_sf_slice.py [src_sf_dir] [out_dir] [mult]
"""

from __future__ import annotations

import os
import sys

import duckdb

KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",  # PK is (l_orderkey, l_linenumber)
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_slice"
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, key in KEYS.items():
        src_path = os.path.join(src, f"{table}.parquet")
        dst_path = os.path.join(out, f"{table}.parquet")
        (span,) = con.execute(
            f"SELECT max({key}) + 1 FROM '{src_path}'"
        ).fetchone()
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src_path}'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"CAST(t.{c} + r.i * {span} AS BIGINT) AS {c}" if c == key else f"t.{c}"
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{src_path}' t, range({mult}) r(i)"
            f" ORDER BY t.{key}, r.i) TO '{dst_path}'"
            " (FORMAT PARQUET, ROW_GROUP_SIZE 122880)"
        )
        (n,) = con.execute(f"SELECT count(*) FROM '{dst_path}'").fetchone()
        print(f"{table}: {n} rows -> {dst_path}")


if __name__ == "__main__":
    main()
