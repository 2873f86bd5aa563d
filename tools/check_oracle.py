"""Local replica of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.01; compare row count, column names,
and order-insensitive values.

Usage: python tools/check_oracle.py [--sf-dir /root/testdata/sf0.01] [--only name]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


EXACT_FLOATS = False


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # normalize -0.0 and represent at fixed precision (both sides pre-round)
        if v == 0:
            v = 0.0
        # --exact reproduces the driver's bit-level hash (full float repr);
        # default %.9g is the lenient mode that hid the round-1
        # quality_stats_lang mismatch
        return repr(v) if EXACT_FLOATS else f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append("\x1f".join(norm_cell(r[i]) for i in order))
    out.sort()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--exact", action="store_true",
                    help="compare floats at full precision (driver-strict)")
    args = ap.parse_args()
    global EXACT_FLOATS
    EXACT_FLOATS = args.exact

    import duckdb

    import __spark_entry__ as entry_mod
    from entity_resolution_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if args.only and name != args.only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, args.sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_sec = time.monotonic() - t0
        if name not in oracles:
            print(f"ROWS  {name}: rows={len(srows)} cols={scols} ({spark_sec:.1f}s) [no oracle]")
            if len(srows) == 0:
                print(f"  WARNING: zero rows for {name}")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        s_can = canon([tuple(r) for r in srows], scols)
        o_can = canon(orows, ocols)
        ok_vals = s_can == o_can
        status = "OK  " if (ok_cols and ok_count and ok_vals) else "FAIL"
        print(
            f"{status}  {name}: rows {len(srows)}/{len(orows)} cols={'ok' if ok_cols else (scols, ocols)}"
            f" values={'ok' if ok_vals else 'MISMATCH'} ({spark_sec:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            if ok_cols and not ok_vals:
                diff_s = [r for r in s_can if r not in set(o_can)][:3]
                diff_o = [r for r in o_can if r not in set(s_can)][:3]
                print(f"  spark-only: {diff_s}")
                print(f"  duck-only : {diff_o}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
