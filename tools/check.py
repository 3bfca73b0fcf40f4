"""Local replica of the driver's t2 correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over the
same parquet, then compares row count, column-name set, and the
order-insensitive multiset of type-tagged values — with both sides
materialized the way the driver does it (Spark rows through pandas
ns-datetimes, DuckDB through .df() so HUGEINT/DECIMAL->float64 coercions
are visible). A green here means the driver's value-hash matches.

Usage: python tools/check.py [key ...] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from base_etl_spark.compare import compare_strict  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--verbose", "-v", action="store_true")
    args = ap.parse_args()

    import duckdb

    from base_etl_spark import build_session, queries, oracle_sql

    qs, osql = queries(), oracle_sql()
    keys = args.keys or list(qs)
    unknown = [k for k in keys if k not in qs]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        return 2

    spark = build_session("check")
    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{args.sf}/{name}.parquet'"
        )

    n_pass = n_fail = n_rowsonly = 0
    for k in keys:
        t0 = time.time()
        try:
            sdf = qs[k](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {k}: spark error: {e}")
            n_fail += 1
            continue
        if k not in osql:
            print(f"rows  {k}: {len(srows)} rows (rows-only, {time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            duck_df = con.sql(osql[k]).df()
        except Exception as e:
            print(f"FAIL  {k}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare_strict(scols, srows, duck_df)
        if problems:
            print(f"FAIL  {k}: " + " | ".join(problems))
            if args.verbose:
                print("  spark sample:", srows[:3])
                print("  duck  sample:", duck_df.head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS  {k}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail / {len(keys)} keys")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
