"""Parallelism-invariance harness.

On a 1000-executor cluster the shuffle fan-out is whatever the cluster
gives you, not what local[32] gave the tests — so any result that
silently depends on partition count (order-dependent float accumulation
that a final round doesn't absorb, first()-style nondeterminism, rank
ties broken by scan order) is a latent wrong answer at scale. This tool
runs every declared key TWICE in one session with
spark.sql.shuffle.partitions flipped between a deliberately awkward
small prime and the standard count, and compares the two results as
order-insensitive type-tagged multisets (the driver's comparison). A
mismatch means the answer depends on parallelism — a bug no fixed-SF
oracle run can see, because both sides would be wrong together.

Usage: python tools/invariance_check.py [key ...] [--sf DIR] [--parts 3 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _multiset(scols: list[str], srows: list[tuple]):
    from base_etl_spark.compare import frame_to_multiset, spark_to_pandas

    return frame_to_multiset(spark_to_pandas(scols, srows))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--parts", nargs=2, type=int, default=[3, 32])
    args = ap.parse_args()

    from base_etl_spark import build_session, oracle_sql, queries

    qs = queries()
    keys = args.keys or list(oracle_sql())  # declared keys: deterministic contract
    spark = build_session("invariance")
    spark.sparkContext.setLogLevel("ERROR")

    n_pass = n_fail = 0
    for k in keys:
        results = []
        try:
            for parts in args.parts:
                spark.conf.set("spark.sql.shuffle.partitions", str(parts))
                t0 = time.time()
                sdf = qs[k](spark, args.sf)
                results.append((sdf.columns, [tuple(r) for r in sdf.collect()]))
        except Exception as e:
            print(f"CRASH {k}: {type(e).__name__}: {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        finally:
            spark.conf.set("spark.sql.shuffle.partitions",
                           os.environ.get("SPARK_GRAFT_CPUS", "32"))
        (c1, r1), (c2, r2) = results
        if c1 != c2:
            print(f"VARIES {k}: columns differ {c1} vs {c2}")
            n_fail += 1
        elif _multiset(c1, r1) != _multiset(c2, r2):
            print(f"VARIES {k}: result depends on shuffle partition count "
                  f"({args.parts[0]} vs {args.parts[1]}), {len(r1)}/{len(r2)} rows")
            n_fail += 1
        else:
            n_pass += 1
            print(f"PASS  {k} ({time.time() - t0:.1f}s)")
    print(f"\n{n_pass} invariant, {n_fail} varying/crash / {len(keys)} keys")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
