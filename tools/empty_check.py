"""Empty-input robustness sweep: every key on 0-row tables.

At production scale, zero-row inputs are not an edge case — a
filter-everything predicate, an empty ingest partition, a date with no
events, or a tenant with no rows produces exactly this shape somewhere
in every large pipeline, and the r4 ADVICE round proved the class is
real here (text_boilerplate_spans crashed on any doc shorter than its
F.sequence lower bound). The per-SF gates and the row-perturbing fuzzer
(tools/fuzz_check.py) can never see it: their tables always have rows.

This tool builds ``.fuzz/sfempty`` — every fixture table as a 0-row
parquet file with the ORIGINAL schema (pyarrow schema read from
sf0.001, rows dropped) — then runs every declared key's Spark query AND
its DuckDB oracle on that tier and compares driver-strict. The contract
under test: on empty input an operator must return exactly what its
oracle returns (usually 0 rows, or one all-NULL/zero row for global
aggregates) — never raise.

Rows-only keys are executed for crash-freedom (count >= 0).

Usage: python tools/empty_check.py [key ...] [-v]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq  # noqa: E402

SRC_SF = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EMPTY_SF = os.path.join(REPO, ".fuzz", "sfempty")
EMPTY_FACTS_SF = os.path.join(REPO, ".fuzz", "sfempty_facts")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
# The mixed tier's fact/dim split: dimensions exist from day one of any
# deployment; what production actually produces is an EMPTY FACT
# PARTITION against populated dims (a holiday with no orders, an ingest
# gap, a filter that eliminated the day).
FACTS = ["orders", "lineitem", "events", "documents", "embeddings"]


def _build_dir(dst_dir: str, empty: set[str]) -> str:
    """Copy of the sf0.001 tier with the named tables truncated to 0
    rows, schema preserved bit-for-bit (taken from the parquet footers,
    so nanos-timestamp layouts and nullability flags survive)."""
    import shutil

    os.makedirs(dst_dir, exist_ok=True)
    for name in TABLES:
        dst = os.path.join(dst_dir, f"{name}.parquet")
        src = os.path.join(SRC_SF, f"{name}.parquet")
        if name in empty:
            tbl = pq.read_table(src)
            if (
                os.path.exists(dst)
                and pq.read_table(dst).schema.equals(tbl.schema)
                and pq.read_metadata(dst).num_rows == 0
            ):
                continue
            pq.write_table(tbl.slice(0, 0), dst)
        else:
            if (
                os.path.exists(dst)
                and os.path.getsize(dst) == os.path.getsize(src)
            ):
                continue
            shutil.copyfile(src, dst)
    return dst_dir


def build_empty_dir() -> str:
    """All-tables-empty tier."""
    return _build_dir(EMPTY_SF, set(TABLES))


def build_empty_facts_dir() -> str:
    """Facts-empty / dims-populated tier (the realistic mixed shape)."""
    return _build_dir(EMPTY_FACTS_SF, set(FACTS))


ONE_ROW_SF = os.path.join(REPO, ".fuzz", "sfonerow")


def build_one_row_dir() -> str:
    """Every table truncated to its FIRST row — the degenerate-statistics
    tier: sample variance of one point, regression over one x, 0/0
    ratios, windows of width one. NaN-vs-NULL and 0-vs-NULL divergences
    between engines live exactly here. (Cross-table keys generally won't
    match, so joins mostly go empty — that shape is covered by the empty
    tiers; this one targets single-group aggregates.)"""
    os.makedirs(ONE_ROW_SF, exist_ok=True)
    for name in TABLES:
        dst = os.path.join(ONE_ROW_SF, f"{name}.parquet")
        src = os.path.join(SRC_SF, f"{name}.parquet")
        tbl = pq.read_table(src)
        if (
            os.path.exists(dst)
            and pq.read_table(dst).schema.equals(tbl.schema)
            and pq.read_metadata(dst).num_rows == 1
        ):
            continue
        pq.write_table(tbl.slice(0, 1), dst)
    return ONE_ROW_SF


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*")
    ap.add_argument("--verbose", "-v", action="store_true")
    ap.add_argument(
        "--facts-only",
        action="store_true",
        help="empty only the fact tables; dims stay populated",
    )
    ap.add_argument(
        "--one-row",
        action="store_true",
        help="truncate every table to its first row instead of zero",
    )
    args = ap.parse_args()

    import duckdb

    from base_etl_spark import build_session, oracle_sql, queries
    from base_etl_spark.compare import compare_strict

    if args.one_row:
        sf = build_one_row_dir()
    elif args.facts_only:
        sf = build_empty_facts_dir()
    else:
        sf = build_empty_dir()
    qs, osql = queries(), oracle_sql()
    keys = args.keys or list(qs)
    unknown = [k for k in keys if k not in qs]
    if unknown:
        print(f"unknown keys: {unknown}", file=sys.stderr)
        return 2

    spark = build_session("empty-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{sf}/{name}.parquet'"
        )

    n_pass = n_fail = n_rowsonly = 0
    for k in keys:
        t0 = time.time()
        try:
            sdf = qs[k](spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {k}: spark error: {str(e)[:200]}")
            n_fail += 1
            continue
        if k not in osql:
            print(f"rows  {k}: {len(srows)} rows (rows-only, {time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            duck_df = con.sql(osql[k]).df()
        except Exception as e:
            print(f"FAIL  {k}: duckdb error: {str(e)[:200]}")
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
