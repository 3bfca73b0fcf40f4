"""Record local baseline anchors for bench queries with no BASELINE.md row.

The round-5 verdict flagged that five bench headliners (sim_topk,
dedup_minhash, q9_profit, q21_waiting, hybrid_rrf) had no "within 2x"
anchor, making the bench gate unfalsifiable for them. This tool measures,
on this machine at sf0.1, the same two columns the original baseline
table records:

- **DuckDB**: the key's oracle SQL (the cost of the answer in the
  in-process OLAP engine — a floor, not the gate).
- **PySpark first-cut**: the engine's query body under a STOCK session
  (shuffle.partitions=8, default 10 MB autoBroadcastJoinThreshold, AQE
  defaults) — the same untuned configuration the original first-cut
  rows used, isolating what the session tuning buys.

Prints a markdown table row per key (cold + warm) to paste into
BASELINE.md. Usage: python tools/record_baselines.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = [
    ("sim_topk", "sim_topk"),
    ("dedup_minhash", "dedup_near_minhash"),
    ("q9_profit", "join_q9_profit"),
    ("q21_waiting", "join_q21_waiting"),
    ("hybrid_rrf", "sim_hybrid_rrf"),
]

# round-8 additions (r7 VERDICT task 5): heaviest new LLM capstones.
# tokenizer_bpe_train is an R key (no oracle) — the DuckDB column is
# n/a for it; the anchor is the stock-session PySpark warm number.
KEYS_R8 = [
    ("dedup_spans", "dedup_spans"),
    ("bpe_train", "tokenizer_bpe_train"),
    ("matryoshka", "sim_recall_matryoshka"),
]

# round-8 continuation additions: the heaviest shapes of the session —
# the cross-source pair-tier rollup, the vocab^3 gram-attribution pass,
# and the corpus x centroid geometry scan.
KEYS_R8C = [
    ("source_matrix", "dedup_source_matrix"),
    ("ngram_novelty", "text_ngram_novelty"),
    ("silhouette", "sim_silhouette_label"),
]

# round-9 additions (r8 VERDICT task 5): the heaviest ROUND9_WINDOW
# shapes still without a 2x-gate anchor — the cluster-survivor policy
# (now on collapsed propagation), the global-ntile lift table, the
# two-codec-trip video kernel, and the multi-fact reconciliation gate.
KEYS_R9 = [
    ("quality_survivor", "dedup_quality_survivor"),
    ("decile_lift", "agg_decile_lift"),
    ("fps_downsample", "mm_video_fps_downsample"),
    ("reconciliation", "etl_reconciliation_gate"),
]

# round-10/11 additions (r10 VERDICT task 4): mm_image_png_decode is
# the heaviest r10 kernel (x100 amplification 7.26x — the largest in
# the r10 table) and had no anchor, making the 2x gate unfalsifiable
# for it; sink_ledger_census is the r11 exactly-once sink census,
# anchored at birth so it never ships unfalsifiable.
KEYS_R10 = [
    ("png_decode", "mm_image_png_decode"),
    ("ledger_census", "sink_ledger_census"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--r8", action="store_true",
        help="measure the round-8 capstone keys instead of the r6 five",
    )
    ap.add_argument(
        "--r8c", action="store_true",
        help="measure the round-8 continuation capstones",
    )
    ap.add_argument(
        "--r9", action="store_true",
        help="measure the round-9 unanchored heavies",
    )
    ap.add_argument(
        "--r10", action="store_true",
        help="measure the round-10/11 unanchored heavies",
    )
    args = ap.parse_args()
    keys = (
        KEYS_R10 if args.r10
        else KEYS_R9 if args.r9
        else KEYS_R8C if args.r8c
        else (KEYS_R8 if args.r8 else KEYS)
    )

    import duckdb

    from base_etl_spark import build_session, execute_fully, oracle_sql, queries

    con = duckdb.connect()
    for p in glob.glob(os.path.join(args.sf, "*.parquet")):
        name = os.path.basename(p).removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

    spark = build_session(
        "record_baselines",
        shuffle_partitions=8,
        extra_conf={
            # stock Spark broadcast threshold (the session default is a
            # tuned 64 MB); this is the untuned first-cut configuration
            "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = queries(), oracle_sql()

    print("| bench key | registry key | DuckDB | PySpark cold | PySpark warm | rows out |")
    print("|---|---|---:|---:|---:|---:|")
    for bench_key, reg_key in keys:
        dt = []
        for _ in range(2):
            if reg_key not in osql:  # R key: no oracle, no DuckDB column
                dt.append(float("nan"))
                break
            t0 = time.time()
            nrows = len(con.sql(osql[reg_key]).fetchall())
            dt.append(time.time() - t0)
        st = []
        for _ in range(2):
            t0 = time.time()
            # sink-forced like the DuckDB side's fetchall(): both sides
            # pay full materialization, the comparison is like-for-like
            execute_fully(qs[reg_key](spark, args.sf))
            st.append(time.time() - t0)
        nrows = qs[reg_key](spark, args.sf).count()
        print(
            f"| {bench_key} | {reg_key} | {min(dt):.3f} s | {st[0]:.2f} s "
            f"| {min(st):.2f} s | {nrows} |"
        )


if __name__ == "__main__":
    main()
