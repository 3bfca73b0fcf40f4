"""Amplified-scale stress bench: measured scaling curves, not guesses.

The standing caveat on every bench round (SURVEY §2.14/§2.15) is that
local[32] at sf0.1 mostly measures fixed overheads — the plan-shape
test suite is the 100×-scale evidence, but it is *structural*, not
*measured*. This tool adds the measured half: it builds an amplified
copy of sf0.1 (.derived/sfx{AMP}/) by concatenating AMP key-shifted
copies of each fact table — dims stay fixed, which is exactly the
100 TB shape (fact growth against a stable dimension universe):

- orders/lineitem: orderkeys offset by copy*1e9 — more orders from the
  SAME customers/parts/suppliers, so join fan-in per dim key grows.
- events: event_id offset by copy*1e9, user_id offset by copy*1e7 —
  user count scales, per-user session volume stays constant (the
  realistic shape; keeps per-key window state bounded).
- documents: doc_id offset by copy*1e9; copies >0 get a 3-char prefix
  so the corpus isn't pathologically 100% exact-duplicated (base-corpus
  duplicates remain, so dedup still has real work).
- embeddings: vec_id offset by copy*1e9, vectors unchanged.

Then every headline bench key runs at 1× and AMP×, and the tool reports
sec, rows, and the time ratio per key. A healthy distributed plan shows
time ratio ≲ max(AMP, output growth): fixed overheads amortize, and an
operator whose OUTPUT grows faster than its input (pair-emitting dedup
on a duplicate-dense corpus) is allowed to take proportionally longer —
the full-surface ×10 sweep measured the dedup family's per-emitted-pair
cost FALLING while total time grew 11-34× against ~100-1000× more pairs.
A key is flagged superlinear only when time outgrows BOTH the data amp
AND the output growth — that shape means a shuffle, window, or
pair-expansion that does not scale, to investigate before it becomes
the 100 TB bottleneck.

PAIR_TIER_KEYS lists the declared exceptions: keys whose docstrings
declare the exact all-pairs tier (inverted-index shingle Jaccard or
LSH-bucket verify) as their semantics, where internal work is
quadratic in duplicate DENSITY by contract even when the final report
is tiny (etl_split_leakage emits 6 rows off ~250k internal pairs).
Their scale path is the minhash banding tier (measured 3.9× at ×10 on
the same corpus); each such excusal is printed loudly, never silent.

Usage: python tools/scale_stress.py [--amp 10] [--base /root/testdata/sf0.1] [key ...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIMS = ["region", "nation", "customer", "supplier", "part"]
FACTS = ["orders", "lineitem", "events", "documents", "embeddings"]
KEY_OFF = 10**9  # per-copy offset for synthetic surrogate keys
USER_OFF = 10**7  # events.user_id: grow the user universe per copy

# Keys whose declared semantics are the exact all-pairs tier: internal
# candidate pairs grow quadratically with duplicate density by contract
# (each doc's near-dup group of size g contributes g*(g-1)/2 pairs), so
# wall time tracks the pair count, not the input rows — even when the
# final report is a handful of summary rows. The scale path for these
# is the minhash banding tier; the excusal is printed per key.
PAIR_TIER_KEYS = {
    "dedup_near_jaccard", "dedup_containment", "dedup_embedding",
    "etl_split_leakage", "corpus_pipeline_report", "text_contamination",
    # 5-row report, but its input IS dedup_embedding's pair set at the
    # loosest theta — pair-tier cost by contract (the exact-dup
    # collapse bounds candidate work; the counted expansion still grows
    # with duplicate density).
    "dedup_threshold_sweep",
    # composite whose near-dup STAGE reuses the inverted-index shingle
    # pair join (llm_dedup._shingle_jaccard_pairs — the exact all-pairs
    # tier); its docstring declares minhash LSH as that stage's scale
    # tier. Flagged x15.71 at x10 in the first sink-forced full sweep
    # (r6) — pair growth, not a plan defect.
    "etl_corpus_clean",
    # UN-EXCUSED r9 (r8 VERDICT task 2): dedup_clusters,
    # dedup_cluster_sizes, dedup_quality_survivor and
    # etl_split_cluster_safe now run min-label propagation over
    # exact-dup-COLLAPSED representatives
    # (llm_dedup.collapsed_cluster_labels) and the split's leak count is
    # rep-bounded — all four complete x30 under the default 8g heap with
    # sub-amp ratios (x3.42 / x9.59 / x6.79 / x12.33, measured
    # 2026-08-16; the old full-graph propagation GC-thrashed 24g).
}

# Declared-iterative keys: per-round driver work is bounded (k-row
# centroid collect / one scalar delta), but ROUND COUNT is data-dependent
# — an amplified-tier ratio must be judged as rounds x per-round cost,
# not flat data growth. The operators record their converged round count
# in base_etl_spark.iterstats; the report carries it per tier, and a
# time ratio above amp is excused LOUDLY when the round growth accounts
# for it (time_ratio <= amp x round_ratio), else flagged superlinear.
ITERATIVE_KEYS = {"cluster_kmeans", "graph_pagerank"}

# default keys: the bench.py headline set (registry keys) + the two
# iterative operators (round-count telemetry, see ITERATIVE_KEYS)
DEFAULT_KEYS = [
    "agg_pricing", "topk_orders", "join_star_q5", "win_topk_per_group",
    "stream_tumbling", "text_stats", "dedup_exact", "json_extract",
    "sim_topk", "dedup_near_minhash", "join_q9_profit", "join_q21_waiting",
    "sim_hybrid_rrf", "cluster_kmeans", "graph_pagerank",
]


def build_amplified(base: str, amp: int, out_dir: str) -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    for name in DIMS:
        shutil.copy(os.path.join(base, f"{name}.parquet"),
                    os.path.join(out_dir, f"{name}.parquet"))
    for name in FACTS:
        tbl = pq.read_table(os.path.join(base, f"{name}.parquet"))
        copies = []
        for i in range(amp):
            t = tbl
            if name == "orders":
                t = t.set_column(t.schema.get_field_index("o_orderkey"),
                                 "o_orderkey",
                                 pc.add(t["o_orderkey"], i * KEY_OFF))
            elif name == "lineitem":
                t = t.set_column(t.schema.get_field_index("l_orderkey"),
                                 "l_orderkey",
                                 pc.add(t["l_orderkey"], i * KEY_OFF))
            elif name == "events":
                t = t.set_column(t.schema.get_field_index("event_id"),
                                 "event_id",
                                 pc.add(t["event_id"], i * KEY_OFF))
                t = t.set_column(t.schema.get_field_index("user_id"),
                                 "user_id",
                                 pc.add(t["user_id"], i * USER_OFF))
            elif name == "documents":
                t = t.set_column(t.schema.get_field_index("doc_id"),
                                 "doc_id",
                                 pc.add(t["doc_id"], i * KEY_OFF))
                if i > 0:
                    prefixed = pc.binary_join_element_wise(
                        pa.array([f"c{i % 10}"] * len(t), pa.string()),
                        pc.cast(t["text"], pa.string()), " ")
                    t = t.set_column(t.schema.get_field_index("text"),
                                     "text", pc.cast(prefixed, t.schema.field("text").type))
                    # keep the n_chars derived column consistent
                    t = t.set_column(t.schema.get_field_index("n_chars"),
                                     "n_chars",
                                     pc.cast(pc.utf8_length(t["text"]), pa.int64()))
            elif name == "embeddings":
                t = t.set_column(t.schema.get_field_index("vec_id"),
                                 "vec_id",
                                 pc.add(t["vec_id"], i * KEY_OFF))
            copies.append(t)
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(out_dir, f"{name}.parquet"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*")
    ap.add_argument("--amp", type=int, default=10)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo, ".derived", f"sfx{args.amp}")
    if args.rebuild:
        shutil.rmtree(out_dir, ignore_errors=True)
    if not os.path.exists(os.path.join(out_dir, "embeddings.parquet")):
        t0 = time.time()
        build_amplified(args.base, args.amp, out_dir)
        print(f"# built {out_dir} in {time.time() - t0:.1f}s", file=sys.stderr)

    from base_etl_spark import build_session, execute_fully, queries

    spark = build_session(
        "scale_stress", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    keys = args.keys or DEFAULT_KEYS

    from base_etl_spark.iterstats import ITER_ROUNDS

    report = {}
    for k in keys:
        row = {}
        for tag, sf_dir in (("base", args.base), (f"x{args.amp}", out_dir)):
            best, n = float("inf"), -1
            runs = 2 if k not in ITERATIVE_KEYS else 1  # iterative: one
            # run is enough (round count dominates; cold/warm delta is
            # per-round session overhead already amortized over rounds)
            for _ in range(runs):
                t0 = time.time()
                # noop sink, not count(): count() let Catalyst DROP the
                # dedup_threshold_sweep pair subtree (unique-key left
                # join elimination) — its x30 "2.4s" was ~30x under-timed
                execute_fully(qs[k](spark, sf_dir))
                best = min(best, time.time() - t0)
            n = qs[k](spark, sf_dir).count()  # rows reported, untimed
            row[tag] = {"sec": round(best, 3), "rows": n}
            if k in ITER_ROUNDS:
                row[tag]["rounds"] = ITER_ROUNDS.pop(k)
        ratio = row[f"x{args.amp}"]["sec"] / max(row["base"]["sec"], 1e-9)
        row["time_ratio"] = round(ratio, 2)
        row["rows_ratio"] = round(
            row[f"x{args.amp}"]["rows"] / max(row["base"]["rows"], 1), 2)
        report[k] = row
        extra = ""
        if "rounds" in row["base"]:
            extra = (f", rounds {row['base']['rounds']} -> "
                     f"{row[f'x{args.amp}']['rounds']}")
        print(f"# {k}: {row['base']['sec']}s -> {row[f'x{args.amp}']['sec']}s "
              f"(x{row['time_ratio']}, rows {row['base']['rows']} -> "
              f"{row[f'x{args.amp}']['rows']}{extra})", file=sys.stderr)

    print(json.dumps({"metric": "scale_stress", "amp": args.amp,
                      "queries": report}))
    worst = max(report.values(), key=lambda r: r["time_ratio"])
    superlinear = []
    for k, r in report.items():
        if r["time_ratio"] <= max(args.amp, r["rows_ratio"]):
            continue  # time bounded by data growth or by output growth
        if k in PAIR_TIER_KEYS:
            print(f"# EXCUSED {k}: time x{r['time_ratio']} > amp {args.amp}, "
                  f"but this key's declared semantics are the exact "
                  f"all-pairs tier (work ~ duplicate-density^2; scale "
                  f"path = minhash banding)", file=sys.stderr)
            continue
        if k in ITERATIVE_KEYS and "rounds" in r["base"]:
            round_ratio = r[f"x{args.amp}"]["rounds"] / max(r["base"]["rounds"], 1)
            if r["time_ratio"] <= args.amp * round_ratio:
                print(f"# EXCUSED {k}: time x{r['time_ratio']} > amp "
                      f"{args.amp}, accounted for by round growth "
                      f"{r['base']['rounds']} -> {r[f'x{args.amp}']['rounds']} "
                      f"(iterative: wall time ~ rounds x per-round data)",
                      file=sys.stderr)
                continue
        superlinear.append(k)
    print(f"# worst ratio {worst['time_ratio']}; "
          f"superlinear keys: {superlinear or 'none'}", file=sys.stderr)
    return 1 if superlinear else 0


if __name__ == "__main__":
    sys.exit(main())
