"""Advisor-style latent-divergence fuzzer.

The driver's fixtures are clean (no nulls, no short docs, no boundary
timestamps), so a key can be green at every SF while still crashing or
hash-diverging on realistic data — exactly the class of defect the r4
ADVICE items were (short-doc sequence() crash, floor-second session
gaps, empty pivot cells). This tool builds a PERTURBED copy of sf0.001
with those realistic edges injected, then runs every declared key's
Spark query AND DuckDB oracle on it and compares driver-strict. A
mismatch here is a latent bug the per-SF gates cannot see; a crash is a
latent outage.

Perturbations (seeded, deterministic):
- documents: empty/1-char/29/30/31-char texts, shared verbatim
  boilerplate across 3 docs, unicode text, single-token text, runs of
  spaces, a 10k-char doc; (wave 3) beyond-BMP 4-byte UTF-8 with
  ZWJ/skin-tone/regional-indicator sequences, combining-mark vs
  precomposed spellings (NFD vs NFC), RTL+LTR mix, and LF/CRLF/tab
  control whitespace — any byte/UTF-16-unit/code-point confusion in
  either engine diverges on these.
- events: one user with inter-event gaps exactly 1799.999999 s /
  1800.0 s / 1800.000001 s; duplicate (user_id, ts) pairs with distinct
  event_ids; events exactly ON hour boundaries; value = 0.0 and 1e9;
  (wave 3) props with interior JSON whitespace and an explicit JSON
  null, still honoring the {"k": int} contract; (wave 4) ZERO-VARIANCE
  cohorts — one user with 10 identical values at identical gaps, one
  with constant zero — every per-user spread denominator (z-score, MAD,
  autocorr, peak/anomaly, regression) degenerates to 0/0 on them.
- orders: a childless order (no lineitems), an order whose o_custkey
  references no customer, totalprice 0.0 and 1e7, orders exactly on the
  fixture's min/max date boundary.
- lineitem: an orphan line (no parent order), quantity 0/1/50 with
  discount 0.0 and 0.9, extendedprice 0.0, shipdate == orderdate.
- customer: a duplicate c_name under a new key, negative and zero
  account balances, customers with no orders.
- part: p_size 1 and 50, retailprice 0.0.
- embeddings: an all-zero vector (norm 0 — divides by zero in cosine)
  and a tiny-norm (1e-6) vector; (wave 5) exact-duplicate vector
  classes with interleaved ids (the collapsed dedup_embedding regime),
  one of them byte-distinct but PARALLEL to the tiny-norm vector —
  normalization-identical without being collapse-mergeable.
- optional --nulls: NULLs punched into nullable non-key columns
  (events.value, documents.lang/source, embeddings.label).

Usage: python tools/fuzz_check.py [--nulls] [key ...]
"""

from __future__ import annotations

import argparse
import datetime as dt
import glob
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC_SF = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FUZZ_SF = os.path.join(REPO, ".fuzz", "sffuzz")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _tpch_rows(name: str, with_nulls: bool) -> dict[str, list]:
    """Wave-2 perturbations for the relational tables (keys from
    2_000_000 up so they cannot collide with fixture keys)."""
    B = 2_000_000
    d = dt.datetime
    if name == "orders":
        return {
            # childless (no lineitems), boundary dates, orphan custkey,
            # zero and extreme totalprice
            "o_orderkey": [B, B + 1, B + 2, B + 3],
            "o_custkey": [7, B + 77, 11, 13],  # B+77 references nobody
            "o_orderstatus": ["O", "F", "P", "O"],
            "o_totalprice": [0.0, 1e7, 123.45, 0.01],
            "o_orderdate": [d(1995, 1, 1), d(2001, 8, 1),
                            d(1997, 6, 15), d(1997, 6, 15)],
            "o_orderpriority": ["3-MEDIUM", "1-URGENT", "5-LOW", "2-HIGH"],
        }
    if name == "lineitem":
        return {
            # B+100 is an orphan (no parent order); the rest attach to
            # existing order 10 with boundary qty/discount/price
            "l_orderkey": [B + 100, 10, 10, 10],
            "l_partkey": [1, 2, 3, 4],
            "l_suppkey": [1, 2, 3, 4],
            "l_linenumber": [901, 902, 903, 904],
            "l_quantity": [0.0, 1.0, 50.0, 7.0],
            "l_extendedprice": [0.0, 100.0, 5000.0, 250.25],
            "l_discount": [0.0, 0.9, 0.0, 0.05],
            "l_tax": [0.0, 0.0, 0.08, 0.0],
            "l_returnflag": ["N", "R", "A", "N"],
            "l_linestatus": ["O", "F", "F", "O"],
            "l_shipdate": [d(1997, 1, 1), d(1995, 1, 1),
                           d(2001, 8, 1), d(1997, 6, 15)],
        }
    if name == "customer":
        return {
            # duplicate c_name under a new key (fuzzy-join bait), zero
            # and negative balances, no orders for any of them
            "c_custkey": [B, B + 1, B + 2],
            "c_name": ["Customer#000000001", "Customer#002000001",
                       "Customer#002000002"],
            "c_nationkey": [0, 12, 24],
            "c_acctbal": [-999.99, 0.0, 9999.99],
            "c_mktsegment": ["BUILDING", "MACHINERY", "AUTOMOBILE"],
        }
    if name == "part":
        return {
            "p_partkey": [B, B + 1],
            "p_name": ["edge widget", "edge bolt"],
            "p_brand": ["Brand#13", "Brand#42"],
            "p_type": ["ECONOMY", "PROMO"],
            "p_size": [1, 50],
            "p_retailprice": [0.0, 1.0],
        }
    if name == "embeddings":
        # wave 5: exact-duplicate classes — the regime the collapsed
        # dedup_embedding path exists for. Class A: four byte-identical
        # copies of a constant vector, ids INTERLEAVED with class B so
        # rep expansion's least/greatest ordering is exercised. Class B:
        # two copies of a varied vector. Adversarial twist: class A's
        # constant vector is PARALLEL to the tiny-norm wave-1 vector
        # (identical after normalization, different bytes) — collapse
        # must NOT merge them, LSH must still pair them at cos 1.0.
        vec_b = [((i * 37) % 13 - 6) / 7.0 for i in range(64)]
        rows = {
            "vec_id": [B, B + 1, B + 10, B + 12, B + 11, B + 13, B + 14],
            "embedding": [
                [0.0] * 64, [1e-6] * 64,           # zero / tiny norm
                [0.25] * 64, vec_b, [0.25] * 64,   # A, B, A
                vec_b, [0.25] * 64,                # B, A
            ],
            "label": [0, 1, 2, 3, 2, 3, 2],
        }
        if with_nulls:
            rows["vec_id"].append(B + 2)
            rows["embedding"].append([0.5] * 64)
            rows["label"].append(None)
        return rows
    raise ValueError(name)


def build_fuzz_dir(with_nulls: bool) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    # Scope the wipe to OUR tier only: .fuzz/ is shared with
    # empty_check's sfempty/sfempty_facts/sfonerow dirs, and nuking the
    # parent mid-run destroyed a concurrent empty sweep's tables out
    # from under it (exit-gate empty stages failed PATH_NOT_FOUND,
    # round 6).
    shutil.rmtree(FUZZ_SF, ignore_errors=True)
    os.makedirs(FUZZ_SF)

    perturbed = ("documents", "events", "orders", "lineitem", "customer",
                 "part", "embeddings")
    for name in TABLES:
        src = os.path.join(SRC_SF, f"{name}.parquet")
        if name not in perturbed:
            shutil.copy(src, os.path.join(FUZZ_SF, f"{name}.parquet"))
            continue

        tbl = pq.read_table(src)
        if name in ("orders", "lineitem", "customer", "part", "embeddings"):
            rows = _tpch_rows(name, with_nulls)
            fields = {f.name: f.type for f in tbl.schema}
            extra = pa.table(
                {k: pa.array(v).cast(fields[k]) for k, v in rows.items()}
            )
            out = pa.concat_tables([tbl, extra.select(tbl.column_names)])
            pq.write_table(out, os.path.join(FUZZ_SF, f"{name}.parquet"))
            continue
        if name == "documents":
            base_id = 1_000_000
            langs = ["en", "de", "fr"]
            texts = [
                "",                                   # empty
                "a",                                  # 1 char
                "x" * 29,                             # just under the span window
                "y" * 30,                             # exactly the span window
                "z" * 31,                             # just over
                "All rights reserved. Terms apply.",  # boilerplate (3 copies)
                "All rights reserved. Terms apply.",
                "All rights reserved. Terms apply.",
                "héllo wörld ünïcode ﬁ ß — émoji-free but multibyte",
                "single_token",
                "double  space   runs    here",
                ("lorem ipsum dolor sit amet " * 400).strip(),  # ~10k chars
                # wave 3: beyond-BMP (4-byte UTF-8), ZWJ sequences,
                # skin-tone modifiers, regional-indicator pairs — any
                # byte/UTF-16-unit/code-point confusion diverges here
                "\U0001d11e clef \U0001f44d\U0001f3fd thumbs "
                "\U0001f1e9\U0001f1ea flag "
                "\U0001f468‍\U0001f469‍\U0001f467 family",
                # combining marks vs precomposed (NFD vs NFC spellings)
                "café naivë vs café naïve",
                # RTL scripts mixed with LTR
                "שלום hello عالم done",
                # control whitespace: LF, CRLF, tab, trailing space
                "line1\nline2\r\nline3\ttab end ",
            ]
            rows = {
                "doc_id": [base_id + i for i in range(len(texts))],
                "text": texts,
                "lang": [langs[i % 3] for i in range(len(texts))],
                "source": ["fuzz"] * len(texts),
                "n_chars": [len(s) for s in texts],
            }
            if with_nulls:
                rows["doc_id"] += [base_id + 100, base_id + 101]
                rows["text"] += ["null lang doc", "null source doc"]
                rows["lang"] += [None, "en"]
                rows["source"] += ["fuzz", None]
                rows["n_chars"] += [13, 15]
            extra = pa.table(
                {k: pa.array(v, type=tbl.schema.field(k).type) for k, v in rows.items()}
            )
            out = pa.concat_tables([tbl, extra.select(tbl.column_names)])
        else:  # events
            base_id = 1_000_000
            t0 = dt.datetime(2024, 3, 1, 12, 0, 0, 123456)
            us = dt.timedelta(microseconds=1)
            s = dt.timedelta(seconds=1)
            ev = []  # (event_id, ts, user_id, event_type, value, props)
            # user A: gaps straddling the 30-min boundary by one microsecond
            tA = t0
            ev.append((base_id + 0, tA, 900001, "view", 1.0, "{}"))
            tA = tA + 1800 * s - us   # 1799.999999 s -> same session
            ev.append((base_id + 1, tA, 900001, "click", 2.0, "{}"))
            tA = tA + 1800 * s        # exactly 1800 s -> same session (not >)
            ev.append((base_id + 2, tA, 900001, "view", 3.0, "{}"))
            tA = tA + 1800 * s + us   # 1800.000001 s -> NEW session
            ev.append((base_id + 3, tA, 900001, "purchase", 4.0, "{}"))
            # user B: duplicate (user_id, ts) with distinct event_ids
            tB = dt.datetime(2024, 3, 2, 9, 30, 15, 500000)
            ev.append((base_id + 10, tB, 900002, "view", 5.0, "{}"))
            ev.append((base_id + 11, tB, 900002, "click", 6.0, "{}"))
            ev.append((base_id + 12, tB, 900002, "view", 6.5, "{}"))
            # user C: events exactly ON hour boundaries (bucket edges)
            tC = dt.datetime(2024, 3, 3, 10, 0, 0, 0)
            ev.append((base_id + 20, tC, 900003, "view", 0.0, "{}"))
            ev.append((base_id + 21, tC + 3600 * s, 900003, "click", 1e9, "{}"))
            # user D: single event (bounce)
            ev.append((base_id + 30, dt.datetime(2024, 3, 4, 23, 59, 59, 999999),
                       900004, "error", 7.0, "{}"))
            # user E (wave 3): props still honors the {"k": int} contract
            # but exercises JSON-surface edges — interior whitespace and
            # an explicit JSON null — where get_json_object/from_json vs
            # json_extract/json_keys could disagree
            tE = dt.datetime(2024, 3, 6, 14, 0, 0, 777000)
            ev.append((base_id + 40, tE, 900006, "view", 1.5, '{ "k" : 7 }'))
            ev.append((base_id + 41, tE + 60 * s, 900006, "click", 2.5,
                       '{"k": null}'))
            # user F (wave 4): a ZERO-VARIANCE cohort — 10 events with
            # identical value AND identical inter-arrival gap. Every
            # per-user statistic that divides by an in-group spread
            # (z-score, MAD, autocorrelation, peak/anomaly thresholds,
            # regression slope) hits 0/0 here; Spark's non-ANSI division
            # yields NULL while DuckDB float math yields NaN or raises —
            # any engine that resolves the degenerate group differently
            # from its oracle diverges on this user.
            tF = dt.datetime(2024, 3, 7, 8, 0, 0, 0)
            for i in range(10):  # ids +60..69 (the nulls row takes +50)
                ev.append((base_id + 60 + i, tF + i * 3600 * s, 900007,
                           "view", 5.0, "{}"))
            # user G (wave 4): constant ZERO value — numerator and
            # denominator both degenerate (sum 0, mean 0, var 0).
            tG = dt.datetime(2024, 3, 8, 6, 30, 0, 250000)
            for i in range(6):
                ev.append((base_id + 80 + i, tG + i * 900 * s, 900008,
                           "view" if i % 2 == 0 else "click", 0.0, "{}"))
            cols = list(zip(*ev))
            rows = {
                "event_id": list(cols[0]),
                "ts": list(cols[1]),
                "user_id": list(cols[2]),
                "event_type": list(cols[3]),
                "value": list(cols[4]),
                "props": list(cols[5]),
            }
            if with_nulls:
                rows["event_id"] += [base_id + 50]
                rows["ts"] += [dt.datetime(2024, 3, 5, 8, 15, 0, 250000)]
                rows["user_id"] += [900005]
                rows["event_type"] += ["view"]
                rows["value"] += [None]
                rows["props"] += ["{}"]
            fields = {f.name: f.type for f in tbl.schema}
            import pyarrow as _pa

            ts_type = fields["ts"]
            arrays = {}
            for k, v in rows.items():
                if k == "ts":
                    arrays[k] = _pa.array(v).cast(ts_type)
                else:
                    arrays[k] = _pa.array(v, type=fields[k])
            extra = pa.table(arrays)
            out = pa.concat_tables([tbl, extra.select(tbl.column_names)])
        pq.write_table(out, os.path.join(FUZZ_SF, f"{name}.parquet"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="*")
    ap.add_argument("--nulls", action="store_true")
    args = ap.parse_args()

    build_fuzz_dir(args.nulls)

    import duckdb

    from base_etl_spark import build_session, oracle_sql, queries
    from base_etl_spark.compare import compare_strict

    qs, osql = queries(), oracle_sql()
    keys = args.keys or [k for k in qs if k in osql]
    spark = build_session("fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM '{FUZZ_SF}/{name}.parquet'"
        )

    n_pass = n_fail = 0
    for k in keys:
        t0 = time.time()
        try:
            sdf = qs[k](spark, FUZZ_SF)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"CRASH {k}: spark error: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if k not in osql:
            # rows-only key named explicitly: the checkable contract on
            # perturbed fixtures is "runs and returns a frame" (the
            # default sweep skips R keys; their invariants live in
            # tests/test_selfchecks.py).
            print(f"rows  {k}: {len(srows)} rows (rows-only, {time.time() - t0:.1f}s)")
            n_pass += 1
            continue
        try:
            odf = con.sql(osql[k]).df()
        except Exception as e:
            print(f"CRASH {k}: oracle error: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        problems = compare_strict(scols, srows, odf)
        if problems:
            print(f"DIVERGE {k}: {str(problems)[:300]}")
            n_fail += 1
        else:
            n_pass += 1
            print(f"PASS  {k} ({time.time() - t0:.1f}s)")
    print(f"\n{n_pass} pass, {n_fail} crash/diverge / {len(keys)} keys")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
