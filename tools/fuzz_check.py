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
  spaces, a 10k-char doc.
- events: one user with inter-event gaps exactly 1799.999999 s /
  1800.0 s / 1800.000001 s; duplicate (user_id, ts) pairs with distinct
  event_ids; events exactly ON hour boundaries; value = 0.0 and 1e9.
- optional --nulls: NULLs punched into nullable non-key columns
  (events.value, documents.lang/source).

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


def build_fuzz_dir(with_nulls: bool) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    shutil.rmtree(os.path.dirname(FUZZ_SF), ignore_errors=True)
    os.makedirs(FUZZ_SF)

    for name in TABLES:
        src = os.path.join(SRC_SF, f"{name}.parquet")
        if name not in ("documents", "events"):
            shutil.copy(src, os.path.join(FUZZ_SF, f"{name}.parquet"))
            continue

        tbl = pq.read_table(src)
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
                rows["event_id"] += [base_id + 40]
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
    main()
