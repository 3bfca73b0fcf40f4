"""A/B: does Spark's RUNTIME BLOOM FILTER injection pay on the selective
fact-fact join shape at mid scale?

Spark ≥3.4 can inject a bloom filter built from a shuffle join's
SELECTIVE side into the other side's scan (InjectRuntimeFilter), cutting
shuffle bytes before the join. Injection is gated by SQLConf thresholds
— notably applicationSideScanSizeThreshold (default 10GB), which local
fixtures never reach, so the engine's sessions run the STOCK defaults
and this tool exists to answer: if the gate were open (as it would be
against a 100 TB fact), does the filter help or hurt this engine's
canonical shape?

Shape under test: orders filtered to one priority × one year (~4%
selectivity) joined to lineitem on orderkey, grouped to a 3-row report.
Injection additionally requires a SHUFFLE join (verified by probe: with
the session's 64 MB dim-broadcast threshold the selective side
broadcasts and Spark rightly skips the filter — under a broadcast join
the fact side never shuffles, so there is nothing for a bloom to save).
The regime being modeled is the 100 TB one where BOTH sides are too big
to broadcast, so the bloom variants run with broadcast disabled
(autoBroadcastJoinThreshold=-1, both static and adaptive), plus a
broadcast_ref row under stock session confs for honest context at THIS
fixture scale. Variants (all dynamic SQLConf — one session, set/reset
per run):

  broadcast_ref — stock session confs: the 64 MB threshold broadcasts
                  the selective side (fixture-scale winner)
  shuffle_bloom_off — broadcast disabled, runtime.bloomFilter.enabled=
                  false: the plain fact-fact shuffle join
  shuffle_bloom_on  — broadcast disabled + applicationSideScanSize
                  Threshold=0 + creation threshold raised: injection ON
                  (plan asserted to contain might_contain)

Timing through the no-op sink (execute_fully — see session.py on why
count() lies); cold run discarded, best-of-2 warm reported. One JSON
line at the end; also verifies bloom_on/off produce identical results.

Usage: python tools/bloom_ab.py [--dir .derived/sfx30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_NO_BCAST = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}

_BLOOM_CONFS = {
    "broadcast_ref": {},
    "shuffle_bloom_off": {
        **_NO_BCAST,
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "false",
    },
    "shuffle_bloom_on": {
        **_NO_BCAST,
        # creation-side gate compares against the PLAN SIZE ESTIMATE,
        # which without CBO column stats is the unfiltered scan size —
        # raise it well past the amplified orders estimate
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "8GB",
    },
}


def _shape(spark, sf_dir):
    from pyspark.sql import functions as F

    from base_etl_spark.io import load_tables

    t = load_tables(spark, sf_dir)
    sel = t.orders.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-01-01"))
    )
    return (
        sel.join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=".derived/sfx30")
    args = ap.parse_args()

    from base_etl_spark.session import build_session, execute_fully

    spark = build_session("bloom_ab")
    base = {
        k: spark.conf.get(k, None)
        for variant in _BLOOM_CONFS.values()
        for k in variant
    }
    report: dict = {"dir": args.dir, "variants": {}}
    results: dict[str, list] = {}
    for name, confs in _BLOOM_CONFS.items():
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            df = _shape(spark, args.dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            injected = "might_contain" in plan or "bloomfilter" in plan.lower()
            # fail fast instead of silently timing two identical plans:
            # the A/B is meaningless if the forced variant didn't inject
            if name == "shuffle_bloom_on" and not injected:
                raise RuntimeError(
                    "shuffle_bloom_on produced no bloom filter in the plan "
                    "— conf names or injection gates changed; A/B invalid"
                )
            # cold run doubles as the identity capture (collect equally
            # warms the page cache; saves a 4th execution per variant)
            results[name] = sorted((tuple(r) for r in df.collect()), key=str)
            times = []
            for _ in range(2):
                t0 = time.time()
                execute_fully(_shape(spark, args.dir))
                times.append(round(time.time() - t0, 3))
            report["variants"][name] = {
                "warm_best": min(times),
                "warm_runs": times,
                "bloom_in_plan": injected,
            }
            print(f"{name}: warm_best={min(times)}s bloom_in_plan={injected}",
                  flush=True)
        finally:
            for k in confs:
                if base[k] is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, base[k])
    report["results_identical"] = len({str(v) for v in results.values()}) == 1
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
