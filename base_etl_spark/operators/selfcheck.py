"""selfcheck_battery: driver-visible correctness for the rows-only tier.

The 34 R keys (hash-seeded sketches, iterative fixed points, FFT/float
kernels, UDF surface demos) are exact-oracle-free BY DESIGN, so the
driver's CORRECTNESS artifact records `no_oracle` for them forever —
their binding invariants lived only in tests/test_selfchecks.py (the
r9 VERDICT called that a missing *signal*, task 2). This module lifts
one binding predicate per R key into a DISTRIBUTED evaluation and
emits one `(key, check_name, passed)` row per R key, hash-checked
against an all-true SQL literal: if any self-check breaks — an HLL
estimate leaves its envelope, KMV drifts past tolerance, the CMS
one-sided law inverts, k-means stops being a Lloyd fixed point, a BPE
merge table loses its argmax property — the driver's hash row for THIS
key fails, making R-tier correctness driver-visible.

Design rules:
- Every predicate is evaluated Spark-side (joins + aggregates over the
  R key's output and, where needed, an exact twin recomputed from the
  base tables). Only the final per-check boolean (1 row) is read on
  the driver — the bounded-driver-materialization class.
- Checks are evaluated EAGERLY, one small job per check, and the
  battery returns a literal frame of the collected booleans. The
  alternative — one lazy union of 34 subplans, several of which are
  themselves iterative (k-means, pagerank, BPE, PCA power) — would
  compile a monster plan and make a failure unattributable; per-check
  jobs keep each predicate's plan exactly what its parent key already
  runs plus one aggregate.
- Every predicate is VACUOUSLY TRUE on empty input (bool_and over zero
  rows coalesces to true; existence assertions are conditioned on the
  source table being non-empty), so the empty-input and empty-facts
  strict sweeps compare clean against the same all-true oracle.

Scale: the battery's cost and scale story are its parents' — each R
key is measured individually in the x10/x30/x100 stress tiers; the
battery adds one aggregation pass per parent and no new shuffle shape.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from base_etl_spark.io import Tables
from base_etl_spark.registry import REGISTRY, query

# (key, check_name) in output order — the oracle literal is generated
# from this list, so adding a check here keeps both sides in lockstep.
_CHECKS: list[tuple[str, str]] = [
    ("agg_approx_distinct", "within_5pct_of_exact"),
    ("agg_approx_quantile", "within_2pct_of_exact"),
    ("agg_approx_top_k", "counts_exact_and_valid_top10"),
    ("agg_decile_lift_approx", "equals_exact_twin"),
    ("agg_freq_items", "superset_of_heavy_hitters"),
    ("agg_hll_native", "within_5pct_envelope"),
    ("cluster_kmeans", "lloyd_fixed_point"),
    ("dedup_bucket_stats", "pair_census_consistent"),
    ("dedup_minhash_estimate", "binomial_error_bound"),
    ("dedup_simhash", "ordered_pairs_hamming_le_3"),
    ("embedding_pca_power", "unit_norm_converged"),
    ("etl_file_stats", "census_matches_orders"),
    ("events_markov_stationary", "stationary_fixed_point"),
    ("graph_k_core", "core_degree_invariants"),
    ("graph_pagerank", "mass_count_and_floor"),
    ("mm_audio_spectral_centroid", "synthesis_contract_and_bounds"),
    ("mm_image_phash", "hash_class_consistency"),
    ("sample_poisson_bootstrap", "ci_brackets_point_mean"),
    ("scan_binary_files", "covers_every_table"),
    ("sim_ivf_nprobe_sweep", "monotone_exact_at_full_scan"),
    ("sim_mmr_rerank", "greedy_structure_and_top1"),
    ("sim_pq_quantize", "census_and_training_gain"),
    ("sim_topk_ivf", "recall_floor_vs_brute_force"),
    ("sim_topk_ivfpq", "rank_structure_adc_monotone"),
    ("sim_topk_pq", "rank_structure_adc_monotone"),
    ("sketch_cms_freq", "one_sided_error_law"),
    ("sketch_hll_overlap", "tracks_exact_retention"),
    ("sketch_hll_rollup", "within_5pct_of_exact"),
    ("sketch_kmv_distinct", "exact_tier_or_25pct"),
    ("stream_late_data", "windows_at_watermark_horizon"),
    ("text_compress_ratio", "bounds_and_completeness"),
    ("tokenizer_bpe_apply", "recount_parity"),
    ("tokenizer_bpe_train", "merge_ranks_and_first_argmax"),
    ("udtf_python", "equals_expression_twin"),
]


def _battery_oracle() -> str:
    rows = ",\n        ".join(
        f"('{k}', '{c}', true)" for k, c in _CHECKS
    )
    return f"""
    SELECT * FROM (VALUES
        {rows}
    ) AS t(key, check_name, passed)
    """


def _frame(key: str, t: Tables) -> DataFrame:
    """The R key's output frame, built from the same Tables."""
    return REGISTRY[key].fn.tables_fn(t)


def _all(df: DataFrame, cond) -> bool:
    """bool_and(cond) over df, vacuously true on zero rows."""
    row = df.agg(F.coalesce(F.bool_and(cond), F.lit(True)).alias("ok")).first()
    return bool(row.ok)


def _scalar(df: DataFrame, expr, default=None):
    v = df.agg(expr.alias("v")).first().v
    return default if v is None else v


# ---------------------------------------------------------------- checks

def _chk_approx_distinct(t: Tables) -> bool:
    got = _frame("agg_approx_distinct", t)
    exact = t.events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n")
    )
    j = got.join(exact, "event_type", "full")
    return _all(
        j,
        F.col("n_users_approx").isNotNull()
        & F.col("n").isNotNull()
        & (F.abs(F.col("n_users_approx") - F.col("n"))
           <= F.greatest(F.lit(1.0), 0.05 * F.col("n"))),
    )


def _chk_approx_quantile(t: Tables) -> bool:
    got = _frame("agg_approx_quantile", t)
    exact = t.orders.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
    )
    j = got.join(exact, "o_orderstatus", "full")
    tol = lambda e: 0.02 * F.greatest(F.abs(e), F.lit(1e-9))  # noqa: E731
    return _all(
        j,
        F.col("p50_approx").isNotNull() & F.col("p50").isNotNull()
        & (F.abs(F.col("p50_approx") - F.col("p50")) <= tol(F.col("p50")))
        & (F.abs(F.col("p90_approx") - F.col("p90")) <= tol(F.col("p90"))),
    )


def _chk_approx_top_k(t: Tables) -> bool:
    got = _frame("agg_approx_top_k", t)
    exact = t.lineitem.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    counts_exact = _all(
        got.join(exact, "l_partkey", "left"),
        F.col("n").isNotNull() & (F.col("n_lines") == F.col("n")),
    )
    # the 10th-largest exact count bounds every returned count below
    kth = exact.orderBy(F.desc("n"), "l_partkey").limit(10).agg(
        F.min("n").alias("kth")
    )
    valid_topk = _all(
        got.crossJoin(F.broadcast(kth)), F.col("n_lines") >= F.col("kth")
    )
    n_got = got.count()
    n_src = t.lineitem.count()
    complete = n_got == (0 if n_src == 0 else min(10, exact.count()))
    return counts_exact and valid_topk and complete


def _chk_decile_lift_approx(t: Tables) -> bool:
    # NOT exact-twin equality: on perturbed data (duplicate boundary
    # scores) GK tie handling may legitimately split a decile edge
    # differently from exact percentile even at small n — the universal
    # contract is conservation + the GK rank-error bucket bound (the
    # same two invariants test_decile_lift_approx pins; equality itself
    # is fixture-pinned there).
    a = _frame("agg_decile_lift_approx", t)
    e = REGISTRY["agg_decile_lift"].fn.tables_fn(t)
    sums = lambda df: df.agg(  # noqa: E731
        F.coalesce(F.sum("n_cust"), F.lit(0)).alias("nc"),
        F.coalesce(F.sum("n_resp"), F.lit(0)).alias("nr"),
    ).first()
    sa, se = sums(a), sums(e)
    if (sa.nc, sa.nr) != (se.nc, se.nr):
        return False
    total = sa.nc
    bound = total / 10 + max(2.0, 2 * total / 10000)
    in_row = _all(
        a,
        F.col("decile").between(1, 10) & (F.col("n_cust") <= bound)
        & (F.col("n_resp") <= F.col("n_cust")),
    )
    distinct = a.select("decile").distinct().count() == a.count()
    return in_row and distinct


def _chk_freq_items(t: Tables) -> bool:
    got = _frame("agg_freq_items", t)
    total = t.orders.count()
    if total == 0:
        return True
    heavy = (
        t.orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 0.15 * total)
    )
    missing = heavy.join(
        got, heavy.o_orderpriority == got.frequent_item, "left_anti"
    ).count()
    return missing == 0


def _chk_hll_native(t: Tables) -> bool:
    got = _frame("agg_hll_native", t)
    per = t.events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n")
    )
    # the ALL row exists even on an empty corpus (global agg -> 1 row
    # with est 0), so the exact twin keeps its n=0 ALL row too
    total = t.events.agg(
        F.lit("ALL").alias("event_type"),
        F.countDistinct("user_id").cast("long").alias("n"),
    )
    j = got.join(per.unionByName(total), "event_type", "full")
    return _all(
        j,
        F.col("n_users_est").isNotNull() & F.col("n").isNotNull()
        & (F.abs(F.col("n_users_est") - F.col("n"))
           <= F.greatest(F.lit(2.0), 0.05 * F.col("n"))),
    )


def _chk_kmeans(t: Tables) -> bool:
    out = _frame("cluster_kmeans", t)
    emb = t.embeddings.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    joined = out.join(emb, "vec_id")
    # completeness: one assignment per vector
    n_emb = t.embeddings.count()
    if out.count() != n_emb or out.select("vec_id").distinct().count() != n_emb:
        return False
    if n_emb == 0:
        return True
    # recompute centroids as means of the returned clusters
    ex = joined.select("cluster_id", F.posexplode("v").alias("i", "x"))
    cents = (
        ex.groupBy("cluster_id", "i").agg(F.avg("x").alias("c"))
        .groupBy("cluster_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "c"))), lambda s: s.c
            ).alias("cv")
        )
    )
    dist_to = lambda a, b: F.sqrt(  # noqa: E731
        F.aggregate(
            F.zip_with(a, b, lambda p, q: (p - q) * (p - q)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    scored = joined.crossJoin(
        F.broadcast(cents.withColumnRenamed("cluster_id", "cid"))
    ).select(
        "vec_id", "cluster_id", "dist",
        F.col("cid"), dist_to(F.col("v"), F.col("cv")).alias("d"),
    )
    best = scored.groupBy("vec_id", "cluster_id", "dist").agg(
        F.min(F.struct("d", "cid")).alias("best"),
        F.min(F.when(F.col("cid") == F.col("cluster_id"), F.col("d"))).alias(
            "d_assigned"
        ),
    )
    # stable under one more Lloyd step (ties by cluster id, matching the
    # operator's struct-ordering tie-break), and the reported dist is the
    # true L2 to the recomputed centroid
    return _all(
        best,
        (F.col("d_assigned") <= F.col("best.d") + 1e-4)
        & (F.abs(F.col("dist") - F.col("d_assigned")) < 1e-3),
    )


def _chk_bucket_stats(t: Tables) -> bool:
    from base_etl_spark.operators.llm_dedup import BUCKET_CAP

    got = _frame("dedup_bucket_stats", t)
    pairs_of = lambda n: (n * (n - 1) / 2).cast("long")  # noqa: E731
    return _all(
        got,
        (F.col("n_multi_buckets") >= 1)
        & (F.col("max_bucket") >= 2)
        & (F.col("n_pairs") >= pairs_of(F.col("max_bucket")))
        & (F.col("n_pairs")
           <= F.col("n_multi_buckets") * pairs_of(F.col("max_bucket")))
        & (F.col("n_overflow") <= F.col("n_multi_buckets"))
        & ((F.col("n_overflow") == 0) == (F.col("max_bucket") <= BUCKET_CAP)),
    )


def _chk_minhash_estimate(t: Tables) -> bool:
    got = _frame("dedup_minhash_estimate", t)
    j = F.col("jaccard_exact")
    se = F.sqrt(F.greatest(j * (1 - j), F.lit(1e-9)) / 32)
    per_row = _all(
        got,
        j.isNull()
        | (F.abs(F.col("jaccard_est") - j) <= 4 * se + 1.0 / 32 + 1e-6),
    )
    bias = _scalar(
        got.filter(j.isNotNull()),
        F.avg(F.col("jaccard_est") - j),
        default=0.0,
    )
    return per_row and abs(bias) < 0.1


def _chk_simhash(t: Tables) -> bool:
    got = _frame("dedup_simhash", t)
    return _all(
        got, (F.col("doc_a") < F.col("doc_b")) & (F.col("hamming") <= 3)
    )


def _chk_pca_power(t: Tables) -> bool:
    got = _frame("embedding_pca_power", t)
    n_rows = got.count()
    if n_rows == 0:
        return True
    dim = _scalar(t.embeddings, F.max(F.size("embedding")), default=0)
    if n_rows != dim:
        return False
    norm_sq = _scalar(got, F.sum(F.col("loading") * F.col("loading")))
    # loadings are 6dp-rounded; 64 dims of rounding noise stay << 1e-3
    unit = abs(norm_sq - 1.0) < 1e-3
    bounded = _all(
        got,
        (F.col("eigenvalue") >= 0)
        & (F.col("explained_share") >= 0)
        & (F.col("explained_share") <= 1.0 + 1e-6)
        & (F.col("conv_delta") < 0.05),
    )
    return unit and bounded


def _chk_file_stats(t: Tables) -> bool:
    got = _frame("etl_file_stats", t)
    s = got.agg(
        F.coalesce(F.sum("n_rows"), F.lit(0)).alias("rows"),
        F.min("min_key").alias("lo"),
        F.max("max_key").alias("hi"),
        F.count(F.lit(1)).alias("nf"),
        F.coalesce(F.max("file_ord"), F.lit(0)).alias("mo"),
        F.countDistinct("file_ord").alias("no"),
    )
    o = t.orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("o_orderkey").alias("olo"),
        F.max("o_orderkey").alias("ohi"),
    )
    shape = _all(
        s.crossJoin(o),
        (F.col("rows") == F.col("n"))
        & ((F.col("nf") == 0)
           | (F.col("lo").eqNullSafe(F.col("olo"))
              & F.col("hi").eqNullSafe(F.col("ohi"))
              & (F.col("mo") == F.col("nf"))
              & (F.col("no") == F.col("nf")))),
    )
    per_file = _all(got, (F.col("n_rows") > 0) & (F.col("file_bytes") > 0))
    return shape and per_file


def _chk_markov(t: Tables) -> bool:
    pi = _frame("events_markov_stationary", t).select(
        "event_type", "stationary_p"
    )
    k = pi.count()
    if k == 0:
        return True
    simplex = abs(_scalar(pi, F.sum("stationary_p"), default=0.0) - 1.0) < 1e-6
    pm = REGISTRY["events_transition_matrix"].fn.tables_fn(t).select(
        "prev", "curr", "n_transitions"
    )
    rs = pm.groupBy("prev").agg(F.sum("n_transitions").alias("rs"))
    p = pm.join(rs, "prev").select(
        "prev", "curr", (F.col("n_transitions") / F.col("rs")).alias("p")
    )
    pi_prev = pi.select(
        F.col("event_type").alias("prev"), F.col("stationary_p").alias("pp")
    )
    mass = (
        p.join(pi_prev, "prev")
        .groupBy(F.col("curr").alias("event_type"))
        .agg(F.sum(F.col("pp") * F.col("p")).alias("m"))
    )
    # dangling states (no outgoing transitions) redistribute uniformly
    dang = pi_prev.join(rs, "prev", "left_anti").agg(
        F.coalesce(F.sum("pp"), F.lit(0.0)).alias("dm")
    )
    nxt = (
        pi.join(mass, "event_type", "left")
        .crossJoin(F.broadcast(dang))
        .select(
            "event_type", "stationary_p",
            (F.coalesce(F.col("m"), F.lit(0.0)) + F.col("dm") / k).alias("nxt"),
        )
    )
    fixed = _all(nxt, F.abs(F.col("nxt") - F.col("stationary_p")) < 1e-6)
    return simplex and fixed


def _chk_k_core(t: Tables) -> bool:
    got = _frame("graph_k_core", t)
    return _all(
        got,
        (F.col("rounds") >= 0)
        & (((F.col("n_nodes") == 0) & (F.col("n_edges") == 0))
           | ((2 * F.col("n_edges") >= F.col("n_nodes") * F.col("k"))
              & (F.col("n_nodes") > F.col("k")))),
    )


def _chk_pagerank(t: Tables) -> bool:
    got = _frame("graph_pagerank", t)
    cnt = got.count()
    n_cust = t.orders.select("o_custkey").distinct().count()
    n_supp = t.lineitem.select("l_suppkey").distinct().count()
    # upper bound, not equality: a childless order's customer never
    # joins the trade graph (observed on the fuzz fixture), so the node
    # set can be smaller than all participants; equality is
    # fixture-pinned in test_pagerank_mass_fixed_point_determinism
    if cnt > n_cust + n_supp:
        return False
    if cnt == 0:
        return True
    s = got.agg(F.sum("rank").alias("s"), F.min("rank").alias("mn")).first()
    return abs(s.s - 1.0) < 1e-6 and s.mn >= 0.15 / cnt - 1e-12


def _chk_spectral_centroid(t: Tables) -> bool:
    got = _frame("mm_audio_spectral_centroid", t)
    if got.count() != t.documents.count():
        return False
    nyq = 8000.0  # encoder rate 16 kHz
    return _all(
        got,
        (F.col("n_samples") == 50 + F.col("asset_id") % 50)
        & F.col("centroid_hz").between(0.0, nyq)
        & (F.col("bandwidth_hz") >= 0.0)
        & F.col("rolloff85_hz").between(0.0, nyq),
    )


def _chk_phash(t: Tables) -> bool:
    got = _frame("mm_image_phash", t)
    grp = got.groupBy("img_hash").agg(
        F.min("doc_id").alias("want_rep"), F.count(F.lit(1)).alias("want_n")
    )
    return _all(
        got.join(grp, "img_hash"),
        (F.col("rep_doc_id") == F.col("want_rep"))
        & (F.col("n_members") == F.col("want_n"))
        & (F.col("is_dup") == (F.col("doc_id") != F.col("want_rep"))),
    )


def _chk_poisson_bootstrap(t: Tables) -> bool:
    got = _frame("sample_poisson_bootstrap", t)
    n_docs = t.documents.count()
    # 4dp output rounding: allow half-unit slack at the CI boundaries
    eps = 2e-4
    return _all(
        got,
        (F.col("n_docs") == n_docs)
        & ((F.col("n_docs") == 0)
           | ((F.col("n_replicates") == 32)
              & (F.col("se_boot") >= 0)
              & (F.col("ci_lo") <= F.col("ci_hi") + eps)
              & (F.col("ci_lo") - eps <= F.col("point_mean"))
              & (F.col("point_mean") <= F.col("ci_hi") + eps))),
    )


def _chk_binary_files(t: Tables) -> bool:
    from base_etl_spark.schemas import TABLE_NAMES

    got = _frame("scan_binary_files", t)
    names = {f"{n}.parquet" for n in TABLE_NAMES}
    in_set = _all(
        got, (F.col("n_bytes") > 0) & F.col("file_name").isin(*sorted(names))
    )
    return in_set and got.count() == len(names)


def _chk_nprobe_sweep(t: Tables) -> bool:
    got = _frame("sim_ivf_nprobe_sweep", t)
    w = Window.orderBy("nprobe")
    stepped = got.select(
        "nprobe", "n_hits", "n_possible", "recall",
        F.lag("recall").over(w).alias("prev"),
        F.max("nprobe").over(Window.partitionBy()).alias("mx"),
    )
    # n_possible is the probe BUDGET (N_PROBES * TOP_K literal); the
    # brute-force ranking can hold fewer rows (zero-norm vectors, short
    # corpora), so the full-scan invariant is n_hits == |brute rows| —
    # and it binds only when the max sweep point actually IS a full
    # scan: every label covered (distinct labels <= max nprobe) and no
    # NULL labels (IVF's label join drops those rows; brute keeps them).
    # recall == 1.0 at nprobe=10 itself is fixture-pinned in
    # test_nprobe_sweep_monotone_and_exact_at_full_scan.
    n_brute = REGISTRY["sim_topk"].fn.tables_fn(t).count()
    lab = t.embeddings.agg(
        F.countDistinct("label").alias("nl"),
        F.sum(F.col("label").isNull().cast("int")).alias("nnull"),
    ).first()
    max_np = _scalar(got, F.max("nprobe"), default=0)
    full_scan_binds = lab.nl <= max_np and not (lab.nnull or 0)
    return _all(
        stepped,
        (F.col("prev").isNull() | (F.col("recall") >= F.col("prev") - 1e-9))
        & ((F.col("n_possible") == 0)
           | (F.abs(F.col("recall")
                    - F.col("n_hits") / F.col("n_possible")) < 1e-9))
        & ((F.col("nprobe") != F.col("mx"))
           | ~F.lit(full_scan_binds)
           | (F.col("n_hits") == n_brute)),
    )


def _chk_mmr(t: Tables) -> bool:
    got = _frame("sim_mmr_rerank", t)
    top1 = (
        REGISTRY["sim_topk"].fn.tables_fn(t)
        .filter(F.col("rn") == 1)
        .select("probe_id", F.col("neighbor_id").alias("top1"))
    )
    g = got.groupBy("probe_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("neighbor_id").alias("nn"),
        F.countDistinct("rank").alias("nr"),
        F.min("rank").alias("rmin"),
        F.max("rank").alias("rmax"),
        F.max(F.when(F.col("rank") == 1, F.col("neighbor_id"))).alias("n1"),
    )
    # NOTE deliberately NOT checked: "rank-1 mmr_score is the maximum".
    # The greedy objective re-scores each step against the grown selected
    # set, and the -0.3*max_cos(selected) penalty turns POSITIVE when all
    # cosines to the selected set are negative (common on near-isotropic
    # embeddings) — a later pick can then legitimately out-score pick 1
    # (observed at sf0.01, probe 6).
    return _all(
        g.join(top1, "probe_id", "left"),
        (F.col("n") == 5) & (F.col("nn") == 5) & (F.col("nr") == 5)
        & (F.col("rmin") == 1) & (F.col("rmax") == 5)
        & F.col("top1").isNotNull() & (F.col("n1") == F.col("top1")),
    )


def _chk_pq_quantize(t: Tables) -> bool:
    from base_etl_spark.operators.llm_vectors import _PQ_K, _PQ_SUBS

    got = _frame("sim_pq_quantize", t)
    n_emb = t.embeddings.count()
    census = _all(
        got.groupBy("sub_id").agg(F.sum("n_vecs").alias("tot")),
        F.col("tot") == n_emb,
    )
    in_row = _all(
        got,
        F.col("code").between(0, _PQ_K - 1)
        & (F.col("mse") >= 0) & (F.col("n_vecs") >= 1),
    )
    subs_ok = (
        got.select("sub_id").distinct().count() == (0 if n_emb == 0 else _PQ_SUBS)
    )
    if n_emb == 0:
        return census and in_row and subs_ok
    # Lloyd rounds never increase SSE: trained mean distortion <= init's
    wmse = lambda df: _scalar(  # noqa: E731
        df, F.sum(F.col("n_vecs") * F.col("mse")) / F.sum("n_vecs")
    )
    trained = wmse(got)
    init = wmse(REGISTRY["sim_pq_distortion"].fn.tables_fn(t))
    gain = trained is not None and init is not None and trained <= init + 1e-6
    return census and in_row and subs_ok and gain


def _chk_topk_ivf(t: Tables) -> bool:
    brute = REGISTRY["sim_topk"].fn.tables_fn(t).select(
        "probe_id", "neighbor_id"
    )
    ivf = _frame("sim_topk_ivf", t).select("probe_id", "neighbor_id")
    total = brute.count()
    if total == 0:
        return True
    matched = brute.join(ivf, ["probe_id", "neighbor_id"]).count()
    # fixture embeddings are near-isotropic: the floor checks the pruning
    # machinery, not ANN quality (see test_ivf_recall_vs_brute_force)
    return matched / total >= 0.3


def _rank_structure(df: DataFrame) -> bool:
    w = Window.partitionBy("probe_id").orderBy("rank")
    g = df.select(
        "probe_id", "rank", "adc_dist",
        F.lag("adc_dist").over(w).alias("prev"),
    )
    mono = _all(
        g, F.col("prev").isNull() | (F.col("adc_dist") >= F.col("prev") - 1e-9)
    )
    per = df.groupBy("probe_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("rank").alias("nr"),
        F.min("rank").alias("rmin"),
        F.max("rank").alias("rmax"),
    )
    shape = _all(
        per,
        (F.col("nr") == F.col("n")) & (F.col("rmin") == 1)
        & (F.col("rmax") == F.col("n")),
    )
    return mono and shape


def _chk_topk_ivfpq(t: Tables) -> bool:
    return _rank_structure(_frame("sim_topk_ivfpq", t))


def _chk_topk_pq(t: Tables) -> bool:
    return _rank_structure(_frame("sim_topk_pq", t))


def _chk_cms(t: Tables) -> bool:
    got = _frame("sketch_cms_freq", t)
    tot = got.agg(
        F.coalesce(F.sum("n_exact"), F.lit(0)).alias("total")
    )
    slack = F.greatest(F.lit(1), (0.001 * F.col("total")).cast("long") + 1)
    return _all(
        got.crossJoin(F.broadcast(tot)),
        (F.col("n_est") >= F.col("n_exact"))
        & (F.col("n_over") == F.col("n_est") - F.col("n_exact"))
        & (F.col("n_over") <= slack),
    )


def _chk_hll_overlap(t: Tables) -> bool:
    got = _frame("sketch_hll_overlap", t)
    d = t.events.select(F.to_date("ts").alias("d"), "user_id").distinct()
    a = d.select(F.col("d").alias("d0"), F.col("user_id").alias("u"))
    b = d.select(F.col("d").alias("d1"), F.col("user_id").alias("u"))
    exact = (
        a.join(b, (F.date_add(F.col("d0"), 1) == F.col("d1")) & (a.u == b.u))
        .groupBy(F.col("d0").cast("string").alias("day"))
        .agg(F.countDistinct(a.u).alias("n"))
    )
    # a day with zero exact retention is absent from the exact join but
    # legitimately present in the sketch report with est 0 (fuzz case);
    # coalescing both sides to 0 applies the same envelope everywhere —
    # a day MISSING from the report with exact n > 3 still fails
    j = got.join(exact, "day", "full")
    return _all(
        j,
        F.abs(
            F.coalesce(F.col("est_retained"), F.lit(0))
            - F.coalesce(F.col("n"), F.lit(0))
        )
        <= F.greatest(F.lit(3.0), 0.15 * F.coalesce(F.col("n"), F.lit(0))),
    )


def _chk_hll_rollup(t: Tables) -> bool:
    got = _frame("sketch_hll_rollup", t)
    daily = t.events.groupBy(
        F.to_date("ts").cast("string").alias("day")
    ).agg(F.countDistinct("user_id").alias("n"))
    jd = got.filter(F.col("grain") == "day").join(daily, "day", "full")
    day_ok = _all(
        jd,
        F.col("est_users").isNotNull() & F.col("n").isNotNull()
        & (F.abs(F.col("est_users") - F.col("n"))
           <= F.greatest(F.lit(1.0), 0.05 * F.col("n"))),
    )
    n_total = t.events.select("user_id").distinct().count()
    tot = got.filter(F.col("grain") == "total")
    tot_ok = _all(
        tot,
        F.abs(F.col("est_users") - n_total)
        <= F.greatest(F.lit(1.0), F.lit(0.05 * n_total)),
    )
    # union-merged sketch can never fall below any single day's estimate
    mx_day = _scalar(
        got.filter(F.col("grain") == "day"), F.max("est_users"), default=0
    )
    floor_ok = _all(tot, F.col("est_users") >= mx_day)
    return day_ok and tot_ok and floor_ok


def _chk_kmv(t: Tables) -> bool:
    # Sketch size comes from the implementation, not a hardcoded twin
    # (r10 ADVICE): if _KMV_K ever changes, the exact-tier/estimate-tier
    # boundary below moves with it instead of silently testing the
    # wrong threshold.
    from base_etl_spark.operators.analytics import _KMV_K

    got = _frame("sketch_kmv_distinct", t)
    per = t.events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("double").alias("n")
    )
    total = t.events.agg(
        F.lit("ALL").alias("event_type"),
        F.countDistinct("user_id").cast("double").alias("n"),
    ).filter(F.col("n") > 0)
    j = got.join(per.unionByName(total), "event_type", "full")
    return _all(
        j,
        F.col("est_distinct").isNotNull() & F.col("n").isNotNull()
        & (((F.col("n_kept") < _KMV_K) & (F.col("est_distinct") == F.col("n")))
           | ((F.col("n_kept") >= _KMV_K)
              & (F.abs(F.col("est_distinct") - F.col("n"))
                 <= 0.25 * F.col("n")))),
    )


def _chk_late_data(t: Tables) -> bool:
    got = _frame("stream_late_data", t)
    mx = t.events.agg(F.max("ts").alias("mx"))
    return _all(
        got.crossJoin(F.broadcast(mx)),
        (F.unix_timestamp("mx") - F.unix_timestamp("window_start"))
        <= 3600 + 900,
    )


def _chk_compress_ratio(t: Tables) -> bool:
    got = _frame("text_compress_ratio", t)
    if got.count() != t.documents.count():
        return False
    # zlib's ~11-byte fixed overhead dominates tiny docs: the 1.5 upper
    # bound is only meaningful once raw_len clears it
    return _all(
        got,
        (F.col("compress_ratio") > 0)
        & ((F.col("raw_len") < 64) | (F.col("compress_ratio") <= 1.5)),
    )


def _chk_bpe_apply(t: Tables) -> bool:
    # null-safe lang key: the fuzz fixture punches NULL langs, and a
    # plain full join would orphan both sides' NULL groups
    lkey = F.coalesce(F.col("lang"), F.lit("\x00null")).alias("lkey")
    got = _frame("tokenizer_bpe_apply", t).select(lkey, "*")
    rec = (
        t.documents.select(
            lkey, F.explode(F.split("text", " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("lkey")
        .agg(
            F.count(F.lit(1)).alias("nw"),
            F.sum(F.length("w")).alias("nc"),
        )
    )
    return _all(
        got.join(rec, "lkey", "full"),
        F.col("n_words").isNotNull() & F.col("nw").isNotNull()
        & (F.col("n_words") == F.col("nw"))
        & (F.col("n_chars") == F.col("nc"))
        & (F.col("n_tokens") >= F.col("n_words"))
        # each word's symbols include the '</w>' marker: at most
        # length+1 tokens per word, at least 1
        & (F.col("n_tokens") <= F.col("n_chars") + F.col("n_words"))
        & (F.abs(F.col("tokens_per_word")
                 - F.round(F.col("n_tokens") / F.col("n_words"), 6)) < 1e-9)
        & (F.abs(F.col("chars_per_token")
                 - F.round(F.col("n_chars") / F.col("n_tokens"), 6)) < 1e-9),
    )


def _chk_bpe_train(t: Tables) -> bool:
    got = _frame("tokenizer_bpe_train", t)
    n = got.count()
    ranks_ok = _all(
        got,
        (F.col("merge_rank") >= 1) & (F.col("merge_rank") <= n)
        & (F.col("pair_count") >= 1)
        & (F.col("merged") == F.concat("left_sym", "right_sym")),
    ) and got.select("merge_rank").distinct().count() == n
    if n == 0:
        return ranks_ok
    # the first merge must be the argmax of the raw pair census
    pairs = REGISTRY["tokenizer_bpe_pairs"].fn.tables_fn(t)
    mx = pairs.agg(F.max("pair_count").alias("mx"))
    first_ok = _all(
        got.filter(F.col("merge_rank") == 1).crossJoin(F.broadcast(mx)),
        F.col("pair_count") == F.col("mx"),
    )
    return ranks_ok and first_ok


def _chk_udtf(t: Tables) -> bool:
    got = _frame("udtf_python", t)
    toks = F.split("text", " ")
    n_chunks = F.ceil(F.size(toks) / 16).cast("int")
    twin = (
        t.documents.select("doc_id", toks.alias("ws"), n_chunks.alias("nc"))
        .select(
            "doc_id", "ws",
            F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("ci"),
        )
        .select(
            "doc_id",
            F.col("ci").alias("chunk_idx"),
            (F.col("ci") * 16).alias("start_tok"),
            F.size(F.slice("ws", F.col("ci") * 16 + 1, 16)).alias("n_toks"),
            F.length(
                F.concat_ws(" ", F.slice("ws", F.col("ci") * 16 + 1, 16))
            ).alias("chunk_chars"),
        )
    )
    return (
        got.exceptAll(twin).count() == 0 and twin.exceptAll(got).count() == 0
    )


_CHECK_FNS = {
    "agg_approx_distinct": _chk_approx_distinct,
    "agg_approx_quantile": _chk_approx_quantile,
    "agg_approx_top_k": _chk_approx_top_k,
    "agg_decile_lift_approx": _chk_decile_lift_approx,
    "agg_freq_items": _chk_freq_items,
    "agg_hll_native": _chk_hll_native,
    "cluster_kmeans": _chk_kmeans,
    "dedup_bucket_stats": _chk_bucket_stats,
    "dedup_minhash_estimate": _chk_minhash_estimate,
    "dedup_simhash": _chk_simhash,
    "embedding_pca_power": _chk_pca_power,
    "etl_file_stats": _chk_file_stats,
    "events_markov_stationary": _chk_markov,
    "graph_k_core": _chk_k_core,
    "graph_pagerank": _chk_pagerank,
    "mm_audio_spectral_centroid": _chk_spectral_centroid,
    "mm_image_phash": _chk_phash,
    "sample_poisson_bootstrap": _chk_poisson_bootstrap,
    "scan_binary_files": _chk_binary_files,
    "sim_ivf_nprobe_sweep": _chk_nprobe_sweep,
    "sim_mmr_rerank": _chk_mmr,
    "sim_pq_quantize": _chk_pq_quantize,
    "sim_topk_ivf": _chk_topk_ivf,
    "sim_topk_ivfpq": _chk_topk_ivfpq,
    "sim_topk_pq": _chk_topk_pq,
    "sketch_cms_freq": _chk_cms,
    "sketch_hll_overlap": _chk_hll_overlap,
    "sketch_hll_rollup": _chk_hll_rollup,
    "sketch_kmv_distinct": _chk_kmv,
    "stream_late_data": _chk_late_data,
    "text_compress_ratio": _chk_compress_ratio,
    "tokenizer_bpe_apply": _chk_bpe_apply,
    "tokenizer_bpe_train": _chk_bpe_train,
    "udtf_python": _chk_udtf,
}

assert {k for k, _ in _CHECKS} == set(_CHECK_FNS)


@query("selfcheck_battery", oracle=_battery_oracle())
def selfcheck_battery(t: Tables) -> DataFrame:
    """One hash-gated row per rows-only key: (key, check_name, passed),
    compared against an all-true literal — the R tier's driver-visible
    correctness signal (module docstring has the full design).

    r11 (guide §2.6 — overlap independent jobs): the 34 checks are
    independent reads over the same Tables, but each one is a chain of
    small driver-latency-bound jobs (several are iterative with driver
    loops), so serial evaluation left the cluster idle between
    round-trips — 306 s at sf0.01 on a quiet box. A small thread pool
    overlaps them; `pool.map` preserves _CHECKS order so the output
    frame is row-for-row identical to the serial build, and
    `inheritable_thread_target` keeps JVM thread-locals (job
    descriptions, pinned threads) correct per the PySpark contract.
    iterstats.record calls inside parent keys are single dict writes
    keyed by parent name — GIL-atomic, same last-writer semantics as
    the serial loop."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    spark = t.orders.sparkSession

    def _run(kc: tuple[str, str]) -> tuple[str, str, bool]:
        k, c = kc
        return (k, c, bool(_CHECK_FNS[k](t)))

    # Pool width from the session, not a constant (r11 VERDICT): the
    # checks are driver-latency-bound, so the knee is how many small
    # jobs can be in flight without starving each other's stages —
    # a quarter of the session's cores, bounded to [2, 8], keeps the
    # r11-measured 8-wide overlap on local[32] and degrades gracefully
    # on smaller sessions (local[4] -> 2 threads, not 8 fighting).
    workers = max(2, min(8, spark.sparkContext.defaultParallelism // 4))
    with ThreadPoolExecutor(max_workers=workers) as pool:
        rows = list(pool.map(inheritable_thread_target(_run), _CHECKS))
    return spark.createDataFrame(
        rows, "key string, check_name string, passed boolean"
    )
