"""Property-based tests (hypothesis) for the reusable operator kernels:
random inputs vs straight-Python reference implementations. Bounded
example counts — every example is a real Spark round-trip."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_key = st.integers(min_value=0, max_value=9)
_val = st.floats(min_value=-100, max_value=100, allow_nan=False, width=32)


@given(
    dim=st.dictionaries(_key, _val, min_size=1, max_size=8),
    upd_keys=st.sets(_key, max_size=8),
)
@settings(**_SETTINGS)
def test_scd2_invariants(spark, dim, upd_keys):
    """One current row per key; updated keys get a closed + an open
    version with contiguous validity; others stay untouched."""
    from base_etl_spark.etl import scd2_apply

    upd = {k: v + 1.0 for k, v in dim.items() if k in upd_keys}
    ddf = spark.createDataFrame([(k, v) for k, v in dim.items()], "k long, v double")
    udf_ = spark.createDataFrame([(k, v) for k, v in upd.items()], "k long, v double")
    out = scd2_apply(ddf, udf_, "k", "2024-06-01", ["v"]).collect()

    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)
    assert set(by_key) == set(dim)
    for k, rows in by_key.items():
        current = [r for r in rows if r.is_current]
        assert len(current) == 1
        if k in upd:
            assert len(rows) == 2
            closed = next(r for r in rows if not r.is_current)
            assert closed.valid_to == current[0].valid_from
            assert closed.v == dim[k] and current[0].v == upd[k]
        else:
            assert len(rows) == 1 and rows[0].v == dim[k]


@given(words=st.lists(st.sampled_from(["a", "bb", "ccc", "dd", "e"]), max_size=12))
@settings(**_SETTINGS)
def test_shingles_match_python_reference(spark, words):
    """_shingles == the naive sliding-window reference, incl. the
    under-k => empty-array rule."""
    from base_etl_spark.operators.llm_dedup import _shingles, _SHINGLE

    text = " ".join(words)
    got = (
        spark.createDataFrame([(text,)], "text string")
        .select(_shingles().alias("sh"))
        .collect()[0]
        .sh
    )
    toks = text.split(" ")  # NB: "".split(" ") == [""] — matches F.split
    want = (
        [" ".join(toks[i : i + _SHINGLE]) for i in range(len(toks) - _SHINGLE + 1)]
        if len(toks) >= _SHINGLE
        else []
    )
    assert got == want


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # id
            st.integers(min_value=0, max_value=2),  # band
            st.integers(min_value=0, max_value=3),  # bucket hash
        ),
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_bucket_pairs_match_reference(spark, rows):
    """bucket_pairs == naive per-bucket all-pairs, deduplicated, a < b.
    (Shared kernel of dedup_near_minhash and dedup_embedding.)"""
    from base_etl_spark.operators.llm_dedup import bucket_pairs

    df = spark.createDataFrame(rows, "id long, band int, bh long")
    got = {
        (r.a, r.b)
        for r in bucket_pairs(df, "id", "a", "b").collect()
    }
    buckets: dict[tuple, set] = {}
    for i, band, bh in rows:
        buckets.setdefault((band, bh), set()).add(i)
    want = {
        (a, b)
        for ids in buckets.values()
        for a in ids
        for b in ids
        if a < b
    }
    assert got == want


@given(ids=st.sets(st.integers(min_value=0, max_value=10**9), max_size=30))
@settings(**_SETTINGS)
def test_sample_bucket_matches_python_arithmetic(spark, ids):
    """Spark's pmod(doc_id * K, 100) == Python's % for non-negative ids —
    the determinism contract of sample_stratified."""
    from base_etl_spark.operators.corpus import _KNUTH

    if not ids:
        return
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: r.bucket
        for r in df.select(
            "doc_id", F.pmod(F.col("doc_id") * F.lit(_KNUTH), F.lit(100)).alias("bucket")
        ).collect()
    }
    assert got == {i: (i * _KNUTH) % 100 for i in ids}


@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-0.625, max_value=0.625, allow_nan=False, width=32),
            min_size=4, max_size=4,
        ),
        min_size=1, max_size=6,
    )
)
@settings(**_SETTINGS)
def test_quantize_matches_numpy_reference(spark, vecs):
    """Spark's int8 quantization expressions == the straight-numpy
    reference (codes, clip counts, L2 reconstruction error)."""
    import math

    import numpy as np

    from base_etl_spark.operators.llm_vectors import _Q_SCALE
    from base_etl_spark.registry import REGISTRY

    df = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )

    class T:
        embeddings = df

    got = {r.vec_id: r for r in REGISTRY["embedding_quantize"].fn.tables_fn(T).collect()}
    for i, v in enumerate(vecs):
        x = np.array(v, dtype=np.float32).astype(np.float64)
        q = np.floor(x * _Q_SCALE + 0.5)
        n_clip = int((np.abs(q) > 127).sum())
        deq = np.clip(q, -127, 127) / _Q_SCALE
        err = round(math.sqrt(float(((x - deq) ** 2).sum())), 6)
        assert got[i].n_clipped == n_clip
        assert abs(got[i].l2_err - err) <= 1e-6


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=6),
        min_size=1, max_size=5,
    )
)
@settings(**_SETTINGS)
def test_unigram_nll_matches_python_reference(spark, docs):
    import math
    from collections import Counter

    from base_etl_spark.registry import REGISTRY

    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    class T:
        documents = df

    got = {r.doc_id: r for r in REGISTRY["text_unigram_nll"].fn.tables_fn(T).collect()}
    freq = Counter(w for d in docs for w in d)
    total = sum(freq.values())
    for i, d in enumerate(docs):
        ref = round(sum(-math.log(freq[w] / total) for w in d) / len(d), 6)
        assert got[i].n_tok == len(d)
        assert abs(got[i].avg_nll - ref) <= 1e-6


@given(ids=st.sets(st.integers(min_value=1, max_value=200), min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_snapshot_diff_matches_python_reference(spark, ids):
    """Class counts == straight-Python over the same derived snapshots."""
    from base_etl_spark.registry import REGISTRY

    df = spark.createDataFrame(
        [(k, f"c{k}", float(k), "SEG") for k in sorted(ids)],
        "c_custkey long, c_name string, c_acctbal double, c_mktsegment string",
    )

    class T:
        customer = df

    got = {r.change_type: r.n_rows for r in REGISTRY["etl_snapshot_diff"].fn.tables_fn(T).collect()}
    ref: dict[str, int] = {}
    for k in ids:
        in_today, in_yest = k % 11 != 0, k % 13 != 0
        if in_today and not in_yest:
            c = "added"
        elif in_yest and not in_today:
            c = "removed"
        elif in_today and in_yest:
            c = "changed" if k % 7 == 0 else "unchanged"
        else:
            continue
        ref[c] = ref.get(c, 0) + 1
    assert got == ref


@given(
    counts=st.lists(st.integers(min_value=1, max_value=400), min_size=1, max_size=24),
)
@settings(**_SETTINGS)
def test_pack_sequences_bin_arithmetic(spark, counts):
    """Packing placement == straight-Python exclusive prefix sum over
    doc_id order, for any token-count sequence — independent of the
    bucket decomposition the Spark plan uses. Budget-boundary docs
    (start exactly on a multiple of the context budget) are forced into
    every run: offset must wrap to 0, bin_id must advance."""
    from base_etl_spark.operators.corpus import _PACK_BUDGET
    from base_etl_spark.registry import REGISTRY

    # force at least one doc whose start lands EXACTLY on a bin boundary:
    # pad the first doc's count so the second doc starts at _PACK_BUDGET
    if len(counts) > 1:
        counts = [_PACK_BUDGET] + counts[1:]
    # sparse, shuffled-magnitude ids: bucketing must not assume density
    ids = [i * 7 + (3 if i % 2 else 0) for i in range(len(counts))]
    rows = [
        (ids[i], " ".join(["w"] * counts[i]), "en", "s", counts[i])
        for i in range(len(counts))
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )

    class T:
        documents = df

    got = {r.doc_id: r for r in REGISTRY["pack_sequences"].fn.tables_fn(T).collect()}
    start = 0
    for i in sorted(range(len(counts)), key=lambda j: ids[j]):
        r = got[ids[i]]
        assert r.n_tokens == counts[i]
        assert r.bin_id == start // _PACK_BUDGET
        assert r.bin_offset == start % _PACK_BUDGET
        start += counts[i]
    if len(counts) > 1:  # the forced boundary doc wrapped exactly
        second = got[ids[1]]
        assert (second.bin_id, second.bin_offset) == (1, 0)


@given(
    # intervals in integer minutes over two days; generous overlap odds.
    # Grid-edge shapes (start/end exactly on an hour, zero-length-ish,
    # interval spanning many buckets) all arise from the raw ranges.
    spans=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=48 * 60),
            st.integers(min_value=0, max_value=8 * 60),
        ),
        min_size=1,
        max_size=12,
    ),
)
@settings(**_SETTINGS)
def test_interval_bucketize_matches_naive_overlap(spark, spans):
    """The hour-grid decomposition (explode to covered buckets, equi-join,
    re-check) must find EXACTLY the pairs the naive O(n^2) predicate
    finds — including intervals touching grid edges, where an off-by-one
    in floor((end-1)/hour) would fabricate or drop a bucket."""
    import datetime

    base = datetime.datetime(2024, 3, 1)
    iv = []
    for i, (start_min, dur_min) in enumerate(spans):
        s = base + datetime.timedelta(minutes=start_min)
        e = s + datetime.timedelta(minutes=dur_min + 1)  # non-degenerate
        iv.append((i, s, e))
    left = spark.createDataFrame(iv, "lid long, s timestamp, e timestamp")
    # fixed right side: 4 maintenance-style windows incl. exact-hour edges
    win = [
        (0, base + datetime.timedelta(hours=1), base + datetime.timedelta(hours=2)),
        (1, base + datetime.timedelta(hours=5), base + datetime.timedelta(hours=9)),
        (2, base + datetime.timedelta(hours=26, minutes=30),
            base + datetime.timedelta(hours=27, minutes=30)),
        (3, base + datetime.timedelta(hours=40), base + datetime.timedelta(hours=40, minutes=1)),
    ]
    right = spark.createDataFrame(win, "rid long, ws timestamp, we timestamp")

    hour_us = 3600 * 1_000_000

    def buckets(lo, hi):
        return F.sequence(
            F.floor(F.unix_micros(lo) / hour_us).cast("long"),
            F.floor((F.unix_micros(hi) - 1) / hour_us).cast("long"),
        )

    lb = left.select("lid", "s", "e", F.explode(buckets(F.col("s"), F.col("e"))).alias("bk"))
    rb = right.select("rid", "ws", "we", F.explode(buckets(F.col("ws"), F.col("we"))).alias("bk"))
    got = {
        (r.lid, r.rid)
        for r in lb.join(rb, "bk")
        .filter((F.col("s") < F.col("we")) & (F.col("ws") < F.col("e")))
        .select("lid", "rid")
        .distinct()
        .collect()
    }
    want = {
        (i, j)
        for i, s, e in iv
        for j, ws, we in win
        if s < we and ws < e
    }
    assert got == want


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=-600, max_value=600),   # lat tenths: ±60°
            st.integers(min_value=-1800, max_value=1800), # lon tenths
        ),
        min_size=2,
        max_size=14,
    ),
)
@settings(**_SETTINGS)
def test_geo_band_join_matches_naive_haversine(spark, pts):
    """The latitude-band decomposition (explode to own+neighbor 2°
    bands, equi-join, exact re-check) must find EXACTLY the pairs the
    naive all-pairs haversine predicate finds — including points sitting
    right on band boundaries and antimeridian-adjacent longitudes."""
    import math

    rows = [(i, lat / 10.0, lon / 10.0) for i, (lat, lon) in enumerate(pts)]
    left = spark.createDataFrame(rows, "lid long, lat double, lon double")
    right = spark.createDataFrame(
        [(i + 100, la, lo) for i, la, lo in rows], "rid long, lat double, lon double"
    )

    def band(lat):
        b = F.floor(lat / 2.0).cast("long")
        return F.explode(F.array(b - 1, b, b + 1))

    lb = left.select("lid", F.col("lat").alias("a_lat"), F.col("lon").alias("a_lon"),
                     band(F.col("lat")).alias("band"))
    rb = right.select("rid", F.col("lat").alias("b_lat"), F.col("lon").alias("b_lon"),
                      band(F.col("lat")).alias("band"))
    rad = F.radians
    dlat = rad(F.col("b_lat") - F.col("a_lat"))
    dlon = rad(F.col("b_lon") - F.col("a_lon"))
    hav = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(rad(F.col("a_lat"))) * F.cos(rad(F.col("b_lat"))) * F.pow(F.sin(dlon / 2), 2)
    )
    dist = F.round(2 * 6371.0 * F.asin(F.sqrt(hav)), 4)
    got = {
        (r.lid, r.rid)
        for r in lb.join(rb, "band")
        .filter(F.abs(F.col("a_lat") - F.col("b_lat")) <= 2.0)
        .select("lid", "rid", dist.alias("d"))
        .filter(F.col("d") <= 200.0)
        .distinct()
        .collect()
    }

    def hav_py(a_lat, a_lon, b_lat, b_lon):
        p = math.pi / 180.0
        h = (
            math.sin((b_lat - a_lat) * p / 2) ** 2
            + math.cos(a_lat * p) * math.cos(b_lat * p)
            * math.sin((b_lon - a_lon) * p / 2) ** 2
        )
        return round(2 * 6371.0 * math.asin(math.sqrt(h)), 4)

    want = {
        (i, j + 100)
        for i, a_lat, a_lon in rows
        for j, b_lat, b_lon in rows
        if abs(a_lat - b_lat) <= 2.0 and hav_py(a_lat, a_lon, b_lat, b_lon) <= 200.0
    }
    assert got == want


@given(
    names=st.lists(
        st.text(alphabet="abcd", min_size=0, max_size=5), min_size=1, max_size=20
    ),
)
@settings(**_SETTINGS)
def test_two_phase_rank_equals_global_row_number(spark, names):
    """The SNM two-phase global rank (range partitions + local
    row_number + broadcast offsets) must equal a straight global
    row_number for ANY input — duplicates included (ties break on the
    key column)."""
    from pyspark.sql import Window

    rows = [(i, n) for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "key long, name string")
    nb = 4
    by_range = df.repartitionByRange(nb, "name", "key").withColumn(
        "pid", F.spark_partition_id()
    )
    local_w = Window.partitionBy("pid").orderBy("name", "key")
    local = by_range.withColumn("lrn", F.row_number().over(local_w))
    off_w = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        by_range.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("pid", F.coalesce(F.sum("n").over(off_w), F.lit(0)).alias("off"))
    )
    got = {
        r.key: r.rk
        for r in local.join(F.broadcast(offsets), "pid")
        .select("key", (F.col("off") + F.col("lrn")).alias("rk"))
        .collect()
    }
    want = {
        k: i + 1
        for i, (k, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert got == want


# ---- codec round-trip laws (VERDICT r4 task 4): the fixture-derived mm_*
# keys exercise one deterministic pixel/sample family; these pin the
# codecs themselves against refactors over ARBITRARY payloads.

_pcm16 = st.integers(min_value=-32768, max_value=32767)


@given(samples=st.lists(_pcm16, min_size=1, max_size=400),
       rate=st.sampled_from([8_000, 16_000, 44_100]))
@settings(deadline=None, max_examples=30)
def test_wav_pcm16_roundtrip_identity(samples, rate):
    """encode_wav_pcm16 → decode_wav_pcm16 is the identity on int16
    sample arrays (and preserves the declared sample rate): ×32768 of the
    decoded float waveform recovers every sample exactly."""
    import numpy as np

    from base_etl_spark.multimodal import decode_wav_pcm16, encode_wav_pcm16

    arr = np.asarray(samples, dtype=np.int16)
    got_rate, wave = decode_wav_pcm16(encode_wav_pcm16(arr, rate))
    assert got_rate == rate
    rec = np.rint(wave * 32768.0).astype(np.int64)
    assert np.array_equal(rec, arr.astype(np.int64))


@given(
    w=st.integers(min_value=1, max_value=9),  # covers all w*3 % 4 stride pads
    h=st.integers(min_value=1, max_value=6),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(deadline=None, max_examples=30)
def test_bmp24_roundtrip_identity(w, h, seed):
    """encode_bmp24 → decode_bmp24 is the identity on arbitrary (h, w, 3)
    uint8 arrays across every 4-byte stride-padding width class."""
    import numpy as np

    from base_etl_spark.multimodal import decode_bmp24, encode_bmp24

    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp24(encode_bmp24(px)), px)


@given(
    w=st.integers(min_value=1, max_value=7),
    h=st.integers(min_value=1, max_value=5),
    nf=st.integers(min_value=1, max_value=6),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(deadline=None, max_examples=30)
def test_avi_rgb24_roundtrip_identity(w, h, nf, seed):
    """encode_avi_rgb24 → decode_avi_rgb24 is the identity on arbitrary
    frame lists: every frame, in order, across stride-padding widths and
    frame counts — and the demuxer must skip the JUNK/idx1 chunks the
    muxer emits."""
    import numpy as np

    from base_etl_spark.multimodal import decode_avi_rgb24, encode_avi_rgb24

    rng = np.random.default_rng(seed)
    frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(nf)]
    dec = decode_avi_rgb24(encode_avi_rgb24(frames))
    assert len(dec) == nf
    for a, b in zip(frames, dec):
        assert np.array_equal(a, b)


def test_avi_decoder_rejects_malformed():
    """The demuxer fails loudly on the corruptions a lazy walker would
    silently accept: wrong magic, frame-count mismatch, truncated frame."""
    import numpy as np
    import pytest as _pytest

    from base_etl_spark.multimodal import decode_avi_rgb24, encode_avi_rgb24

    frames = [np.zeros((2, 3, 3), dtype=np.uint8) for _ in range(2)]
    good = encode_avi_rgb24(frames)
    with _pytest.raises(ValueError):
        decode_avi_rgb24(b"RIFF" + good[4:8] + b"WAVE" + good[12:])
    # header claims 2 frames; drop the movi list's second chunk by
    # truncating the file right after the first frame chunk
    with _pytest.raises(ValueError):
        decode_avi_rgb24(good[: len(good) // 2])
