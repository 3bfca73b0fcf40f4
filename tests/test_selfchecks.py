"""Self-checks for rows-only (R) keys (SURVEY §5.6): approximate vs
exact, pandas kernels vs built-in expressions, LSH recall vs the exact
tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from base_etl_spark import queries
from tests.conftest import SF_TEST

_QS = queries()


def _rows(spark, key):
    return {tuple(r) for r in _QS[key](spark, SF_TEST).collect()}


def test_battery_covers_every_rows_only_key():
    """selfcheck_battery (r9 VERDICT task 2) must carry exactly one
    check per rows-only key: a NEW R key without a battery entry would
    silently fall back to `no_oracle` driver rows — the gap the battery
    exists to close. (The battery itself is a D key and excluded.)"""
    from base_etl_spark.operators.selfcheck import _CHECK_FNS, _CHECKS
    from base_etl_spark.registry import REGISTRY

    r_keys = {k for k, spec in REGISTRY.items() if spec.oracle is None}
    battery_keys = {k for k, _ in _CHECKS}
    assert battery_keys == r_keys, (
        f"battery/R-key drift: missing={sorted(r_keys - battery_keys)} "
        f"extra={sorted(battery_keys - r_keys)}"
    )
    assert len(_CHECKS) == len(set(_CHECKS))
    assert set(_CHECK_FNS) == battery_keys


def test_approx_distinct_within_5pct(spark):
    exact = {
        r.event_type: r.n_users for r in _QS["agg_count_distinct"](spark, SF_TEST).collect()
    }
    approx = {
        r.event_type: r.n_users_approx
        for r in _QS["agg_approx_distinct"](spark, SF_TEST).collect()
    }
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(1, 0.05 * n), (et, n, approx[et])


def test_minhash_equals_exact_jaccard(spark):
    """Both tiers measure 3-word-shingle Jaccard; banding (8x4 @
    theta=.6 -> ~97% recall/pair, and the corpus' true near-dups sit well
    above theta) finds every exact pair; verification guarantees
    precision == 1."""
    exact = _rows(spark, "dedup_near_jaccard")
    mh = _rows(spark, "dedup_near_minhash")
    assert mh <= exact  # verification: no false positives, ever
    assert len(mh) >= 0.9 * len(exact), (len(mh), len(exact))
    assert len(exact) > 0  # the corpus does contain near-dups


def test_blocked_topk_equals_expression_topk(spark):
    assert _rows(spark, "sim_topk_blocked") == _rows(spark, "sim_topk")


def test_ivf_recall_vs_brute_force(spark):
    brute = {(r.probe_id, r.neighbor_id) for r in _QS["sim_topk"](spark, SF_TEST).collect()}
    ivf = {(r.probe_id, r.neighbor_id) for r in _QS["sim_topk_ivf"](spark, SF_TEST).collect()}
    recall = len(brute & ivf) / len(brute)
    # the fixture embeddings are near-orthogonal random vectors (no real
    # cluster structure, same-label mean cosine ~0.002 measured), so with
    # nprobe/nlist = 5/10 the expected recall is only ~0.5; the assertion
    # checks the pruning machinery, not ANN quality on random data
    assert recall >= 0.3, recall


def test_pandas_udf_matches_builtin(spark):
    bad = (
        _QS["udf_pandas"](spark, SF_TEST)
        .filter(F.col("value_norm") != F.col("value_norm_builtin"))
        .count()
    )
    assert bad == 0


def test_entropy_pandas_matches_expression(spark):
    assert _rows(spark, "udaf_entropy_pandas") == _rows(spark, "udaf_entropy")


def test_simhash_near_dup_is_symmetric_sane(spark):
    df = _QS["dedup_simhash"](spark, SF_TEST)
    rows = df.collect()
    assert all(r.doc_a < r.doc_b and r.hamming <= 3 for r in rows)


def test_late_data_subset_of_all_windows(spark):
    late = {r.window_start for r in _QS["stream_late_data"](spark, SF_TEST).collect()}
    # every surviving window is near the max ts (watermark horizon)
    from base_etl_spark import load_tables

    t = load_tables(spark, SF_TEST)
    max_ts = t.events.agg(F.max("ts")).collect()[0][0]
    assert late and all((max_ts - w).total_seconds() <= 3600 + 900 for w in late)


def test_multimodal_pipeline_plumbing(spark):
    """Binary payload -> (stub) decode/resize/frame-sample over Arrow
    batches: shapes and determinism, independent of any real codec."""
    from base_etl_spark import load_tables, multimodal as mm

    t = load_tables(spark, SF_TEST)
    assets = mm.with_binary_payload(t.documents)
    feats = mm.extract_features(assets)
    row = feats.orderBy("asset_id").first()
    assert len(row.features) == 8 and row.n_bytes > 0
    # deterministic: same asset -> same features on recompute
    again = mm.extract_features(assets).orderBy("asset_id").first()
    assert row.features == again.features
    frames = mm.sample_frames(assets, n_frames=4)
    per = frames.groupBy("asset_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per] == [4]
    # stub resize produces fixed-size payloads
    rb = mm.resize_image_stub(b"0123456789abcdef", 8, 8)
    assert len(rb) == 64


def test_dedup_embedding_lsh_equals_allpairs_fixture(spark):
    """The declared dedup_embedding key runs the SRP-LSH bucketed path;
    its driver oracle is the all-pairs SQL — so bucketed MUST equal
    all-pairs exactly on the fixture (r=2/b=24 banding: per-pair miss
    ~1.2e-5 at theta=.35; deterministic seed => stable)."""
    from base_etl_spark import load_tables
    from base_etl_spark.operators.llm_vectors import dedup_embedding_allpairs

    t = load_tables(spark, SF_TEST)
    lsh = _rows(spark, "dedup_embedding")
    ap = {tuple(r) for r in dedup_embedding_allpairs(t.embeddings, 0.35).collect()}
    assert lsh == ap
    assert len(lsh) > 0


def test_dedup_embedding_lsh_planted_high_cosine(spark):
    """Production-shaped check: planted near-duplicate vectors at
    theta=0.95 with the narrow-band parameterization (r=6, b=8) — the
    regime LSH is actually for. Bucketed == all-pairs, non-empty."""
    import random

    from base_etl_spark.operators.llm_vectors import (
        dedup_embedding_allpairs,
        dedup_embedding_pairs,
    )

    rng = random.Random(7)
    dim = 64
    rows = []
    base_vecs = []
    for i in range(40):
        v = [rng.gauss(0, 1) for _ in range(dim)]
        base_vecs.append(v)
        rows.append((i, [float(x) for x in v]))
    # plant a near-dup of every 4th base vector: tiny perturbation
    for j, i in enumerate(range(0, 40, 4)):
        v = [x + rng.gauss(0, 0.02) for x in base_vecs[i]]
        rows.append((100 + j, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    lsh = {tuple(r) for r in dedup_embedding_pairs(emb, 0.95, n_bands=8, rows_per_band=6).collect()}
    ap = {tuple(r) for r in dedup_embedding_allpairs(emb, 0.95).collect()}
    assert lsh == ap
    assert len(ap) >= 8  # the planted pairs are found


def test_dedup_embedding_collapse_exact_duplicates(spark):
    """The duplicate-dense regime that killed the raw-banding tier at
    x100 (measured: candidate-quadratic bucket self-join, ~75 GB spill):
    byte-identical copies of base vectors. The default collapsed path
    must equal BOTH the all-pairs oracle and the raw-banding research
    dial — same-class pairs at the class self-cosine, cross-class pairs
    at the rep cosine, all orderings vec_a < vec_b."""
    import random

    from base_etl_spark.operators.llm_vectors import (
        dedup_embedding_allpairs,
        dedup_embedding_pairs,
    )

    rng = random.Random(11)
    dim = 64
    rows = []
    base_vecs = []
    for i in range(20):
        v = [float(rng.gauss(0, 1)) for _ in range(dim)]
        base_vecs.append(v)
        rows.append((i, v))
    # 3 exact copies of every 5th vector, with ids INTERLEAVED around the
    # base range so least/greatest ordering in the expansion is exercised
    cid = 0
    for i in range(0, 20, 5):
        for c in range(3):
            rows.append((200 + cid if c % 2 else 5 + 20 * (cid + 1), base_vecs[i]))
            cid += 1
    # plus one near-dup (not exact) of vector 0
    rows.append((999, [x + rng.gauss(0, 0.02) for x in base_vecs[0]]))
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    collapsed = {
        tuple(r)
        for r in dedup_embedding_pairs(emb, 0.95, n_bands=8, rows_per_band=6).collect()
    }
    raw = {
        tuple(r)
        for r in dedup_embedding_pairs(
            emb, 0.95, n_bands=8, rows_per_band=6, collapse_exact=False
        ).collect()
    }
    ap = {tuple(r) for r in dedup_embedding_allpairs(emb, 0.95).collect()}
    assert collapsed == ap
    assert raw == ap
    # every planted copy class of size 4 contributes C(4,2)=6 pairs
    assert len(ap) >= 24
    assert all(a < b for a, b, _ in ap)


def test_corpus_clean_consistent_with_stage_operators(spark):
    """etl_corpus_clean's verdicts agree with the standalone stage
    operators it composes (first-failing-stage priority)."""
    verdict = {r.doc_id: r.verdict for r in _QS["etl_corpus_clean"](spark, SF_TEST).collect()}
    langid = {r.doc_id: r.pred_lang for r in _QS["text_langid"](spark, SF_TEST).collect()}
    quality = {r.doc_id: r.quality for r in _QS["text_quality"](spark, SF_TEST).collect()}
    near_b = {r.doc_b for r in _QS["dedup_near_jaccard"](spark, SF_TEST).collect()}

    assert set(verdict) == set(langid)  # one verdict per document
    assert {"lang", "keep"} <= set(verdict.values())  # non-degenerate split
    for d, v in verdict.items():
        if v == "lang":
            assert langid[d] == "other"
        else:
            assert langid[d] == "en"
            if v == "quality":
                assert quality[d] < 0.7
            else:
                assert quality[d] >= 0.7
                if v == "near_dup":
                    assert d in near_b
                elif v == "keep":
                    assert d not in near_b


def test_langid_ngram_mechanics(spark, tables):
    """One prediction per doc, deterministic across runs, score in [0,1].
    (Fixture text is language-agnostic, so accuracy is not assertable —
    see the operator docstring.)"""
    rows = _QS["text_langid_ngram"](spark, SF_TEST).collect()
    again = _QS["text_langid_ngram"](spark, SF_TEST).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    assert len(rows) == tables.documents.count()
    assert len({r.doc_id for r in rows}) == len(rows)
    for r in rows:
        assert 0.0 <= r.score <= 1.0
        assert r.pred_lang in {"en", "de", "fr", "es", "zh", "unknown"}


def test_agg_mode_tie_breaks_lexicographically(spark):
    """Two event types with equal counts -> the lexicographically smaller
    one wins (native mode() would be nondeterministic here)."""
    from base_etl_spark.registry import REGISTRY
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1), 7, "view", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 2), 7, "click", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 3), 7, "view", 1.0, "{}"),
        (4, dt.datetime(2024, 1, 4), 7, "click", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )

    class T:  # minimal Tables stand-in for the raw body
        events = ev

    out = REGISTRY["agg_mode"].fn.tables_fn(T).collect()
    assert len(out) == 1 and out[0].mode_event == "click" and out[0].n_events == 2


def test_train_split_stable_under_corpus_growth(spark):
    """A doc's split assignment must not change when new docs arrive —
    the whole point of hash-based (vs rank-based) splitting."""
    from base_etl_spark import load_tables
    from base_etl_spark.registry import REGISTRY

    t = load_tables(spark, SF_TEST)

    class Small:
        documents = t.documents.filter(F.col("doc_id") < 100)

    class Full:
        documents = t.documents

    fn = REGISTRY["etl_train_split"].fn.tables_fn
    # per-split doc counts of the prefix corpus == the full corpus's
    # assignment restricted to the same doc_ids (recompute via the same
    # expression, compare totals per (split, lang))
    small = {(r.split, r.lang): r.n_docs for r in fn(Small).collect()}

    class FullPrefix:
        documents = t.documents.filter(F.col("doc_id") < 100)

    again = {(r.split, r.lang): r.n_docs for r in fn(FullPrefix).collect()}
    assert small == again  # deterministic, corpus-independent


def test_contamination_bounds_and_exclusions(spark):
    from base_etl_spark import queries

    out = queries()["text_contamination"](spark, SF_TEST).collect()
    assert out, "train docs must score"
    assert all(0.0 <= r.contamination <= 1.0 for r in out)
    assert all(r.n_contaminated <= r.n_shingles for r in out)
    # benchmark sources never score themselves
    from base_etl_spark import load_tables
    bench_ids = {
        r.doc_id
        for r in load_tables(spark, SF_TEST)
        .documents.filter(F.col("source").isin("src0", "src1"))
        .select("doc_id").collect()
    }
    assert bench_ids.isdisjoint({r.doc_id for r in out})


def test_upsert_merge_preserves_key_set(spark):
    from base_etl_spark import load_tables, queries

    t = load_tables(spark, SF_TEST)
    out = queries()["etl_upsert_merge"](spark, SF_TEST)
    assert out.count() == t.customer.count()  # SCD1: one row per key
    assert out.select("c_custkey").distinct().count() == t.customer.count()


def test_knn_votes_bounded_by_k(spark):
    from base_etl_spark import queries

    out = queries()["sim_knn_classify"](spark, SF_TEST).collect()
    assert len(out) == 10
    assert all(1 <= r.n_votes <= 5 for r in out)


def test_quantize_codes_in_int8_range_and_error_bounded(spark):
    """Quantized codes must fit int8 after clamp, and for unclipped
    dims the per-dim reconstruction error is bounded by half a step."""
    from base_etl_spark import load_tables, queries

    out = queries()["embedding_quantize"](spark, SF_TEST)
    rows = out.collect()
    assert rows and all(r.n_clipped >= 0 for r in rows)
    # worst case per-vector L2 error: sqrt(64 * (0.5/256)^2) for unclipped
    # dims; clipped dims add at most (|x|max - 127/256) each. With fixture
    # |x| <= 0.53 the bound is loose but finite:
    import math
    bound = math.sqrt(64) * (0.53 - 127.0 / 256.0 + 0.5 / 256.0)
    assert all(r.l2_err <= bound for r in rows)


def test_unigram_nll_scores_positive_and_complete(spark):
    from base_etl_spark import load_tables, queries

    t = load_tables(spark, SF_TEST)
    out = queries()["text_unigram_nll"](spark, SF_TEST)
    rows = out.collect()
    assert len(rows) == t.documents.count()  # every doc scores
    # -ln(p) > 0 strictly unless a single token IS the whole corpus
    assert all(r.avg_nll > 0 for r in rows)
    assert all(r.n_tok > 0 for r in rows)


def test_snapshot_diff_classes_partition_the_key_space(spark):
    from base_etl_spark import load_tables, queries

    t = load_tables(spark, SF_TEST)
    got = {r.change_type: r.n_rows for r in queries()["etl_snapshot_diff"](spark, SF_TEST).collect()}
    n = t.customer.count()
    n_union = (
        t.customer.filter((F.col("c_custkey") % 11 != 0) | (F.col("c_custkey") % 13 != 0)).count()
    )
    assert set(got) == {"added", "removed", "changed", "unchanged"}
    assert sum(got.values()) == n_union  # every key classified exactly once


def test_audio_stub_waveform_shape():
    from base_etl_spark import multimodal as mm

    w = mm.decode_audio_stub(b"\x00\x80\xff")
    assert w.shape == (3,) and (-1.0 <= w).all() and (w < 1.0).all()
    import pytest

    with pytest.raises(NotImplementedError):
        mm.decode_audio_stub(None)


def test_wav_codec_roundtrip_and_chunk_walk():
    """The REAL WAV codec: encode→decode must be lossless; the parser
    must walk chunks by declared size (extra LIST chunk tolerated, not
    fixed offsets) and reject non-PCM16-mono or non-RIFF payloads."""
    import struct

    import numpy as np
    import pytest

    from base_etl_spark import multimodal as mm

    smp = np.array([0, 1, -1, 32767, -32768, 256, -12345], dtype=np.int64)
    payload = mm.encode_wav_pcm16(smp, sample_rate=22_050)
    rate, wave = mm.decode_wav_pcm16(payload)
    assert rate == 22_050
    # float64 scaling by 2^15 is exact — recover the ints bit-perfectly
    assert (np.rint(wave * 32768.0).astype(np.int64) == smp).all()
    assert wave.min() >= -1.0 and wave.max() < 1.0

    # insert a LIST chunk between fmt and data: a fixed-offset parser
    # would read garbage; a chunk walker parses identically. Odd-sized
    # chunk also exercises the word-alignment padding rule.
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    patched = payload[:fmt_end] + extra + payload[fmt_end:]
    rate2, wave2 = mm.decode_wav_pcm16(patched)
    assert rate2 == rate and (wave2 == wave).all()

    with pytest.raises(ValueError):
        mm.decode_wav_pcm16(b"OggS" + payload[4:])
    stereo = bytearray(payload)
    stereo[22] = 2  # channels field inside fmt
    with pytest.raises(ValueError):
        mm.decode_wav_pcm16(bytes(stereo))
    with pytest.raises(ValueError):  # RIFF shell with no data chunk
        mm.decode_wav_pcm16(payload[: 12 + 8 + 16])


def test_bmp_codec_roundtrip_and_stride_padding():
    """The REAL BMP codec: encode→decode lossless for widths that do and
    don't need stride padding; honors a non-standard pixel offset; and
    rejects non-BMP / compressed / non-24-bit payloads."""
    import struct

    import numpy as np
    import pytest

    from base_etl_spark import multimodal as mm

    rng = np.random.default_rng(7)
    for w in (1, 2, 3, 4, 5, 8):  # w*3 % 4 cycles through all pad widths
        px = rng.integers(0, 256, size=(3, w, 3), dtype=np.uint8)
        assert (mm.decode_bmp24(mm.encode_bmp24(px)) == px).all(), w

    # decoder must honor the DECLARED data offset, not assume 54
    px = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    payload = mm.encode_bmp24(px)
    gap = b"\xee" * 10
    patched = bytearray(payload[:54] + gap + payload[54:])
    patched[10:14] = struct.pack("<I", 64)
    assert (mm.decode_bmp24(bytes(patched)) == px).all()

    # real resize: identity resize is lossless; downsample picks the
    # canonical nearest-neighbor pixels; upsample replicates them
    px5 = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    blob = mm.encode_bmp24(px5)
    assert (mm.decode_bmp24(mm.resize_bmp_nearest(blob, 5, 4)) == px5).all()
    down = mm.decode_bmp24(mm.resize_bmp_nearest(blob, 2, 2))
    want = px5[[(y * 4) // 2 for y in range(2)]][:, [(x * 5) // 2 for x in range(2)]]
    assert (down == want).all()
    up = mm.decode_bmp24(mm.resize_bmp_nearest(blob, 10, 8))
    assert up.shape == (8, 10, 3)
    assert (up[::2, ::2] == px5[[(y * 4) // 8 for y in range(0, 8, 2)]][:, [(x * 5) // 10 for x in range(0, 10, 2)]]).all()

    with pytest.raises(ValueError):
        mm.decode_bmp24(b"PNG" + payload[3:])
    comp = bytearray(payload)
    comp[30:34] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(ValueError):
        mm.decode_bmp24(bytes(comp))
    bad_bits = bytearray(payload)
    bad_bits[28:30] = struct.pack("<H", 8)
    with pytest.raises(ValueError):
        mm.decode_bmp24(bytes(bad_bits))


def test_png_codec_roundtrip_all_filters_and_rejections():
    """The REAL PNG codec: encode→decode lossless under every scanline
    filter type (0-4) and odd shapes; the ENCODER is pinned to RFC 2083
    by a hand-computed Sub-filtered stream; the DECODER is pinned
    independently by a hand-built payload with MIXED per-line filters
    (a shape the encoder never emits); CRC, color-type, interlace, and
    truncation must all reject."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from base_etl_spark import multimodal as mm

    rng = np.random.default_rng(11)
    for ft in range(5):
        for (h, w) in ((1, 1), (2, 3), (5, 4), (8, 8)):
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            assert (mm.decode_png_rgb24(mm.encode_png_rgb24(px, ft)) == px).all(), ft

    # encoder pinned to the spec: hand-computed Sub (type 1) filter bytes
    px = np.array(
        [[(10, 20, 30), (13, 22, 35)], [(9, 19, 29), (200, 0, 255)]],
        dtype=np.uint8,
    )
    payload = mm.encode_png_rgb24(px, 1)
    idat_len = struct.unpack(">I", payload[33:37])[0]
    raw = zlib.decompress(payload[41 : 41 + idat_len])
    want = (
        b"\x01" + bytes([10, 20, 30, 3, 2, 5])
        + b"\x01" + bytes([9, 19, 29, 191, 237, 226])
    )
    assert raw == want

    # decoder pinned independently: hand-built stream, a DIFFERENT
    # filter on each line (None then Up) — the encoder never mixes
    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    line0 = b"\x00" + bytes([1, 2, 3, 4, 5, 6])
    line1 = b"\x02" + bytes([10, 10, 10, 20, 20, 20])  # Up: adds line 0
    hand = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(line0 + line1)) + chunk(b"IEND", b""))
    got = mm.decode_png_rgb24(hand)
    assert (got[0] == [[1, 2, 3], [4, 5, 6]]).all()
    assert (got[1] == [[11, 12, 13], [24, 25, 26]]).all()

    good = mm.encode_png_rgb24(px, 4)
    bad_crc = bytearray(good)
    bad_crc[45] ^= 0x01  # inside IDAT data
    with pytest.raises(ValueError):
        mm.decode_png_rgb24(bytes(bad_crc))
    with pytest.raises(ValueError):
        mm.decode_png_rgb24(b"BM" + good[2:])
    gray = bytearray(good)
    gray[25] = 0  # IHDR color type byte
    with pytest.raises(ValueError):  # CRC catches the flip first — still rejects
        mm.decode_png_rgb24(bytes(gray))
    ihdr_gray = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    with pytest.raises(ValueError):
        mm.decode_png_rgb24(
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_gray)
            + chunk(b"IDAT", zlib.compress(b"\x00" + bytes(2))) + chunk(b"IEND", b"")
        )
    with pytest.raises(ValueError):  # truncated: no IEND
        mm.decode_png_rgb24(good[:40])


def test_pii_patterns_match_python_re(spark):
    """The Spark (Java regex) and declared-oracle (RE2) PII counts must
    agree with a plain Python `re` reference on constructed rows — the
    fixture corpus has no PII, so this is where the patterns earn their
    keep."""
    import re

    import duckdb

    from base_etl_spark.operators.llm_text import (
        _PII_EMAIL,
        _PII_IPV4,
        _PII_PHONE,
    )

    texts = [
        "contact alice.smith+spam@mail-host.co.uk or bob@x.io today",
        "server at 10.0.0.1 and 192.168.255.3, call 555-123-4567",
        "+49 555-123-4567 backup (555) 123 4567 ip 1.2.3.4",
        "no personal data in this sentence at all",
        "e@a.bc e@a.bc e@a.bc",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )

    class _Shim:
        documents = df

    got = {
        r.doc_id: (r.n_emails, r.n_ipv4, r.n_phones)
        for r in queries()["text_pii_scrub"].tables_fn(_Shim()).collect()
    }
    for i, s in enumerate(texts):
        want = tuple(
            len(re.findall(p, s)) for p in (_PII_EMAIL, _PII_IPV4, _PII_PHONE)
        )
        assert got[i] == want, (i, got[i], want)
    # and the RE2 side (the oracle dialect) agrees on the same rows
    con = duckdb.connect()
    for i, s in enumerate(texts):
        (re2_counts,) = con.execute(
            "SELECT [len(regexp_extract_all(?, ?)), len(regexp_extract_all(?, ?)),"
            " len(regexp_extract_all(?, ?))]",
            [s, _PII_EMAIL, s, _PII_IPV4, s, _PII_PHONE],
        ).fetchone()
        assert tuple(re2_counts) == got[i], (i, re2_counts, got[i])
    assert got[3] == (0, 0, 0)  # clean row stays clean
    assert got[4][0] == 3  # repeated matches all counted


def test_pack_sequences_is_exclusive_token_cumsum(spark, tables):
    """Packing must place each doc at the exclusive prefix sum of token
    counts in doc_id order, regardless of how the two-phase bucketing
    split the work: bin_id * budget + bin_offset == cumsum(preceding)."""
    from base_etl_spark.operators.corpus import _PACK_BUDGET

    rows = sorted(
        queries()["pack_sequences"].tables_fn(tables).collect(),
        key=lambda r: r.doc_id,
    )
    run = 0
    for r in rows:
        assert r.bin_id * _PACK_BUDGET + r.bin_offset == run, r
        assert 0 <= r.bin_offset < _PACK_BUDGET
        run += r.n_tokens


def test_repetition_flags_crafted_docs(spark):
    """A degenerate one-bigram doc must fail the keep rule; a
    repetition-free doc must pass with zero dup fractions."""
    df = spark.createDataFrame(
        [
            (1, "spam " * 40 + "spam"),  # one bigram dominates entirely
            (2, " ".join(f"w{i}" for i in range(40))),  # all distinct
        ],
        "doc_id long, text string",
    )

    class _Shim:
        documents = df

    got = {r.doc_id: r for r in queries()["text_repetition"].tables_fn(_Shim()).collect()}
    assert got[1].keep is False and got[1].top2_frac > 0.9
    assert got[1].dup2_frac > 0.9 and got[1].dup3_frac > 0.9
    assert got[2].keep is True
    assert got[2].dup2_frac == 0.0 and got[2].dup3_frac == 0.0


def test_mix_weights_flatten_to_uniform(spark, tables):
    """sum(share) == 1 and share * weight == 1/n_sources for every
    source — the defining property of flattening weights."""
    rows = queries()["corpus_mix_weights"].tables_fn(tables).collect()
    n = len(rows)
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs(r.token_share * r.mix_weight - 1.0 / n) < 1e-4


def test_kmeans_fixed_point_and_determinism(spark, tables):
    """The returned assignment must be a Lloyd fixed point: (a) every
    vec_id assigned exactly once to a cluster in [0, k); (b) re-deriving
    centroids as the means of the returned clusters and brute-force
    reassigning by nearest centroid reproduces the same assignment
    (convergence => assignment is stable under one more Lloyd step);
    (c) dist is the true L2 to the recomputed centroid within tol."""
    import math

    rows = queries()["cluster_kmeans"].tables_fn(tables).collect()
    n = tables.embeddings.count()
    assert len(rows) == n
    assert len({r.vec_id for r in rows}) == n
    assert all(0 <= r.cluster_id < 8 for r in rows)

    emb = {r.vec_id: list(r.embedding) for r in tables.embeddings.collect()}
    by_cluster: dict[int, list[int]] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r.vec_id)
    cents = {
        cid: [sum(emb[v][i] for v in vs) / len(vs) for i in range(len(next(iter(emb.values()))))]
        for cid, vs in by_cluster.items()
    }
    for r in rows:
        dists = {
            cid: math.sqrt(sum((a - b) ** 2 for a, b in zip(emb[r.vec_id], c)))
            for cid, c in cents.items()
        }
        best = min(dists, key=lambda cid: (dists[cid], cid))
        # stable under one more Lloyd step (ties broken by cluster id,
        # matching the struct-ordering tie-break in the operator)
        assert dists[r.cluster_id] <= dists[best] + 1e-4
        assert abs(r.dist - dists[r.cluster_id]) < 1e-3


def test_hll_rollup_estimates_within_5pct_of_exact(spark):
    from pyspark.sql import functions as F

    from base_etl_spark import load_tables, queries

    t = load_tables(spark, SF_TEST)
    out = {(r.grain, r.day): r.est_users for r in queries()["sketch_hll_rollup"](spark, SF_TEST).collect()}
    exact_daily = {
        str(r.day): r.n
        for r in t.events.groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact_total = t.events.select("user_id").distinct().count()
    for day, n in exact_daily.items():
        assert abs(out[("day", day)] - n) <= max(1, 0.05 * n), day
    assert abs(out[("total", None)] - exact_total) <= max(1, 0.05 * exact_total)
    # merge-of-daily-sketches must estimate the same population as one
    # global sketch would: the union estimate can't be below any daily one
    assert out[("total", None)] >= max(v for (g, _), v in out.items() if g == "day")


def test_pagerank_mass_fixed_point_determinism(spark):
    from pyspark.sql import functions as F

    from base_etl_spark import load_tables, queries

    t = load_tables(spark, SF_TEST)
    out = queries()["graph_pagerank"](spark, SF_TEST)
    rows = {r.node: r.rank for r in out.collect()}
    # mass conservation: symmetrized graph has no dangling nodes
    assert abs(sum(rows.values()) - 1.0) < 1e-6
    # node set == all trade participants on both sides
    n_cust = t.orders.select("o_custkey").distinct().count()
    n_supp = t.lineitem.select("l_suppkey").distinct().count()
    assert len(rows) == n_cust + n_supp
    # determinism at the rounded precision
    rows2 = {r.node: r.rank for r in queries()["graph_pagerank"](spark, SF_TEST).collect()}
    assert rows == rows2
    # every rank at least the teleport floor
    base = 0.15 / len(rows)
    assert all(v >= base - 1e-12 for v in rows.values())


def test_hll_overlap_tracks_exact_retention(spark):
    from pyspark.sql import functions as F

    from base_etl_spark import load_tables, queries

    t = load_tables(spark, SF_TEST)
    out = {r.day: r.est_retained for r in queries()["sketch_hll_overlap"](spark, SF_TEST).collect()}
    days = t.events.select(F.to_date("ts").alias("d"), "user_id").distinct()
    a = days.select(F.col("d").alias("d0"), F.col("user_id").alias("u0"))
    b = days.select(F.col("d").alias("d1"), F.col("user_id").alias("u1"))
    exact = {
        str(r.d0): r.n
        for r in a.join(
            b, (F.date_add(F.col("d0"), 1) == F.col("d1")) & (F.col("u0") == F.col("u1"))
        )
        .groupBy("d0")
        .agg(F.countDistinct("u0").alias("n"))
        .collect()
    }
    assert set(out) == set(exact)
    for day, n in exact.items():
        # inclusion-exclusion triples the sketch error: wide tolerance
        assert abs(out[day] - n) <= max(3, 0.15 * n), (day, out[day], n)


def test_compress_ratio_bounds_and_monotonicity(spark):
    from base_etl_spark import queries

    rows = queries()["text_compress_ratio"](spark, SF_TEST).collect()
    assert rows and all(0.0 < r.compress_ratio <= 1.5 for r in rows)
    # constructed docs: pure repetition must compress harder than varied text
    from base_etl_spark.operators.llm_text import _zratio
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "spam " * 200), (2, " ".join(f"w{i}x{i * 7 % 13}" for i in range(200)))],
        "doc_id long, text string",
    ).select("doc_id", _zratio(F.col("text")).alias("r"))
    got = {r.doc_id: r.r for r in df.collect()}
    assert got[1] < got[2] * 0.5


def test_python_udtf_matches_expression_twin(spark):
    """udtf_python's chunking must equal the pure-expression slice twin
    row-for-row (the UDTF exists to pin the API, not new semantics)."""
    from pyspark.sql import functions as F

    from base_etl_spark import load_tables, queries

    got = sorted(
        (r.doc_id, r.chunk_idx, r.start_tok, r.n_toks, r.chunk_chars)
        for r in queries()["udtf_python"](spark, SF_TEST).collect()
    )
    t = load_tables(spark, SF_TEST)
    toks = F.split("text", " ")
    n_chunks = F.ceil(F.size(toks) / 16).cast("int")
    twin = (
        t.documents.select("doc_id", toks.alias("ws"), n_chunks.alias("nc"))
        .select("doc_id", "ws", F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("ci"))
        .select(
            "doc_id",
            F.col("ci").alias("chunk_idx"),
            (F.col("ci") * 16).alias("start_tok"),
            F.size(F.slice("ws", F.col("ci") * 16 + 1, 16)).alias("n_toks"),
            F.length(F.concat_ws(" ", F.slice("ws", F.col("ci") * 16 + 1, 16))).alias(
                "chunk_chars"
            ),
        )
    )
    want = sorted(
        (r.doc_id, r.chunk_idx, r.start_tok, r.n_toks, r.chunk_chars) for r in twin.collect()
    )
    assert got == want


def test_mean_family_inequality(spark):
    from base_etl_spark import queries

    for r in queries()["agg_mean_family"](spark, SF_TEST).collect():
        assert r.arith_mean >= r.geo_mean >= r.harm_mean > 0


def test_binary_files_cover_all_tables(spark):
    from base_etl_spark import queries
    from base_etl_spark.schemas import TABLE_NAMES

    rows = queries()["scan_binary_files"](spark, SF_TEST).collect()
    names = [r.file_name for r in rows]
    assert sorted(names) == sorted(f"{n}.parquet" for n in TABLE_NAMES)
    assert all(r.n_bytes > 0 for r in rows)


def test_minhash_estimates_within_binomial_bound(spark):
    import math

    from base_etl_spark import queries

    rows = queries()["dedup_minhash_estimate"](spark, SF_TEST).collect()
    assert rows
    errs = []
    for r in rows:
        if r.jaccard_exact is None:
            continue  # candidate below the exact-pair threshold — fine
        j = r.jaccard_exact
        se = math.sqrt(max(j * (1 - j), 1e-9) / 32)
        assert abs(r.jaccard_est - j) <= 4 * se + 1 / 32 + 1e-6, (r, se)
        errs.append(r.jaccard_est - j)
    assert errs and abs(sum(errs) / len(errs)) < 0.1


def test_freq_items_superset_guarantee(spark):
    """freqItems' sketch contract: every value whose exact relative
    frequency exceeds the support threshold MUST appear (false negatives
    forbidden; false positives tolerated)."""
    from base_etl_spark import load_tables, queries
    from tests.conftest import SF_TEST

    t = load_tables(spark, SF_TEST)
    got = {r.frequent_item for r in queries()["agg_freq_items"](spark, SF_TEST).collect()}
    total = t.orders.count()
    exact = {
        r.o_orderpriority
        for r in t.orders.groupBy("o_orderpriority").count().collect()
        if r["count"] / total > 0.15
    }
    assert exact, "fixture must have at least one heavy hitter at 15%"
    assert exact <= got


def test_file_stats_invariants(spark, tables):
    """etl_file_stats (R): per-file rows sum to the table count, every
    file is non-empty, and the per-file key ranges bound the global."""
    from tests.conftest import SF_TEST

    rows = _QS["etl_file_stats"](spark, SF_TEST).collect()
    assert rows and all(r.n_rows > 0 and r.file_bytes > 0 for r in rows)
    assert sum(r.n_rows for r in rows) == tables.orders.count()
    lo = tables.orders.agg(F.min("o_orderkey")).first()[0]
    hi = tables.orders.agg(F.max("o_orderkey")).first()[0]
    assert min(r.min_key for r in rows) == lo
    assert max(r.max_key for r in rows) == hi
    assert {r.file_ord for r in rows} == set(range(1, len(rows) + 1))


def test_mmr_kernel_prefers_diversity():
    """Unit-test the greedy MMR kernel on a constructed case: candidate
    B is a near-clone of top hit A, candidate C is orthogonal with a
    slightly lower query sim — MMR must rank C above B at position 2."""
    import numpy as np
    import pandas as pd

    from base_etl_spark.operators.llm_vectors import _mmr_kernel

    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.999, 0.01, 0.0, 0.0]   # near-duplicate of a
    c = [0.0, 1.0, 0.0, 0.0]      # orthogonal
    d = [0.0, 0.0, 1.0, 0.0]
    pdf = pd.DataFrame(
        {
            "probe_id": [0, 0, 0, 0],
            "neighbor_id": [10, 11, 12, 13],
            "embedding": [np.array(a), np.array(b), np.array(c), np.array(d)],
            # query sims: a best, clone b second, diverse c close behind
            "cos_sim": [0.95, 0.94, 0.90, 0.40],
        }
    )
    out = _mmr_kernel(pdf).sort_values("rank")
    # clone 11 (query sim 0.94) is demoted below diverse 12 (0.90):
    # 0.7*0.94 - 0.3*cos(a,b)~=0.358 < 0.7*0.90 - 0 = 0.63
    assert list(out["neighbor_id"])[:2] == [10, 12]
    assert list(out["rank"]) == [1, 2, 3, 4]
    by_id = {int(r.neighbor_id): float(r.mmr_score) for r in out.itertuples()}
    assert abs(by_id[12] - 0.63) < 1e-9
    assert by_id[11] < 0.40  # the diversity penalty genuinely bit


def test_mmr_integration_invariants(spark):
    """sim_mmr_rerank over the fixture: 5 distinct ranks per probe,
    rank-1 equals the cosine top-1 (first greedy pick has no diversity
    penalty), every pick comes from that probe's top-20 candidates, and
    scores never increase with rank (the greedy objective is
    assert rank-1 max)."""
    got = {}
    for r in _QS["sim_mmr_rerank"](spark, SF_TEST).collect():
        got.setdefault(r.probe_id, []).append(r)
    top = {}
    for r in _QS["sim_topk"](spark, SF_TEST).collect():
        top.setdefault(r.probe_id, []).append((r.rn, r.neighbor_id))
    assert set(got) == set(top)
    for p, rows in got.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == [1, 2, 3, 4, 5]
        ids = [r.neighbor_id for r in rows]
        assert len(set(ids)) == 5
        rank1 = next(r.neighbor_id for r in rows if r.rank == 1)
        top1 = next(i for rn, i in top[p] if rn == 1)
        assert rank1 == top1
        s1 = next(r.mmr_score for r in rows if r.rank == 1)
        assert all(s1 >= r.mmr_score for r in rows)


def test_fuzzy_join_finds_every_planted_twin(spark):
    """join_fuzzy_blocked recall on its own construction: every mangle
    class is sort-local by design (trailing junk / last-char sub /
    doubled final char), so EVERY dirty twin must pair with its source
    clean key inside the w=24 neighborhood — zero planted misses."""
    from base_etl_spark import load_tables

    t = load_tables(spark, SF_TEST)
    pairs = {
        (r.clean_key, r.dirty_key)
        for r in _QS["join_fuzzy_blocked"](spark, SF_TEST).collect()
    }
    keys = [r.s_suppkey for r in t.supplier.select("s_suppkey").collect()]
    missing = [k for k in keys if (k, k) not in pairs]
    assert missing == []


def test_cms_estimates_obey_one_sided_error_law(spark):
    """sketch_cms_freq: the count-min law is one-sided — a cell only
    ever OVERcounts — so exact <= estimate <= exact + eps*N must hold
    for every event type (eps=1e-3, confidence .99; the bound is
    deterministic here: fixed seed, fixed fixture)."""
    rows = _QS["sketch_cms_freq"](spark, SF_TEST).collect()
    assert rows, "events fixture is non-empty"
    total = sum(r.n_exact for r in rows)
    slack = max(1, int(0.001 * total) + 1)
    for r in rows:
        assert r.n_est >= r.n_exact, (r.event_type, r.n_exact, r.n_est)
        assert r.n_est - r.n_exact <= slack, (r.event_type, r.n_exact, r.n_est)
        assert r.n_over == r.n_est - r.n_exact


def test_ks_stat_matches_direct_computation(spark):
    """events_ks_test vs a literal driver-side ECDF max over the same
    arm assignment — pins the distributed two-phase prefix sum (range
    repartition + per-partition cumsum + offsets) to the textbook
    definition, independently of the SQL oracle."""
    from base_etl_spark import load_tables

    t = load_tables(spark, SF_TEST)
    data = sorted(
        ((r.value, "A" if (r.user_id * 2654435761) % 100 < 50 else "B")
         for r in t.events.select("user_id", "value").collect()
         if r.value is not None)
    )
    n_a = sum(1 for _, v in data if v == "A")
    n_b = len(data) - n_a
    ca = cb = 0
    best = 0
    i = 0
    while i < len(data):
        j = i
        while j < len(data) and data[j][0] == data[i][0]:
            if data[j][1] == "A":
                ca += 1
            else:
                cb += 1
            j += 1
        best = max(best, abs(ca * n_b - cb * n_a))
        i = j
    row = _QS["events_ks_test"](spark, SF_TEST).collect()[0]
    assert row.n_a == n_a and row.n_b == n_b
    assert row.ks_stat == round(best / (n_a * n_b), 6)


def test_ks_prefix_sum_is_distributed(spark):
    """The KS cumulative counts must come from the two-phase pattern:
    a range repartition on value and a pid-partitioned window — never
    one unpartitioned window over the full fact table."""
    import re

    df = _QS["events_ks_test"](spark, SF_TEST)
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    assert "rangepartitioning(value" in plan
    assert re.search(r"hashpartitioning\(pid", plan), plan[:2000]


def test_triangle_count_planted_graph(spark):
    """Hand-built lineitem with known supplier co-occurrence: orders
    {1,2,3}, {1,2}, {3,4}. KNN pruning (k=5) keeps every edge at these
    degrees, so the census is the raw graph's: edges {12,13,23,34},
    degrees (2,2,3,1) => wedges 1+1+3+0 = 5, one triangle {1,2,3},
    clustering 3·1/5 = 0.6."""
    from base_etl_spark.registry import REGISTRY

    li = spark.createDataFrame(
        [(10, s) for s in (1, 2, 3)]
        + [(20, s) for s in (1, 2)]
        + [(30, s) for s in (3, 4)],
        "l_orderkey bigint, l_suppkey bigint",
    )

    class _T:
        lineitem = li

    (row,) = REGISTRY["graph_triangle_count"].fn.tables_fn(_T()).collect()
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (4, 4, 5, 1)
    assert abs(row.clustering - 0.6) < 1e-12


def test_image_dedup_planted_families(spark):
    """doc_id % 37 keys the rendered image, so ids {0, 37, 74} share one
    byte-identical asset and {1, 38} another: the hash buckets, reps,
    member counts and is_dup flags are forced."""
    from base_etl_spark.registry import REGISTRY

    docs = spark.createDataFrame(
        [(i,) for i in (0, 1, 37, 38, 74)], "doc_id bigint"
    )

    class _T:
        documents = docs

    rows = {r.doc_id: r for r in REGISTRY["mm_image_dedup"].fn.tables_fn(_T()).collect()}
    assert len(rows) == 5
    fam0 = [rows[i] for i in (0, 37, 74)]
    fam1 = [rows[i] for i in (1, 38)]
    assert len({r.img_hash for r in fam0}) == 1
    assert len({r.img_hash for r in fam1}) == 1
    assert fam0[0].img_hash != fam1[0].img_hash
    assert all(r.rep_doc_id == 0 and r.n_members == 3 for r in fam0)
    assert all(r.rep_doc_id == 1 and r.n_members == 2 for r in fam1)
    assert [rows[i].is_dup for i in (0, 1, 37, 38, 74)] == [
        False, False, True, True, True,
    ]


def test_bitsign_two_stage_recall_vs_brute_force(spark):
    """The sign-sketch prefilter is declared lossy; its QUALITY contract
    is recall against the exact brute-force top-5 (sim_topk) — measured
    0.96 mean / 0.8 min at this fixture, pinned with slack. Structure:
    exactly 5 ranked neighbors per probe, ranks 1..5, no self-matches."""
    brute, two = {}, {}
    for r in _QS["sim_topk"](spark, SF_TEST).collect():
        brute.setdefault(r.probe_id, set()).add(r.neighbor_id)
    rows = _QS["sim_topk_bitsign"](spark, SF_TEST).collect()
    for r in rows:
        assert r.neighbor_id != r.probe_id
        two.setdefault(r.probe_id, set()).add(r.neighbor_id)
    assert set(two) == set(brute)
    for p, ns in two.items():
        assert len(ns) == 5
    ranks = {}
    for r in rows:
        ranks.setdefault(r.probe_id, []).append(r.rn)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in ranks.values())
    recalls = [len(brute[p] & two[p]) / len(brute[p]) for p in brute]
    assert sum(recalls) / len(recalls) >= 0.9
    assert min(recalls) >= 0.6


def test_changepoint_planted_level_shift(spark):
    """10 days at 5 events/day then a shift to 15/day: the scaled CUSUM
    |n·S_i| = |10·cum_i − i·100| peaks exactly at the last low-regime
    day (i=5: |250|), so day 5 must carry the flag."""
    import datetime as dt

    rows = []
    eid = 0
    for day in range(1, 11):
        for _ in range(5 if day <= 5 else 15):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, day, 12, 0, 0)))
    ev = spark.createDataFrame(rows, "event_id bigint, ts timestamp")

    class _T:
        events = ev

    from base_etl_spark.registry import REGISTRY

    out = {r.day.isoformat(): r for r in
           REGISTRY["events_changepoint"].fn.tables_fn(_T()).collect()}
    assert out["2024-01-05"].is_changepoint
    assert out["2024-01-05"].cusum_scaled == -250
    assert sum(r.is_changepoint for r in out.values()) == 1


def test_cohort_survival_planted_km(spark):
    """Hand-computed Kaplan–Meier: deaths (first purchase) at t=1 (x2,
    n=5), t=3 (n=3), t=5 (n=2), one user censored at t=5 (no purchase,
    at risk through the horizon). S = 0.6, 0.4, 0.2 — the censored user
    keeps t=3's at-risk count at 3, which a converters-only estimate
    would get wrong."""
    import datetime as dt

    D = lambda day, hh=12: dt.datetime(2024, 1, day, hh, 0, 0)
    rows = [
        (1, 10, "click", D(1)), (2, 10, "purchase", D(2)),      # t=1
        (3, 20, "click", D(1)), (4, 20, "purchase", D(4)),      # t=3
        (5, 30, "click", D(1)), (6, 30, "click", D(3)),         # censored t=5
        (7, 40, "click", D(3)), (8, 40, "purchase", D(4)),      # t=1
        (9, 50, "click", D(1)), (10, 50, "purchase", D(6)),     # t=5 (horizon)
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, event_type string, ts timestamp"
    )

    class _T:
        events = ev

    from base_etl_spark.registry import REGISTRY

    got = {
        r.t_days: (r.n_risk, r.n_deaths, r.survival)
        for r in REGISTRY["events_cohort_survival"].fn.tables_fn(_T()).collect()
    }
    assert got == {1: (5, 2, 0.6), 3: (3, 1, 0.4), 5: (2, 1, 0.2)}


def test_asof_nearest_direction_and_ties(spark):
    """Planted timeline, one user: clicks at 10:00 and 10:10. A purchase
    at 10:06 is closer to the LATER click (fwd), at 10:04 to the EARLIER
    (back), at exactly 10:05 equidistant -> back wins (causal tie rule);
    a purchase before any click matches forward; a user with no clicks
    keeps a NULL match."""
    import datetime as dt

    T = lambda m, s=0: dt.datetime(2024, 1, 1, 10, m, s)  # noqa: E731
    rows = [
        (1, T(0), 100, "click"),
        (1, T(10), 101, "click"),
        (1, T(6), 200, "purchase"),   # fwd: gap 4 min < back 6 min
        (1, T(4), 201, "purchase"),   # back: gap 4 min < fwd 6 min
        (1, T(5), 202, "purchase"),   # tie 5 min -> back
        (2, T(9), 102, "click"),
        (2, T(1), 203, "purchase"),   # nothing before -> fwd
        (3, T(2), 204, "purchase"),   # no clicks at all -> NULL
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, event_type string"
    )

    class _T:
        events = ev

    from base_etl_spark.registry import REGISTRY

    out = {
        r.purchase_id: r
        for r in REGISTRY["join_asof_nearest"].fn.tables_fn(_T()).collect()
    }
    assert (out[200].matched_click, out[200].direction) == (101, "fwd")
    assert (out[201].matched_click, out[201].direction) == (100, "back")
    assert (out[202].matched_click, out[202].direction) == (100, "back")
    assert out[202].gap_us == 5 * 60 * 1_000_000
    assert (out[203].matched_click, out[203].direction) == (102, "fwd")
    assert out[204].matched_click is None and out[204].direction is None


def test_drawdown_planted_series(spark):
    """Monthly revenue 100, 80, 120, 60, 90, 60: running peak
    100,100,120,120,120,120 -> drawdowns 0,20,0,60,30,60. Deepest dip 60
    occurs twice (months 4 and 6); the EARLIEST month must win, with the
    pct against the running peak at that trough (60/120)."""
    import datetime as dt

    revs = [100.0, 80.0, 120.0, 60.0, 90.0, 60.0]
    orders = spark.createDataFrame(
        [(1, r, dt.datetime(2024, m + 1, 15)) for m, r in enumerate(revs)],
        "o_custkey bigint, o_totalprice double, o_orderdate timestamp",
    )

    class _T:
        pass

    _T.orders = orders
    _T.customer = spark.createDataFrame([(1, 7)], "c_custkey bigint, c_nationkey bigint")
    _T.nation = spark.createDataFrame([(7, "FRANCE")], "n_nationkey bigint, n_name string")

    from base_etl_spark.registry import REGISTRY

    [r] = REGISTRY["win_drawdown"].fn.tables_fn(_T()).collect()
    assert r.n_months == 6 and r.peak_rev == 120.0
    assert r.max_drawdown == 60.0
    assert r.max_drawdown_pct == 0.5
    assert r.trough_month == dt.datetime(2024, 4, 1)


def test_bpe_pairs_planted_counts(spark):
    """Corpus 'ab ab b': word freqs ab:2, b:1. Symbol pairs weighted by
    word frequency: (a,b) 2, (b,</w>) 2+1=3 — the end-of-word marker
    pair must aggregate ACROSS words sharing the boundary symbol."""

    class _T:
        pass

    _T.documents = spark.createDataFrame([(1, "ab ab b")], "doc_id bigint, text string")

    from base_etl_spark.registry import REGISTRY

    out = {
        (r.left_sym, r.right_sym): r.pair_count
        for r in REGISTRY["tokenizer_bpe_pairs"].fn.tables_fn(_T()).collect()
    }
    assert out == {("b", "</w>"): 3, ("a", "b"): 2}


def test_pmi_planted_independence_is_zero(spark):
    """4 docs: {x y} x3 + {x z w}: only (x,y) reaches support 3.
    P(x)=1, so co-occurrence with x carries no information: PMI must be
    exactly ln(3*4/(4*3)) = 0. Sub-support pairs must not appear."""

    class _T:
        pass

    docs = [(1, "x y"), (2, "x y"), (3, "x y"), (4, "x z w")]
    _T.documents = spark.createDataFrame(docs, "doc_id bigint, text string")

    from base_etl_spark.registry import REGISTRY

    rows = REGISTRY["text_pmi_cooccur"].fn.tables_fn(_T()).collect()
    assert len(rows) == 1
    [r] = rows
    assert (r.w1, r.w2, r.n_docs_pair, r.df1, r.df2, r.pmi) == ("x", "y", 3, 4, 3, 0.0)


def test_backfill_plan_planted_gaps(spark):
    """Orders on Jan 1,2,5,6,10: missing dates coalesce to exactly
    [3-4] (2 days) and [7-9] (3 days) — islands, not per-day rows."""
    import datetime as dt

    class _T:
        pass

    days = [1, 2, 5, 6, 10]
    _T.orders = spark.createDataFrame(
        [(d, dt.datetime(2024, 1, d, 9, 30)) for d in days],
        "o_orderkey bigint, o_orderdate timestamp",
    )

    from base_etl_spark.registry import REGISTRY

    got = {
        (r.range_start.isoformat(), r.range_end.isoformat(), r.n_days)
        for r in REGISTRY["etl_backfill_plan"].fn.tables_fn(_T()).collect()
    }
    assert got == {("2024-01-03", "2024-01-04", 2), ("2024-01-07", "2024-01-09", 3)}


def test_jaccard_planted_link_prediction(spark):
    """Co-occurrence orders {1,2},{1,3},{2,3},{1,4},{2,4} build edges
    12,13,23,14,24. Exactly two pairs share >= 2 neighbors: the EDGE
    (1,2) with J = 2/4, and the NON-edge (3,4) with J = 2/2 = 1.0 — the
    predicted missing link must surface with is_edge = false."""

    class _T:
        pass

    orders = [(10, 1), (10, 2), (11, 1), (11, 3), (12, 2), (12, 3),
              (13, 1), (13, 4), (14, 2), (14, 4)]
    _T.lineitem = spark.createDataFrame(
        orders, "l_orderkey bigint, l_suppkey bigint"
    )

    from base_etl_spark.registry import REGISTRY

    rows = {
        (r.u, r.v): r
        for r in REGISTRY["graph_jaccard_similarity"].fn.tables_fn(_T()).collect()
    }
    assert set(rows) == {(1, 2), (3, 4)}
    assert rows[(1, 2)].is_edge and rows[(1, 2)].jaccard == 0.5
    assert not rows[(3, 4)].is_edge and rows[(3, 4)].jaccard == 1.0
    assert rows[(3, 4)].n_common == 2 and rows[(3, 4)].deg_u == 2


def test_silence_trim_planted_frames(spark):
    """doc_id 13: 21 frames, 1 leading + 3 trailing silent frames ->
    active span frames 1..17 (17 frames, 85 samples) — from DECODED
    integers, and the planted quiet/loud classes are orders of
    magnitude apart so the threshold can't sit near either."""

    class _T:
        pass

    _T.documents = spark.createDataFrame([(13,)], "doc_id bigint")

    from base_etl_spark.registry import REGISTRY

    [r] = REGISTRY["mm_audio_silence_trim"].fn.tables_fn(_T()).collect()
    assert (r.n_frames, r.first_active, r.last_active) == (21, 1, 17)
    assert r.n_active == 17 and r.active_samples == 85


def test_scene_cut_planted_boundaries(spark):
    """doc_id 7: 8 frames, scene length 3 -> scenes 000 111 22; cuts
    fire at frames 3 and 6 exactly; within-scene deltas are 0 (decoded
    frames of one scene are bit-identical)."""

    class _T:
        pass

    _T.documents = spark.createDataFrame([(7,)], "doc_id bigint")

    from base_etl_spark.registry import REGISTRY

    rows = {r.frame_no: r for r in
            REGISTRY["mm_video_scene_cut"].fn.tables_fn(_T()).collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6, 7}
    assert {f for f, r in rows.items() if r.is_cut} == {3, 6}
    assert all(r.delta == 0 for f, r in rows.items() if f not in (3, 6))
    assert rows[3].delta > 0 and rows[6].delta > 0


def test_welch_ttest_planted_arms(spark):
    """Hand-placed users (hash-verified arms: 2,4 -> A; 1,3 -> B) with
    values A={1,3}, B={2,6}: mean_a=2, mean_b=4, var_a=2, var_b=8 ->
    t = -2/sqrt(5) = -0.894427, Welch df = 25/17 = 1.470588."""
    import datetime as dt

    class _T:
        pass

    rows = [(2, 1.00), (4, 3.00), (1, 2.00), (3, 6.00)]
    _T.events = spark.createDataFrame(
        [(u, v, dt.datetime(2024, 1, 1)) for u, v in rows],
        "user_id bigint, value double, ts timestamp",
    )

    from base_etl_spark.registry import REGISTRY

    [r] = REGISTRY["events_welch_ttest"].fn.tables_fn(_T()).collect()
    assert (r.n_a, r.n_b, r.mean_a, r.mean_b) == (2, 2, 2.0, 4.0)
    assert r.t_stat == -0.894427
    assert r.welch_df == 1.470588


def test_recall_report_perfect_on_small_corpus(spark):
    """12 deterministic vectors: the Hamming prefilter (top-100) keeps
    the WHOLE corpus, so the two-stage rerank degenerates to exact brute
    force and every probe's recall must be exactly 1.0 at every k —
    the report's upper anchor. (The fixture-scale lower anchor, recall
    0.96/0.8 vs brute force, is pinned in
    test_bitsign_two_stage_recall_vs_brute_force.)"""

    class _T:
        pass

    vecs = [
        (i, [((i * 7 + j * 13) % 19) / 10.0 - 0.9 for j in range(8)])
        for i in range(12)
    ]
    _T.embeddings = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")

    from base_etl_spark.registry import REGISTRY

    rows = REGISTRY["sim_recall_at_k"].fn.tables_fn(_T()).collect()
    assert len(rows) == 30  # 10 probes x k in (1, 3, 5)
    assert all(r.recall == 1.0 and r.n_hits == r.k for r in rows)


def test_holt_linear_planted_series(spark):
    """Textbook hand-run (alpha=.3, beta=.2) on 100,110,125,130:
    l1=110, b1=10 -> l2=121.5, b2=10.3 -> l3=131.26, b3=10.192,
    forecast_3 = 131.26 + 3*10.192 = 161.836. Also pins that Spark's
    aggregate() lambda is PURE (the DuckDB 1.0.0 list_reduce in-place
    field-mutation defect, probed and documented in the oracle, would
    produce b3=9.6064 here)."""
    import datetime as dt

    class _T:
        pass

    revs = [100.0, 110.0, 125.0, 130.0]
    _T.orders = spark.createDataFrame(
        [(1, r, dt.datetime(2024, m + 1, 10)) for m, r in enumerate(revs)],
        "o_custkey bigint, o_totalprice double, o_orderdate timestamp",
    )
    _T.customer = spark.createDataFrame([(1, 7)], "c_custkey bigint, c_nationkey bigint")
    _T.nation = spark.createDataFrame([(7, "FRANCE")], "n_nationkey bigint, n_name string")

    from base_etl_spark.registry import REGISTRY

    [r] = REGISTRY["win_holt_linear"].fn.tables_fn(_T()).collect()
    assert (r.n_months, r.level, r.trend) == (4, 131.26, 10.192)
    assert r.forecast_h3 == 161.836


def test_url_dedup_planted_variants(spark):
    """doc 0 carries EVERY dirty dim (uppercase scheme+host, www.,
    utm params, swapped param order, trailing slash, fragment); doc 149
    shares its canonical key (149 % 149 = 0) with NONE of the dirt.
    Both must normalize to the identical canonical string and collapse
    to rep 0."""

    class _T:
        pass

    _T.documents = spark.createDataFrame([(0,), (149,)], "doc_id bigint")

    from base_etl_spark.registry import REGISTRY

    rows = {r.doc_id: r for r in
            REGISTRY["dedup_url_canonical"].fn.tables_fn(_T()).collect()}
    want = "http://site0.example.com/p/0?id=0&v=1"
    assert rows[0].canonical == want and rows[149].canonical == want
    assert rows[0].rep_doc_id == 0 and not rows[0].is_dup
    assert rows[149].rep_doc_id == 0 and rows[149].is_dup
    assert rows[149].n_members == 2


def test_pca_power_planted_direction(spark):
    """Embeddings = t·w + small orthogonal noise for a planted unit
    direction w: the returned axis must align with w (|cos| > 0.99),
    carry most of the variance, satisfy the positive-max sign pin, and
    be unit length after rounding."""
    import math
    import random

    class _T:
        pass

    dim = 64
    rng = random.Random(3)
    w = [math.sin(0.37 * i + 1.0) for i in range(dim)]
    nw = math.sqrt(sum(c * c for c in w))
    w = [c / nw for c in w]
    rows = []
    for vid in range(120):
        t_ = rng.gauss(0, 5.0)  # dominant axis
        vec = [t_ * w[i] + rng.gauss(0, 0.05) for i in range(dim)]
        rows.append((vid, [float(c) for c in vec]))
    _T.embeddings = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    from base_etl_spark.registry import REGISTRY

    out = sorted(
        REGISTRY["embedding_pca_power"].fn.tables_fn(_T()).collect(),
        key=lambda r: r.dim,
    )
    v = [r.loading for r in out]
    assert len(v) == 64
    assert abs(sum(c * c for c in v) - 1.0) < 1e-4  # unit after 6dp
    cos = abs(sum(a * b for a, b in zip(v, w)))
    assert cos > 0.99, cos
    k = max(range(dim), key=lambda i: abs(v[i]))
    assert v[k] > 0  # sign pin
    assert out[0].explained_share > 0.9
    assert out[0].conv_delta < 1e-6


def test_pca_power_residual_on_fixture(spark):
    """Eigen residual ‖Cv − λv‖/λ on the real fixture: the fixed-15-
    round iterate must be a near-eigenvector even on the isotropic
    corpus (conv_delta reported, not hidden). Bounds re-measured when
    r8 cut the round contract 60→15 (the 60-round sweep cost 184 s at
    sf0.01, ~25x any other key, for a residual gain of 0.03→0.05 on a
    corpus with no real top axis): sf0.001 resid 0.0524 / conv_delta
    1.4e-3 measured 2026-08-15."""
    import numpy as np

    from base_etl_spark import load_tables

    t = load_tables(spark, SF_TEST)
    rows = sorted(_QS["embedding_pca_power"](spark, SF_TEST).collect(),
                  key=lambda r: r.dim)
    v = np.array([r.loading for r in rows])
    lam = rows[0].eigenvalue
    X = np.array(
        [list(r.embedding) for r in t.embeddings.select("embedding").collect()],
        dtype=np.float64,
    )
    mu = X.mean(axis=0)
    Xc = X - mu
    Cv = Xc.T @ (Xc @ v) / len(X)
    resid = np.linalg.norm(Cv - lam * v) / lam
    assert resid < 0.08, resid
    assert rows[0].conv_delta < 2e-3


def test_dedup_spans_planted(spark):
    """Planted chunk anatomy: a cross-document duplicated chunk (A), a
    within-document repeat (D twice in one doc), a sub-8-word doc (zero
    chunks, never enters the shuffle), and a partial tail (ignored).
    Pins the n_occ >= 2 rule counting BOTH repeat kinds, the ratio
    denominator being full chunks only, and keep = ratio <= 0.5
    (boundary: exactly 0.5 keeps)."""

    class _T:
        pass

    A = "a b c d e f g h"          # appears in docs 1 and 2
    B = "i j k l m n o p"          # unique
    C = "q r s t u v w x"          # unique
    D = "r1 r2 r3 r4 r5 r6 r7 r8"  # twice within doc 3
    _T.documents = spark.createDataFrame(
        [
            (1, f"{A} {B}"),
            (2, f"{A} {C}"),
            (3, f"{D} {D}"),
            (4, "only seven words live in this doc"),
            (5, f"{B.replace('i', 'zz')} tail1 tail2"),
        ],
        "doc_id bigint, text string",
    )

    from base_etl_spark.registry import REGISTRY

    rows = {r.doc_id: r for r in
            REGISTRY["dedup_spans"].fn.tables_fn(_T()).collect()}
    assert (rows[1].n_chunks, rows[1].n_dup_chunks, rows[1].keep) == (2, 1, True)
    assert rows[1].dup_chunk_ratio == 0.5
    assert (rows[2].n_chunks, rows[2].n_dup_chunks) == (2, 1)
    assert (rows[3].n_chunks, rows[3].n_dup_chunks, rows[3].keep) == (2, 2, False)
    assert rows[3].dup_chunk_ratio == 1.0
    assert (rows[4].n_chunks, rows[4].n_dup_chunks, rows[4].keep) == (0, 0, True)
    assert rows[4].dup_chunk_ratio == 0.0
    assert (rows[5].n_chunks, rows[5].n_dup_chunks) == (1, 0)


def _ref_bpe(word_freqs: dict, n_merges: int):
    """Pure-Python reference BPE trainer (Sennrich 2016): pair counts
    weighted by word freq, winner = (count desc, lexicographically
    smallest pair), left-to-right non-overlapping merge application."""
    vocab = {w: tuple(list(w) + ["</w>"]) for w in word_freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = tuple(out)
    return merges


def test_bpe_batch_guard_fuzz():
    """The r12 batched-merge guard (_pick_merge_batch) must yield a
    merge table AND final vocab identical to the sequential reference
    for ANY input — replayed here in pure Python (no Spark) over
    adversarial fuzz vocabs: 2-4 letter alphabets (forces shared-symbol
    interactions and count ties), tiny top-K values (forces the
    truncation floor), and alphabets containing '<', '/', 'w', '>'
    (forces merged strings that collide with the '</w>' marker, the
    msym hazard)."""
    import random

    from base_etl_spark.operators.llm_text import _pick_merge_batch

    def batched(freqs, n_merges, k):
        vocab = {w: tuple(list(w) + ["</w>"]) for w in freqs}
        merges, merged_strings, rounds = [], set(), 0
        while len(merges) < n_merges:
            counts: dict = {}
            for w, syms in vocab.items():
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    counts[p] = counts.get(p, 0) + freqs[w]
            if not counts:
                break
            ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            truncated = len(ranked) > k
            ranked = [(l, r, c) for (l, r), c in ranked[:k]]
            batch = _pick_merge_batch(
                ranked, truncated, n_merges - len(merges), merged_strings
            )
            assert batch, "the argmax pair must always be accepted"
            for l, r, m, c in batch:
                merges.append((len(merges) + 1, l, r, m, c))
                merged_strings.add(m)
            pairmap: dict = {}
            for l, r, m, _c in batch:
                pairmap.setdefault(l, {})[r] = m
            new_vocab = {}
            for w, syms in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    nxt = pairmap.get(syms[i])
                    if i + 1 < len(syms) and nxt is not None and syms[i + 1] in nxt:
                        out.append(nxt[syms[i + 1]])
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                new_vocab[w] = tuple(out)
            vocab = new_vocab
            rounds += 1
        return merges, vocab, rounds

    def ref_with_vocab(freqs, n_merges):
        vocab = {w: tuple(list(w) + ["</w>"]) for w in freqs}
        merges = []
        for rank in range(1, n_merges + 1):
            counts: dict = {}
            for w, syms in vocab.items():
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    counts[p] = counts.get(p, 0) + freqs[w]
            if not counts:
                break
            (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((rank, l, r, l + r, c))
            for w, syms in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                vocab[w] = tuple(out)
        return merges, vocab

    saved_rounds = 0
    for seed in range(800):
        rng = random.Random(seed)
        alpha = ["ab", "abc", "abcd", "</w>", "ab<>/w"][seed % 5]
        freqs: dict = {}
        for _ in range(rng.randint(1, 30)):
            w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
            freqs[w] = freqs.get(w, 0) + rng.choice([1, 1, 1, 2, 3, 7])
        n_merges = rng.choice([4, 8, 12])
        k = rng.choice([2, 3, 8, 24])
        ref_m, ref_v = ref_with_vocab(freqs, n_merges)
        got_m, got_v, rounds = batched(freqs, n_merges, k)
        assert got_m == ref_m, f"seed {seed}: merge table diverged"
        assert got_v == ref_v, f"seed {seed}: final vocab diverged"
        saved_rounds += len(ref_m) - rounds
    assert saved_rounds > 0, "batching never batched — guard degenerate"


def test_bpe_train_matches_reference_planted(spark):
    """Planted vocab with an overlap trap ('aaaa' → left-to-right gives
    TWO 'aa' tokens, not three overlapping pairs merged) and a
    count-tie broken lexicographically. The merge tables must be
    IDENTICAL to the pure-Python reference — an exact external oracle
    for the rows-only key."""

    class _T:
        pass

    corpus = ["aaaa low low lower", "aaaa low newest newest", "widest"]
    _T.documents = spark.createDataFrame(
        [(i, s) for i, s in enumerate(corpus)], "doc_id bigint, text string"
    )
    freqs: dict = {}
    for s in corpus:
        for w in s.split(" "):
            freqs[w] = freqs.get(w, 0) + 1

    from base_etl_spark.registry import REGISTRY

    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in sorted(
            REGISTRY["tokenizer_bpe_train"].fn.tables_fn(_T()).collect(),
            key=lambda r: r.merge_rank,
        )
    ]
    assert got == _ref_bpe(freqs, 8), got


def test_bpe_train_matches_reference_fixture(spark):
    """Same equivalence over the REAL sf0.001 corpus word frequencies —
    the fixture-scale exact oracle for the iterative trainer."""
    import duckdb

    from base_etl_spark import queries

    con = duckdb.connect()
    freqs = dict(
        con.sql(
            f"""SELECT w, count(*) FROM (
                   SELECT unnest(string_split(text, ' ')) AS w
                   FROM '{SF_TEST}/documents.parquet')
               WHERE w <> '' GROUP BY w"""
        ).fetchall()
    )
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.merged, r.pair_count)
        for r in sorted(
            queries()["tokenizer_bpe_train"](spark, SF_TEST).collect(),
            key=lambda r: r.merge_rank,
        )
    ]
    assert got == _ref_bpe(freqs, 8), got[:3]


def test_wilson_ci_planted(spark):
    """n=4, conv=1 per planted type: the interval must equal the Wilson
    formula evaluated in plain Python floats (independent of the Column
    expression tree), and must stay inside [0, 1] — the regime where the
    naive normal interval goes negative."""
    import math

    class _T:
        pass

    _T.events = spark.createDataFrame(
        [(i, "x", 150.0 if i == 0 else 50.0) for i in range(4)],
        "event_id bigint, event_type string, value double",
    )

    from base_etl_spark.registry import REGISTRY

    [r] = REGISTRY["events_wilson_ci"].fn.tables_fn(_T()).collect()
    n, conv, z = 4, 1, 1.96
    p = conv / n
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert (r.n, r.conv, r.p_hat) == (4, 1, 0.25)
    assert r.ci_low == round(center - half, 6)
    assert r.ci_high == round(center + half, 6)
    assert 0.0 < r.ci_low < r.p_hat < r.ci_high < 1.0


def test_partition_skew_report_planted(spark):
    """Two tied hottest keys (5 rows each) must resolve to the SMALLER
    key; avg/skew/percentiles hand-computed over counts [1, 5, 5]."""

    class _T:
        pass

    rows = [(1,)] * 5 + [(2,)] * 5 + [(3,)]
    _T.lineitem = spark.createDataFrame(rows, "l_suppkey bigint")

    from base_etl_spark.registry import REGISTRY

    [r] = REGISTRY["etl_partition_skew_report"].fn.tables_fn(_T()).collect()
    assert (r.n_keys, r.total_rows, r.hottest_key, r.max_rows) == (3, 11, 1, 5)
    assert r.avg_rows == round(11 / 3, 6)
    assert r.skew_ratio == round(5 / (11 / 3), 6)
    assert (r.p50, r.p90, r.p99) == (5.0, 5.0, 5.0)


def test_pq_quantize_planted_exact_recovery(spark):
    """120 vectors whose every subvector is one of 16 exact patterns
    (vector i uses pattern i % 16, so the 16 seed vectors cover all
    codes): init lands ON the true centers, every round is a fixed
    point, distortion is exactly 0, and counts follow i % 16."""

    class _T:
        pass

    def pat(c, s, j):
        return float(c * 10 + s + j * 0.25)

    rows = []
    for i in range(120):
        c = i % 16
        vec = [pat(c, s, j) for s in range(8) for j in range(8)]
        rows.append((i, vec))
    _T.embeddings = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")

    from base_etl_spark.registry import REGISTRY

    out = REGISTRY["sim_pq_quantize"].fn.tables_fn(_T()).collect()
    assert len(out) == 8 * 16
    for r in out:
        assert r.mse == 0.0, (r.sub_id, r.code, r.mse)
        assert r.n_vecs == len([i for i in range(120) if i % 16 == r.code])


def test_pq_quantize_matches_numpy_replica(spark):
    """Replays the EXACT declared algorithm (seed init by lowest
    vec_ids, 5 fixed Lloyd rounds, lowest-code tie-break, empty codes
    keep centroids) in numpy over the real fixture and requires
    identical assignment counts and 6dp distortions — the external
    oracle for the rows-only key."""
    import numpy as np

    from base_etl_spark import load_tables, queries

    t = load_tables(spark, SF_TEST)
    fix = sorted(
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in t.embeddings.select("vec_id", "embedding").collect()
    )
    X = np.array([v for _, v in fix], dtype=np.float64)
    got = {
        (r.sub_id, r.code): (r.n_vecs, r.mse)
        for r in queries()["sim_pq_quantize"](spark, SF_TEST).collect()
    }
    want = {}
    for s in range(8):
        sv = X[:, s * 8 : (s + 1) * 8]
        C = sv[:16].copy()  # fix is vec_id-sorted; seeds = 16 lowest
        for _ in range(5):
            d = ((sv[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            a = d.argmin(1)
            for c in range(16):
                m = a == c
                if m.any():
                    C[c] = sv[m].mean(0)
        d = ((sv[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for c in range(16):
            m = a == c
            if m.any():
                want[(s, c)] = (int(m.sum()), float(d[m, c].mean()))
    assert set(got) == set(want)
    for k, (n, mse) in want.items():
        assert got[k][0] == n, (k, got[k], n)
        assert abs(got[k][1] - mse) < 2e-6, (k, got[k][1], mse)


def test_seasonal_decompose_planted(spark):
    """Single nation, one year Jan-Apr [100, 110, 125, 130]: edge months
    take the partial centered window (documented), and with only one
    observation per month-of-year the seasonal term equals the detrended
    value exactly, forcing resid == 0 everywhere — hand-computed."""
    import datetime as dt

    class _T:
        pass

    revs = [100.0, 110.0, 125.0, 130.0]
    _T.orders = spark.createDataFrame(
        [(1, r, dt.datetime(2024, m + 1, 10)) for m, r in enumerate(revs)],
        "o_custkey bigint, o_totalprice double, o_orderdate timestamp",
    )
    _T.customer = spark.createDataFrame([(1, 7)], "c_custkey bigint, c_nationkey bigint")
    _T.nation = spark.createDataFrame([(7, "FRANCE")], "n_nationkey bigint, n_name string")

    from base_etl_spark.registry import REGISTRY

    rows = sorted(
        REGISTRY["win_seasonal_decompose"].fn.tables_fn(_T()).collect(),
        key=lambda r: r.month,
    )
    assert [r.y for r in rows] == revs
    want_trend = [105.0, round((100 + 110 + 125) / 3, 6),
                  round((110 + 125 + 130) / 3, 6), 127.5]
    assert [r.trend for r in rows] == want_trend
    for r, tr in zip(rows, want_trend):
        assert r.seasonal == round(r.y - tr, 6)
        assert r.resid == 0.0


def test_image_neardup_matches_allpairs_reference(spark):
    """One full kk cycle (doc_ids 0..73): a numpy replay of the planted
    closed form computes ALL distinct-hash pairs per (w, h) and their
    hamming; the operator's banded output must equal the hamming-1..2
    subset EXACTLY — pinning both pigeonhole recall (3 bands cover
    hamming <= 2) and the exclusions (hamming 0 collapses upstream,
    hamming >= 3 is out of contract)."""
    import numpy as np

    from base_etl_spark.multimodal import planted_rgb

    class _T:
        pass

    _T.documents = spark.createDataFrame(
        [(i,) for i in range(74)], "doc_id bigint"
    )

    def ahash(rgb):
        g = rgb.astype(np.int64).sum(axis=2).reshape(-1)
        n = g.size
        bits = (g * n > g.sum()).astype(np.int64)
        return int((bits << np.arange(n, dtype=np.int64)).sum())

    groups: dict = {}
    for kk in range(74):
        k = kk % 37
        w, h = 3 + k % 5, 2 + k % 4
        rgb = planted_rgb(k, w, h).astype(np.int64)
        if kk >= 37:
            rgb[0, 0, :] = (rgb[0, 0, :] + 64) % 256
        groups.setdefault((w, h), set()).add(ahash(rgb.astype(np.uint8)))
    want = set()
    for (w, h), hashes in groups.items():
        hs = sorted(hashes)
        for i in range(len(hs)):
            for j in range(i + 1, len(hs)):
                d = bin(hs[i] ^ hs[j]).count("1")
                if 1 <= d <= 2:
                    want.add((w, h, hs[i], hs[j], d))

    from base_etl_spark.registry import REGISTRY

    got = {
        (r.w, r.h, r.hash_a, r.hash_b, r.hamming)
        for r in REGISTRY["mm_image_neardup"].fn.tables_fn(_T()).collect()
    }
    assert got == want
    assert want  # the planted siblings guarantee a non-empty contract


def test_stream_interval_join_planted(spark):
    """Purchase at 12:00 matches clicks at 11:00:00..12:00 inclusive
    (two-sided bound): 11:30 in, exactly-12:00 in, 10:59 out (beyond
    lookback), 12:05 out (future click), other-user 11:30 out."""
    import datetime as dt

    class _T:
        pass

    T0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, typ, minutes):
        return (eid, uid, typ, T0 + dt.timedelta(minutes=minutes))

    _T.events = spark.createDataFrame(
        [
            ev(1, 1, "purchase", 0),
            ev(10, 1, "click", -30),
            ev(11, 1, "click", 0),
            ev(12, 1, "click", -61),
            ev(13, 1, "click", 5),
            ev(14, 2, "click", -30),
        ],
        "event_id bigint, user_id bigint, event_type string, ts timestamp",
    )

    from base_etl_spark.registry import REGISTRY

    got = {
        (r.purchase_id, r.click_id)
        for r in REGISTRY["stream_interval_join"].fn.tables_fn(_T()).collect()
    }
    assert got == {(1, 10), (1, 11)}


def test_qte_planted(spark):
    """Arm A = {10, 20, 30, 40}, arm B = A + 100 (constant shift): every
    quantile's treatment effect must be exactly 100, and the quantile
    values must equal numpy's linear interpolation at p*(n-1)."""
    import numpy as np

    class _T:
        pass

    # find user_ids hashing to each arm
    a_ids = [u for u in range(1, 200) if (u * 2654435761) % 100 < 50][:4]
    b_ids = [u for u in range(1, 200) if (u * 2654435761) % 100 >= 50][:4]
    vals = [10.0, 20.0, 30.0, 40.0]
    rows = [(u, v) for u, v in zip(a_ids, vals)] + [
        (u, v + 100.0) for u, v in zip(b_ids, vals)
    ]
    _T.events = spark.createDataFrame(rows, "user_id bigint, value double")

    from base_etl_spark.registry import REGISTRY

    got = {r.q: r for r in REGISTRY["events_quantile_treatment_effect"].fn.tables_fn(_T()).collect()}
    assert set(got) == {0.1, 0.25, 0.5, 0.75, 0.9}
    for q, r in got.items():
        assert r.qte == 100.0, (q, r)
        assert r.q_a == round(float(np.quantile(vals, q)), 6)


def test_degree_distribution_planted(spark):
    """A 4-clique of suppliers on one order: every node nominates its 3
    partners (within the KNN cap of 5), so the histogram is one row
    (deg 3, 4 nodes, share 1.0)."""

    class _T:
        pass

    _T.lineitem = spark.createDataFrame(
        [(1, s) for s in [10, 11, 12, 13]], "l_orderkey bigint, l_suppkey bigint"
    )

    from base_etl_spark.registry import REGISTRY

    rows = REGISTRY["graph_degree_distribution"].fn.tables_fn(_T()).collect()
    assert [(r.deg, r.n_nodes, r.share) for r in rows] == [(3, 4, 1.0)]


def test_bpe_apply_matches_reference(spark):
    """End-to-end train+apply replay in pure Python over sf0.001: the
    per-language word/token/char totals must match exactly (extends the
    merge-table oracle to the segmentation consumer)."""
    import duckdb

    from base_etl_spark import queries

    con = duckdb.connect()
    rows = con.sql(
        f"""SELECT lang, w, count(*) AS c FROM (
               SELECT lang, unnest(string_split(text, ' ')) AS w
               FROM '{SF_TEST}/documents.parquet')
           WHERE w <> '' GROUP BY lang, w"""
    ).fetchall()
    freqs: dict = {}
    for _, w, c in rows:
        freqs[w] = freqs.get(w, 0) + c
    merges = _ref_bpe(freqs, 8)
    # re-apply the merge list to each word to get its final token count
    def tok_len(w):
        syms = list(w) + ["</w>"]
        for _, l, r, m, _c in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(m)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    want: dict = {}
    for lang, w, c in rows:
        n_words, n_toks, n_chars = want.get(lang, (0, 0, 0))
        want[lang] = (n_words + c, n_toks + c * tok_len(w), n_chars + c * len(w))

    got = {
        r.lang: (r.n_words, r.n_tokens, r.n_chars)
        for r in queries()["tokenizer_bpe_apply"](spark, SF_TEST).collect()
    }
    assert got == want


def test_stream_interval_join_outer_planted(spark):
    """Same anatomy as the inner planted test plus a second purchase
    with NO click in its window: it must survive with NULL click
    columns (the unattributed-conversion contract)."""
    import datetime as dt

    class _T:
        pass

    T0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, uid, typ, minutes):
        return (eid, uid, typ, T0 + dt.timedelta(minutes=minutes))

    _T.events = spark.createDataFrame(
        [
            ev(1, 1, "purchase", 0),
            ev(2, 2, "purchase", 0),
            ev(10, 1, "click", -30),
            ev(14, 2, "click", -90),
        ],
        "event_id bigint, user_id bigint, event_type string, ts timestamp",
    )

    from base_etl_spark.registry import REGISTRY

    got = {
        (r.purchase_id, r.click_id)
        for r in REGISTRY["stream_interval_join_outer"].fn.tables_fn(_T()).collect()
    }
    assert got == {(1, 10), (2, None)}


def test_topk_pq_matches_numpy_replica(spark):
    """Full ADC replay in numpy over the fixture: train (the
    sim_pq_quantize replica), encode, build each probe's 8x16 distance
    table, rank by 6dp-rounded ADC sum with neighbor_id tie-break, and
    compare the exact-L2 top-5 flags — the retrieved (probe, rank,
    neighbor, in_exact) tuples must match EXACTLY."""
    import numpy as np

    from base_etl_spark import load_tables, queries

    t = load_tables(spark, SF_TEST)
    fix = sorted(
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in t.embeddings.select("vec_id", "embedding").collect()
    )
    ids = np.array([i for i, _ in fix])
    X = np.array([v for _, v in fix], dtype=np.float64)

    # train replica (identical to test_pq_quantize_matches_numpy_replica)
    cents = {}
    for s in range(8):
        sv = X[:, s * 8 : (s + 1) * 8]
        C = sv[:16].copy()
        for _ in range(5):
            d = ((sv[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            a = d.argmin(1)
            for c in range(16):
                m = a == c
                if m.any():
                    C[c] = sv[m].mean(0)
        cents[s] = C
    # encode
    codes = np.stack(
        [
            ((X[:, s * 8 : (s + 1) * 8][:, None, :] - cents[s][None, :, :]) ** 2)
            .sum(-1)
            .argmin(1)
            for s in range(8)
        ],
        axis=1,
    )  # (n, 8)
    want = set()
    for p in range(10):
        pi = int(np.where(ids == p)[0][0])
        pv = X[pi]
        tab = np.stack(
            [((pv[s * 8 : (s + 1) * 8] - cents[s]) ** 2).sum(-1) for s in range(8)]
        )  # (8, 16)
        adc = np.round(
            sum(tab[s][codes[:, s]] for s in range(8)), 6
        )
        mask = ids != p
        order = sorted(zip(adc[mask], ids[mask]))[:5]
        l2 = np.round(((X - pv) ** 2).sum(-1), 6)
        exact5 = {int(i) for _, i in sorted(zip(l2[mask], ids[mask]))[:5]}
        for rk, (d, nid) in enumerate(order, 1):
            want.add((p, rk, int(nid), float(d), int(nid) in exact5))

    got = {
        (r.probe_id, r.rank, r.neighbor_id, r.adc_dist, r.in_exact)
        for r in queries()["sim_topk_pq"](spark, SF_TEST).collect()
    }
    assert got == want


def test_incremental_dedup_planted(spark):
    """Batch doc 18 repeats historical doc 1's text (not novel); batch
    doc 19 is unseen (novel); batch doc 28 repeats ANOTHER batch doc's
    text but no historical one (still novel — the gate checks history,
    not the batch itself)."""

    class _T:
        pass

    _T.documents = spark.createDataFrame(
        [
            (1, "alpha"),
            (2, "beta"),
            (18, "alpha"),
            (19, "gamma"),
            (28, "delta"),
            (29, "delta"),
        ],
        "doc_id bigint, text string",
    )

    from base_etl_spark.registry import REGISTRY

    got = {r.doc_id: r.is_novel for r in
           REGISTRY["etl_incremental_dedup"].fn.tables_fn(_T()).collect()}
    assert got == {18: False, 19: True, 28: True, 29: True}


def test_dedup_exact_normalized_planted(spark):
    """Case/punctuation/spacing variants of one sentence collapse into a
    single normalized group (n_copies 3, n_raw_variants 3, keeper = min
    doc_id) while a genuinely different doc stays alone — the duplicates
    byte-hashing (dedup_exact) would have missed."""

    class _T:
        pass

    _T.documents = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello   world"),
            (3, "HELLO WORLD."),
            (4, "goodbye world"),
        ],
        "doc_id bigint, text string",
    )

    from base_etl_spark.registry import REGISTRY

    rows = sorted(
        REGISTRY["dedup_exact_normalized"].fn.tables_fn(_T()).collect(),
        key=lambda r: r.keeper_doc_id,
    )
    assert [(r.keeper_doc_id, r.n_copies, r.n_raw_variants) for r in rows] == [
        (1, 3, 3),
        (4, 1, 1),
    ]


def test_span_scrub_planted(spark):
    """The duplicated chunk A is scrubbed from both carriers while
    unique chunks and partial tails survive in order; a doc with
    nothing removed reassembles BYTE-IDENTICAL (split/join losslessness
    incl. a double space); sub-8-word docs pass through untouched."""

    class _T:
        pass

    A = "a b c d e f g h"
    B = "i j k l m n o p"
    C = "q r s t u v w x"
    _T.documents = spark.createDataFrame(
        [
            (1, f"{A} {B} t1 t2"),      # A scrubbed, B + tail stay
            (2, f"{C} {A}"),            # A scrubbed at the END
            (3, f"{B.replace('i', 'zz')} y1  y2"),  # untouched, double space
            (4, "short doc here"),
        ],
        "doc_id bigint, text string",
    )

    from base_etl_spark.registry import REGISTRY

    rows = {r.doc_id: r for r in
            REGISTRY["dedup_span_scrub"].fn.tables_fn(_T()).collect()}
    assert (rows[1].n_chunks, rows[1].n_removed) == (2, 1)
    assert rows[1].cleaned_text == f"{B} t1 t2"
    assert (rows[2].n_chunks, rows[2].n_removed) == (2, 1)
    assert rows[2].cleaned_text == C
    assert rows[3].n_removed == 0
    assert rows[3].cleaned_text == f"{B.replace('i', 'zz')} y1  y2"
    assert rows[4].cleaned_text == "short doc here"


def test_audio_resample_planted(spark):
    """Hand-checkable asset 0 (64 samples): both codec trips must be
    lossless, so n halves exactly and the decimated energy/checksum
    equal the even-index closed form."""

    class _T:
        pass

    _T.documents = spark.createDataFrame([(0,)], "doc_id bigint")

    from base_etl_spark.registry import REGISTRY

    [r] = REGISTRY["mm_audio_resample"].fn.tables_fn(_T()).collect()
    smp = [((0 * 31 + i * 7) % 20001) - 10000 for i in range(64)]
    even = smp[::2]
    assert (r.n_in, r.n_out) == (64, 32)
    assert r.ssq_in == sum(s * s for s in smp)
    assert r.ssq_out == sum(s * s for s in even)
    assert r.sum_out == sum(even)


def test_matryoshka_planted(spark):
    """Planted 3-probe corpus where the 16-dim prefix either preserves
    or inverts the full-dim ranking by construction: probe 0's top
    neighbors agree on prefix and full (recall 1.0); probe 1's nearest
    full-dim neighbor hides its similarity in dims 17-64, so the
    truncated ranking misses it (recall < 1)."""
    import numpy as np

    class _T:
        pass

    rng = np.random.RandomState(7)
    rows = []
    # probes 0-2: random base vectors
    base = rng.rand(3, 64).astype(float)
    for i in range(3):
        rows.append((i, [float(x) for x in base[i]]))
    # 10..15: aligned with probe 0 in ALL dims (prefix agrees)
    for j in range(6):
        v = base[0] + rng.rand(64) * 0.01
        rows.append((10 + j, [float(x) for x in v]))
    # 20: aligned with probe 1 ONLY in dims 17-64 (prefix orthogonalish)
    v = base[1].copy()
    v[:16] = rng.rand(16) * 5  # scramble the prefix hard
    rows.append((20, [float(x) for x in v]))
    # 21..26: mild noise vectors
    for j in range(6):
        rows.append((21 + j, [float(x) for x in rng.rand(64)]))
    _T.embeddings = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )

    from base_etl_spark.registry import REGISTRY

    # N_PROBES = 10 so probes are vec_ids 0..2 here (others >= 10)
    out = {r.probe_id: r for r in
           REGISTRY["sim_recall_matryoshka"].fn.tables_fn(_T()).collect()}
    assert out[0].recall == 1.0
    assert out[1].recall < 1.0
    for r in out.values():
        assert 0.0 <= r.recall <= 1.0
        assert r.n_hits == round(r.recall * 5)


def test_ewma_time_decay_planted(spark):
    """Three events at 0 min / 60 min / 90 min with values 10/20/5:
    decayed score = 5 + e^-0.5 * (20 + e^-1 * 10) — hand-computed with
    plain math.exp, pinning the integer-microsecond gap arithmetic and
    the (ts, event_id) fold order."""
    import datetime as dt
    import math

    class _T:
        pass

    T0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    _T.events = spark.createDataFrame(
        [
            (1, 7, T0, 10.0),
            (2, 7, T0 + dt.timedelta(hours=1), 20.0),
            (3, 7, T0 + dt.timedelta(minutes=90), 5.0),
        ],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )

    from base_etl_spark.registry import REGISTRY

    [r] = REGISTRY["win_ewma_time_decay"].fn.tables_fn(_T()).collect()
    want = 5.0 + math.exp(-0.5) * (20.0 + math.exp(-1.0) * 10.0)
    assert (r.user_id, r.n_events) == (7, 3)
    assert r.decayed_score == round(want, 6)


def test_dedup_funnel_planted(spark):
    """4-doc corpus: two byte-identical docs, one punctuation variant of
    the same sentence, one long self-repeating doc. exact keeps 3 of 4,
    normalization keeps 2, span flags the self-repeater — each tier's
    row hand-computed."""

    class _T:
        pass

    D = "a b c d e f g h"
    _T.documents = spark.createDataFrame(
        [
            (1, "Hello World"),
            (2, "Hello World"),         # byte dup of 1
            (3, "hello,   world!"),     # normalized dup of 1
            (4, f"{D} {D}"),            # span self-repeater (ratio 1.0)
        ],
        "doc_id bigint, text string",
    )

    from base_etl_spark.registry import REGISTRY

    rows = {r.stage: r for r in
            REGISTRY["dedup_funnel_report"].fn.tables_fn(_T()).collect()}
    assert rows["raw"].docs_kept == 4 and rows["raw"].docs_removed == 0
    assert rows["exact"].docs_kept == 3          # docs 1+2 collapse
    assert rows["exact_normalized"].docs_kept == 2  # 1+2+3 collapse
    assert rows["span"].docs_kept == 3           # doc 4 dropped
    assert rows["span"].pct_kept == 0.75


def test_scd3_planted(spark):
    """Customer 1 has an urgent order: current flips to PRIORITY with
    the old segment preserved in the prior column; customer 2 keeps its
    segment with a NULL prior."""

    class _T:
        pass

    _T.customer = spark.createDataFrame(
        [(1, "BUILDING"), (2, "MACHINERY")], "c_custkey bigint, c_mktsegment string"
    )
    _T.orders = spark.createDataFrame(
        [(10, 1, "1-URGENT"), (11, 2, "3-MEDIUM")],
        "o_orderkey bigint, o_custkey bigint, o_orderpriority string",
    )

    from base_etl_spark.registry import REGISTRY

    rows = {r.c_custkey: r for r in
            REGISTRY["etl_scd3"].fn.tables_fn(_T()).collect()}
    assert (rows[1].segment_current, rows[1].segment_prev, rows[1].changed) == (
        "PRIORITY", "BUILDING", True)
    assert (rows[2].segment_current, rows[2].segment_prev, rows[2].changed) == (
        "MACHINERY", None, False)


def test_kmv_distinct_within_tolerance(spark):
    """KMV per-type rows fall back to EXACT counts when the group holds
    fewer than k=256 hashes (the fixture case); the merged ALL row must
    equal the deduplicated union, never the multiset sum (the shared-
    user overcount caught at build time). A planted 20k-user universe
    exercises the real (k-1)/u estimator within ~4/sqrt(k)."""
    from pyspark.sql import functions as F

    from base_etl_spark import load_tables
    from base_etl_spark.registry import REGISTRY

    got = {r.event_type: r for r in _QS["sketch_kmv_distinct"](spark, SF_TEST).collect()}
    t = load_tables(spark, SF_TEST)
    exact = {
        r.event_type: r.n
        for r in t.events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = t.events.select("user_id").distinct().count()
    assert set(got) == set(exact)
    for et, e in exact.items():
        assert got[et].est_distinct == float(e), (et, got[et], e)  # exact tier

    class _T:
        events = spark.range(0, 60_000).select(
            F.when(F.col("id") % 3 == 0, "click").otherwise("view").alias("event_type"),
            (F.col("id") % 20_000).alias("user_id"),
        )

    rows = {r.event_type: r for r in REGISTRY["sketch_kmv_distinct"].fn.tables_fn(_T()).collect()}
    assert rows["ALL"].n_kept == 256
    assert abs(rows["ALL"].est_distinct - 20_000) / 20_000 < 0.25
    assert abs(rows["view"].est_distinct - 20_000) / 20_000 < 0.25


def test_ivfpq_full_probe_equals_exhaustive_adc(spark):
    """Composition self-check: IVF+PQ with nprobe = nlist (search every
    cluster) must EQUAL sim_topk_pq's exhaustive ADC ranking row for
    row — the pruning is the ONLY difference between the two keys. At
    the declared nprobe=5 the pruned result keeps >= 20% of the
    exhaustive top-5 (the fixture has no real cluster structure — the
    sim_topk_ivf caveat — so this bounds the machinery, not quality)."""
    from base_etl_spark import load_tables
    from base_etl_spark.operators.llm_vectors import _ivfpq_search

    t = load_tables(spark, SF_TEST)
    nlist = t.embeddings.select("label").distinct().count()
    full = {
        (r.probe_id, r.rank, r.neighbor_id, r.adc_dist)
        for r in _ivfpq_search(t, nprobe=nlist).collect()
    }
    exhaustive = {
        (r.probe_id, r.rank, r.neighbor_id, r.adc_dist)
        for r in _QS["sim_topk_pq"](spark, SF_TEST).collect()
    }
    assert full == exhaustive
    pruned = {
        (r.probe_id, r.neighbor_id)
        for r in _QS["sim_topk_ivfpq"](spark, SF_TEST).collect()
    }
    base = {(p, n) for (p, _, n, _) in exhaustive}
    assert len(pruned & base) / len(base) >= 0.2


def test_image_phash_replica_and_brightness_invariance(spark):
    """pHash key == the numpy replica on the same planted recipe;
    brightness variants (same content k, opposite parity offset)
    collapse to one hash even though their BMP bytes differ; distinct
    contents keep distinct hashes on this fixture."""
    import numpy as np

    from base_etl_spark.multimodal import (
        dct_phash,
        decode_bmp24,
        encode_bmp24,
        planted_rgb,
    )

    got = {r.doc_id: r.img_hash for r in _QS["mm_image_phash"](spark, SF_TEST).collect()}
    want, raw = {}, {}
    for doc_id in got:
        k = doc_id % 37
        px = planted_rgb(k, 8, 8).astype(np.int64) % 200 + 24 * (doc_id % 2)
        payload = encode_bmp24(px.astype(np.uint8))
        want[doc_id] = dct_phash(decode_bmp24(payload).astype(np.int64).sum(axis=2))
        raw[doc_id] = payload
    assert got == want
    by_k = {}
    for doc_id, h in got.items():
        by_k.setdefault(doc_id % 37, set()).add(h)
    # brightness variants collapse per content k...
    assert all(len(hs) == 1 for hs in by_k.values()), by_k
    # ...even though their raw bytes differ (exact dedup would miss them)
    k0 = [d for d in got if d % 37 == 0]
    odd = [d for d in k0 if d % 2 == 1]
    even = [d for d in k0 if d % 2 == 0]
    if odd and even:
        assert raw[odd[0]] != raw[even[0]]
    # distinct contents mostly separate (15-bit space, 37 structured
    # contents: a few birthday collisions are expected — 34/37 measured)
    assert len({next(iter(h)) for h in by_k.values()}) >= 0.9 * len(by_k)


def test_k_core_planted_graph(spark):
    """Same planted graph as the triangle census (edges {12,13,23,34}):
    k=2 peels the pendant node 4 in one round leaving exactly the
    triangle (3 nodes / 3 edges); k=3 peels everything (the triangle's
    degrees are all 2) — the two boundary behaviors that define the
    decomposition."""
    from base_etl_spark.registry import REGISTRY

    li = spark.createDataFrame(
        [(10, s) for s in (1, 2, 3)]
        + [(20, s) for s in (1, 2)]
        + [(30, s) for s in (3, 4)],
        "l_orderkey bigint, l_suppkey bigint",
    )

    class _T:
        lineitem = li

    rows = {r.k: r for r in REGISTRY["graph_k_core"].fn.tables_fn(_T()).collect()}
    assert (rows[2].n_nodes, rows[2].n_edges) == (3, 3)
    assert (rows[3].n_nodes, rows[3].n_edges) == (0, 0)
    assert rows[2].rounds == 1


def test_poisson_bootstrap_selfchecks(spark):
    """R-key invariants: the hash-seeded bootstrap is deterministic
    across runs, SE is positive, the percentile CI brackets the exact
    corpus mean (Poisson(1) weights are unbiased), and the CI is
    ordered. Fixture n is large enough that a CI miss would mean the
    weights are wrong, not bad luck."""
    from base_etl_spark.registry import REGISTRY
    from tests.conftest import SF_TEST

    fn = REGISTRY["sample_poisson_bootstrap"].fn
    (r1,) = fn(spark, SF_TEST).collect()
    (r2,) = fn(spark, SF_TEST).collect()
    assert r1 == r2  # seeded hash => bit-identical reruns
    assert r1.se_boot > 0
    assert r1.ci_lo < r1.ci_hi
    assert r1.ci_lo <= r1.point_mean <= r1.ci_hi


def test_decile_lift_approx_matches_exact_twin_small_n(spark):
    """agg_decile_lift_approx's binding contract (its docstring): at
    n << GK accuracy the sketch boundaries are exact, so the whole
    table must EQUAL the exact twin's; conservation and bucket balance
    are then implied but asserted separately so a future fixture where
    n grows past exactness still pins them."""
    approx = _rows(spark, "agg_decile_lift_approx")
    exact = _rows(spark, "agg_decile_lift")
    assert approx == exact
    n_cust = _QS["agg_decile_lift"](spark, SF_TEST).agg(F.sum("n_cust")).first()[0]
    got = _QS["agg_decile_lift_approx"](spark, SF_TEST).agg(
        F.sum("n_cust"), F.sum("n_resp")
    ).first()
    exp = _QS["agg_decile_lift"](spark, SF_TEST).agg(
        F.sum("n_cust"), F.sum("n_resp")
    ).first()
    assert (got[0], got[1]) == (exp[0], exp[1])  # totals conserve exactly
    for r in _QS["agg_decile_lift_approx"](spark, SF_TEST).collect():
        # GK rank error <= n/accuracy -> each decile within bound of n/10
        bound = n_cust / 10 + max(2.0, 2 * n_cust / 10000)
        assert r.n_cust <= bound, (r.decile, r.n_cust, bound)


def test_pq_training_reduces_init_distortion(spark):
    """sim_pq_distortion is the round-0 (init-codebook) report;
    sim_pq_quantize reports after 5 Lloyd rounds. Lloyd's assignment
    and update steps are each non-increasing in total SSE, so the
    trained corpus-weighted mean distortion must not exceed init's."""
    def weighted_mse(key):
        row = (
            _QS[key](spark, SF_TEST)
            .agg(F.sum(F.col("n_vecs") * F.col("mse")), F.sum("n_vecs"))
            .first()
        )
        return row[0] / row[1]

    init, trained = weighted_mse("sim_pq_distortion"), weighted_mse("sim_pq_quantize")
    assert trained <= init + 1e-6, (trained, init)


def test_spectral_centroid_matches_numpy_replica(spark):
    """mm_audio_spectral_centroid R contract: independent per-asset
    replay (decode -> shared spectral_features kernel) must match the
    operator's rows exactly."""
    from base_etl_spark.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
        spectral_features,
    )
    import numpy as np

    got = {r.asset_id: (r.n_samples, r.centroid_hz, r.bandwidth_hz, r.rolloff85_hz)
           for r in _QS["mm_audio_spectral_centroid"](spark, SF_TEST).collect()}
    assert got
    for doc_id, row in got.items():
        n = 50 + doc_id % 50
        i = np.arange(n, dtype=np.int64)
        smp = ((doc_id * 31 + i * 7) % 65536) - 32768
        _, wave = decode_wav_pcm16(encode_wav_pcm16(smp))
        assert row == (n, *spectral_features(wave)), doc_id


def test_spectral_centroid_planted_tone():
    """A pure tone at an exact rFFT bin must put the centroid on (or
    within 1% of) the tone frequency, with near-zero bandwidth."""
    from base_etl_spark.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
        spectral_features,
    )
    import numpy as np

    n, rate, k = 1600, 16000, 200  # bin k -> f = k*rate/n = 2000 Hz
    tone = np.rint(0.5 * 32767 * np.sin(2 * np.pi * k * np.arange(n) / n))
    _, wave = decode_wav_pcm16(encode_wav_pcm16(tone.astype(np.int64)))
    c, b, _ = spectral_features(wave)
    f = k * rate / n
    assert abs(c - f) < 0.01 * f, (c, f)
    assert b < 0.05 * f, b


def test_approx_top_k_exact_below_sketch_capacity(spark):
    """agg_approx_top_k R contract: with maxItemsTracked far above the
    distinct-part count, the sketch counts are exact — the top-10
    (key, count) multiset must equal the exact groupBy top-10's count
    multiset, and the returned key set must be A valid top-10 (every
    returned count >= the exact 10th-largest count)."""
    from base_etl_spark.io import load_tables

    li = load_tables(spark, SF_TEST).lineitem
    exact = (
        li.groupBy("l_partkey").count()
        .orderBy(F.desc("count"), "l_partkey")
        .limit(50)
        .collect()
    )
    exact_counts = sorted((r["count"] for r in exact), reverse=True)[:10]
    got = _QS["agg_approx_top_k"](spark, SF_TEST).collect()
    assert len(got) == 10
    exact_by_key = {r.l_partkey: r["count"] for r in exact}
    for r in got:
        assert exact_by_key.get(r.l_partkey) == r.n_lines, (r, "count not exact")
    assert sorted((r.n_lines for r in got), reverse=True) == exact_counts


def test_hll_native_within_error_envelope(spark):
    """agg_hll_native R contract: every per-group estimate within 5%
    of the exact distinct count (lgConfigK=12 -> ~1.6% rse; 3 sigma),
    and the union-merged ALL row within 5% of the exact global."""
    from base_etl_spark.io import load_tables

    ev = load_tables(spark, SF_TEST).events
    exact = {r.event_type: r.n for r in
             ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()}
    exact["ALL"] = ev.select("user_id").distinct().count()
    got = {r.event_type: r.n_users_est
           for r in _QS["agg_hll_native"](spark, SF_TEST).collect()}
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert abs(got[k] - n) <= max(2, 0.05 * n), (k, got[k], n)


def test_zorder_ranges_bound_both_dimensions(spark):
    """etl_zorder_cluster's reason to exist: every 16-cell z-range
    covers a bounded rectangle (cell_span 16 of 256), where a
    lexicographic (bx, by) sort would span the full by-axis (span 16
    only in degenerate data). Also pins the Morton arithmetic: 8-bit
    z-values cut into 16 ranges of exactly 16 cells."""
    rows = _QS["etl_zorder_cluster"](spark, SF_TEST).collect()
    assert len(rows) == 16
    for r in rows:
        assert 0 <= r.zrange < 16
        assert r.cell_span <= 16, (r.zrange, r.cell_span)
        # a 16-cell z-range is a 4x4 (or thinner) tile of the 16x16 grid
        assert r.max_bx - r.min_bx + 1 <= 4 and r.max_by - r.min_by + 1 <= 4


def test_markov_stationary_is_fixed_point(spark):
    """events_markov_stationary R contract: pi is a probability vector,
    a fixed point of the row-stochastic transition matrix (rebuilt here
    from the parent key), and the dominant left eigenvector."""
    import numpy as np

    pi_rows = _QS["events_markov_stationary"](spark, SF_TEST).collect()
    pm = _QS["events_transition_matrix"](spark, SF_TEST).collect()
    states = sorted(r.event_type for r in pi_rows)
    idx = {s: i for i, s in enumerate(states)}
    k = len(states)
    assert k > 1
    pi = np.zeros(k)
    for r in pi_rows:
        pi[idx[r.event_type]] = r.stationary_p
    assert abs(pi.sum() - 1.0) < 1e-6 and (pi > 0).all()
    counts = np.zeros((k, k))
    for r in pm:
        counts[idx[r.prev], idx[r.curr]] = r.n_transitions
    rs = counts.sum(axis=1, keepdims=True)
    p = np.where(rs > 0, counts / np.where(rs == 0, 1, rs), 1.0 / k)
    assert np.abs(pi @ p - pi).max() < 1e-6  # stationarity
    vals, vecs = np.linalg.eig(p.T)
    lead = np.real(vecs[:, np.argmax(np.real(vals))])
    lead = lead / lead.sum()
    assert np.abs(lead - pi).max() < 1e-6  # dominant left eigenvector


def test_nprobe_sweep_monotone_and_exact_at_full_scan(spark):
    """sim_ivf_nprobe_sweep R contract: recall is monotone
    nondecreasing in nprobe, and at nprobe = nlist (10 labels) the
    pruned search degenerates to brute force -> recall == 1.0."""
    rows = sorted(
        _QS["sim_ivf_nprobe_sweep"](spark, SF_TEST).collect(),
        key=lambda r: r.nprobe,
    )
    assert [r.nprobe for r in rows] == [1, 2, 3, 5, 10]
    recalls = [r.recall for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(recalls, recalls[1:])), recalls
    assert recalls[-1] == 1.0, recalls
    # cross-key coherence: the nprobe=5 sweep point must equal the
    # recall computed directly from sim_topk_ivf's own rows
    exact = {(r.probe_id, r.neighbor_id) for r in _QS["sim_topk"](spark, SF_TEST).collect()}
    ivf = {(r.probe_id, r.neighbor_id) for r in _QS["sim_topk_ivf"](spark, SF_TEST).collect()}
    direct = len(exact & ivf) / len(exact)
    at5 = next(r.recall for r in rows if r.nprobe == 5)
    assert abs(at5 - direct) < 1e-6, (at5, direct)


def test_ndcg_bounds_and_perfect_when_all_relevant(spark):
    """sim_ndcg_at_k sanity floor: every ndcg in [0, 1]; dcg <= idcg;
    and a probe whose entire top-5 shares its label scores exactly 1.0
    when n_rel >= 5 (ideal == achieved)."""
    rows = _QS["sim_ndcg_at_k"](spark, SF_TEST).collect()
    assert rows
    for r in rows:
        if r.ndcg is not None:
            assert -1e-9 <= r.ndcg <= 1.0 + 1e-9, r
            assert r.dcg <= r.idcg + 1e-9, r
