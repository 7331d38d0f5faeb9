"""Golden tests for the beyond-reference operators (dedup, text,
similarity, as-of join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tickdatapipeline_spark.operators.asof import asof_join
from tickdatapipeline_spark.operators.dedup import (
    exact_duplicates,
    jaccard_pairs,
    lsh_candidate_pairs,
    shingles,
)
from tickdatapipeline_spark.operators.similarity import cosine_topk
from tickdatapipeline_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_score,
    simhash,
    token_stats,
)


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


@pytest.mark.heavy
def test_token_stats_golden(spark):
    d = docs_df(spark, [(1, "The cat sat. The cat!", "en")])
    r = token_stats(d).collect()[0]
    # tokens: the, cat, sat, the, cat
    assert r.n_tokens == 5
    assert r.n_unique_tokens == 3
    assert r.n_chars == 21
    assert r.avg_token_len == pytest.approx(3.0)


def test_quality_score_golden(spark):
    d = docs_df(spark, [(1, "Hi 42!", "en")])
    r = quality_score(d).collect()[0]
    assert r.n_chars == 6
    assert r.n_tokens == 2  # hi, 42
    assert r.punct_ratio == pytest.approx(1 / 6, abs=1e-6)   # '!'
    assert r.digit_ratio == pytest.approx(2 / 6, abs=1e-6)   # '42'
    assert r.upper_ratio == pytest.approx(1 / 6, abs=1e-6)   # 'H'


def test_lang_id_markers(spark):
    d = docs_df(spark, [
        (1, "the cat and the dog of a house", "en"),
        (2, "der Hund und die Katze ist nicht da", "de"),
        (3, "xyzzy qwerty", "zz"),
    ])
    out = {r.doc_id: r.pred_lang for r in lang_id(d).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "und"


def test_fingerprint_whitespace_invariant(spark):
    d = docs_df(spark, [(1, "  Hello   World ", "en"), (2, "hello world", "en")])
    fps = {r.doc_id: r.fingerprint for r in fingerprint(d).collect()}
    assert fps[1] == fps[2]


def test_exact_duplicates(spark):
    d = docs_df(spark, [(1, "same text", "en"), (2, "Same  TEXT", "en"), (3, "other", "en")])
    dups = exact_duplicates(d).collect()
    assert len(dups) == 1
    assert dups[0].dup_count == 2
    assert dups[0].keeper_doc_id == 1


@pytest.mark.heavy
def test_shingles_and_jaccard_identical_docs(spark):
    text = "alpha beta gamma delta epsilon zeta"
    d = docs_df(spark, [(1, text, "en"), (2, text, "en"), (3, "unrelated words entirely here now", "en")])
    sh = shingles(d).collect()
    # 6 tokens -> 4 distinct 3-grams per doc
    assert sum(1 for r in sh if r.doc_id == 1) == 4
    pairs = jaccard_pairs(d, threshold=0.5).collect()
    assert len(pairs) == 1
    p = pairs[0]
    assert (p.doc_a, p.doc_b) == (1, 2)
    assert p.jaccard == pytest.approx(1.0)
    # identical docs must also be LSH candidates (identical signatures)
    cands = lsh_candidate_pairs(d).collect()
    assert (1, 2) in {(r.doc_a, r.doc_b) for r in cands}


@pytest.mark.heavy
def test_simhash_equal_for_equal_docs(spark):
    d = docs_df(spark, [(1, "spark window join", "en"), (2, "spark window join", "en"),
                        (3, "completely different content", "en")])
    sigs = {r.doc_id: r.simhash for r in simhash(d).collect()}
    assert sigs[1] == sigs[2]
    assert sigs[1] != sigs[3]


@pytest.mark.heavy
def test_simhash_pairs_match_bruteforce(spark):
    """Band pigeonholing is EXACT for hamming <= n_bands - 1: the banded
    join must find precisely the pairs a brute-force all-pairs hamming
    scan finds on the real corpus slice."""
    from tickdatapipeline_spark.operators.dedup import simhash_near_dup_pairs
    from tickdatapipeline_spark.operators.text import simhash as _sh

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    sigs = sorted((r.doc_id, r.simhash) for r in _sh(docs).collect())
    brute = {
        (a_id, b_id, bin(a_s ^ b_s).count("1"))
        for i, (a_id, a_s) in enumerate(sigs)
        for b_id, b_s in sigs[i + 1:]
        if bin(a_s ^ b_s).count("1") <= 3
    }
    assert got == brute and len(brute) > 0


def test_vocab_topk_golden(spark):
    from tickdatapipeline_spark.operators.text import vocab_topk

    d = docs_df(spark, [(1, "the cat and the hat", "en"),
                        (2, "the cat sat", "en"),
                        (3, "a hat", "en")])
    rows = vocab_topk(d, k=3).collect()
    assert [(r.token, r.n_occurrences, r.n_docs) for r in rows] == [
        ("the", 3, 2), ("cat", 2, 2), ("hat", 2, 2)]  # count desc, token asc


def test_stratified_sample_deterministic_and_rate_shaped(spark):
    """Hash-based sampling: identical draw under any partitioning, and
    per-stratum keep rates track the configured permille."""
    from tickdatapipeline_spark.operators.text import stratified_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rates = {"en": 350, "es": 800}
    a = {r.doc_id for r in stratified_sample(docs, rates).collect()}
    b = {r.doc_id for r in stratified_sample(docs.repartition(7), rates).collect()}
    assert a == b and 0 < len(a) < docs.count()
    by_lang_total = {r["lang"]: r["n"] for r in
                     docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    by_lang_kept = {r["lang"]: r["n"] for r in
                    stratified_sample(docs, rates).groupBy("lang")
                    .agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, pm in rates.items():
        if by_lang_total.get(lang, 0) >= 20:
            frac = by_lang_kept.get(lang, 0) / by_lang_total[lang]
            assert abs(frac - pm / 1000) < 0.25, (lang, frac)


@pytest.mark.heavy
def test_new_ops_edge_cases(spark):
    """Degenerate inputs: token-free docs have NO signature row (so they
    never pair — an all-zero signature would false-match every other
    empty doc), no vocab/tfidf rows; stratified rates 0 and 1000 are
    drop-all / keep-all strata."""
    from tickdatapipeline_spark.operators.dedup import simhash_near_dup_pairs
    from tickdatapipeline_spark.operators.text import (
        simhash,
        stratified_sample,
        tfidf_topk,
        vocab_topk,
    )

    d = docs_df(spark, [(1, "", "en"), (2, "   ", "en"), (3, "real text here", "de")])
    assert vocab_topk(d, k=10).count() == 3  # only doc 3's tokens
    assert tfidf_topk(d).where(F.col("doc_id") != 3).count() == 0
    assert {r.doc_id for r in simhash(d).collect()} == {3}
    assert simhash_near_dup_pairs(d).count() == 0
    kept = stratified_sample(d, {"en": 0, "de": 1000}).collect()
    assert {r.doc_id for r in kept} == {3}


def test_tfidf_topk_golden(spark):
    """Integer reciprocal-df weighting: corpus-wide tokens rank below
    document-specific ones; ties break by token asc."""
    from tickdatapipeline_spark.operators.text import tfidf_topk

    d = docs_df(spark, [(1, "alpha alpha shared", "en"),
                        (2, "beta shared shared", "en"),
                        (3, "gamma shared", "en")])
    rows = tfidf_topk(d, k=2).orderBy("doc_id", "rank").collect()
    got = [(r.doc_id, r.rank, r.token, r.tf, r.doc_freq, r.score_q) for r in rows]
    assert got == [
        (1, 1, "alpha", 2, 1, 2_000_000), (1, 2, "shared", 1, 3, 333_333),
        (2, 1, "beta", 1, 1, 1_000_000), (2, 2, "shared", 2, 3, 666_666),
        (3, 1, "gamma", 1, 1, 1_000_000), (3, 2, "shared", 1, 3, 333_333),
    ]


@pytest.mark.heavy
def test_binned_range_join_matches_naive(spark):
    """The binned equi-join must produce exactly the rows of the naive
    inequality join, including intervals spanning many bins, empty
    intervals, and points on both bounds."""
    from tickdatapipeline_spark.operators.rangejoin import binned_range_join

    points = spark.createDataFrame(
        [(k, i, 10 * i + k) for k in (1, 2) for i in range(40)],
        "k long, pid long, t long",
    )
    intervals = spark.createDataFrame(
        [(1, 100, 0, 35), (1, 101, 35, 36), (1, 102, 390, 391),  # touches last point
         (2, 200, 5, 250), (2, 201, 999, 1000), (3, 300, 0, 400)],  # no k=3 points
        "k long, iid long, lo long, hi long",
    )
    for bin_size in (7, 100, 1):
        got = {
            (r.k, r.pid, r.iid)
            for r in binned_range_join(points, intervals, ["k"], "t", "lo", "hi",
                                       bin_size=bin_size).collect()
        }
        naive = {
            (r.k, r.pid, r.iid)
            for r in points.alias("p").join(
                intervals.alias("i"),
                (F.col("p.k") == F.col("i.k"))
                & (F.col("p.t") >= F.col("i.lo"))
                & (F.col("p.t") <= F.col("i.hi")),
            ).collect()
        }
        assert got == naive and len(naive) > 0, bin_size


def test_range_join_epoch_nanos_and_invalid_intervals(spark):
    """Bin math must be exact integer division — epoch-nanos exceed 2^53
    where float division rounds — and hi < lo intervals must yield no
    rows instead of raising from F.sequence."""
    from tickdatapipeline_spark.operators.rangejoin import binned_range_join

    base = 2**61  # far beyond double's exact-integer range
    points = spark.createDataFrame(
        [(1, 0, base + 10), (1, 1, base + 999), (1, 2, base + 1000)],
        "k long, pid long, t long",
    )
    intervals = spark.createDataFrame(
        [(1, 100, base + 0, base + 999),   # catches pid 0,1
         (1, 101, base + 500, base + 400)],  # hi < lo: must match nothing
        "k long, iid long, lo long, hi long",
    )
    got = {
        (r.pid, r.iid)
        for r in binned_range_join(points, intervals, ["k"], "t", "lo", "hi",
                                   bin_size=250).collect()
    }
    assert got == {(0, 100), (1, 100)}


def test_range_join_plans_as_equi_join(spark):
    """The point of the operator: the physical plan must be a hash/sort
    -merge EQUI-join on (key, bin), never BroadcastNestedLoopJoin or
    CartesianProduct (what a naive BETWEEN join degrades to)."""
    from tickdatapipeline_spark.plans.beyond import attribution_fn

    plan = attribution_fn(spark, "/root/testdata/sf0.001")._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan


def test_cosine_topk_golden(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.7, 0.7])],
        "vec_id long, embedding array<double>",
    )
    # query_mod=4 -> query is vec 0 only
    out = cosine_topk(emb, k=3, query_mod=4).orderBy("rank").collect()
    assert [r.neighbor_id for r in out] == [1, 3, 2]
    assert out[0].cosine == pytest.approx(1.0)
    assert out[1].cosine == pytest.approx(0.7071068, abs=1e-6)
    assert out[2].cosine == pytest.approx(0.0)


def test_asof_join_golden(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 10, 305), (4, 99, 100)],
        "id long, key long, t long",
    )
    right = spark.createDataFrame(
        [(10, 100, 1.0), (10, 200, 2.0), (10, 300, 3.0)],
        "key long, t long, v double",
    )
    out = asof_join(left, right, on="key", left_time="t", right_time="t",
                    value_cols=["v"]).orderBy("id").collect()
    # t=100 matches the t=100 quote (ties: right wins), 205 -> 2.0, 305 -> 3.0
    assert [r.asof_v for r in out] == [1.0, 2.0, 3.0, None]


@pytest.mark.heavy
def test_asof_join_duplicate_right_times_deterministic(spark):
    # several right rows share (key, t): the largest value_cols tuple must
    # win, regardless of input order or partitioning.
    left = spark.createDataFrame([(1, 10, 150)], "id long, key long, t long")
    dup = [(10, 100, 5.0), (10, 100, 9.0), (10, 100, 1.0)]
    for perm in (dup, dup[::-1], [dup[1], dup[2], dup[0]]):
        right = spark.createDataFrame(perm, "key long, t long, v double").repartition(3)
        out = asof_join(left, right, on="key", left_time="t", right_time="t",
                        value_cols=["v"]).collect()
        assert [r.asof_v for r in out] == [9.0]


@pytest.mark.heavy
def test_media_plumbing(spark):
    from tickdatapipeline_spark.operators.multimodal import (
        _fake_decode_features,
        extract_features,
        sample_frames,
        synth_media_from_documents,
    )

    docs = spark.createDataFrame(
        [(0, "abcdefgh", "en", "s", 8), (1, "ijkl", "en", "s", 4), (2, "mnopqrstuvwx", "en", "s", 12)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    media = synth_media_from_documents(docs)
    kinds = {r.media_id: r.kind for r in media.collect()}
    assert kinds == {0: "image", 1: "audio", 2: "video"}

    feats = {r.media_id: r for r in extract_features(media, dim=4).collect()}
    payload = b"abcdefgh"
    assert feats[0].n_bytes == 8
    assert feats[0].byte_mean == pytest.approx(sum(payload) / 8)
    assert list(feats[0].features) == _fake_decode_features(payload, 4)

    frames = sample_frames(media, every=2).collect()
    assert all(f.media_id == 2 for f in frames)  # only the video row
    n_frames = 12 % 16 + 1  # 13 frames -> sampled 0,2,4,...,12
    assert sorted(f.frame_idx for f in frames) == list(range(0, n_frames, 2))


def test_media_frame_kernel_golden_slices(spark):
    """The vectorized explode kernel must reproduce the per-row stub
    contract exactly: frame f of a payload of length L split into n
    frames is payload[f*size:(f+1)*size] with size = max(L // n, 1);
    n_frames null/0 clamps to 1; non-video and null-content rows drop."""
    from tickdatapipeline_spark.operators.multimodal import MEDIA_SCHEMA, sample_frames

    rows = [
        (1, "video", b"abcdefghij", 0, 0, 5),   # 10 bytes / 5 frames -> size 2
        (2, "video", b"xyz", 0, 0, None),        # null n_frames -> 1 frame
        (3, "video", b"pq", 0, 0, 0),            # 0 clamps to 1
        (4, "image", b"ignored", 0, 0, 9),       # wrong kind drops
        (5, "video", None, 0, 0, 3),             # null payload drops
        (6, "video", b"a", 0, 0, 7),             # size clamps to 1, 7 frames
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {(r.media_id, r.frame_idx): bytes(r.frame_bytes)
           for r in sample_frames(media, every=2).collect()}
    assert got == {
        (1, 0): b"ab", (1, 2): b"ef", (1, 4): b"ij",
        (2, 0): b"xyz",
        (3, 0): b"pq",
        (6, 0): b"a", (6, 2): b"", (6, 4): b"", (6, 6): b"",
    }


def test_media_codec_injection(spark):
    """Deployments swap the stub kernels for real codecs without touching
    the Spark plumbing: extract_features(decode=...) and
    sample_frames(demux=...) run the injected callables on executors."""
    from tickdatapipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        sample_frames,
    )

    rows = [(1, "video", b"abcdef", 0, 0, 3), (2, "image", b"zz", 0, 0, 1)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    def fake_decode(payload: bytes) -> list[float]:
        return [float(len(payload)), float(payload[0])]

    feats = {r.media_id: list(r.features)
             for r in extract_features(media, dim=2, decode=fake_decode).collect()}
    assert feats == {1: [6.0, float(b"a"[0])], 2: [2.0, float(b"z"[0])]}

    def fake_demux(payload: bytes, n_frames: int) -> list[bytes]:
        # a "real" demuxer: reversed per-frame chunks, to prove the stub
        # slicer was NOT used
        return [payload[i::n_frames][::-1] for i in range(n_frames)]

    frames = {(r.media_id, r.frame_idx): bytes(r.frame_bytes)
              for r in sample_frames(media, every=2, demux=fake_demux).collect()}
    assert frames == {(1, 0): b"da", (1, 2): b"fc"}


def test_media_near_duplicates_decodes_each_payload_once(spark):
    """r15: `media_near_duplicates` consumes its feature frame from the
    per-dim means subquery AND the main plan; without the feats pin the
    mapInPandas decode lineage executed twice per query — the dominant
    cost once a real codec is injected. Pin the total decode-call count
    (via an accumulator-instrumented injected decoder) to exactly one
    call per payload."""
    from tickdatapipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        media_near_duplicates,
    )

    rows = [(i, "image", bytes([i % 7 + 1] * (8 + i)), 0, 0, 1)
            for i in range(1, 13)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    calls = spark.sparkContext.accumulator(0)

    def counting_decode(payload: bytes) -> list[float]:
        calls.add(1)
        return [float(b) for b in payload[:4]]

    import tickdatapipeline_spark.operators.multimodal as mm

    orig = mm.extract_features

    def instrumented(m, dim=8, decode=None):
        return orig(m, dim=dim, decode=counting_decode)

    mm.extract_features = instrumented
    try:
        media_near_duplicates(media, threshold=0.0, planes=4, dim=4).collect()
    finally:
        mm.extract_features = orig
    assert calls.value == len(rows), (
        f"decode ran {calls.value} times for {len(rows)} payloads — the "
        "feature frame must be pinned so every consumer shares one decode"
    )


@pytest.mark.heavy
def test_media_features_oracle_survives_non_ascii(spark, tmp_path):
    """The MEDIA_FEATURES_SQL oracle must match the Spark side for ANY
    corpus, not just ASCII: exercise 2/3/4-byte UTF-8 codepoints so a
    driver testdata regeneration with non-ASCII text can't flip the
    gated row red (round-4 verdict, 'What's wrong' #3)."""
    import duckdb

    from tickdatapipeline_spark.plans.beyond import (
        MEDIA_FEATURES_SQL,
        media_features_fn,
    )

    texts = ["plain ascii", "héllo wörld", "日本語テキスト", "emoji 😀🚀 mix é中",
             ""]
    rows = [(i, t, "xx", "s", len(t)) for i, t in enumerate(texts)]
    docs_dir = tmp_path / "docs_sf"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(docs_dir / "documents.parquet"))

    got = {r.media_id: r for r in media_features_fn(spark, str(docs_dir)).collect()}

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{docs_dir}/documents.parquet/*.parquet')"
    )
    want = {r[0]: r for r in con.sql(MEDIA_FEATURES_SQL).fetchall()}

    assert set(got) == set(want)
    for mid, (_, kind, n_bytes, byte_mean) in want.items():
        assert got[mid].kind == kind
        assert got[mid].n_bytes == n_bytes, texts[mid]
        assert got[mid].byte_mean == pytest.approx(byte_mean, abs=0), texts[mid]
        # ground truth straight from the utf-8 encoding
        enc = texts[mid].encode("utf-8")
        assert got[mid].n_bytes == len(enc)
        assert got[mid].byte_mean == (sum(enc) / len(enc) if enc else 0.0)


def test_media_exact_duplicates(spark):
    """sha2-256 groupBy over payload bytes: identical payloads collapse
    into one group with keep_id = min media_id; null content drops;
    singletons are still emitted (manifest contract)."""
    import hashlib

    from tickdatapipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        media_exact_duplicates,
    )

    rows = [
        (1, "image", b"same-bytes", 0, 0, 1),
        (5, "audio", b"same-bytes", 0, 0, 1),   # dup of 1 across kinds
        (3, "image", b"same-bytes", 0, 0, 1),   # dup of 1
        (4, "video", b"unique", 0, 0, 1),
        (9, "image", None, 0, 0, 1),            # null payload drops
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.content_sha: (r.dup_cnt, r.keep_id)
           for r in media_exact_duplicates(media).collect()}
    assert got == {
        hashlib.sha256(b"same-bytes").hexdigest(): (3, 1),
        hashlib.sha256(b"unique").hexdigest(): (1, 4),
    }


def _py_media_near_dups(payloads, threshold, planes=8, dim=8):
    """Pure-Python mirror of media_near_duplicates on the stub codec —
    same fold order as similarity._dot/_norm so values are bit-equal."""
    import math

    from tickdatapipeline_spark.operators.multimodal import _fake_decode_features
    from tickdatapipeline_spark.operators.similarity import _plane_weight

    feats = {i: _fake_decode_features(p, dim) for i, p in payloads.items() if p}
    n = len(feats)
    mean = [sum(f[d] for f in feats.values()) / n for d in range(dim)]
    cent = {i: [f[d] - mean[d] for d in range(dim)] for i, f in feats.items()}

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def bucket(c):
        out = 0
        for p in range(planes):
            if fold_dot([float(_plane_weight(p, d)) for d in range(dim)], c) > 0.0:
                out += 1 << p
        return out

    nrm = {i: math.sqrt(fold_dot(c, c)) for i, c in cent.items()}
    bkt = {i: bucket(c) for i, c in cent.items()}
    pairs = {}
    for i in sorted(cent):
        for j in sorted(cent):
            if i < j and bkt[i] == bkt[j] and nrm[i] > 0.0 and nrm[j] > 0.0:
                cos = math.floor(
                    fold_dot(cent[i], cent[j]) / (nrm[i] * nrm[j]) * 1e6 + 0.5
                ) / 1e6
                if cos >= threshold:
                    pairs[(i, j)] = cos
    return pairs


@pytest.mark.heavy
def test_media_near_duplicates_golden(spark):
    """Feature-space near-dup pairs must match a pure-Python mirror of
    the whole chain (stub features -> mean-center -> SRP bucket ->
    rounded cosine) bit-for-bit; empty payloads drop; the bucket skew
    cap kills pairs when armed below the bucket size."""
    from tickdatapipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        media_near_duplicates,
    )

    base = (b"the quick brown fox jumps over the lazy dog. " * 12)
    payloads = {
        1: base,
        2: base[:-3] + b"g!?",              # near-identical histogram
        3: bytes(range(48, 128)) * 6,       # flat histogram, far from 1/2
        4: b"zZzZ" * 120,                   # periodic, its own direction
        5: base.upper(),                    # same offsets, shifted bytes
        6: b"",                             # empty -> dropped
    }
    rows = [(i, "image", p, 0, 0, 1) for i, p in payloads.items()]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    want = _py_media_near_dups(payloads, threshold=0.9)
    got = {(r.media_a, r.media_b): r.cosine
           for r in media_near_duplicates(media, threshold=0.9).collect()}
    assert got == want
    assert (1, 2) in got and got[(1, 2)] >= 0.999  # the engineered near-dup

    capped = media_near_duplicates(media, threshold=0.9, max_bucket_size=1)
    assert capped.count() == 0


@pytest.mark.heavy
def test_media_dedup_features_oracle_survives_non_ascii(spark, tmp_path):
    """MEDIA_DEDUP_FEATURES_SQL reproduces the stub codec's byte-offset
    histogram in closed UTF-8 form — exercise 2/3/4-byte codepoints so a
    testdata regeneration with non-ASCII text can't flip the gated row
    red (same hazard class as test_media_features_oracle_survives_non_ascii)."""
    import duckdb

    from tickdatapipeline_spark.plans.beyond import (
        MEDIA_DEDUP_FEATURES_SQL,
        media_dedup_features_fn,
    )

    base = "héllo wörld 日本語テキスト emoji 😀🚀 mix é中 " * 8
    texts = [base, base + "!", "plain ascii filler text " * 10, base + "違う", ""]
    rows = [(i, t, "xx", "s", len(t)) for i, t in enumerate(texts)]
    docs_dir = tmp_path / "docs_sf"
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(docs_dir / "documents.parquet"))

    got = {(r.media_a, r.media_b): r.cosine
           for r in media_dedup_features_fn(spark, str(docs_dir)).collect()}

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{docs_dir}/documents.parquet/*.parquet')"
    )
    want = {(r[0], r[1]): r[2] for r in con.sql(MEDIA_DEDUP_FEATURES_SQL).fetchall()}
    assert got == want
    assert (0, 1) in got  # the engineered multibyte near-dup pair survives


@pytest.mark.heavy
def test_duplicate_clusters_transitive(spark):
    """Connected components must merge chains: A~B and B~C (never A~C as
    a direct LSH pair is fine) land in ONE cluster keyed by min doc_id;
    singletons are absent."""
    from tickdatapipeline_spark.operators.dedup import duplicate_clusters

    t1 = "alpha beta gamma delta epsilon zeta eta theta"
    d = docs_df(spark, [
        (1, t1, "en"),
        (2, t1, "en"),                     # identical to 1
        (3, t1 + " iota", "en"),           # near-dup of 1/2
        (4, "unrelated words entirely different content here", "en"),
        (7, "another singleton document with its own text body", "en"),
        (8, "another singleton document with its own text body", "en"),  # =7
    ])
    rows = {r.doc_id: r for r in duplicate_clusters(d, threshold=0.5).collect()}
    assert set(rows) == {1, 2, 3, 7, 8}
    assert rows[1].cluster_id == rows[2].cluster_id == rows[3].cluster_id == 1
    assert rows[1].cluster_size == 3
    assert rows[7].cluster_id == rows[8].cluster_id == 7
    assert rows[7].cluster_size == 2
    assert rows[1].is_representative == 1 and rows[2].is_representative == 0
    assert rows[7].is_representative == 1 and rows[8].is_representative == 0


@pytest.mark.heavy
def test_bucket_skew_guards(spark, caplog):
    """max_band_bucket / max_bucket_size drop oversized buckets BEFORE
    the quadratic join (100 TB skew guard); with a cap above every
    bucket the output is unchanged. The DEPLOYMENT defaults are finite
    (a degenerate corpus must not silently go n^2 per bucket) and a
    tripped guard logs how much it dropped; None = exhaustive."""
    import logging

    from tickdatapipeline_spark.operators import dedup as dedup_mod
    from tickdatapipeline_spark.operators import similarity as sim_mod
    from tickdatapipeline_spark.operators.dedup import lsh_candidate_pairs
    from tickdatapipeline_spark.operators.similarity import embedding_near_duplicates

    # the corpus-scale entry points ship with the guard ON
    assert dedup_mod.DEFAULT_MAX_BAND_BUCKET is not None
    assert sim_mod.DEFAULT_MAX_BUCKET_SIZE is not None
    import inspect

    assert (inspect.signature(lsh_candidate_pairs).parameters["max_band_bucket"].default
            == dedup_mod.DEFAULT_MAX_BAND_BUCKET)
    assert (inspect.signature(embedding_near_duplicates).parameters["max_bucket_size"].default
            == sim_mod.DEFAULT_MAX_BUCKET_SIZE)

    t1 = "alpha beta gamma delta epsilon zeta"
    d = docs_df(spark, [(i, t1, "en") for i in range(1, 5)]  # 4 identical docs
                + [(9, "other words completely unrelated here", "en")])
    # identical docs share every band: bucket size 4 < default cap -> 6 pairs
    assert lsh_candidate_pairs(d).count() == 6
    # exhaustive mode unchanged
    assert lsh_candidate_pairs(d, max_band_bucket=None).count() == 6
    # degenerate corpus: cap 3 drops the size-4 buckets entirely, logged
    with caplog.at_level(logging.WARNING, logger="tickdatapipeline_spark.operators.dedup"):
        capped = lsh_candidate_pairs(d, max_band_bucket=3)
    assert any("skew guard" in r.message and "max_band_bucket=3" in r.message
               for r in caplog.records)
    assert capped.count() == 0
    caplog.clear()
    # cap above every bucket: identical output, nothing logged
    with caplog.at_level(logging.WARNING, logger="tickdatapipeline_spark.operators.dedup"):
        assert lsh_candidate_pairs(d, max_band_bucket=100).count() == 6
    assert not any("skew guard" in r.message for r in caplog.records)

    emb = spark.createDataFrame(
        [(i, [1.0] * 8) for i in range(1, 5)] + [(9, [-1.0] * 8)],
        "vec_id long, embedding array<double>",
    )
    assert embedding_near_duplicates(emb, 0.25).count() == 6
    assert embedding_near_duplicates(emb, 0.25, max_bucket_size=None).count() == 6
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="tickdatapipeline_spark.operators.similarity"):
        capped = embedding_near_duplicates(emb, 0.25, max_bucket_size=3)
    assert any("skew guard" in r.message and "max_bucket_size=3" in r.message
               for r in caplog.records)
    assert capped.count() == 0
    assert embedding_near_duplicates(emb, 0.25, max_bucket_size=100).count() == 6


@pytest.mark.heavy
def test_cross_corpus_contamination(spark, caplog):
    """Benchmark decontamination: train docs near-duplicating an eval
    doc are flagged (LSH band join BETWEEN corpora + Jaccard verify);
    sub-threshold overlap is not; the skew cap applies to the TRAIN
    side only (dropping eval docs would silently un-decontaminate)."""
    import logging

    from tickdatapipeline_spark.operators.dedup import cross_corpus_contamination

    leak = ("the quick brown fox jumps over the lazy dog while rain "
            "falls gently on the quiet village roofs tonight")
    train = docs_df(spark, [
        (1, leak, "en"),                               # verbatim eval leak
        (2, leak + " extra trailing words here", "en"),  # near-dup of eval
        (3, "completely unrelated training text about spark plans and "
            "shuffle exchanges in distributed query engines", "en"),
    ])
    eval_d = docs_df(spark, [(100, leak, "en")])
    out = {(r.train_doc_id, r.eval_doc_id): r.jaccard
           for r in cross_corpus_contamination(train, eval_d, 0.5).collect()}
    assert (1, 100) in out and out[(1, 100)] == 1.0
    assert (2, 100) in out and 0.5 <= out[(2, 100)] < 1.0
    assert all(t != 3 for t, _e in out)

    # train-side skew cap: every train doc shares every band -> bucket
    # size 3; cap 2 drops them all, logged; eval side is never capped
    with caplog.at_level(logging.WARNING, logger="tickdatapipeline_spark.operators.dedup"):
        capped = cross_corpus_contamination(
            docs_df(spark, [(i, leak, "en") for i in (1, 2, 3)]),
            eval_d, 0.5, max_band_bucket=2)
    assert any("train-side" in r.message for r in caplog.records)
    assert capped.count() == 0


@pytest.mark.heavy
def test_corpus_index_build_time_cap(spark, tmp_path, caplog):
    """write_corpus_index applies the skew cap ONCE at build time: an
    oversized band bucket never reaches the parquet index (logged), so
    per-batch probes pass max_band_bucket=None and pay no sizing work;
    an uncapped build keeps everything."""
    import logging

    from tickdatapipeline_spark.operators.dedup import (
        contamination_against_index,
        shingles,
        write_corpus_index,
    )

    leak = ("the quick brown fox jumps over the lazy dog while rain "
            "falls gently on the quiet village roofs tonight")
    corpus = docs_df(spark, [(i, leak, "en") for i in (1, 2, 3)])
    probe = docs_df(spark, [(100, leak, "en")])

    capped = tmp_path / "capped"
    with caplog.at_level(logging.WARNING, logger="tickdatapipeline_spark.operators.dedup"):
        write_corpus_index(corpus, str(capped), max_band_bucket=2)
    assert any("write_corpus_index skew guard" in r.message for r in caplog.records)
    assert spark.read.parquet(str(capped / "bands")).count() == 0  # all buckets size 3
    hits = contamination_against_index(
        probe, spark.read.parquet(str(capped / "bands")),
        spark.read.parquet(str(capped / "shingles")), max_band_bucket=None)
    assert hits.count() == 0

    full = tmp_path / "full"
    write_corpus_index(corpus, str(full), max_band_bucket=None)
    hits = contamination_against_index(
        probe, spark.read.parquet(str(full / "bands")),
        spark.read.parquet(str(full / "shingles")), max_band_bucket=None)
    assert hits.count() == 3  # verbatim leak matches every corpus doc
    assert shingles(probe).count() > 0


@pytest.mark.heavy
def test_token_budget_sample_matches_naive_order(spark):
    """The two-level (bucket prefix + within-bucket window) plan must
    admit EXACTLY the docs a naive single-ordered scan admits, and the
    admitted token total can overshoot the budget by at most the last
    admitted document."""
    from tickdatapipeline_spark.operators.text import h60, token_budget_sample

    texts = [(i, " ".join(f"w{j}" for j in range((i * 13) % 29 + 1)), "en")
             for i in range(60)]
    d = docs_df(spark, texts)
    # naive order: (h % n_buckets, h, doc_id), exclusive prefix < budget
    hashes = {
        r.doc_id: r.h
        for r in d.select("doc_id", h60(
            F.concat(F.lit("budget:"), F.col("doc_id").cast("string"))).alias("h")
        ).collect()
    }
    ntok = {i: (i * 13) % 29 + 1 for i, _t, _l in texts}
    order = sorted(ntok, key=lambda i: (hashes[i] % 16, hashes[i], i))
    budget = 300
    run, want = 0, {}
    for i in order:
        if run < budget:
            want[i] = ntok[i]
        run += ntok[i]
    got = {r.doc_id: r.n_tokens
           for r in token_budget_sample(d, budget, n_buckets=16).collect()}
    assert got == want
    assert sum(want.values()) < budget + max(ntok.values())
    # degenerate budgets
    assert token_budget_sample(d, 0, n_buckets=16).count() == 0
    first = token_budget_sample(d, 1, n_buckets=16).collect()
    assert len(first) == 1 and first[0].doc_id == order[0]


@pytest.mark.heavy
def test_power_iteration_finds_dominant_axis(spark):
    """On a corpus dominated by one axis the fixed-iteration power
    method lands on it: the unit-norm iterate concentrates on dim 0 and
    the run is deterministic."""
    from tickdatapipeline_spark.operators.similarity import power_iteration_top_component

    rows = [(i, [0.9 if d == 0 else (0.02 if (i + d) % 3 == 0 else -0.01)
                 for d in range(8)]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sorted(power_iteration_top_component(emb, iters=3).collect(),
                 key=lambda r: r.pos)
    assert len(out) == 8
    comp = [r.component for r in out]
    assert abs(comp[0]) > 0.95                      # dominant axis found
    assert abs(sum(c * c for c in comp) - 1.0) < 1e-4  # unit norm (Q20)
    again = sorted(power_iteration_top_component(emb, iters=3).collect(),
                   key=lambda r: r.pos)
    assert [r.component_q for r in again] == [r.component_q for r in out]
    # single-plan formulation: the iterations unroll into ONE lazy tree
    # (no driver-side collect between them), and the seed precondition
    # rides the plan as an un-prunable raise_error
    plan = power_iteration_top_component(emb, iters=3)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert plan.count("raise_error") >= 4  # 1 seed + 3 zero-norm guards
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    no_seed = emb.where(F.col("vec_id") != 0)
    with pytest.raises(SparkRuntimeException, match="vec_id == 0"):
        power_iteration_top_component(no_seed, iters=1).collect()


def test_pq_dequantized_golden(spark):
    """PQ reconstruction on the SEEDED codebook (train_iters=0 — the
    legacy stand-in path, kept as the degenerate fallback): codebook
    vectors (vec_id < k_codes) quantize to themselves exactly; a vector
    assembled from DIFFERENT codes' subvectors reconstructs as exactly
    that assembly (per-subspace independent argmin); a perturbed
    subvector snaps to its nearest code."""
    from tickdatapipeline_spark.operators.similarity import DIM, pq_dequantized

    n_sub, k_codes = 4, 8
    sub = DIM // n_sub

    def vec(seed):
        return [float((seed * 31 + d * 7) % 13 - 6) / 6.0 for d in range(DIM)]

    rows = [(i, vec(i)) for i in range(k_codes)]
    # vec 100: subspace m takes code (m % k_codes)'s subvector -> mixed assembly
    mixed = []
    for m in range(n_sub):
        mixed += vec(m % k_codes)[m * sub:(m + 1) * sub]
    rows.append((100, mixed))
    # vec 101: code 3's vector with a tiny perturbation in subspace 0
    pert = vec(3)[:]
    pert[0] += 0.001
    rows.append((101, pert))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: list(r.v)
           for r in pq_dequantized(emb, n_sub, k_codes,
                                   train_iters=0).collect()}
    for i in range(k_codes):
        assert out[i] == vec(i), f"codebook vector {i} not exact"
    assert out[100] == mixed
    assert out[101] == vec(3)  # perturbation snapped away


@pytest.mark.heavy
def test_pq_train_trained_golden(spark):
    """Trained PQ (the r12-verdict #1 default): on two binary-exact
    clusters per subspace, Lloyd's converges to the cluster means in
    every subspace, and reconstruction snaps members to their cluster
    mean — strictly better than the seeded codebook, which could only
    return the two seed vectors themselves. Values are picked so the
    Q30 fixed-point means are exact and the expected codebook is an
    equality, not a tolerance."""
    from tickdatapipeline_spark.operators.similarity import (
        DIM, pq_dequantized, pq_train)

    k_codes, n_sub = 2, 4
    rows = [
        (0, [0.0] * DIM),    # seed code 0
        (1, [1.0] * DIM),    # seed code 1
        (2, [0.5] * DIM),    # ties to code 0 (d2 equal, lowest code wins)
        (3, [0.75] * DIM),   # nearer code 1
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # iter 1: code0 <- mean{0.0, 0.5} = 0.25; code1 <- mean{1.0, 0.75} = 0.875
    # iter 2+: assignments stable (0.5 is nearer 0.25 than 0.875) -> converged
    cb = pq_train(emb, n_sub, k_codes)
    assert sorted((m, code) for m, code, _ in cb) == [
        (m, c) for m in range(n_sub) for c in range(k_codes)]
    for _, code, c in cb:
        assert c == [0.25 if code == 0 else 0.875] * (DIM // n_sub)
    # determinism: retraining yields the identical codebook
    assert pq_train(emb, n_sub, k_codes) == cb
    out = {r.vec_id: list(r.v)
           for r in pq_dequantized(emb, n_sub, k_codes).collect()}
    assert out[0] == out[2] == [0.25] * DIM
    assert out[1] == out[3] == [0.875] * DIM


@pytest.mark.heavy
def test_pq_train_empty_code_carries_forward(spark):
    """A code that attracts no subvectors keeps its previous entry
    (kmeans_train's empty-cell rule): with every non-seed vector on
    top of seed 0, seed 1's entry must survive training unchanged."""
    from tickdatapipeline_spark.operators.similarity import DIM, pq_train

    emb = spark.createDataFrame(
        [(0, [0.0] * DIM), (1, [1.0] * DIM),
         (2, [0.0] * DIM), (3, [0.0] * DIM)],
        "vec_id long, embedding array<double>")
    cb = {(m, code): c for m, code, c in pq_train(emb, 4, 2)}
    sub = DIM // 4
    for m in range(4):
        assert cb[(m, 0)] == [0.0] * sub   # trained on {0,2,3}
        assert cb[(m, 1)] == [1.0] * sub   # only its own seed -> unchanged


@pytest.mark.heavy
def test_pq_adc_contract_and_dominance(spark):
    """ADC (raw query vs reconstructed corpus): same output contract
    as the other ANN paths; on the seeded codebook a CODEBOOK vector's
    reconstruction is itself, so its ADC cosine to a codebook neighbor
    equals the exact value; and ADC recall is >= symmetric recall on
    the sf0.001 fixture (the asymmetric side carries no quantization
    error — the reason the variant exists)."""
    from pyspark.sql import functions as F

    from tickdatapipeline_spark.operators.similarity import (
        ann_recall, ann_topk_pq, ann_topk_pq_adc, cosine_topk)
    from tickdatapipeline_spark.plans.beyond import _emb

    emb = _emb(spark, "/root/testdata/sf0.001")
    adc = ann_topk_pq_adc(emb, 5, 50).collect()
    assert adc and all(-1.0 <= r.cosine <= 1.0 for r in adc)
    assert all(r.query_id != r.neighbor_id for r in adc)

    exact = cosine_topk(emb, 5, 50)

    def mean_recall(df):
        return ann_recall(df, exact).agg(
            F.avg("recall").alias("r")).first()["r"]

    r_adc = mean_recall(ann_topk_pq_adc(emb, 5, 50))
    r_sym = mean_recall(ann_topk_pq(emb, 5, 50))
    assert r_adc >= r_sym


@pytest.mark.heavy
def test_pq_train_shifted_ids_match_rekeyed(spark):
    """Rank-based seeding (r14 verdict #2): a shard whose vec_ids start
    at 10^6 trains the IDENTICAL codebook — and reconstructs the
    identical vectors per rank — as the same shard re-keyed from 0.
    The former ``vec_id < k_codes`` init seeded NOTHING on such a
    shard, so pq_dequantized silently reconstructed zero rows and
    every downstream PQ/ADC panel returned empty."""
    from tickdatapipeline_spark.operators.similarity import (
        DIM, pq_dequantized, pq_train)

    vecs = [[((7 * i + d) % 13) / 16.0 for d in range(DIM)]
            for i in range(12)]
    shifted = spark.createDataFrame(
        [(1_000_000 + i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    rekeyed = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<double>")
    cb_s = pq_train(shifted, 4, 8)
    cb_r = pq_train(rekeyed, 4, 8)
    assert cb_s and cb_s == cb_r
    out_s = {r.vec_id - 1_000_000: list(r.v)
             for r in pq_dequantized(shifted, 4, 8).collect()}
    out_r = {r.vec_id: list(r.v)
             for r in pq_dequantized(rekeyed, 4, 8).collect()}
    assert out_s == out_r and len(out_s) == 12


@pytest.mark.heavy
def test_kmeans_train_shifted_ids_match_rekeyed(spark):
    """kmeans_train's default init is rank-based too (r14): centroids
    from a shifted-id corpus equal the re-keyed corpus's, without the
    explicit ``seeds`` escape hatch the delta loop uses."""
    from tickdatapipeline_spark.operators.similarity import (
        DIM, kmeans_train)

    vecs = [[((5 * i + d) % 11) / 16.0 for d in range(DIM)]
            for i in range(10)]
    shifted = spark.createDataFrame(
        [(10_000_000 + 2 * i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>")
    rekeyed = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<double>")
    cs = kmeans_train(shifted, k=4, iters=3)
    cr = kmeans_train(rekeyed, k=4, iters=3)
    assert cs and cs == cr


@pytest.mark.heavy
def test_train_sample_mod_bounds_training_set(spark):
    """Deterministic training sampling (r14 verdict #1): with
    sample_mod forced to 3, pq_train equals training on the explicit
    vec_id % 3 == 0 subset with sampling off — the predicate IS the
    sample, so the DuckDB oracle twins replay it as a WHERE clause.
    Also pins the auto-sizing arithmetic train_sample_mod shares with
    the oracle CTEs (integer division, floor, min 1)."""
    from tickdatapipeline_spark.operators.similarity import (
        DIM, pq_train, train_sample_mod)

    vecs = [[((3 * i + d) % 17) / 32.0 for d in range(DIM)]
            for i in range(18)]
    emb = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<double>")
    sampled = pq_train(emb, 4, 4, sample_mod=3)
    explicit = pq_train(
        emb.where("vec_id % 3 = 0"), 4, 4, sample_mod=1)
    assert sampled and sampled == explicit
    assert train_sample_mod(50_000, 32) == 1          # below target
    assert train_sample_mod(250_000, 32) == 2         # 250k // 100k
    assert train_sample_mod(1_000_000, 2048) == 4     # 100*k lifts target
    assert train_sample_mod(0, 32) == 1               # empty corpus


def test_label_centroid_cosine_golden(spark):
    """Known group geometry: aligned centroids give cosine 1, orthogonal
    0, opposite -1; unordered pairs appear once with label_a < label_b."""
    from tickdatapipeline_spark.operators.similarity import label_centroid_cosine

    rows = (
        [(i, [1.0, 0.0], 0) for i in range(3)]          # centroid +e1
        + [(10 + i, [0.0, 1.0], 1) for i in range(2)]   # centroid +e2
        + [(20 + i, [2.0, 0.0], 2) for i in range(4)]   # +e1 again (scaled)
        + [(30, [-1.0, 0.0], 3)]                        # -e1
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = {(r.label_a, r.label_b): r for r in label_centroid_cosine(emb).collect()}
    assert set(out) == {(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)}
    assert out[(0, 2)].cosine == 1.0    # same direction, different scale/count
    assert out[(0, 1)].cosine == 0.0
    assert out[(0, 3)].cosine == -1.0
    assert out[(1, 3)].cosine == 0.0
    assert (out[(0, 2)].n_a, out[(0, 2)].n_b) == (3, 4)


def test_embedding_outliers_golden(spark):
    """The far-from-centroid vector ranks first with an exactly
    computable integer distance; top-N plans TakeOrdered (no global
    sort of the corpus)."""
    from tickdatapipeline_spark.operators.similarity import OUTLIER_Q, embedding_outliers

    emb = spark.createDataFrame(
        [(i, [0.5, -0.5]) for i in range(9)] + [(9, [-1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = embedding_outliers(emb, top_n=3)
    rows = out.collect()
    assert [r.vec_id for r in rows] == [9, 0, 1]  # outlier, then id ties
    # centroid_q = trunc((9*0.5Q - 1.0Q)/10) per dim = 0.35Q exactly
    q = OUTLIER_Q
    c = (9 * (q // 2) - q) // 10
    assert rows[0].dist_q == (-q - c) ** 2 + (q + c) ** 2
    assert rows[1].dist_q == (q // 2 - c) ** 2 * 2
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_repetition_score_golden(spark):
    """Gopher-style repetition metrics on engineered docs: a spam doc
    (one token repeated), a clean doc (all unique), a half-repeated doc,
    and the empty doc (all zeros)."""
    from tickdatapipeline_spark.operators.text import repetition_score

    d = docs_df(spark, [
        (1, "buy buy buy buy", "en"),                  # pure spam
        (2, "five distinct little words here", "en"),  # clean
        (3, "red blue red blue red", "en"),            # alternating
        (4, "", "en"),                                 # empty
    ])
    rows = {r.doc_id: r for r in repetition_score(d).collect()}
    assert rows[1].n_tokens == 4
    assert rows[1].dup_token_frac == 0.75      # 4 tokens, 1 unique
    assert rows[1].top_token_frac == 1.0
    assert rows[1].dup_bigram_frac == pytest.approx(2 / 3, abs=1e-6)
    assert rows[2].dup_token_frac == 0.0 and rows[2].dup_bigram_frac == 0.0
    assert rows[2].top_token_frac == 0.2
    assert rows[3].n_tokens == 5
    assert rows[3].dup_token_frac == 0.6       # 5 tokens, 2 unique
    assert rows[3].top_token_frac == 0.6       # 'red' x3
    assert rows[3].dup_bigram_frac == 0.5      # 4 bigrams, 2 unique
    assert (rows[4].n_tokens, rows[4].dup_token_frac, rows[4].top_token_frac,
            rows[4].dup_bigram_frac) == (0, 0.0, 0.0, 0.0)


@pytest.mark.heavy
def test_shard_assignments_contract(spark):
    """Every doc lands in exactly one shard; positions are contiguous
    0..k-1 within each shard; the assignment is deterministic and
    independent of input partitioning; the window partitions BY shard
    (no SinglePartition)."""
    from tickdatapipeline_spark.operators.text import shard_assignments

    d = docs_df(spark, [(i, f"doc number {i}", "en") for i in range(200)])
    out = shard_assignments(d, n_shards=8)
    rows = out.collect()
    assert len(rows) == 200 and len({r.doc_id for r in rows}) == 200
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard < 8
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), f"shard {shard} gapped"
    # deterministic under repartitioning
    again = {(r.doc_id, r.shard, r.pos)
             for r in shard_assignments(d.repartition(13), n_shards=8).collect()}
    assert again == {(r.doc_id, r.shard, r.pos) for r in rows}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


@pytest.mark.heavy
def test_write_training_shards_roundtrip(spark, tmp_path):
    """Materialized shards: every doc lands in its assigned shard=N
    partition directory, a single-shard read is partition-pruned, and
    within a shard rows come back in the deterministic pos order."""
    from tickdatapipeline_spark.operators.text import (
        shard_assignments,
        write_training_shards,
    )

    d = docs_df(spark, [(i, f"text of document {i}", "en") for i in range(120)])
    out = str(tmp_path / "shards")
    n = write_training_shards(d, out, n_shards=4)
    assert n == 120

    want = {r.doc_id: (r.shard, r.pos) for r in shard_assignments(d, 4).collect()}
    rd = spark.read.parquet(out)
    got = {r.doc_id: (r.shard, r.pos) for r in rd.collect()}
    assert got == want

    one = rd.where(F.col("shard") == 1)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan.split("PartitionFilters")[1][:120]
    poss = [r.pos for r in one.collect()]
    assert sorted(poss) == list(range(len(poss)))


def test_token_budget_sample_single_partitions_only_aggregates(spark):
    """Scale shape, for BOTH consumers of the shared two-level prefix
    helper: the only SinglePartition exchange in the plan is the
    bucket-offsets window over n_buckets AGGREGATE rows — full-data rows
    flow through hash exchanges only."""
    from tickdatapipeline_spark.operators.text import pack_sequences, token_budget_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def walk(node):
        acc, stack = [], [node]
        while stack:
            n = stack.pop()
            acc.append(n)
            ch = n.children()
            stack += [ch.apply(i) for i in range(ch.length())]
        return acc

    for df in (token_budget_sample(docs, 1500), pack_sequences(docs, 64)):
        root = df._jdf.queryExecution().executedPlan()
        if root.nodeName() == "AdaptiveSparkPlan":
            root = root.initialPlan()
        singles = [n for n in walk(root)
                   if n.nodeName() == "Exchange" and "SinglePartition" in n.simpleString(200)]
        assert singles, "expected the tiny bucket-offsets window to single-partition"
        for ex in singles:
            assert any("Aggregate" in c.nodeName() for c in walk(ex)[1:]), (
                f"full-data rows reach a SinglePartition exchange: {ex.simpleString(200)}"
            )


@pytest.mark.heavy
def test_ivf_kmeans_recall(spark):
    """kmeans-trained IVF must behave like a real ANN index: valid top-k
    contract, and recall@5 vs brute force at least as good as chance by
    a wide margin. Also sanity-check Lloyd's training moved centroids."""
    from tickdatapipeline_spark.operators.similarity import (
        ann_topk_ivf, ann_topk_ivf_kmeans, cosine_topk, kmeans_train)
    from tickdatapipeline_spark.sources.io import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")

    cents = kmeans_train(emb, k=8, iters=3)
    assert len(cents) == 8 and all(len(v) > 0 for _, v in cents)
    init = {int(r.vec_id): list(r.embedding)
            for r in emb.where("vec_id < 8").collect()}
    moved = sum(1 for cell, v in cents
                if [float(x) for x in init[cell]] != v)
    assert moved >= 6  # training actually updated centroids

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    truth = topk_sets(cosine_topk(emb, 5, 50))
    got = topk_sets(ann_topk_ivf_kmeans(emb, 5, 50, n_cells=8, nprobe=2, iters=3))
    assert set(got) == set(truth)          # every query answered
    assert all(len(v) <= 5 for v in got.values())
    hits = sum(len(got[q] & truth[q]) for q in truth)
    total = sum(len(truth[q]) for q in truth)
    recall = hits / total
    assert recall >= 0.4, f"kmeans-IVF recall@5 = {recall:.2f}"


def test_rolling_corr_golden(spark):
    """Perfectly correlated, anti-correlated and constant count series
    produce corr 1, -1 and NULL; missing hours zero-fill into the
    window."""
    from tickdatapipeline_spark.plans.beyond import rolling_corr

    HN = 3600 * 1_000_000_000
    rows = []
    # hours 0-3: views = [1, 2, 3, 4]; clicks = 2*views (corr -> +1)
    for h, v in enumerate([1, 2, 3, 4]):
        rows += [(h * HN, "view", 0.0)] * v + [(h * HN, "click", 0.0)] * (2 * v)
    # hours 4-5: views [3, 1], clicks [1, 3] with hour 6 EMPTY (gap)
    rows += [(4 * HN, "view", 0.0)] * 3 + [(4 * HN, "click", 0.0)]
    rows += [(5 * HN, "view", 0.0)] + [(5 * HN, "click", 0.0)] * 3
    rows += [(6 * HN + 1, "error", 0.0)]  # keeps hour 6 on the grid, 0 views
    ev = spark.createDataFrame(rows, "ts long, event_type string, value double")
    out = {r.hour_s // 3600: r for r in rolling_corr(ev, window_h=2).collect()}
    assert len(out) == 7
    assert out[0].corr_2h is None             # single hour: zero variance
    assert out[1].corr_2h == 1.0              # (1,2) vs (2,4)
    assert out[3].corr_2h == 1.0
    assert out[5].corr_2h == -1.0             # (3,1) vs (1,3)
    assert out[6].sum_x == 1 and out[6].sum_y == 3  # gap hour zero-fills
    assert out[6].corr_2h == 1.0              # (1,0) vs (3,0)
    assert out[2].n_hours == 2


def test_hourly_gapfill_golden(spark):
    """Engineered gaps: missing hours appear with zero counts, the last
    observed hourly average carries forward across the gap, and hours
    before a type's first observation stay NULL."""
    from tickdatapipeline_spark.plans.beyond import hourly_gapfill

    HN = 3600 * 1_000_000_000  # one hour in nanos
    rows = [
        # type a: hours 0 and 3 observed; 1-2 are gaps
        (0 * HN, "a", 2.0), (0 * HN + 5, "a", 4.0),   # hour 0: avg 3.00
        (3 * HN, "a", 10.0),                          # hour 3: avg 10.00
        # type b: first observation at hour 2 -> hours 0-1 lead with NULL
        (2 * HN, "b", 7.5),
    ]
    ev = spark.createDataFrame(rows, "ts long, event_type string, value double")
    out = {(r.hour_s // 3600, r.event_type): r
           for r in hourly_gapfill(ev).collect()}
    assert len(out) == 8  # 4 hours x 2 types: dense grid
    assert out[(0, "a")].n_events == 2 and out[(0, "a")].sum_value == 6.0
    assert out[(1, "a")].n_events == 0 and out[(1, "a")].sum_value == 0.0
    assert out[(1, "a")].ffill_avg_value == 3.0     # carried across the gap
    assert out[(2, "a")].ffill_avg_value == 3.0
    assert out[(3, "a")].ffill_avg_value == 10.0    # new observation resets
    assert out[(0, "b")].ffill_avg_value is None    # before first observation
    assert out[(1, "b")].ffill_avg_value is None
    assert out[(2, "b")].ffill_avg_value == 7.5
    assert out[(3, "b")].n_events == 0 and out[(3, "b")].ffill_avg_value == 7.5


@pytest.mark.heavy
def test_hourly_gapfill_rejects_corrupt_timestamp_span(spark):
    """Dirty-timestamp guard: one epoch-0 row among 2026-era events
    would inflate the dense grid by ~490K hours x |types| — the query
    must fail loudly in-plan (raise_error folded into the grid bound,
    so the optimizer can't prune it) instead of silently building it;
    a generous explicit cap admits the same span."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from tickdatapipeline_spark.plans.beyond import hourly_gapfill

    HN = 3600 * 1_000_000_000
    year_2026_h = 56 * 365 * 24  # ~hour index of 2026 in epoch hours
    rows = [((year_2026_h + k) * HN, "a", 1.0) for k in range(3)]
    rows.append((0, "a", 1.0))  # the one corrupt epoch-0 row
    ev = spark.createDataFrame(rows, "ts long, event_type string, value double")
    with pytest.raises(SparkRuntimeException, match="max_span_hours"):
        hourly_gapfill(ev).collect()
    # same data, explicit generous cap: grid spans the corrupt row
    n = hourly_gapfill(ev, max_span_hours=60 * 366 * 24).count()
    assert n == year_2026_h + 3
    # clean data is untouched by the default guard
    clean = spark.createDataFrame(rows[:3], "ts long, event_type string, value double")
    assert hourly_gapfill(clean).count() == 3


@pytest.mark.heavy
def test_event_funnel_golden(spark):
    """Hand-computed funnel: stage entry must be strictly after the
    previous stage's entry and within the conversion window; the first
    qualifying event wins; avg_secs measures from first view."""
    from tickdatapipeline_spark.plans.beyond import event_funnel

    H = 3600 * 1_000_000
    rows = [
        # u1 converts fully: view@0, click@1h, purchase@2h
        (1, "view", 0), (1, "click", H), (1, "purchase", 2 * H),
        # u2: click BEFORE first view -> not a conversion; none after
        (2, "click", 0), (2, "view", H),
        # u3: click after view but outside the 24h window
        (3, "view", 0), (3, "click", 30 * H),
        # u4: view+click, purchase before click -> stops at click
        (4, "view", 0), (4, "purchase", H), (4, "click", 2 * H),
        # u5: two clicks after view -> earliest wins for the next window
        (5, "view", 0), (5, "click", 2 * H), (5, "click", H),
        (5, "purchase", H + 23 * H),  # within 24h of the FIRST click
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, tus long")
    out = {r.stage: r for r in event_funnel(ev).collect()}
    assert out["view_1"].n_users == 5
    assert out["click_2"].n_users == 3          # u1, u4, u5
    assert out["purchase_3"].n_users == 2       # u1, u5
    assert out["view_1"].avg_secs_from_view == 0.0
    # u1 entered click at 1h, u4 at 2h, u5 at 1h -> mean 4/3 h
    assert out["click_2"].avg_secs_from_view == pytest.approx(4 / 3 * 3600, abs=1e-4)
    # u1 purchase@2h, u5 purchase@24h -> mean 13h
    assert out["purchase_3"].avg_secs_from_view == pytest.approx(13 * 3600, abs=1e-4)


@pytest.mark.heavy
def test_curate_corpus_each_filter_discriminates(spark):
    """Every curation stage drops its intended doc: the near-dup twin,
    the unknown-language doc, the too-short doc, the stopword-free doc,
    and the repetitive (low unique-ratio) doc."""
    from tickdatapipeline_spark.plans.beyond import curate_corpus

    base = ("the cat sat of the mat and it was that good for a while "
            "quick brown fox jumps over lazy dog near the old river bank")
    rows = [
        (1, base, "en"),                                   # keeper
        (2, base + " extra", "en"),                        # near-dup of 1 -> dropped
        (3, "xyzzy plugh qwerty azerty " * 8, "xx"),       # no lang markers -> und
        (4, "the cat sat", "en"),                          # too short
        (5, " ".join(f"w{i}" for i in range(40)), "en"),   # no stopwords
        (6, "the the the the the " * 8, "en"),             # low unique ratio
    ]
    d = docs_df(spark, rows)
    kept = {r.doc_id for r in curate_corpus(d).collect()}
    assert kept == {1}


def test_retention_cohorts_golden(spark):
    """Hand-computed cohort matrix: cohort day = first signup day;
    activity counts any event type, capped at the offset horizon;
    pre-signup and never-signed-up users don't appear."""
    from tickdatapipeline_spark.plans.beyond import (
        RETENTION_MAX_OFFSET,
        retention_cohorts,
    )

    D = 86400 * 1_000_000
    rows = [
        # u1 signs up day 0, active days 0, 1, 3
        (1, "signup", 0), (1, "click", D + 5), (1, "view", 3 * D),
        # u2 signs up day 0 too (second signup ignored), active day 0 only
        (2, "signup", D // 2), (2, "signup", 5 * D),
        # u3 signs up day 1; also has a PRE-signup event (not counted)
        (3, "view", 0), (3, "signup", D), (3, "purchase", 2 * D),
        # u4 never signs up -> excluded entirely
        (4, "view", 0), (4, "click", D),
        # u5 signs up day 0 but next activity is past the horizon
        (5, "signup", 0), (5, "view", (RETENTION_MAX_OFFSET + 5) * D),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, tus long")
    got = {(r.cohort_day_s, r.day_offset): r.n_active_users
           for r in retention_cohorts(ev).collect()}
    assert got == {
        (0, 0): 3,            # u1, u2, u5 (signup itself counts as activity)
        (0, 1): 1,            # u1
        (0, 3): 1,            # u1
        (0, 5): 1,            # u2's second signup day
        (86400, 0): 1,        # u3 cohort day 1
        (86400, 1): 1,        # u3 purchase day 2
    }


@pytest.mark.heavy
def test_connected_components_deep_chain_converges(spark):
    """A 40-node path graph (diameter 39) must fully collapse to ONE
    cluster labelled by the min node — pointer jumping makes this take
    ~6 rounds; plain one-hop propagation would exhaust max_iter=20 and
    previously returned silently split clusters."""
    from tickdatapipeline_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "a long, b long"
    )
    out = connected_components(pairs, "a", "b").collect()
    assert len(out) == 40
    assert {r.cluster_id for r in out} == {1}
    assert all(r.cluster_size == 40 for r in out)
    assert sum(r.is_representative for r in out) == 1


@pytest.mark.heavy
def test_pack_sequences_contiguous_layout(spark):
    """Packing must lay the corpus out as ONE contiguous token stream:
    sorted by (pack_id, pack_offset), each doc starts exactly where the
    previous one ended, the first at 0; n_packs counts the example
    boundaries a doc straddles; empty docs are excluded."""
    from tickdatapipeline_spark.operators.text import pack_sequences

    texts = [(i, " ".join(f"w{j}" for j in range((i * 7) % 23)), "en")
             for i in range(50)]  # i % 23 == 0 -> empty docs exist
    d = docs_df(spark, texts)
    seq_len = 16
    rows = pack_sequences(d, seq_len=seq_len, n_buckets=8).collect()
    ntok = {i: (i * 7) % 23 for i, _t, _l in texts}
    assert {r.doc_id for r in rows} == {i for i, t in ntok.items() if t > 0}
    assert all(r.n_tokens == ntok[r.doc_id] for r in rows)
    assert all(0 <= r.pack_offset < seq_len for r in rows)
    # reconstruct global start positions and check contiguity
    starts = sorted((r.pack_id * seq_len + r.pack_offset, r.n_tokens, r.n_packs)
                    for r in rows)
    pos = 0
    for start, n, n_packs in starts:
        assert start == pos
        assert n_packs == (start + n - 1) // seq_len - start // seq_len + 1
        pos += n
    assert pos == sum(ntok.values())
    # determinism + salt redraw
    again = pack_sequences(d, seq_len=seq_len, n_buckets=8).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))
    other = pack_sequences(d, seq_len=seq_len, n_buckets=8, salt="pack2:").collect()
    assert sorted(map(tuple, other)) != sorted(map(tuple, rows))


@pytest.mark.heavy
def test_token_commonness_and_source_top_tokens_golden(spark):
    """Hand-computed corpus frequencies: common-token docs score high,
    rare-token docs low; per-source top-k ranks count desc then token
    asc."""
    from tickdatapipeline_spark.operators.text import (
        source_top_tokens,
        token_commonness,
    )

    rows = [
        (1, "aa aa bb", "en", "s0"),   # freq: aa=3, bb=2, zz=1
        (2, "aa bb zz", "en", "s0"),
        (3, "", "en", "s1"),           # empty: no tokens, no row
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r.doc_id: r for r in token_commonness(d).collect()}
    assert set(out) == {1, 2}
    # doc1: (3+3+2)/3 ; doc2: (3+2+1)/3
    assert out[1].sum_freq == 8 and abs(out[1].mean_token_freq - 8 / 3) < 1e-6
    assert out[2].sum_freq == 6 and out[2].mean_token_freq == 2.0
    top = [(r.token, r.n_occurrences, r.rank)
           for r in source_top_tokens(d, k=2).collect() if r.source == "s0"]
    assert sorted(top, key=lambda t: t[2]) == [("aa", 3, 1), ("bb", 2, 2)]


@pytest.mark.heavy
def test_containment_pairs_catches_embedded_doc(spark):
    """A short doc fully embedded in a long one: containment = 1.0 even
    though Jaccard is far below any dedup threshold (the asymmetric
    case symmetric similarity misses)."""
    from tickdatapipeline_spark.operators.dedup import containment_pairs, jaccard_pairs

    long_text = " ".join(f"w{i}" for i in range(30))
    short_text = " ".join(f"w{i}" for i in range(8))  # prefix -> contained
    d = docs_df(spark, [(1, long_text, "en"), (2, short_text, "en")])
    cand = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    got = containment_pairs(d, threshold=0.8, candidates=cand).collect()
    assert len(got) == 1
    r = got[0]
    # 3-gram shingles: short doc has 6, all present in the long doc
    assert (r.inter_count, r.min_count, r.containment) == (6, 6, 1.0)
    # symmetric Jaccard misses it: 6 / (28 + 6 - 6) = 0.214...
    assert jaccard_pairs(d, threshold=0.5, candidates=cand).count() == 0


def test_langid_confusion_golden(spark):
    """Confusion counts and per-true-label fractions from engineered
    marker texts (one German doc mislabeled as English)."""
    from tickdatapipeline_spark.operators.text import langid_confusion

    d = docs_df(spark, [
        (1, "the cat and the dog", "en"),      # en -> en
        (2, "the house is that big", "en"),    # en -> en
        (3, "der hund und die katze", "en"),   # labeled en, predicted de
        (4, "der die und das ist", "de"),      # de -> de
        (5, "zzz qqq", "fr"),                  # no markers -> und
    ])
    out = {(r.lang_true, r.pred_lang): r for r in langid_confusion(d).collect()}
    assert out[("en", "en")].n_docs == 2
    assert out[("en", "de")].n_docs == 1
    assert out[("de", "de")].n_docs == 1
    assert out[("fr", "und")].n_docs == 1
    assert abs(out[("en", "en")].frac_of_true - 2 / 3) < 1e-6
    assert out[("de", "de")].frac_of_true == 1.0
    assert len(out) == 4


def test_snapshot_diff_statuses(spark):
    """All four statuses from engineered snapshots; whitespace-only
    edits are NOT changes (shared normalized fingerprint)."""
    from tickdatapipeline_spark.operators.text import snapshot_diff

    old = docs_df(spark, [
        (1, "alpha beta", "en"),
        (2, "gamma delta", "en"),
        (3, "kept  as is", "en"),
        (4, "  kept\tas   is ", "en"),
    ])
    new = docs_df(spark, [
        (1, "alpha beta EDITED", "en"),   # changed
        (3, "kept as is", "en"),          # unchanged (ws-normalized)
        (4, "kept as is", "en"),          # unchanged (ws-normalized)
        (5, "brand new", "en"),           # added
    ])                                     # 2 -> removed
    out = {r.doc_id: r for r in snapshot_diff(old, new).collect()}
    assert {i: r.status for i, r in out.items()} == {
        1: "changed", 2: "removed", 3: "unchanged", 4: "unchanged", 5: "added",
    }
    assert out[5].old_fingerprint is None and out[2].new_fingerprint is None
    assert out[3].old_fingerprint == out[4].new_fingerprint
    # NULL text (e.g. a corrupt JSONL row) is PRESENT on its side:
    # presence keys on doc_id, and the content comparison is null-safe
    old2 = docs_df(spark, [(1, None, "en"), (2, None, "en"), (3, "same", "en")])
    new2 = docs_df(spark, [(1, None, "en"), (2, "now text", "en"), (3, "same", "en")])
    got = {r.doc_id: r.status for r in snapshot_diff(old2, new2).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "unchanged"}


@pytest.mark.heavy
def test_mixture_sample_rates_and_epochs(spark):
    """Weighted mixing: epoch counts follow the closed-form admission
    rule, full epochs contain the whole source, untargeted sources are
    dropped, and the draw is deterministic with salt redraw."""
    from tickdatapipeline_spark.operators.text import h60, mixture_sample

    rows = []
    for i in range(40):
        src = f"s{i % 4}"  # s0..s3, 10 docs each, 5 tokens per doc
        rows.append((i, "tok " * 5, "en", src))
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    targets = {"s0": 500, "s1": 100}  # s2/s3 dropped
    budget = 200  # s0: rate_pm = 100*500/50 = 2000 (2 epochs exactly)
    #              s1: rate_pm = 200*100/50 = 400 (fractional)
    out = mixture_sample(d, targets, budget).collect()
    assert {r.source for r in out} == {"s0", "s1"}
    s0 = [r for r in out if r.source == "s0"]
    # rate_pm 2000: every doc admitted in exactly epochs 0 and 1
    assert sorted((r.doc_id, r.epoch) for r in s0) == sorted(
        (i, e) for i in range(0, 40, 4) for e in (0, 1)
    )
    # s1 rate_pm 400: admitted iff h60('mix:'||id) % 1000 < 400, epoch 0 only
    import hashlib

    def draw(doc_id):
        return int(hashlib.md5(f"mix:{doc_id}".encode()).hexdigest()[17:], 16) % 1000

    s1 = sorted(r.doc_id for r in out if r.source == "s1")
    assert all(r.epoch == 0 for r in out if r.source == "s1")
    assert s1 == [i for i in range(1, 40, 4) if draw(i) < 400]
    # determinism + salt redraw
    again = mixture_sample(d, targets, budget).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    other = mixture_sample(d, targets, budget, salt="mix2:").collect()
    assert {r.doc_id for r in other if r.source == "s1"} != set(s1) or len(s1) in (0, 10)


@pytest.mark.heavy
def test_mixture_sample_epoch_cap(spark, caplog):
    """Degenerate-mix guard: a 10^12-token budget against a ~50-token
    source asks for billions of epochs per doc; the default max_epochs
    clamps the fan-out to a bounded row count and WARN-logs the clamped
    source with its requested epoch count. An uncapped run
    (max_epochs=None) keeps the closed-form fan-out for sane mixes."""
    import logging

    from tickdatapipeline_spark.operators.text import (
        DEFAULT_MAX_EPOCHS,
        mixture_sample,
    )

    rows = [(i, "tok " * 5, "en", "tiny") for i in range(10)]  # 50 tokens total
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    with caplog.at_level(logging.WARNING, logger="tickdatapipeline_spark.operators.text"):
        out = mixture_sample(d, {"tiny": 1000}, budget=10**12).collect()
    # bounded: every doc clamped to exactly DEFAULT_MAX_EPOCHS epochs
    assert len(out) == 10 * DEFAULT_MAX_EPOCHS
    assert max(r.epoch for r in out) == DEFAULT_MAX_EPOCHS - 1
    assert any("epoch guard" in r.message and "tiny" in r.message
               for r in caplog.records)
    # sane mix: cap leaves the closed-form result untouched
    sane = mixture_sample(d, {"tiny": 1000}, budget=100).collect()
    unguarded = mixture_sample(d, {"tiny": 1000}, budget=100, max_epochs=None).collect()
    assert sorted(map(tuple, sane)) == sorted(map(tuple, unguarded))


def test_source_cap_golden(spark):
    """Per-source capping: a source under the cap passes through whole;
    oversized sources keep exactly `cap` docs; the selection equals the
    documented two-phase rule (oversample band on h60('cap:'||id), then
    rank by (h, doc_id)) computed independently in Python — which, for
    these fixtures, also equals the plain 'cap smallest hashes' rule."""
    import hashlib

    from tickdatapipeline_spark.operators.text import source_cap

    rows = ([(i, "doc text", "en", "big") for i in range(30)]
            + [(100 + i, "doc text", "en", "small") for i in range(5)]
            + [(200 + i, "doc text", "en", "mid") for i in range(12)])
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    cap = 10
    got = {(r.source, r.doc_id): r.sample_rank
           for r in source_cap(d, cap).collect()}

    def h(doc_id):
        return int(hashlib.md5(f"cap:{doc_id}".encode()).hexdigest()[17:], 16)

    expect = {}
    for src, ids in (("big", range(30)), ("small", range(100, 105)),
                     ("mid", range(200, 212))):
        ids = list(ids)
        frac = min(1.0, 2.0 * cap / len(ids))
        band = [i for i in ids if float(h(i)) < frac * float(1 << 60)]
        ranked = sorted(band, key=lambda i: (h(i), i))[:cap]
        # fixture sanity: the band held enough docs, so two-phase == plain
        assert ranked == sorted(ids, key=lambda i: (h(i), i))[:cap]
        for rk, i in enumerate(ranked, start=1):
            expect[(src, i)] = rk
    assert got == expect
    counts = {}
    for (src, _i) in got:
        counts[src] = counts.get(src, 0) + 1
    assert counts == {"big": 10, "small": 5, "mid": 10}


def test_ngram_novelty_golden(spark):
    """First-occurrence attribution: the lowest doc_id containing a gram
    owns it; later docs score only their genuinely new grams; docs with
    fewer than n tokens are absent."""
    from tickdatapipeline_spark.operators.dedup import ngram_novelty

    d = spark.createDataFrame(
        [(1, "a b c d", "en", "s"),      # grams {abc, bcd}: both novel
         (2, "a b c x", "en", "s"),      # {abc(first=1), bcx(novel)} -> 0.5
         (3, "a b", "en", "s"),          # no 3-grams -> absent
         (4, "b c d", "en", "s")],       # {bcd(first=1)} -> 0.0
        "doc_id long, text string, lang string, source string",
    )
    out = {r.doc_id: r for r in ngram_novelty(d).collect()}
    assert set(out) == {1, 2, 4}
    assert (out[1].n_grams, out[1].n_novel, out[1].novelty) == (2, 2, 1.0)
    assert (out[2].n_grams, out[2].n_novel, out[2].novelty) == (2, 1, 0.5)
    assert (out[4].n_grams, out[4].n_novel, out[4].novelty) == (1, 0, 0.0)


@pytest.mark.heavy
def test_cross_source_dup_matrix_golden(spark):
    """Near-dup pairs aggregate into an unordered source matrix: a
    within-source pair lands on the diagonal, a cross-source pair on
    the (least, greatest) cell; clean sources never appear."""
    from tickdatapipeline_spark.operators.dedup import cross_source_dup_matrix

    text = ("the quick brown fox jumps over the lazy dog while rain falls "
            "gently on the quiet village roofs tonight")
    d = spark.createDataFrame(
        [(1, text, "en", "feed_b"),
         (2, text, "en", "feed_a"),          # cross-source dup of 1
         (3, text + " extra", "en", "feed_b"),  # within-source near-dup of 1
         (4, "completely different content about parquet file layouts and "
             "columnar compression strategies", "en", "feed_c")],
        "doc_id long, text string, lang string, source string",
    )
    out = {(r.source_a, r.source_b): r
           for r in cross_source_dup_matrix(d, 0.5, max_band_bucket=None).collect()}
    # pairs: (1,2) cross feed_a/feed_b; (1,3) and (2,3) mixed; feed_c clean
    assert ("feed_a", "feed_b") in out and ("feed_b", "feed_b") in out
    assert not any("feed_c" in k for k in out)
    assert out[("feed_a", "feed_b")].max_jaccard == 1.0   # verbatim pair
    total = sum(r.n_pairs for r in out.values())
    assert total == 3
    for r in out.values():
        assert 0.5 <= r.min_jaccard <= r.max_jaccard <= 1.0


def test_type_transitions_golden(spark):
    """Markov bigram matrix: per-user consecutive pairs only (no
    cross-user transitions), n_users counts distinct users per cell,
    and shares sum to 1 within each prev_type row."""
    from tickdatapipeline_spark.plans.beyond import type_transitions_fn

    M = 1_000_000_000  # 1s in nanos
    rows = [
        (1, 10, 1 * M, "view", 0.0), (2, 10, 2 * M, "click", 0.0),
        (3, 10, 3 * M, "purchase", 0.0),
        (4, 20, 1 * M, "view", 0.0), (5, 20, 2 * M, "click", 0.0),
        (6, 30, 1 * M, "view", 0.0), (7, 30, 2 * M, "view", 0.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, event_type string, value double")
    import tickdatapipeline_spark.plans.beyond as B
    import tickdatapipeline_spark.sources.io as io_mod
    orig = io_mod.read_events
    try:
        B.read_events = lambda s, d: ev
        out = {(r.prev_type, r.next_type): r
               for r in B.type_transitions_fn(spark, "ignored").collect()}
    finally:
        B.read_events = orig
    assert out[("view", "click")].n_transitions == 2
    assert out[("view", "click")].n_users == 2
    assert out[("view", "view")].n_transitions == 1
    assert out[("click", "purchase")].n_transitions == 1
    assert out[("view", "click")].share == pytest.approx(2 / 3)
    assert out[("view", "view")].share == pytest.approx(1 / 3)
    assert out[("click", "purchase")].share == 1.0


def test_chunk_windows_coverage_and_overlap(spark):
    """Sliding-window chunking: chunks advance by stride, interior
    chunks are exactly `window` tokens, the final chunk reaches the end
    of the doc (never empty), consecutive chunks overlap by
    window - stride tokens, and empty docs yield no chunks."""
    import pytest as _pytest

    from tickdatapipeline_spark.operators.text import chunk_windows

    texts = [(i, " ".join(f"w{j}" for j in range((i * 7) % 23)), "en")
             for i in range(30)]  # includes empty docs and n < window docs
    d = docs_df(spark, texts)
    window, stride = 8, 5
    rows = chunk_windows(d, window=window, stride=stride).collect()
    ntok = {i: (i * 7) % 23 for i, _t, _l in texts}
    assert {r.doc_id for r in rows} == {i for i, n in ntok.items() if n > 0}
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, chunks in by_doc.items():
        n = ntok[doc_id]
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c.chunk_start == c.chunk_idx * stride
            assert c.chunk_len == min(window, n - c.chunk_start)
            assert c.chunk_len >= 1
            toks = c.chunk_text.split(" ")
            assert len(toks) == c.chunk_len
            assert toks[0] == f"w{c.chunk_start}"
            assert toks[-1] == f"w{c.chunk_start + c.chunk_len - 1}"
        last = chunks[-1]
        assert last.chunk_start + last.chunk_len == n  # reaches the end
        if n > window:  # interior chunks are full-width; overlap is fixed
            assert all(c.chunk_len == window for c in chunks[:-1])
            assert len(chunks) == 1 + -(-(n - window) // stride)
        else:
            assert len(chunks) == 1
    with _pytest.raises(ValueError):
        chunk_windows(d, window=4, stride=5)


def test_ngram_overlap_golden(spark):
    """Exact verbatim overlap: only train docs sharing a full n-gram
    with the eval corpus appear; counts are distinct-gram exact."""
    from tickdatapipeline_spark.operators.dedup import ngram_overlap_contamination

    eval_docs = docs_df(spark, [
        (100, "the quick brown fox jumps over the lazy dog", "en"),
    ])
    train = docs_df(spark, [
        # shares the 5-gram "the quick brown fox jumps" (and one more)
        (1, "a tale of the quick brown fox jumps high today", "en"),
        # shares words but no 5 consecutive tokens
        (2, "quick brown dog sleeps while the lazy fox walks far", "en"),
        # verbatim copy: every gram hits
        (3, "the quick brown fox jumps over the lazy dog", "en"),
        # too short for any 5-gram
        (4, "tiny doc", "en"),
    ])
    out = {r.train_doc_id: r for r in
           ngram_overlap_contamination(train, eval_docs, n=5).collect()}
    assert set(out) == {1, 3}
    # doc 1: grams at positions 1..6 of 10 tokens -> 6 grams, hits are
    # "the quick brown fox jumps" + "quick brown fox jumps high"? no —
    # eval has "quick brown fox jumps over", so exactly 1 hit
    assert out[1].n_grams == 6 and out[1].n_hit == 1
    assert out[3].n_grams == 5 and out[3].n_hit == 5
    assert out[3].hit_frac == 1.0


def test_redact_pii_golden(spark):
    """Counts are per-category on the original text; placeholders land
    in order; text without PII passes through untouched."""
    from tickdatapipeline_spark.operators.text import redact_pii

    d = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-corp.example.org and b@y.io now"),
            (2, "call 555-123-4567 or 800-555-0199 from 192.168.0.1"),
            (3, "no pii here, just words and 1234 numbers"),
            (4, "edge 999.999.999.999 still matches the ipv4 shape"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in redact_pii(d).collect()}
    assert (out[1].n_emails, out[1].n_ips, out[1].n_phones) == (2, 0, 0)
    assert out[1].clean_text == "mail <EMAIL> and <EMAIL> now"
    assert (out[2].n_emails, out[2].n_ips, out[2].n_phones) == (0, 1, 2)
    assert out[2].clean_text == "call <PHONE> or <PHONE> from <IP>"
    assert (out[3].n_emails, out[3].n_ips, out[3].n_phones) == (0, 0, 0)
    assert out[3].clean_text == out[3].text
    # precision-leaning by design: the regex is shape-based, not
    # range-validating — documented contract
    assert out[4].n_ips == 1


def test_ann_recall_contract(spark):
    """Recall@k algebra: per-query hit counts against ground truth;
    fully-missed queries still appear with n_hit = 0; a result compared
    to itself scores 1.0 everywhere."""
    from tickdatapipeline_spark.operators.similarity import ann_recall

    schema = "query_id long, neighbor_id long, rank long, cosine double"
    exact = spark.createDataFrame(
        [(1, 10, 1, 0.9), (1, 11, 2, 0.8), (2, 10, 1, 0.7), (2, 12, 2, 0.6)],
        schema,
    )
    ann = spark.createDataFrame(
        [(1, 10, 1, 0.9), (1, 99, 2, 0.5), (2, 13, 1, 0.4), (2, 14, 2, 0.3)],
        schema,
    )
    out = {r.query_id: r for r in ann_recall(ann, exact).collect()}
    assert (out[1].n_exact, out[1].n_hit, out[1].recall) == (2, 1, 0.5)
    assert (out[2].n_exact, out[2].n_hit, out[2].recall) == (2, 0, 0.0)
    perfect = {r.query_id: r for r in ann_recall(exact, exact).collect()}
    assert all(r.recall == 1.0 for r in perfect.values())


@pytest.mark.heavy
def test_sq8_quantization_error_bounded(spark):
    """SQ8 reconstruction stays within half a quantization step per
    dimension, and values already on the level grid reconstruct
    EXACTLY (min 0 / max 255 / integer components -> step 1.0)."""
    from tickdatapipeline_spark.operators.similarity import sq8_dequantized

    vecs = [(i, [float((i * 7 + d * 13) % 256) for d in range(64)]) for i in range(6)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r.vec_id: list(r.v) for r in sq8_dequantized(df).collect()}
    for d in range(64):
        col = [v[d] for _i, v in vecs]
        lo, hi = min(col), max(col)
        step = (hi - lo) / 255.0 if hi > lo else 0.0
        for i, v in vecs:
            assert abs(out[i][d] - v[d]) <= step / 2 + 1e-9
    grid = spark.createDataFrame(
        [(0, [0.0] * 64), (1, [255.0] * 64),
         (2, [float((d * 3) % 256) for d in range(64)])],
        "vec_id long, embedding array<double>",
    )
    got = {r.vec_id: list(r.v) for r in sq8_dequantized(grid).collect()}
    assert got[2] == [float((d * 3) % 256) for d in range(64)]
    assert got[0] == [0.0] * 64 and got[1] == [255.0] * 64


@pytest.mark.heavy
def test_sq8_topk_recall_near_exact(spark):
    """With 255 levels the quantization error is tiny, so the SQ8
    top-k must recover nearly all of the exact neighbors."""
    from tickdatapipeline_spark.operators.similarity import (
        ann_recall, ann_topk_sq8, cosine_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rec = ann_recall(ann_topk_sq8(emb), cosine_topk(emb))
    mean = rec.agg(F.avg("recall").alias("m")).collect()[0].m
    assert mean >= 0.7, mean


def test_train_val_test_split_contract(spark):
    """Split is exhaustive, stable under repartitioning and corpus
    growth (a doc never migrates when others are added), rate-shaped,
    and redrawn by a new salt; degenerate permilles are rejected."""
    import pytest as _pytest

    from tickdatapipeline_spark.operators.text import train_val_test_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r.doc_id: r.split for r in train_val_test_split(docs, 100, 50).collect()}
    assert len(a) == docs.count() and set(a.values()) <= {"train", "val", "test"}
    b = {r.doc_id: r.split
         for r in train_val_test_split(docs.repartition(7), 100, 50).collect()}
    assert a == b
    # stability under corpus growth: the half-corpus assignment agrees
    half = docs.where(F.col("doc_id") % 2 == 0)
    h = {r.doc_id: r.split for r in train_val_test_split(half, 100, 50).collect()}
    assert all(a[k] == v for k, v in h.items())
    n = len(a)
    n_val = sum(1 for s in a.values() if s == "val")
    n_test = sum(1 for s in a.values() if s == "test")
    assert abs(n_val / n - 0.10) < 0.06 and abs(n_test / n - 0.05) < 0.05
    redrawn = {r.doc_id: r.split
               for r in train_val_test_split(docs, 100, 50, salt="s2:").collect()}
    assert redrawn != a
    with _pytest.raises(ValueError):
        train_val_test_split(docs, 600, 400)
    with _pytest.raises(ValueError):
        train_val_test_split(docs, -100, 200)


@pytest.mark.heavy
def test_pack_and_budget_share_the_same_prefix_order(spark):
    """Cross-operator invariant over the shared prefix helper: with the
    SAME salt and buckets, token_budget_sample(B) admits exactly the
    documents whose pack start position is < B — the budget cut is a
    prefix of the packing layout."""
    from tickdatapipeline_spark.operators.text import pack_sequences, token_budget_sample

    texts = [(i, " ".join(f"w{j}" for j in range((i * 11) % 17 + 1)), "en")
             for i in range(80)]
    d = docs_df(spark, texts)
    seq_len, budget = 32, 300
    packed = pack_sequences(d, seq_len=seq_len, n_buckets=16, salt="x:").collect()
    admitted = {r.doc_id for r in
                token_budget_sample(d, budget, n_buckets=16, salt="x:").collect()}
    by_start = {r.doc_id: r.pack_id * seq_len + r.pack_offset for r in packed}
    assert admitted == {i for i, s in by_start.items() if s < budget}


def test_redact_pii_is_a_fixed_point(spark):
    """Redacted text contains no residual matches: running redact_pii
    on its own clean_text changes nothing and counts zero everywhere
    (placeholders hold no digits or @)."""
    from tickdatapipeline_spark.operators.text import redact_pii

    d = spark.createDataFrame(
        [(i, f"u{i}@ex{i}.org 10.0.{i}.1 555-123-{1000 + i} and text {i}")
         for i in range(20)],
        "doc_id long, text string",
    )
    once = redact_pii(d).select("doc_id", F.col("clean_text").alias("text"))
    twice = redact_pii(once).collect()
    assert all(
        (r.n_emails, r.n_ips, r.n_phones) == (0, 0, 0) and r.clean_text == r.text
        for r in twice
    )


def test_sq8_rejects_wrong_dimension(spark):
    """The bounds row covers exactly DIM components, so a wider or
    narrower vector must fail loudly instead of dequantizing its tail
    to NULL."""
    from pyspark.errors import PySparkException

    from tickdatapipeline_spark.operators.similarity import sq8_dequantized

    bad = spark.createDataFrame(
        [(0, [1.0] * 32)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(PySparkException, match="DIM"):
        sq8_dequantized(bad).collect()


def test_bpe_token_stats_golden(spark):
    """GPT-2-style pre-split: contraction suffixes split off, space
    glues to the following run, punctuation and residual whitespace
    count as 'other'."""
    from tickdatapipeline_spark.operators.text import bpe_token_stats

    d = spark.createDataFrame(
        [(1, "I'll pay 42 dollars, OK?"), (2, ""), (3, "   "),
         (4, "naïve café 3x")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bpe_token_stats(d).collect()}
    # doc 1: [I]["'ll"][ pay][ 42][ dollars][,][ OK][?] -> 8 pre-tokens
    assert out[1].n_bpe_tokens == 8
    assert out[1].n_word == 4   # I, ' pay', ' dollars', ' OK'
    assert out[1].n_num == 1    # ' 42'
    assert out[1].n_other == 3  # "'ll", ',', '?'
    assert out[2].n_bpe_tokens == 0 and out[2].chars_per_token == 0.0
    assert out[3].n_bpe_tokens == 1 and out[3].n_other == 1  # one ws run
    # unicode letters stay in word runs; '3x' splits digit/letter
    assert out[4].n_word == 3 and out[4].n_num == 1  # naïve, café, x | 3


def test_source_quality_report_golden(spark):
    from tickdatapipeline_spark.operators.text import source_quality_report

    d = spark.createDataFrame(
        [(1, "one two three", "en", "a"), (2, "vier fünf", "de", "a"),
         (3, "six", "en", "b")],
        "doc_id long, text string, lang string, source string",
    )
    out = {r.source: r for r in source_quality_report(d).collect()}
    # "vier fünf" -> vier, f, nf under the ascii [a-z0-9]+ tokenizer
    assert (out["a"].n_docs, out["a"].n_langs, out["a"].total_tokens) == (2, 2, 6)
    assert out["a"].avg_tokens == 3.0
    assert (out["b"].n_docs, out["b"].n_langs, out["b"].total_tokens) == (1, 1, 1)


def test_vocab_drift_golden(spark):
    """Exact counts and shares for a tiny two-slice corpus; one-sided
    tokens count zero on the other side; top-k order is (combined
    count desc, token asc)."""
    from tickdatapipeline_spark.operators.text import vocab_drift

    a = docs_df(spark, [(1, "x x y", "en"), (2, "x z", "en")])
    b = docs_df(spark, [(3, "x y y", "en")])
    rows = vocab_drift(a, b, k=10).collect()
    assert [(r.token, r.cnt_a, r.cnt_b) for r in rows] == [
        ("x", 3, 1), ("y", 1, 2), ("z", 1, 0)]
    x = rows[0]
    assert x.share_a == 0.6 and abs(x.share_b - 0.333333) < 1e-9
    assert abs(x.drift - 0.266667) < 1e-9
    z = rows[2]
    assert z.share_b == 0.0 and z.drift == 0.2


def test_bpe_pretoken_vertical_tab_cross_engine(spark):
    """Java \\s includes U+000B but RE2's does not, so the pre-tokenizer
    spells whitespace explicitly — both engines must agree on a
    vtab-adjacent-to-punctuation document."""
    import duckdb

    from tickdatapipeline_spark.operators.text import BPE_PRETOKEN_RE, bpe_token_stats

    text = "x\x0b.y"
    d = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = bpe_token_stats(d).collect()[0]
    oracle = duckdb.sql(
        "SELECT len(regexp_extract_all(?, ?)) AS n",
        params=[text, BPE_PRETOKEN_RE],  # bound param: no quote-doubling
    ).fetchone()[0]
    assert got.n_bpe_tokens == oracle == 4  # x | \x0b | . | y


def test_vocab_drift_tagged_matches_two_frame(spark):
    """The single-scan tagged path must produce exactly the two-frame
    result; NULL/other side values are excluded."""
    from tickdatapipeline_spark.operators.text import vocab_drift, vocab_drift_tagged

    rows = [(i, f"w{i % 5} shared", "en") for i in range(20)]
    d = docs_df(spark, rows)
    two = vocab_drift(
        d.where(F.col("doc_id") % 2 == 0), d.where(F.col("doc_id") % 2 == 1), k=10
    ).collect()
    one = vocab_drift_tagged(d, F.col("doc_id") % 2, k=10).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, two))
    # rows with an out-of-range side are dropped
    dropped = vocab_drift_tagged(d, F.lit(None).cast("int"), k=10).collect()
    assert dropped == []


def test_sq8_precomputed_bounds_injection(spark):
    """Deployment bounds injection: with the corpus's own [min,max]
    lists passed in, reconstruction is identical to the self-computed
    path, and a wrong-length bounds artifact is rejected."""
    from tickdatapipeline_spark.operators.similarity import sq8_dequantized

    vecs = [(i, [float((i * 7 + d * 13) % 256) for d in range(64)]) for i in range(6)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    auto = {r.vec_id: list(r.v) for r in sq8_dequantized(df).collect()}
    mn = [min(v[d] for _i, v in vecs) for d in range(64)]
    mx = [max(v[d] for _i, v in vecs) for d in range(64)]
    injected = {r.vec_id: list(r.v)
                for r in sq8_dequantized(df, bounds=(mn, mx)).collect()}
    assert injected == auto
    with pytest.raises(ValueError, match="length-64"):
        sq8_dequantized(df, bounds=([0.0] * 32, [1.0] * 32))


def test_user_journeys_golden(spark, tmp_path):
    """Journey strings follow (time, event_id) order with ties broken
    by event_id; counts and first/last activity are exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tickdatapipeline_spark.plans.beyond import user_journeys_fn

    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([2_000_000, 1_000_000, 1_000_000, 5_000_000],
                       pa.timestamp("ns")),
        "user_id": pa.array([7, 7, 7, 8], pa.int64()),
        "event_type": pa.array(["click", "view", "scroll", "purchase"]),
        "value": pa.array([1.0, 2.0, 3.0, 4.0]),
        "props": pa.array(["{}"] * 4),
    })
    (tmp_path / "sf").mkdir()
    pq.write_table(tbl, tmp_path / "sf" / "events.parquet")
    out = {r.user_id: r for r in user_journeys_fn(spark, str(tmp_path / "sf")).collect()}
    # user 7: ts ties at 1ms between event 2 (view) and 3 (scroll) ->
    # event_id order; then event 1 (click) at 2ms
    assert out[7].journey == "view>scroll>click"
    assert out[7].n_events == 3
    assert (out[7].first_us, out[7].last_us) == (1_000, 2_000)
    assert out[8].journey == "purchase" and out[8].n_events == 1


def test_oov_rate_golden(spark):
    """With a 1-token vocabulary, OOV counts are exact; a fully
    in-vocab doc scores 0.0; token-free docs are excluded."""
    from tickdatapipeline_spark.operators.text import oov_rate

    d = docs_df(spark, [
        (1, "the the the rareword", "en"),   # 'the' dominates -> vocab
        (2, "the the", "en"),
        (3, "", "en"),
    ])
    out = {r.doc_id: r for r in oov_rate(d, vocab_k=1).collect()}
    assert set(out) == {1, 2}
    assert (out[1].n_tokens, out[1].n_oov, out[1].oov_rate) == (4, 1, 0.25)
    assert (out[2].n_tokens, out[2].n_oov, out[2].oov_rate) == (2, 0, 0.0)


def test_boilerplate_ngrams_golden(spark):
    """Shared template sentences surface as high-df grams; unique
    grams fall below min_docs and vanish."""
    from tickdatapipeline_spark.operators.text import boilerplate_ngrams

    footer = "all rights reserved contact us today"
    d = docs_df(spark, [
        (1, "alpha content here " + footer, "en"),
        (2, "beta words differ " + footer, "en"),
        (3, "gamma totally unique text " + footer, "en"),
        (4, "unrelated document entirely alone", "en"),
    ])
    rows = boilerplate_ngrams(d, n=5, k=10, min_docs=2).collect()
    assert all(r.n_docs >= 2 for r in rows)
    top = rows[0]
    assert top.n_docs == 3 and top.example_doc_id == 1
    assert "rights reserved" in top.shingle or "contact us" in top.shingle


def test_sq8_frozen_bounds_saturate_out_of_range(spark):
    """Against a frozen deployment bounds artifact, an out-of-range
    component must saturate at the bound (as a real uint8 store
    would), not reconstruct near-identically; inverted bounds are
    rejected at injection."""
    from tickdatapipeline_spark.operators.similarity import sq8_dequantized

    mn, mx = [0.0] * 64, [1.0] * 64
    df = spark.createDataFrame(
        [(0, [10.0] * 64), (1, [-5.0] * 64), (2, [0.5] * 64)],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: list(r.v) for r in sq8_dequantized(df, bounds=(mn, mx)).collect()}
    assert out[0] == [1.0] * 64   # saturates high
    assert out[1] == [0.0] * 64   # saturates low
    assert abs(out[2][0] - 0.5) <= 0.5 / 255 + 1e-12
    bad = ([1.0] * 64, [0.0] * 64)
    with pytest.raises(ValueError, match="mn\\[i\\] <= mx\\[i\\]"):
        sq8_dequantized(df, bounds=bad)


@pytest.mark.heavy
def test_training_examples_composition(spark, tmp_path):
    """The assembly query equals manually composing its three stages:
    quality gate, train-split selection, packing — stage fusion must
    not change semantics."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tickdatapipeline_spark.operators.text import (
        pack_sequences, tokens, train_val_test_split,
    )
    from tickdatapipeline_spark.plans.beyond import (
        PACK_BUCKETS, PACK_SEQ_LEN, SPLIT_TEST_PM, SPLIT_VAL_PM,
        TRAIN_MAX_TOKENS, TRAIN_MIN_TOKENS, training_examples_fn,
    )

    texts = [" ".join(f"w{j}" for j in range(i % 40)) for i in range(120)]
    tbl = pa.table({
        "doc_id": pa.array(range(120), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * 120),
        "source": pa.array(["s"] * 120),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    (tmp_path / "sf").mkdir()
    pq.write_table(tbl, tmp_path / "sf" / "documents.parquet")

    got = sorted(map(tuple, training_examples_fn(spark, str(tmp_path / "sf")).collect()))
    docs = spark.read.parquet(str(tmp_path / "sf" / "documents.parquet"))
    elig = docs.where(
        F.size(tokens(F.col("text"))).between(TRAIN_MIN_TOKENS, TRAIN_MAX_TOKENS))
    keep = {r.doc_id for r in
            train_val_test_split(elig, SPLIT_VAL_PM, SPLIT_TEST_PM)
            .where(F.col("split") == "train").collect()}
    manual = sorted(map(tuple, pack_sequences(
        elig.where(F.col("doc_id").isin(list(keep))), PACK_SEQ_LEN, PACK_BUCKETS
    ).collect()))
    assert got == manual and len(got) > 0


def test_value_cusum_golden(spark, tmp_path):
    """Hand-computed CUSUM: hourly sums (100, 100, 200, 200) cents put
    the peak of |H*S_k - k*T| at k=2 (the last low hour), with exact
    before/after hourly means 1.0 and 2.0 dollars."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tickdatapipeline_spark.plans.beyond import value_cusum_fn

    hour_ns = 3_600 * 1_000_000_000
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([0, hour_ns, 2 * hour_ns, 3 * hour_ns],
                       pa.timestamp("ns")),
        "user_id": pa.array([1, 1, 1, 1], pa.int64()),
        "event_type": pa.array(["m"] * 4),
        "value": pa.array([1.0, 1.0, 2.0, 2.0]),
        "props": pa.array(["{}"] * 4),
    })
    (tmp_path / "sf").mkdir()
    pq.write_table(tbl, tmp_path / "sf" / "events.parquet")
    rows = value_cusum_fn(spark, str(tmp_path / "sf")).collect()
    assert len(rows) == 1
    r = rows[0]
    # k=2: |4*200 - 2*600| = 400 beats k=1 (200) and k=3 (200)
    assert (r.k, r.n_hours, r.stat) == (2, 4, 400)
    assert r.cp_hour_s == 3_600
    assert (r.mean_before, r.mean_after) == (1.0, 2.0)


def test_importance_weights_golden(spark):
    """Two docs, unigram+bigram features, hand-worked DSIR ratio
    algebra: the target-source doc scores 1.222222, the other
    0.763889 (scale 1e6, add-one smoothing, Ts=6 Tt=3 V=5)."""
    from tickdatapipeline_spark.operators.text import importance_weights

    d = spark.createDataFrame(
        [(1, "a b", "tgt"), (2, "a c", "other")],
        "doc_id long, text string, source string",
    )
    out = {r.doc_id: r for r in importance_weights(d, "tgt").collect()}
    assert out[1].n_feats == 3 and out[2].n_feats == 3
    assert out[1].score == 1.222222
    assert out[2].score == 0.763889
    assert out[1].source == "tgt"


def test_semantic_dedup_golden(spark):
    """Duplicate vectors land in the same cell and exactly one of them
    is dropped (the tie rule keeps the lower vec_id); singleton-cell
    vectors all survive."""
    from tickdatapipeline_spark.operators.similarity import DIM, semantic_dedup

    def unit(i):
        v = [0.0] * DIM
        v[i] = 1.0
        return v

    rows = [(0, unit(0), "x"), (1, unit(1), "x"),
            (2, unit(2), "x"), (3, unit(2), "x")]  # 3 duplicates 2
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    out = {r.vec_id: r for r in semantic_dedup(emb, threshold=0.9,
                                               max_cell_size=None).collect()}
    assert len(out) == 4
    assert out[2].cell == 2 and out[3].cell == 2  # tie -> lower cell
    assert out[0].kept and out[1].kept and out[2].kept
    assert not out[3].kept
    assert out[3].centroid_sim == 1.0 == out[2].centroid_sim


def test_winnowing_guarantee_and_short_doc(spark):
    """Two docs sharing a verbatim run of >= k+w-1 normalized chars
    must share at least one winnowing fingerprint regardless of
    alignment; a doc shorter than k chars selects none."""
    from tickdatapipeline_spark.operators.dedup import (
        WINNOW_K, WINNOW_W, winnowing_fingerprints)

    shared = "the quick brown fox jumps over it"   # 33 chars >= k+w-1
    d = spark.createDataFrame(
        [(1, "aaaa bbbb cccc dddd " + shared, "en"),
         (2, shared + " zzzz yyyy xxxx wwww vvvv", "en"),
         (3, "tiny", "en")],  # < k chars after normalization
        "doc_id long, text string, lang string",
    )
    fps = winnowing_fingerprints(d).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "guaranteed shared fingerprint missing"
    assert 3 not in by_doc
    assert len("tiny") < WINNOW_K and WINNOW_W > 1  # premises


def test_substring_dup_pairs_golden(spark):
    """The pair table finds exactly the verbatim-overlap pair and
    orders/filters by the shared-fingerprint count."""
    from tickdatapipeline_spark.operators.dedup import substring_dup_pairs

    shared = "copyright 2026 example corp all rights reserved"
    d = spark.createDataFrame(
        [(1, "first document body " + shared, "en"),
         (2, shared + " second document body", "en"),
         (3, "completely unrelated text with no overlap at all", "en")],
        "doc_id long, text string, lang string",
    )
    rows = substring_dup_pairs(d, min_shared=1, max_fp_bucket=None).collect()
    pairs = {(r.doc_a, r.doc_b) for r in rows}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_user_rfm_golden(spark, tmp_path):
    """Two users in one cohort: the heavier user takes quartile 1 on
    every axis, the lighter one quartile 2+ (ntile over 2 rows splits
    1/2); totals are exact cents."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tickdatapipeline_spark.plans.beyond import user_rfm_fn

    us = 1_000_000
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array([0, 1000 * us * 1000, 2000 * us * 1000], pa.timestamp("ns")),
        "user_id": pa.array([7, 7, 8], pa.int64()),
        "event_type": pa.array(["m"] * 3),
        "value": pa.array([5.0, 5.0, 1.0]),
        "props": pa.array(["{}"] * 3),
    })
    (tmp_path / "sf").mkdir()
    pq.write_table(tbl, tmp_path / "sf" / "events.parquet")
    rows = user_rfm_fn(spark, str(tmp_path / "sf")).collect()
    by_seg = {(r.r, r.f, r.m): r for r in rows}
    # user 8: most recent (r=1) but fewer events / lower value (f=m=2)
    # user 7: older (r=2) but heavier (f=m=1)
    assert set(by_seg) == {(2, 1, 1), (1, 2, 2)}
    assert by_seg[(2, 1, 1)].total_value == 10.0
    assert by_seg[(1, 2, 2)].total_value == 1.0
    assert all(r.cohort_week == 0 for r in rows)


@pytest.mark.heavy
def test_seasonal_anomaly_golden(spark, tmp_path):
    """Two days at level 1.0 with one spiked 3am hour: the spike hour
    leads the ranking with the integer-cleared deviation statistic and
    the correct hour-of-day baseline."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tickdatapipeline_spark.plans.beyond import seasonal_anomaly_fn

    hour_ns = 3_600 * 1_000_000_000
    # hour-of-day 3 on day 0 (value 10.0) and day 1 (value 1.0)
    rows_in = [(1, 3 * hour_ns, 10.0), (2, (24 + 3) * hour_ns, 1.0),
               (3, 4 * hour_ns, 1.0), (4, (24 + 4) * hour_ns, 1.0)]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows_in], pa.int64()),
        "ts": pa.array([r[1] for r in rows_in], pa.timestamp("ns")),
        "user_id": pa.array([1] * 4, pa.int64()),
        "event_type": pa.array(["m"] * 4),
        "value": pa.array([r[2] for r in rows_in]),
        "props": pa.array(["{}"] * 4),
    })
    (tmp_path / "sf").mkdir()
    pq.write_table(tbl, tmp_path / "sf" / "events.parquet")
    out = seasonal_anomaly_fn(spark, str(tmp_path / "sf")).collect()
    top = out[0]
    # hod-3 baseline: (1000+100)/2 = 550 cents; spike hour: |1000*2 - 1100| = 900
    assert (top.rnk, top.hour_s, top.hod) == (1, 3 * 3600, 3)
    assert (top.stat, top.n_hod) == (900, 2)
    assert top.baseline_mean == 5.5
    assert top.hour_value == 10.0
    # hod-4 hours are exactly at baseline -> stat 0 for both
    assert {r.stat for r in out if r.hod == 4} == {0}


def test_hourly_topk_golden(spark, tmp_path):
    """One crowded hour: user 1 leads (two events summed), the 8.0-tie
    between users 2 and 3 breaks toward the lower id, user 4 misses
    the top-3 cut; a second hour ranks independently."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tickdatapipeline_spark.plans.beyond import hourly_topk_fn

    hour_ns = 3_600 * 1_000_000_000
    rows_in = [(1, 10, 1, 5.0), (2, 20, 1, 5.0), (3, 30, 2, 8.0),
               (4, 40, 3, 8.0), (5, 50, 4, 1.0), (6, hour_ns + 10, 9, 2.5)]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows_in], pa.int64()),
        "ts": pa.array([r[1] for r in rows_in], pa.timestamp("ns")),
        "user_id": pa.array([r[2] for r in rows_in], pa.int64()),
        "event_type": pa.array(["m"] * len(rows_in)),
        "value": pa.array([r[3] for r in rows_in]),
        "props": pa.array(["{}"] * len(rows_in)),
    })
    (tmp_path / "sf").mkdir()
    pq.write_table(tbl, tmp_path / "sf" / "events.parquet")
    out = hourly_topk_fn(spark, str(tmp_path / "sf")).collect()
    assert [(r.hour_s, r.rnk, r.user_id, r.hour_value, r.n_events) for r in out] == [
        (0, 1, 1, 10.0, 2),   # 5.0 + 5.0
        (0, 2, 2, 8.0, 1),    # tie with user 3 -> lower id first
        (0, 3, 3, 8.0, 1),
        (3600, 1, 9, 2.5, 1),
    ]


def test_zipf_profile_golden(spark, tmp_path):
    """Counts a:8 b:4 c:2 d:1 -> power-of-two ranks 1 (a), 2 (b), 4 (d);
    each reported ratio divides the count at rank r by the count at
    rank 2r (8/4 = 2.0, 4/1 = 4.0); rank 4 has no rank-8 successor and
    is dropped."""
    from tickdatapipeline_spark.plans.beyond import zipf_profile_fn

    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    spark.createDataFrame(
        [(1, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(tmp_path / "sf" / "documents.parquet"))
    out = zipf_profile_fn(spark, str(tmp_path / "sf")).collect()
    assert [(r.source, r.rnk, r.token, r.cnt, r.doubling_ratio) for r in out] == [
        ("s", 1, "a", 8, 2.0),
        ("s", 2, "b", 4, 4.0),
    ]


@pytest.mark.heavy
def test_char_bigram_likelihood_golden(spark):
    """Corpus 'aa ab' + 'aa aa': model P(aa)=3/6, P('a ')=2/6,
    P(' a')=2/2, P(ab)=1/6 -> doc 1 averages exactly 0.5, doc 2
    (1.0 + 1/3 + 2*0.5)/4 = 0.583333 after the shared rnd."""
    from tickdatapipeline_spark.operators.text import char_bigram_likelihood

    d = docs_df(spark, [(1, "aa ab", "en"), (2, "aa aa", "en")])
    out = {r.doc_id: r for r in char_bigram_likelihood(d).collect()}
    assert out[1].n_bigrams == 4 and out[1].avg_bigram_p == 0.5
    assert out[2].n_bigrams == 4 and out[2].avg_bigram_p == 0.583333


@pytest.mark.heavy
def test_char_bigram_likelihood_drops_short_docs(spark):
    from tickdatapipeline_spark.operators.text import char_bigram_likelihood

    d = docs_df(spark, [(1, "x", "en"), (2, " ", "en"), (3, "ok", "en")])
    assert [r.doc_id for r in char_bigram_likelihood(d).collect()] == [3]


@pytest.mark.heavy
def test_diversity_sample_golden(spark):
    """Centroids v0=(1,0), v1=(0,1); v3=(1,1) ties both cells at
    cos 0.707107 -> lower cell 0 wins, and being the farthest member
    there it is cell 0's pick; in cell 1 both members sit at cos 1.0
    -> tie breaks to the lower vec_id."""
    from tickdatapipeline_spark.operators.similarity import diversity_sample

    rows = [(0, [1.0, 0.0], 0), (1, [0.0, 1.0], 0), (2, [1.0, 0.1], 0),
            (3, [1.0, 1.0], 0), (4, [0.0, 5.0], 0)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = diversity_sample(emb, m=1, n_cells=2).collect()
    assert [(r.cell, r.sel_rank, r.vec_id) for r in out] == [(0, 1, 3), (1, 1, 1)]
    assert out[0].centroid_sim == 0.707107


@pytest.mark.heavy
def test_minhash_calibration_identical_docs(spark):
    """Two identical docs agree on every minhash lane: the estimate is
    exactly 1.0, the exact jaccard is 1.0, the error 0.0; every
    surfaced row satisfies est = n_match/64 and err = |est - jaccard|
    (both sides of the identity are the exact binary values)."""
    from tickdatapipeline_spark.operators.dedup import (
        NUM_PERM,
        minhash_jaccard_calibration,
    )

    d = docs_df(spark, [
        (1, "alpha beta gamma delta epsilon zeta", "en"),
        (2, "alpha beta gamma delta epsilon zeta", "en"),
        (3, "alpha beta gamma delta epsilon omega", "en"),
        (4, "one two three four five six", "en"),
    ])
    out = minhash_jaccard_calibration(d, max_band_bucket=None).collect()
    rows = {(r.doc_a, r.doc_b): r for r in out}
    ident = rows[(1, 2)]
    assert (ident.n_match, ident.est_jaccard, ident.jaccard, ident.abs_err) == \
        (NUM_PERM, 1.0, 1.0, 0.0)
    for r in out:
        assert r.est_jaccard == r.n_match / NUM_PERM
        assert r.abs_err == abs(r.est_jaccard - r.jaccard)
        assert 0 < r.jaccard <= 1.0


@pytest.mark.heavy
def test_weekly_users_hll_merge_consistency(spark):
    """The merged-daily-sketch estimate must EQUAL the estimate of a
    sketch built over the whole week directly (same deterministic
    Datasketches algorithm either way), and sit within HLL error of
    the exact distinct count."""
    from pyspark.sql import functions as F

    from tickdatapipeline_spark.plans.beyond import weekly_users_hll_fn

    sf = "/root/testdata/sf0.01"
    out = {r.week_start_s: r for r in weekly_users_hll_fn(spark, sf).collect()}
    assert out, "no weeks surfaced"

    from tickdatapipeline_spark.sources.io import read_events

    ev = read_events(spark, sf)
    day = F.expr("(ts DIV 1000000000 DIV 86400) * 86400")
    week = (F.col("day_s") - ((F.col("day_s") / 86400).cast("long") + 3) % 7 * 86400)
    direct = {
        r.week_start_s: r
        for r in ev.select(day.alias("day_s"), "user_id")
        .groupBy(week.alias("week_start_s"))
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"),
             F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(direct) == set(out)
    for wk, r in out.items():
        assert r.est_users == direct[wk].est  # merge == direct, bit-for-bit
        exact = direct[wk].exact
        assert abs(r.est_users - exact) <= max(0.05 * exact, 2.0)


def test_robust_anomalies_golden(spark, tmp_path):
    """Hand-worked median/MAD: type m values [1,2,2,3,10] -> median 2.0,
    deviations [1,0,0,1,8], MAD 1.0, so the 10.0 event scores exactly
    8.0; type z (all values equal, MAD 0) is excluded wholesale."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tickdatapipeline_spark.plans.beyond import robust_anomalies_fn

    vals = [(1, "m", 1.0), (2, "m", 2.0), (3, "m", 2.0), (4, "m", 3.0),
            (5, "m", 10.0), (6, "z", 5.0), (7, "z", 5.0), (8, "z", 5.0)]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in vals], pa.int64()),
        "ts": pa.array([i * 1000 for i in range(len(vals))], pa.timestamp("ns")),
        "user_id": pa.array([1] * len(vals), pa.int64()),
        "event_type": pa.array([r[1] for r in vals]),
        "value": pa.array([r[2] for r in vals]),
        "props": pa.array(["{}"] * len(vals)),
    })
    (tmp_path / "sf").mkdir()
    pq.write_table(tbl, tmp_path / "sf" / "events.parquet")
    out = robust_anomalies_fn(spark, str(tmp_path / "sf")).collect()
    assert all(r.event_type == "m" for r in out)  # MAD-0 type excluded
    assert (out[0].event_id, out[0].robust_z) == (5, 8.0)
    assert {r.event_id: r.robust_z for r in out} == \
        {1: 1.0, 2: 0.0, 3: 0.0, 4: 1.0, 5: 8.0}


def test_cosine_topk_truncated_golden(spark):
    """With trunc_dim=2 the third component must not matter: vectors 0
    and 10 (queries, mod 10) see the same prefix-plane neighbors even
    though full-dim cosines would order them differently."""
    from tickdatapipeline_spark.operators.similarity import cosine_topk_truncated

    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (10, [1.0, 0.0, 9.0], 0),   # same 2-dim prefix as vec 0
        (3, [1.0, 0.0, -7.0], 0),   # prefix-identical to both queries
        (4, [0.0, 1.0, 0.0], 0),    # prefix-orthogonal
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = cosine_topk_truncated(emb, trunc_dim=2, k=1, query_mod=10).collect()
    got = {r.query_id: (r.neighbor_id, r.cosine) for r in out}
    # prefix-cos 1.0 ties break to the lowest neighbor id: query 0 picks
    # vec 3 (vs 10), query 10 picks vec 0 (the other query is a candidate)
    assert got[0] == (3, 1.0)
    assert got[10] == (0, 1.0)


def test_collocations_golden(spark):
    """'new york' appears 5x (passing min_count) out of N=20 tokens
    while 'new' and 'york' appear only inside it: lift = 20*5/(5*5) =
    4.0 exactly; the filler bigram 'aa aa' (count 9, c(aa)=10) scores
    20*9/100 = 1.8 and ranks below."""
    from tickdatapipeline_spark.operators.text import collocations

    text = " ".join(["new york"] * 5 + ["aa"] * 10)
    d = docs_df(spark, [(1, text, "en")])
    out = collocations(d, min_count=5, top_k=10).collect()
    rows = [(r.token_a, r.token_b, r.pair_count, r.count_a, r.count_b, r.lift)
            for r in out]
    assert rows[0] == ("new", "york", 5, 5, 5, 4.0)
    # 'york new' seam pairs occur 4x (< min_count) and are filtered;
    # 'york aa' seam occurs once
    assert ("aa", "aa", 9, 10, 10, 1.8) in rows
    assert all(r[2] >= 5 for r in rows)


def test_attribution_linear_golden(spark, tmp_path):
    """Two clicks inside the window split the 10.0 purchase 5.0/5.0; a
    click outside the lookback gets nothing; sum(credit) == value."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tickdatapipeline_spark.plans.beyond import (
        ATTRIB_LOOKBACK_US,
        attribution_linear_fn,
    )

    us = 1_000
    look_ns = ATTRIB_LOOKBACK_US * us
    rows = [
        (1, look_ns + 1_000_000, 7, "click", 0.0),       # inside window
        (2, look_ns + 2_000_000, 7, "click", 0.0),       # inside window
        (3, 0, 7, "click", 0.0),                          # too early
        (4, look_ns + 3_000_000, 7, "purchase", 10.0),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([r[4] for r in rows]),
        "props": pa.array(["{}"] * len(rows)),
    })
    (tmp_path / "sf").mkdir()
    pq.write_table(tbl, tmp_path / "sf" / "events.parquet")
    out = attribution_linear_fn(spark, str(tmp_path / "sf")).collect()
    assert {(r.click_event_id, r.n_touches, r.credit) for r in out} == \
        {(1, 2, 5.0), (2, 2, 5.0)}


@pytest.mark.heavy
def test_split_leakage_golden(spark):
    """Two identical docs are a verified near-dup pair; whether they
    leak depends only on the deterministic split draw — the query must
    agree exactly with composing its two building blocks by hand."""
    from tickdatapipeline_spark.operators.dedup import jaccard_pairs
    from tickdatapipeline_spark.operators.text import train_val_test_split
    from tickdatapipeline_spark.plans.beyond import (
        JACCARD_THRESHOLD,
        SPLIT_TEST_PM,
        SPLIT_VAL_PM,
        split_leakage_fn,
    )

    rows = [(i, "alpha beta gamma delta epsilon zeta", "en") for i in range(12)]
    d = docs_df(spark, rows)
    import pyspark.sql.functions as F  # noqa: F811

    tmp = d.sparkSession.createDataFrame(
        [(i, t, l, "s", len(t)) for i, t, l in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        tmp.coalesce(1).write.parquet(f"{td}/documents.parquet")
        got = {(r.doc_a, r.doc_b): (r.split_a, r.split_b)
               for r in split_leakage_fn(spark, td).collect()}

    splits = {r.doc_id: r.split
              for r in train_val_test_split(d, SPLIT_VAL_PM, SPLIT_TEST_PM).collect()}
    pairs = {(r.doc_a, r.doc_b)
             for r in jaccard_pairs(d, JACCARD_THRESHOLD, max_band_bucket=None).collect()}
    expect = {(a, b): (splits[a], splits[b])
              for a, b in pairs if splits[a] != splits[b]}
    assert got == expect
    assert len(pairs) == 12 * 11 // 2  # identical docs: every pair verified


@pytest.mark.heavy
def test_cosine_histogram_bins_sum_to_pairs(spark, tmp_path):
    """Histogram mass equals the sample's pair count and a hand-built
    two-vector bin lands where floor(cos/0.05) puts it."""
    from tickdatapipeline_spark.plans.beyond import cosine_histogram_fn

    rows = [(0, [1.0, 0.0], 0), (10, [0.0, 1.0], 0), (20, [1.0, 1.0], 0)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    emb.coalesce(1).write.parquet(str(tmp_path / "sf" / "embeddings.parquet"))
    out = {r.bin_id: r.n_pairs
           for r in cosine_histogram_fn(spark, str(tmp_path / "sf")).collect()}
    # pairs: (0,10) cos 0 -> bin 0; (0,20) and (10,20) cos .707107 -> bin 14
    assert out == {0: 1, 14: 2}


@pytest.mark.heavy
def test_cluster_aware_split_eliminates_leakage(spark):
    """The property the operator exists for: after group-aware
    splitting, NO verified near-dup pair straddles splits (per-doc
    splitting leaks these with probability ~1 on identical docs), and
    singleton docs keep exactly their train_val_test_split assignment
    (same salt, same draw)."""
    from tickdatapipeline_spark.operators.dedup import (
        cluster_aware_split,
        jaccard_pairs,
    )
    from tickdatapipeline_spark.operators.text import train_val_test_split

    rows = [(i, f"alpha beta gamma delta epsilon id{i // 3}", "en")
            for i in range(30)]  # triples of identical docs
    rows += [(100 + i, f"unique text number {i} with words {i * 7}", "en")
             for i in range(5)]
    d = docs_df(spark, rows)
    split = {r.doc_id: r.split
             for r in cluster_aware_split(d, 100, 50, 0.5,
                                          max_band_bucket=None).collect()}
    pairs = [(r.doc_a, r.doc_b)
             for r in jaccard_pairs(d, 0.5, max_band_bucket=None).collect()]
    assert pairs, "fixture must produce near-dup pairs"
    assert all(split[a] == split[b] for a, b in pairs)

    per_doc = {r.doc_id: r.split
               for r in train_val_test_split(d, 100, 50).collect()}
    clustered = {x for a, b in pairs for x in (a, b)}
    for doc_id in split:
        if doc_id not in clustered:
            assert split[doc_id] == per_doc[doc_id]


def test_bpe_learn_merges_golden(spark):
    """Sennrich-style hand-worked merges on {low x3, lower x2,
    newest x1}: round 1 ties (l,o)/(o,w) at 5 -> ascending sym_a picks
    (l,o); round 2 merges (lo,w) at 5; round 3 ties (e,r)/(low,e) at 2
    -> (e,r). Multi-char symbols must never be matched inside (the
    double-space boundary contract)."""
    from tickdatapipeline_spark.operators.text import bpe_learn_merges

    text = " ".join(["low"] * 3 + ["lower"] * 2 + ["newest"])
    d = docs_df(spark, [(1, text, "en")])
    out = [(r.merge_idx, r.sym_a, r.sym_b, r.pair_count)
           for r in bpe_learn_merges(d, n_merges=3).collect()]
    assert out == [(1, "l", "o", 5), (2, "lo", "w", 5), (3, "e", "r", 2)]


def test_bpe_merge_greedy_overlap(spark):
    """'aaaa' with merge (a,a): greedy left-to-right segments to
    [aa, aa], so round 2's top pair is (aa, aa) — the leftmost
    non-overlapping replace on the double-space spelling must
    reproduce exactly that (the consecutive-site space bookkeeping)."""
    from tickdatapipeline_spark.operators.text import bpe_learn_merges

    d = docs_df(spark, [(1, "aaaa aaaa aaaa", "en")])
    out = [(r.merge_idx, r.sym_a, r.sym_b, r.pair_count)
           for r in bpe_learn_merges(d, n_merges=2).collect()]
    # round 1: (a,a) appears 3x per word (adjacent count) = 9
    # round 2: words are [aa, aa] -> (aa, aa) x1 per word = 3
    assert out == [(1, "a", "a", 9), (2, "aa", "aa", 3)]


@pytest.mark.heavy
def test_bpe_compression_golden(spark):
    """{low x3, lower x2, newest x1} after 3 merges ((l,o), (lo,w),
    (e,r)): char symbols 3*3+5*2+6 = 25, BPE symbols low->1 (x3),
    lower->[low, er]=2 (x2), newest->6: 3+4+6 = 13 -> 0.52."""
    from tickdatapipeline_spark.operators.text import bpe_compression_report

    text = " ".join(["low"] * 3 + ["lower"] * 2 + ["newest"])
    d = docs_df(spark, [(1, text, "en")])
    r = bpe_compression_report(d, n_merges=3).collect()[0]
    assert (r.n_words, r.n_symbols_char, r.n_symbols_bpe) == (6, 25, 13)
    assert r.compression == 0.52


@pytest.mark.heavy
def test_knn_label_accuracy_golden(spark, tmp_path):
    """Two tight clusters along the axes (queries are vec_id % 50 == 0):
    queries 0 and 50 are voted correctly by their own clusters; vector
    100 sits geometrically in cluster A but carries label 9, so its
    top-5 votes are all label 0 and its label's accuracy is 0 — the
    mislabel is exactly what the probe flags."""
    from tickdatapipeline_spark.plans.beyond import knn_label_accuracy_fn

    rows = (
        [(0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0), (2, [1.0, 0.1], 0),
         (3, [0.95, 0.0], 0), (4, [1.0, 0.05], 0),
         (100, [0.97, 0.03], 9)]   # mislabeled member of cluster A (a query)
        + [(50, [0.0, 1.0], 1), (51, [0.1, 0.9], 1), (52, [0.0, 0.9], 1),
           (53, [0.05, 1.0], 1), (54, [0.0, 0.95], 1)]
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    emb.coalesce(1).write.parquet(str(tmp_path / "sf" / "embeddings.parquet"))
    out = {r.true_label: (r.n_queries, r.n_correct, r.accuracy)
           for r in knn_label_accuracy_fn(spark, str(tmp_path / "sf")).collect()}
    assert out[0] == (1, 1, 1.0)
    assert out[1] == (1, 1, 1.0)
    assert out[9] == (1, 0, 0.0)


@pytest.mark.heavy
def test_phrase_search_index_matches_direct(spark, tmp_path):
    """The inverted-index path must return exactly the direct
    corpus-scan answer (overlapping occurrences included), and the
    postings scan must be partition-pruned to the phrase's buckets."""
    from tickdatapipeline_spark.operators.search import (
        phrase_search_indexed,
        write_inverted_index,
    )
    from tickdatapipeline_spark.plans.beyond import SEARCH_PHRASE, phrase_search_fn

    sf = "/root/testdata/sf0.001"
    idx = str(tmp_path / "idx")
    write_inverted_index(spark.read.parquet(f"{sf}/documents.parquet"), idx)

    direct = [(r.doc_id, r.n_occurrences, r.first_pos)
              for r in phrase_search_fn(spark, sf).collect()]
    assert direct, "fixture phrase must occur at sf0.001"
    via_index = phrase_search_indexed(spark, idx, SEARCH_PHRASE)
    got = [(r.doc_id, r.n_occurrences, r.first_pos) for r in via_index.collect()]
    assert got == direct

    plan = via_index._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert scans and all("bucket" in ln.split("PartitionFilters")[1][:120]
                         for ln in scans)


def test_phrase_search_overlapping_occurrences(spark, tmp_path):
    """'part filter part filter part' contains the phrase at positions
    1 and 3 — both the direct formulation and the index path count
    every start position, not just disjoint matches."""
    from tickdatapipeline_spark.operators.search import (
        phrase_search_indexed,
        write_inverted_index,
    )

    d = spark.createDataFrame(
        [(1, "part filter part filter part", "en", "s", 29)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    idx = str(tmp_path / "idx")
    write_inverted_index(d, idx)
    r = phrase_search_indexed(spark, idx, "part filter part").collect()
    assert [(x.doc_id, x.n_occurrences, x.first_pos) for x in r] == [(1, 2, 1)]


@pytest.mark.heavy
def test_ann_mrr_golden(spark, tmp_path):
    """Hand-buildable MRR: with IVF probing only nprobe=2 of the cells,
    a query whose true nearest neighbor lives in an unprobed cell
    contributes 0; one whose list leads with the true NN contributes
    1.0. Checked against a direct python recomputation from the two
    operator outputs."""
    from tickdatapipeline_spark.operators.similarity import (
        ann_topk_ivf,
        cosine_topk,
    )
    from tickdatapipeline_spark.plans.beyond import QUERY_MOD, TOPK_K, ann_mrr_fn

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = cosine_topk(emb, TOPK_K, QUERY_MOD).collect()
    approx = ann_topk_ivf(emb, TOPK_K, QUERY_MOD).collect()
    true1 = {r.query_id: r.neighbor_id for r in exact if r.rank == 1}
    import numpy as np

    acc = 0.0
    for q in sorted(true1):
        ranks = [r.rank for r in approx if r.query_id == q and r.neighbor_id == true1[q]]
        acc += 1.0 / ranks[0] if ranks else 0.0
    expect = float(np.floor(acc / len(true1) * 1e6 + 0.5) / 1e6)

    got = ann_mrr_fn(spark, "/root/testdata/sf0.001").collect()[0]
    assert got.n_queries == len(true1)
    assert got.mrr == expect


def test_value_trend_golden(spark, tmp_path):
    """Perfect line: hourly sums 1.0, 2.0, 3.0 -> slope exactly 1.0/h,
    mean 2.0; a flat type slopes 0.0; a single-hour type (sxx = 0) is
    excluded."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tickdatapipeline_spark.plans.beyond import value_trend_fn

    hour_ns = 3_600 * 1_000_000_000
    rows = [(1, 0, "up", 1.0), (2, hour_ns, "up", 2.0), (3, 2 * hour_ns, "up", 3.0),
            (4, 0, "flat", 5.0), (5, hour_ns, "flat", 5.0),
            (6, 0, "single", 9.0)]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([r[2] for r in rows]),
        "value": pa.array([r[3] for r in rows]),
        "props": pa.array(["{}"] * len(rows)),
    })
    (tmp_path / "sf").mkdir()
    pq.write_table(tbl, tmp_path / "sf" / "events.parquet")
    out = {r.event_type: r for r in value_trend_fn(spark, str(tmp_path / "sf")).collect()}
    assert set(out) == {"up", "flat"}
    assert (out["up"].n_hours, out["up"].mean_hourly_value, out["up"].slope_per_hour) \
        == (3, 2.0, 1.0)
    assert out["flat"].slope_per_hour == 0.0


def test_stickiness_golden(spark, tmp_path):
    """Hand-built 3 days: day 0 users {1,2}, day 1 {1}, day 8 {3}.
    Day 0: dau 2 / wau 2 = 1.0; day 1: dau 1, wau = {1,2} (day 0 rows
    serve the window) = 0.5; day 8 is beyond day 1's 7-day reach so its
    wau is just {3} = 1.0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tickdatapipeline_spark.plans.beyond import stickiness_fn

    day_ns = 86_400 * 1_000_000_000
    rows = [(1, 0, 1), (2, 0, 2), (3, day_ns, 1), (4, 8 * day_ns, 3)]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["m"] * len(rows)),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    (tmp_path / "sf").mkdir()
    pq.write_table(tbl, tmp_path / "sf" / "events.parquet")
    out = [(r.day_s, r.dau, r.wau, r.stickiness)
           for r in stickiness_fn(spark, str(tmp_path / "sf")).collect()]
    assert out == [
        (0, 2, 2, 1.0),
        (86_400, 1, 2, 0.5),
        (8 * 86_400, 1, 1, 1.0),
    ]


def _write_events_ns(tmp_path, rows):
    """rows: (event_id, ts_ns, user_id, event_type) -> events.parquet"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    (tmp_path / "sf").mkdir(exist_ok=True)
    pq.write_table(tbl, tmp_path / "sf" / "events.parquet")
    return str(tmp_path / "sf")


def test_session_concurrency_golden(spark, tmp_path):
    """Hand-swept intervals: day 0 holds u1 [0,600s], u2 [300,300], u4
    [100,300] -> 3 concurrent at t=300 (touching endpoints count, starts
    sort before ends); u3's session spans midnight and contributes a
    clipped segment to EACH day, so day 1's sweep sees exactly one
    segment."""
    from tickdatapipeline_spark.plans.beyond import session_concurrency_fn

    s = 1_000_000_000
    day = 86_400
    rows = [
        (1, 0 * s, 1, "m"), (2, 600 * s, 1, "m"),
        (3, 300 * s, 2, "m"),
        (4, 100 * s, 4, "m"), (5, 300 * s, 4, "m"),
        (6, (day - 5) * s, 3, "m"), (7, (day + 5) * s, 3, "m"),
    ]
    sf = _write_events_ns(tmp_path, rows)
    out = [(r.day_s, r.max_concurrent, r.n_segments)
           for r in session_concurrency_fn(spark, sf).collect()]
    assert out == [(0, 3, 4), (day, 1, 1)]


def test_kmv_exact_below_k_and_estimate_mirror(spark, tmp_path):
    """Days with fewer than k distinct users report the exact count
    (the sketch IS exact below k); a day with >= k users must match a
    pure-python mirror of the estimator ((2^60 DIV h_k) * (k-1) over
    md5-lower-60 hashes)."""
    import hashlib

    from tickdatapipeline_spark.plans.beyond import KMV_K, kmv_daily_fn

    s = 1_000_000_000
    day = 86_400
    rows = [(i, 0 * s, 100 + i, "m") for i in range(3)]          # day 0: 3 users
    rows += [(10 + i, day * s + i * s, 200 + i, "m") for i in range(20)]  # day 1: 20
    sf = _write_events_ns(tmp_path, rows)
    got = {r.day_s: (r.n_exact, r.kmv_est) for r in kmv_daily_fn(spark, sf).collect()}

    def h60(u: int) -> int:
        return int(hashlib.md5(str(u).encode()).hexdigest()[17:32], 16)

    hs = sorted(h60(200 + i) for i in range(20))
    want_est = ((1 << 60) // hs[KMV_K - 1]) * (KMV_K - 1)
    assert got[0] == (3, 3)
    assert got[day] == (20, want_est)


def test_bm25_matches_python_mirror(spark, tmp_path):
    """bm25_topk against a pure-python mirror of the whole scoring chain
    (rational idf, k1=1.25/b=0.75 normalization, floor-rounding) on a
    hand-built corpus — same doubles, same fold order, exact equality."""
    import math

    from tickdatapipeline_spark.operators.search import bm25_topk

    texts = {
        1: "part filter part join filter",
        2: "part part part part",
        3: "join join filter",
        4: "nothing relevant here",
        5: "filter",
    }
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    terms = ["part", "filter", "join"]
    got = [(r.doc_id, r.dl, r.score) for r in bm25_topk(docs, terms, 3).collect()]

    toks = {i: t.split() for i, t in texts.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    scored = []
    for i, v in toks.items():
        score = 0.0
        for t in terms:
            tf = v.count(t)
            if tf > 0:
                idf = (n - df[t] + 0.5) / (df[t] + 0.5)
                tfn = (tf * 2.25) / (tf + 1.25 * (0.25 + 0.75 * (len(v) / avgdl)))
                score = score + idf * tfn
        if score > 0.0:
            scored.append((i, len(v), score))
    scored.sort(key=lambda x: (-x[2], x[0]))
    want = [(i, dl, math.floor(sc * 1e6 + 0.5) / 1e6) for i, dl, sc in scored[:3]]
    assert got == want


def test_part_fuzzy_dictionary_semantics(spark, tmp_path):
    """The fuzzy match runs over the deduped name dictionary: duplicate
    part names collapse to one pair with multiplicities carried, blocks
    (last word) never cross, and the levenshtein threshold is exact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tickdatapipeline_spark.plans.relational import r36_fn

    names = ["red bolt", "ted bolt", "red bolt", "green bolt", "red ring"]
    tbl = pa.table({
        "p_partkey": pa.array(range(1, len(names) + 1), pa.int64()),
        "p_name": pa.array(names),
    })
    (tmp_path / "sf").mkdir()
    pq.write_table(tbl, tmp_path / "sf" / "part.parquet")
    out = {(r.name_a, r.name_b): (r.lev, r.n_parts_a, r.n_parts_b)
           for r in r36_fn(spark, str(tmp_path / "sf")).collect()}
    # "red bolt"~"ted bolt" lev 1 (multiplicity 2 on the red side);
    # "green bolt"~"red bolt" lev 3 sits exactly AT the threshold;
    # "green bolt"~"ted bolt" is lev 4 (out); "red ring" blocks apart
    assert out == {
        ("red bolt", "ted bolt"): (1, 2, 1),
        ("green bolt", "red bolt"): (3, 1, 2),
    }


@pytest.mark.heavy
def test_hourly_ccf_detects_engineered_lag(spark, tmp_path):
    """Clicks built as an exact copy of views shifted +2 hours: the CCF
    must be exactly 1.0 at lag +2 and below it everywhere else, with
    n_pairs shrinking by |lag| (the grid overlap)."""
    from tickdatapipeline_spark.plans.beyond import hourly_ccf_fn

    h_ns = 3600 * 1_000_000_000
    views = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]  # distinct pattern, 10 hours
    rows = []
    eid = 0
    for h, n in enumerate(views):
        for _ in range(n):
            rows.append((eid, h * h_ns, 1, "view")); eid += 1
        for _ in range(n):  # clicks = views shifted +2h
            rows.append((eid, (h + 2) * h_ns, 1, "click")); eid += 1
    sf = _write_events_ns(tmp_path, rows)
    got = {r.lag_h: (r.n_pairs, r.ccf) for r in hourly_ccf_fn(spark, sf).collect()}
    assert set(got) == set(range(-3, 4))
    span = 12  # hours 0..11 in the grid
    assert got[2][1] == 1.0
    for lag, (n, ccf) in got.items():
        assert n == span - abs(lag)
        if lag != 2 and ccf is not None:
            assert ccf < 1.0


def test_corr_budget_guard_raises_on_overflowing_sums(spark):
    """The correlation family's int64-budget guard: synthetic five-sums
    just past the 2^62 budget raise the documented re-bin message (not
    an opaque ANSI arithmetic error), sums just inside it pass n
    through untouched. Uses the division form so the check itself can
    never overflow — including at sxy = int64 max."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from tickdatapipeline_spark.plans.beyond import _corr_budget_guard

    def run(n, sxy, sxx, syy):
        df = spark.createDataFrame(
            [(n, 0, 0, sxy, sxx, syy)],
            "n long, sx long, sy long, sxy long, sxx long, syy long",
        )
        return df.select(_corr_budget_guard("acf_test").alias("n_pairs")).collect()

    # inside the budget: n = 3, each sum at the floor((2^62-1)/3) cap
    cap = (2 ** 62 - 1) // 3
    assert run(3, -cap, cap, cap) == [(3,)]
    # one past the cap on each of the three sums -> the re-bin message
    for bad in ("sxy", "sxx", "syy"):
        kw = {"sxy": cap, "sxx": cap, "syy": cap}
        kw[bad] = cap + 1
        with pytest.raises(SparkRuntimeException, match="re-bin the series"):
            run(3, **kw)
    # sxy at int64 max: the multiplication form n*sxy would itself
    # overflow under ANSI before comparing; the DIV form must raise
    # the guard's own message instead
    with pytest.raises(SparkRuntimeException, match="re-bin the series"):
        run(3, 2 ** 63 - 1, cap, cap)


@pytest.mark.heavy
def test_acf_ccf_plans_fold_the_budget_guard(spark, tmp_path):
    """The guard must be IN the executed plan (folded into the consumed
    n_pairs output, un-prunable): both hourly correlation plans carry a
    raise_error node, and on an in-budget fixture the guarded n_pairs
    values are unchanged (the CCF golden above pins exact values)."""
    from tickdatapipeline_spark.operators import globalorder
    from tickdatapipeline_spark.plans.beyond import hourly_acf_fn, hourly_ccf_fn

    h_ns = 3600 * 1_000_000_000
    rows = []
    eid = 0
    for h in range(6):
        for et in ("view", "click"):
            rows.append((eid, h * h_ns, 1, et)); eid += 1
    sf = _write_events_ns(tmp_path, rows)
    globalorder.set_pins(False)  # pin() truncates lineage for plan asserts
    try:
        for fn in (hourly_acf_fn, hourly_ccf_fn):
            df = fn(spark, sf)
            assert "raise_error" in df._jdf.queryExecution().optimizedPlan().toString()
            assert all(r.n_pairs >= 1 for r in df.collect())
    finally:
        globalorder.set_pins(True)


@pytest.mark.heavy
def test_phash_fingerprint_semantics(spark):
    """Perceptual fingerprints: byte-identical payloads share a phash
    (hamming 0), a lightly perturbed payload lands within a few bits
    (near-dup by pigeonhole), an unrelated payload does not; the WHT
    median-sign construction balances the key (~half the 63 bits set)."""
    from pyspark.sql import functions as F

    from tickdatapipeline_spark.operators.multimodal import (
        perceptual_fingerprints,
        phash_near_duplicates,
    )

    base = ("the quick brown fox jumps over the lazy dog " * 8).encode()
    tweaked = bytearray(base)
    for k in range(4):  # a handful of bytes nudged (one flips no bit at
        tweaked[7 * k + 3] ^= 0x14  # all — cell sums absorb ±4 deltas)
    other = ("completely different content with other bytes here " * 7).encode()
    media = spark.createDataFrame(
        [(1, "image", bytes(base)), (2, "image", bytes(base)),
         (3, "image", bytes(tweaked)), (4, "image", bytes(other))],
        "media_id long, kind string, content binary",
    )
    fp = perceptual_fingerprints(media)
    got = {r.media_id: r.phash for r in fp.collect()}
    assert got[1] == got[2]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert 0 < ham(got[1], got[3]) <= 8
    assert ham(got[1], got[4]) > 8
    assert 20 <= bin(got[1]).count("1") <= 43  # median-sign balance
    pairs = {(r.media_a, r.media_b): r.hamming
             for r in phash_near_duplicates(fp).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_phash_pairs_plan_is_band_equijoin(spark):
    """The phash near-dup join must be a band-key EQUI-join (shuffle on
    (band, band_key)), never a cartesian/nested-loop over fingerprints."""
    from tickdatapipeline_spark.operators import globalorder
    from tickdatapipeline_spark.plans.beyond import media_dedup_phash_fn

    globalorder.set_pins(False)
    try:
        plan = (
            media_dedup_phash_fn(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution().executedPlan().toString()
        )
    finally:
        globalorder.set_pins(True)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_key" in plan


@pytest.mark.heavy
def test_graph_triangles_golden(spark):
    """A triple of identical docs forms a candidate 3-clique -> one
    triangle, each member counted once; a disjoint identical pair has
    edges but no closure -> absent from the output."""
    import tempfile

    from tickdatapipeline_spark.plans.beyond import dedup_graph_triangles_fn

    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta", "en") for i in range(3)]
    rows += [(10 + i, "one two three four five six seven eight", "en") for i in range(2)]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(i, t, l, "s", len(t)) for i, t, l in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.parquet(f"{td}/documents.parquet")
        got = {r.doc_id: r.n_triangles
               for r in dedup_graph_triangles_fn(spark, td).collect()}
    assert got == {0: 1, 1: 1, 2: 1}


def test_key_skew_gini_golden(spark, tmp_path):
    """Hand-counted Gini: type 'a' users with counts (1, 1, 4) ->
    ranked six = 1+2+12 = 15, gini = (30-24)/18 = 1/3; a single-user
    type pins gini = 0."""
    from tickdatapipeline_spark.plans.beyond import key_skew_fn

    rows, eid = [], 0
    for u, n in ((1, 1), (2, 1), (3, 4)):
        for _ in range(n):
            rows.append((eid, eid * 1_000_000_000, u, "a")); eid += 1
    rows.append((eid, 0, 9, "b"))
    sf = _write_events_ns(tmp_path, rows)
    out = {r.event_type: r for r in key_skew_fn(spark, sf).collect()}
    a = out["a"]
    assert (a.n_users, a.n_events, a.max_user_events) == (3, 6, 4)
    assert a.top_user_share == 0.666667 and a.gini == 0.333333
    assert out["b"].gini == 0.0 and out["b"].top_user_share == 1.0


def test_readability_lix_golden(spark, tmp_path):
    """LIX by hand: 'One two three. Four five!' -> 5 words, 2 sentence
    runs, 0 long words -> 2.5; '!!!' is ONE boundary; a >=7-char word
    adds 100/n_words."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tickdatapipeline_spark.plans.beyond import readability_fn

    texts = {1: "One two three. Four five!",
             2: "Amazing!!! Wonderful gigantic words",
             3: "no terminators here"}
    tbl = pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[i] for i in sorted(texts)]),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["s"] * 3),
        "n_chars": pa.array([len(texts[i]) for i in sorted(texts)], pa.int64()),
    })
    (tmp_path / "sf").mkdir()
    pq.write_table(tbl, tmp_path / "sf" / "documents.parquet")
    out = {r.doc_id: r for r in readability_fn(spark, str(tmp_path / "sf")).collect()}
    assert (out[1].n_words, out[1].n_sentences, out[1].n_long_words) == (5, 2, 0)
    assert out[1].lix == 2.5
    # doc 2: 4 words, 1 run (!!!), long: amazing(7) wonderful(9) gigantic(8)
    assert (out[2].n_words, out[2].n_sentences, out[2].n_long_words) == (4, 1, 3)
    assert out[2].lix == 4.0 + 75.0
    # doc 3: 0 runs -> sentence divisor max(0,1)=1; "terminators" is long
    assert out[3].n_sentences == 0 and out[3].lix == 3.0 + 33.333333


def test_power_pareto_golden(spark, tmp_path):
    """Counts (8, 1, 1) over 3 users: deciles 1-3 have k=0 (absent),
    k=1 covers the heavy user (0.8), k=2 splits the tied tail exactly
    (9/10), k=3 covers all. Tie split = cum_before + (k-users_before)*cnt."""
    from tickdatapipeline_spark.plans.beyond import power_users_pareto_fn

    rows, eid = [], 0
    for u, n in ((1, 8), (2, 1), (3, 1)):
        for _ in range(n):
            rows.append((eid, eid * 1_000_000_000, u, "m")); eid += 1
    sf = _write_events_ns(tmp_path, rows)
    got = {r.decile: (r.n_top_users, r.events_covered, r.share)
           for r in power_users_pareto_fn(spark, sf).collect()}
    assert set(got) == set(range(4, 11))
    assert got[4] == (1, 8, 0.8) and got[6] == (1, 8, 0.8)
    assert got[7] == (2, 9, 0.9) and got[9] == (2, 9, 0.9)
    assert got[10] == (3, 10, 1.0)


@pytest.mark.heavy
def test_funnel_latency_golden(spark, tmp_path):
    """Hand-timed funnel: u1 views at 0s, clicks at 10s (a later 20s
    click is ignored), purchases at 40s; u2 views at 0s and clicks at
    30s. view->click lats [10s, 30s]: p50 interpolates to 20s, p90 to
    28s, max 30s; click->purchase has the single 30s latency at every
    pct."""
    from tickdatapipeline_spark.plans.beyond import funnel_latency_fn

    s = 1_000_000_000
    rows = [
        (1, 0 * s, 1, "view"), (2, 10 * s, 1, "click"),
        (3, 20 * s, 1, "click"), (4, 40 * s, 1, "purchase"),
        (5, 0 * s, 2, "view"), (6, 30 * s, 2, "click"),
    ]
    sf = _write_events_ns(tmp_path, rows)
    got = {(r.transition, r.pct): r.latency_us
           for r in funnel_latency_fn(spark, sf).collect()}
    us = 1_000_000.0
    assert got[("view_to_click", 0.5)] == 20 * us
    assert got[("view_to_click", 0.9)] == 28 * us
    assert got[("view_to_click", 1.0)] == 30 * us
    assert got[("click_to_purchase", 0.5)] == 30 * us
    assert got[("click_to_purchase", 1.0)] == 30 * us


@pytest.mark.heavy
def test_dedup_savings_golden(spark):
    """An identical triple in source s1 (6 tokens each) sheds 2 docs /
    12 of 18 tokens = 0.666667; the untouched source s2 sheds nothing."""
    import tempfile

    from tickdatapipeline_spark.plans.beyond import dedup_savings_fn

    rows = [(i, "alpha beta gamma delta epsilon zeta", "s1") for i in range(3)]
    rows += [(10, "one two three four five six seven eight", "s2")]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(i, t, "en", src, len(t)) for i, t, src in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.parquet(f"{td}/documents.parquet")
        got = {r.source: (r.n_docs, r.docs_dropped, r.tokens_total,
                          r.tokens_dropped, r.token_savings)
               for r in dedup_savings_fn(spark, td).collect()}
    assert got["s1"] == (3, 2, 18, 12, 0.666667)
    assert got["s2"] == (1, 0, 8, 0, 0.0)


@pytest.mark.heavy
def test_cluster_cohesion_golden(spark):
    """Pooled-Jaccard cohesion by hand: an identical triple pools 3
    perfect pairs -> 1.0; a last-token-perturbed pair shares 5 of 7
    3-gram shingles -> 5/7 = 0.714286; the ratio is of SUMS, never an
    average of floats."""
    import tempfile

    from tickdatapipeline_spark.plans.beyond import cluster_cohesion_fn

    rows = [(i, "alpha beta gamma delta epsilon zeta", "en") for i in range(3)]
    rows += [(10, "one two three four five six seven eight", "en"),
             (11, "one two three four five six seven nine", "en")]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(i, t, l, "s", len(t)) for i, t, l in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.parquet(f"{td}/documents.parquet")
        got = {r.cluster_id: (r.cluster_size, r.n_pairs, r.inter_total,
                              r.union_total, r.cohesion)
               for r in cluster_cohesion_fn(spark, td).collect()}
    assert got[0] == (3, 3, 12, 12, 1.0)       # 3 pairs x 4 shared shingles
    assert got[10] == (2, 1, 5, 7, 0.714286)   # one perturbed 3-gram run


@pytest.mark.heavy
def test_dup_degree_histogram_golden(spark):
    """A triple of identical docs plus a disjoint pair: the triple's
    members each have degree 2, the pair's degree 1 -> histogram
    {1: 2 docs, 2: 3 docs}."""
    from tickdatapipeline_spark.plans.beyond import dup_degree_fn
    import tempfile

    rows = [(i, "alpha beta gamma delta epsilon zeta", "en") for i in range(3)]
    rows += [(10 + i, "one two three four five six", "en") for i in range(2)]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            [(i, t, l, "s", len(t)) for i, t, l in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.parquet(f"{td}/documents.parquet")
        out = {r.degree: r.n_docs for r in dup_degree_fn(spark, td).collect()}
    assert out == {1: 2, 2: 3}


@pytest.mark.heavy
def test_weighted_jaccard_downweights_boilerplate(spark):
    """Two doc pairs with the SAME plain Jaccard: one shares rare
    content, the other shares the corpus-wide boilerplate — the
    weighted score must separate them (rare-sharing pair scores
    higher), and weights must equal N // df exactly."""
    from tickdatapipeline_spark.operators.dedup import weighted_jaccard_pairs

    boiler = "click here to subscribe now please"
    rows = [
        (1, f"unique alpha content {boiler}", "en"),
        (2, f"unique alpha content {boiler}", "en"),      # shares everything
        (3, f"other beta words {boiler}", "en"),
        (4, f"third gamma phrase {boiler}", "en"),        # 3-4 share ONLY boiler
    ]
    d = docs_df(spark, rows)
    out = {(r.doc_a, r.doc_b): r.wjaccard
           for r in weighted_jaccard_pairs(d, 0.0, max_band_bucket=None).collect()}
    assert out[(1, 2)] == 1.0  # identical docs stay 1.0 under any weighting
    if (3, 4) in out:  # boiler-only pair may or may not clear LSH bands
        assert out[(3, 4)] < out[(1, 2)]
        assert out[(3, 4)] < 0.6  # plain jaccard of 3-4 would be ~0.45; weighted must not exceed it


@pytest.mark.heavy
def test_fluency_filter_respects_per_source_bar(spark, tmp_path):
    """Survivors score >= their OWN source's exact p10 bar, ~90% of
    each source survives, and the bars genuinely differ per source
    (the reason for per-domain thresholds)."""
    from tickdatapipeline_spark.plans.beyond import fluency_filter_fn
    from tickdatapipeline_spark.operators.text import char_bigram_likelihood

    import random

    rng = random.Random(7)
    rows = []
    for i in range(30):  # fluent-ish source: words over a small alphabet
        rows.append((i, " ".join("ab" * rng.randint(1, 3) for _ in range(8)),
                     "en", "clean", 0))
    for i in range(30, 60):  # noisy source: wide-alphabet gibberish
        rows.append((i, "".join(rng.choice("qwxzjkv ") for _ in range(40)),
                     "en", "noisy", 0))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(tmp_path / "sf" / "documents.parquet"))

    out = fluency_filter_fn(spark, str(tmp_path / "sf")).collect()
    assert out
    bars = {}
    for r in out:
        assert r.avg_bigram_p >= r.bar
        bars[r.source] = r.bar
    assert set(bars) == {"clean", "noisy"}
    assert bars["clean"] != bars["noisy"]

    docs = spark.read.parquet(str(tmp_path / "sf" / "documents.parquet"))
    n_scored = char_bigram_likelihood(docs).count()
    assert len(out) >= 0.85 * n_scored  # ~p10 trimmed, never more


@pytest.mark.heavy
def test_ivf_recall_sweep_monotone(spark):
    """Pooled recall must be non-decreasing in nprobe (each wider probe
    set strictly contains the narrower one's candidates), and every
    pooled value is the exact hit/truth integer ratio."""
    from tickdatapipeline_spark.plans.beyond import ivf_recall_sweep_fn

    rows = ivf_recall_sweep_fn(spark, "/root/testdata/sf0.001").collect()
    assert [r.nprobe for r in rows] == [1, 2, 4]
    recalls = [r.pooled_recall for r in rows]
    assert recalls == sorted(recalls)
    for r in rows:
        import math
        assert r.pooled_recall == math.floor(r.hit_total / r.exact_total * 1e6 + 0.5) / 1e6


@pytest.mark.heavy
def test_incremental_index_dedup_matches_full_recompute(spark, tmp_path):
    """The daily-delta loop (r9 verdict stretch): a new shard is
    near-dup-filtered against the PERSISTED index (dedup_against_index
    — no corpus-signature recompute), its keepers appended as an
    idempotent shard partition (append_corpus_index), and the next
    shard's filter sees them. Row-identical to the full in-session
    recompute, and replaying an append leaves the index equivalent."""
    from tickdatapipeline_spark.operators.dedup import (
        append_corpus_index,
        contamination_against_index,
        dedup_against_index,
        write_corpus_index,
    )

    d1 = ("the quick brown fox jumps over the lazy dog while rain "
          "falls gently on the quiet village roofs tonight")
    d2 = ("distributed query engines shuffle partitioned data across "
          "executors while the optimizer prunes columns and filters")
    corpus0 = docs_df(spark, [(1, d1, "en"), (2, d2, "en")])
    idx = str(tmp_path / "idx")
    write_corpus_index(corpus0, idx, max_band_bucket=None)

    # shard A: 10 near-dups corpus doc 1 (one appended token — verified
    # to share 6 of 8 LSH bands with d1; a mid-sentence swap can
    # legitimately miss all 8 at J~0.7, the ~10% LSH recall trade),
    # 11 fresh
    d11 = ("streaming watermarks bound the state of event time "
           "aggregations while late arrivals readmit after the horizon")
    shard_a = docs_df(spark, [
        (10, d1 + " indeed", "en"), (11, d11, "en")])
    kept_a = dedup_against_index(spark, shard_a, idx, max_band_bucket=None)
    assert sorted(r.doc_id for r in kept_a.collect()) == [11]

    # equals the full in-session recompute (corpus_docs path)
    full = contamination_against_index(
        shard_a, spark.read.parquet(f"{idx}/bands"), None,
        corpus_docs=corpus0, max_band_bucket=None)
    assert sorted(r.probe_doc_id for r in full.collect()) == [10]

    append_corpus_index(kept_a, idx, shard="a", max_band_bucket=None)
    n_bands = spark.read.parquet(f"{idx}/bands").count()
    n_shingles = spark.read.parquet(f"{idx}/shingles").count()

    # shard B: 20 near-dups doc 11 — visible ONLY through the appended
    # shard-a partition — and 21 is fresh
    shard_b = docs_df(spark, [
        (20, d11 + " indeed", "en"),
        (21, "vectorized arrow batches cross the python boundary far "
             "faster than pickled rows ever could", "en"),
    ])
    kept_b = dedup_against_index(spark, shard_b, idx, max_band_bucket=None)
    assert sorted(r.doc_id for r in kept_b.collect()) == [21]

    # replay idempotence: re-appending shard a changes nothing
    append_corpus_index(kept_a, idx, shard="a", max_band_bucket=None)
    assert spark.read.parquet(f"{idx}/bands").count() == n_bands
    assert spark.read.parquet(f"{idx}/shingles").count() == n_shingles
    kept_b2 = dedup_against_index(spark, shard_b, idx, max_band_bucket=None)
    assert sorted(r.doc_id for r in kept_b2.collect()) == [21]

    # full rebuild wipes delta shards (compaction hygiene)
    write_corpus_index(corpus0, idx, max_band_bucket=None)
    shards = {r.shard for r in
              spark.read.parquet(f"{idx}/bands").select("shard").distinct().collect()}
    assert shards == {"base"}


def test_ngram_repetition_golden(spark):
    """Hand-counted duplicate n-gram fractions: 'a b a b a b' has five
    2-grams of which two values repeat (dup 3) and four 3-grams (dup
    2); a one-token doc contributes zero grams; pooled permilles use
    integer DIV."""
    from tickdatapipeline_spark.plans.beyond import ngram_repetition_fn

    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    tmp = tempfile.mkdtemp()
    texts = [(1, "a b a b a b", "s1"), (2, "x", "s1"),
             (3, "fresh words only here now", "s2")]
    tbl = pa.table({
        "doc_id": pa.array([t[0] for t in texts], pa.int64()),
        "text": pa.array([t[1] for t in texts]),
        "lang": pa.array(["en"] * 3),
        "source": pa.array([t[2] for t in texts]),
        "n_chars": pa.array([len(t[1]) for t in texts], pa.int64()),
    })
    os.mkdir(os.path.join(tmp, "sf"))
    pq.write_table(tbl, os.path.join(tmp, "sf", "documents.parquet"))
    out = {r.source: r for r in
           ngram_repetition_fn(spark, os.path.join(tmp, "sf")).collect()}
    s1 = out["s1"]
    # doc1: 2-grams [ab, ba, ab, ba, ab] -> n2=5, d2=2, dup=3;
    # 3-grams [aba, bab, aba, bab] -> n3=4, d3=2, dup=2; doc2: none
    assert (s1.n_docs, s1.n_2grams, s1.dup_2grams) == (2, 5, 3)
    assert s1.dup2_permille == 600  # 3000 DIV 5
    assert (s1.n_3grams, s1.dup_3grams, s1.dup3_permille) == (4, 2, 500)
    s2 = out["s2"]
    assert (s2.n_2grams, s2.dup_2grams, s2.dup2_permille) == (4, 0, 0)


def test_seasonal_profile_golden(spark, tmp_path):
    """Hand-built hour-of-day profile: type 'a' has 3 events at hod 0
    and 1 at hod 1 -> dev = 3*240000 DIV 4 - 10000 = +170000/4... by
    hand: hod0 180000-10000=170000? 3*240000//4=180000, dev=+170000;
    hod1 dev = 60000-10000 = 50000... 1*240000//4=60000 -> dev 50000."""
    from tickdatapipeline_spark.plans.beyond import seasonal_profile_fn

    H = 3_600_000_000_000  # one hour in ns
    rows = [(0, 0 * H, 1, "a"), (1, 0 * H + 5, 2, "a"), (2, 24 * H, 3, "a"),
            (3, 1 * H, 1, "a"),
            (4, 2 * H, 1, "b")]
    sf = _write_events_ns(tmp_path, rows)
    got = {(r.event_type, r.hod): (r.n_events, r.dev_permyriad)
           for r in seasonal_profile_fn(spark, sf).collect()}
    assert got[("a", 0)] == (3, 170000)   # 3 of 4 at hod 0 (incl. day 2)
    assert got[("a", 1)] == (1, 50000)
    assert got[("b", 2)] == (1, 230000)   # sole slot: 24x the flat share
    assert set(got) == {("a", 0), ("a", 1), ("b", 2)}


@pytest.mark.heavy
def test_type_affinity_golden(spark, tmp_path):
    """Hand-counted lift: users {1,2} do both a and b, user 3 only a
    -> n_a=3, n_b=2, n_both=2, n_users=3, lift = 2*3/(3*2) = 1.0;
    b-c co-occur only for user 2 -> lift = 1*3/(2*1) = 1.5."""
    from tickdatapipeline_spark.plans.beyond import type_affinity_fn

    rows = [(0, 0, 1, "a"), (1, 0, 1, "b"), (2, 0, 1, "b"),  # dup (1,b)
            (3, 0, 2, "a"), (4, 0, 2, "b"), (5, 0, 2, "c"),
            (6, 0, 3, "a")]
    sf = _write_events_ns(tmp_path, rows)
    got = {(r.type_a, r.type_b): r for r in type_affinity_fn(spark, sf).collect()}
    ab = got[("a", "b")]
    assert (ab.n_both, ab.n_a, ab.n_b, ab.n_users) == (2, 3, 2, 3)
    assert ab.lift == 1.0
    assert got[("b", "c")].lift == 1.5
    assert got[("a", "c")].n_both == 1


@pytest.mark.heavy
def test_media_phash_clusters_chain(spark):
    """A perceptual re-encode CHAIN A~B~C (A,C beyond max_hamming of
    each other) collapses into ONE cluster with min-id representative —
    the pairs->components contract duplicate_clusters pins for text,
    here over injected fingerprints through the banded pair join."""
    from tickdatapipeline_spark.operators.dedup import connected_components
    from tickdatapipeline_spark.operators.multimodal import phash_near_duplicates

    # hand-built phashes: B flips 5 low bits of A; C flips 5 more
    # (A-B 5, B-C 5, A-C 10 > 8); D is far from everything
    a = (1 << 40) | 0b1111111
    b = a ^ 0b11111
    c = b ^ 0b1111100000
    d = (1 << 62) - 12345
    fp = spark.createDataFrame(
        [(1, "image", a), (2, "image", b), (3, "image", c), (4, "image", d)],
        "media_id long, kind string, phash long",
    )
    pairs = phash_near_duplicates(fp, max_hamming=8)
    got = {(r.media_a, r.media_b) for r in pairs.collect()}
    assert (1, 2) in got and (2, 3) in got and (1, 3) not in got
    clusters = connected_components(pairs, "media_a", "media_b",
                                    id_col="media_id").collect()
    by_id = {r.media_id: r for r in clusters}
    assert {by_id[i].cluster_id for i in (1, 2, 3)} == {1}
    assert by_id[1].cluster_size == 3 and by_id[1].is_representative == 1
    assert 4 not in by_id  # no edges -> not in the pair graph


def test_seasonal_anomalies_golden(spark, tmp_path):
    """Hand-counted seasonal residuals: hod-0 over two days with
    counts (3, 1) -> s=4, n_slots=2, both days sit exactly ±50% off
    the slot mean (|x*2-4|*1000//4 = 500 = the threshold) with
    opposite directions; every other hod has s=0 and is excluded."""
    from tickdatapipeline_spark.plans.beyond import seasonal_anomalies_fn

    H = 3_600_000_000_000
    rows = [(0, 0, 1, "a"), (1, 5, 2, "a"), (2, 7, 3, "a"),  # hod 0, day 1: 3
            (3, 24 * H, 1, "a")]                             # hod 0, day 2: 1
    sf = _write_events_ns(tmp_path, rows)
    got = seasonal_anomalies_fn(spark, sf).collect()
    assert [(r.hour_s, r.n_events, r.rel_abs_permille, r.direction)
            for r in got] == [(0, 3, 500, 1), (86400, 1, 500, -1)]
    assert all(r.hod == 0 and r.hod_total == 4 and r.hod_slots == 2 for r in got)


@pytest.mark.heavy
def test_ivfpq_codebook_vectors_score_exactly(spark):
    """SEEDED IVF-PQ invariant (train_iters=0 — the degenerate
    fallback): a vector whose vec_id < k_codes IS a codebook entry in
    every subspace (its own residual subvectors, d2 = 0), so its
    reconstruction is bit-exact and any (query, neighbor<k_codes)
    cosine in the IVF-PQ result must equal the brute-force value for
    that same pair. The TRAINED default breaks self-reconstruction by
    design (entries are cluster means), so it is checked on contract
    only: cosines in [-1, 1], at most k rows per query."""
    from tickdatapipeline_spark.operators.similarity import (
        PQ_K,
        ann_topk_ivfpq,
        cosine_topk,
    )
    from tickdatapipeline_spark.plans.beyond import _emb
    from collections import Counter

    emb = _emb(spark, "/root/testdata/sf0.001")
    for train_iters in (0, None):
        kw = {} if train_iters is None else {"train_iters": train_iters}
        approx = ann_topk_ivfpq(emb, 5, 50, **kw).collect()
        assert approx and all(-1.0 <= r.cosine <= 1.0 for r in approx)
        per_q = Counter(r.query_id for r in approx)
        assert all(v <= 5 for v in per_q.values())
        if train_iters == 0:
            exact = {(r.query_id, r.neighbor_id): r.cosine
                     for r in cosine_topk(emb, 400, 50).collect()}
            checked = 0
            for r in approx:
                if r.neighbor_id < PQ_K and (r.query_id, r.neighbor_id) in exact:
                    assert r.cosine == exact[(r.query_id, r.neighbor_id)], (
                        r.query_id, r.neighbor_id)
                    checked += 1
            assert checked > 0  # the invariant actually fired


# ===== round-10 (cont.): heavy hitters / pagerank / LM surprisal =====


@pytest.mark.heavy
def test_heavy_hitters_exact_and_partition_independent(spark):
    """The two-pass Misra-Gries output must equal the exact
    count>n/(k+1) answer and be identical under different input
    partitionings (the sketch's candidate set may differ; the final
    exact filter may not)."""
    from tickdatapipeline_spark.operators.sketches import (
        exact_heavy_hitters,
        misra_gries_candidates,
    )

    # 100 rows: key 1 x 40, key 2 x 25, keys 3..37 x 1 each
    keys = [1] * 40 + [2] * 25 + list(range(3, 38))
    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    k = 3  # threshold: count > 100/4 = 25 -> only key 1 qualifies
    expected = [(1, 40, 400000)]  # 40*1e6 DIV 100

    for parts in (1, 4):
        out = exact_heavy_hitters(df.repartition(parts), "user_id", k)
        rows = [(r.user_id, r.n_events, r.share_ppm) for r in out.collect()]
        assert rows == expected, f"parts={parts}: {rows}"

    # candidate superset property: every true heavy key is a candidate
    cands = {
        r.user_id
        for r in misra_gries_candidates(df.repartition(4), "user_id", k).collect()
    }
    assert 1 in cands
    # strict > semantics: key 2 at exactly... 25*4=100 == total -> NOT heavy
    out = exact_heavy_hitters(df, "user_id", k)
    assert 2 not in {r.user_id for r in out.collect()}


def test_heavy_hitters_ignores_nulls(spark):
    from tickdatapipeline_spark.operators.sketches import exact_heavy_hitters

    df = spark.createDataFrame(
        [(1,)] * 9 + [(None,)] * 20 + [(2,)] * 1,
        "user_id long",
    )
    # nulls excluded: total=10, threshold with k=1 -> count > 5
    rows = exact_heavy_hitters(df, "user_id", 1).collect()
    assert [(r.user_id, r.n_events) for r in rows] == [(1, 9)]


def _naive_int_pagerank(pairs, iters, scale):
    """Pure-Python mirror of the integer recurrence."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    nodes = sorted(adj)
    n = len(nodes)
    r = {v: scale // n for v in nodes}
    tele = (15 * scale) // (100 * n)
    for _ in range(iters):
        share = {v: r[v] // len(adj[v]) for v in nodes}
        nxt = {}
        for v in nodes:
            s = sum(share[u] for u in adj[v])
            nxt[v] = tele + ((85 * s) // 100)
        r = nxt
    return {v: (len(adj[v]), r[v]) for v in nodes}


def test_pagerank_matches_naive_mirror(spark):
    """Star K1,4 plus a pendant path — hub must outrank leaves, and
    every scaled-integer value must match the Python mirror exactly
    (bit-reproducibility is the operator's whole contract)."""
    from tickdatapipeline_spark.operators.dedup import pagerank_scores

    pairs = [(0, 1), (0, 2), (0, 3), (0, 4), (4, 5)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r.node: (r.degree, r.pagerank_e12)
        for r in pagerank_scores(df, "doc_a", "doc_b", iters=5).collect()
    }
    want = _naive_int_pagerank(pairs, 5, 10**12)
    assert got == want
    assert got[0][1] > got[1][1]  # hub beats leaf


def test_lm_surprisal_golden(spark, tmp_path):
    """Hand-computed bigram bits: corpus 'a b','a b','a c' has
    n(a *)=3, n(a b)=2, n(a c)=1; bits(ab)=bitlen(3)-bitlen(2)=0,
    bits(ac)=bitlen(3)-bitlen(1)=1."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tickdatapipeline_spark.plans.beyond import lm_surprisal_fn

    texts = [(1, "a b"), (2, "a b"), (3, "a c"), (4, "solo")]
    tbl = pa.table({
        "doc_id": pa.array([t[0] for t in texts], pa.int64()),
        "text": pa.array([t[1] for t in texts]),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["s"] * 4),
        "n_chars": pa.array([len(t[1]) for t in texts], pa.int64()),
    })
    os.mkdir(tmp_path / "sf")
    pq.write_table(tbl, str(tmp_path / "sf" / "documents.parquet"))
    out = {r.doc_id: r for r in lm_surprisal_fn(spark, str(tmp_path / "sf")).collect()}
    assert set(out) == {1, 2, 3}  # doc 4 has no bigrams
    assert (out[1].n_bigrams, out[1].total_bits, out[1].bits_permille) == (1, 0, 0)
    assert (out[3].n_bigrams, out[3].total_bits, out[3].bits_permille) == (1, 1, 1000)


def test_dup_span_coverage_golden(spark):
    """Hand-computed cross-doc duplicated-span union (n=3): two docs
    share 'x y z w' (two overlapping 3-grams -> ONE merged island of 4
    tokens) plus a disjoint 'a b c' island (3 tokens); a doc repeating
    a gram only WITHIN itself (df=1 by distinct-doc counting) and a
    unique doc contribute zero coverage; pooled per-source permille
    uses integer DIV."""
    from tickdatapipeline_spark.operators.text import dup_span_coverage

    rows = [
        # src a, doc 1: 9 tokens; covered [0,3] + [6,8] = 7
        (1, "x y z w q1 q2 a b c", "a"),
        # src a, doc 2: 10 tokens; covered [2,5] + [7,9] = 7
        (2, "p p2 x y z w r a b c", "a"),
        # src b: within-doc repetition only (df counts DISTINCT docs)
        (3, "m m m m m", "b"),
        # src b: all-unique short doc
        (4, "u v w", "b"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.source: r for r in dup_span_coverage(d, 3).collect()}
    a, b = out["a"], out["b"]
    assert (a.n_docs, a.docs_with_dup, a.total_tokens, a.covered_tokens) == (2, 2, 19, 14)
    assert a.coverage_permille == 14 * 1000 // 19  # 736
    assert (b.n_docs, b.docs_with_dup, b.total_tokens, b.covered_tokens) == (2, 0, 8, 0)
    assert b.coverage_permille == 0


@pytest.mark.heavy
def test_append_ann_index_matches_full_rebuild(spark, tmp_path):
    """Incremental IVF index maintenance: base build + one shard append
    (frozen centroids) must answer probes ROW-IDENTICALLY to a full
    rebuild over the unioned corpus with the same centroids; the append
    is replay-idempotent; shard names that could clobber foreign
    partitions are rejected before any work runs."""
    import pytest

    from tickdatapipeline_spark.operators.similarity import (
        ann_probe_against_index,
        append_ann_index,
        write_ann_index,
    )
    from tickdatapipeline_spark.sources.io import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    cents = [(i, [float(x) for x in r.embedding])
             for i, r in enumerate(
                 emb.where(F.col("vec_id") < 8).orderBy("vec_id").collect())]
    base = emb.where(F.col("vec_id") % 5 != 0)
    shard = emb.where(F.col("vec_id") % 5 == 0)
    probe = emb.where(F.col("vec_id") % 37 == 0).limit(6)

    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    write_ann_index(base, inc, centroids=cents)
    append_ann_index(shard, inc, "delta1")
    write_ann_index(emb, full, centroids=cents)

    def answer(path):
        return sorted(
            (r.query_id, r.neighbor_id, r.rank, r.cosine)
            for r in ann_probe_against_index(
                probe,
                spark.read.parquet(f"{path}/centroids"),
                spark.read.parquet(f"{path}/vectors"),
                k=5).collect())

    first = answer(inc)
    assert first == answer(full) and len(first) > 0
    # replay the SAME delta: nothing doubles
    append_ann_index(shard, inc, "delta1")
    assert answer(inc) == first
    # shard-name hygiene: rejected before any job runs
    for bad in ("", "base", "a/b", "a=b"):
        with pytest.raises(ValueError):
            append_ann_index(shard, inc, bad)
    # legacy-layout guard: a pre-shard index (vectors/cell=* at the top
    # level) must be refused with the rebuild message, not poisoned
    legacy = str(tmp_path / "legacy")
    spark.read.parquet(f"{inc}/centroids").write.parquet(f"{legacy}/centroids")
    spark.read.option("basePath", f"{inc}/vectors").parquet(
        f"{inc}/vectors/shard=base").drop("shard").write.partitionBy(
        "cell").parquet(f"{legacy}/vectors")
    with pytest.raises(ValueError, match="pre-shard layout"):
        append_ann_index(shard, legacy, "delta1")


@pytest.mark.heavy
def test_adc_probe_matches_exact_probe(spark, tmp_path):
    """The persisted-index ADC probe (r13 verdict #4): with ``rerank``
    covering every candidate, `ann_probe_against_index_adc` must
    answer ROW-IDENTICALLY to the exact-scan probe — the verify stage
    computes the same rounded exact cosines, so only candidate
    SELECTION can differ, and an all-covering rerank removes that
    difference. Appends encode their shard against the frozen
    codebooks (pq_codes/shard=<name> exists), mirroring the centroid
    contract. At deployment rerank (50), the top-1 self-dup answer —
    the keep/drop decision the live ingest path makes — matches the
    exact probe too."""
    from tickdatapipeline_spark.operators.similarity import (
        ann_probe_against_index,
        ann_probe_against_index_adc,
        append_ann_index,
        pq_encode,
        write_ann_index,
    )
    from tickdatapipeline_spark.sources.io import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    cents = [(i, [float(x) for x in r.embedding])
             for i, r in enumerate(
                 emb.where(F.col("vec_id") < 8).orderBy("vec_id").collect())]
    base = emb.where(F.col("vec_id") % 5 != 0)
    shard = emb.where(F.col("vec_id") % 5 == 0)
    probe = emb.where(F.col("vec_id") % 37 == 0).limit(6)

    idx = str(tmp_path / "idx")
    write_ann_index(base, idx, centroids=cents, pq=True)
    append_ann_index(shard, idx, "delta1")
    import os

    assert os.path.isdir(f"{idx}/pq_codes/shard=base")
    assert os.path.isdir(f"{idx}/pq_codes/shard=delta1")
    # codes cover the whole corpus, one row per vector
    codes_df = spark.read.parquet(f"{idx}/pq_codes")
    assert codes_df.count() == 500

    cents_df = spark.read.parquet(f"{idx}/centroids")
    cb_df = spark.read.parquet(f"{idx}/pq_codebooks")
    vecs_df = spark.read.parquet(f"{idx}/vectors")

    def rows(df):
        return sorted((r.query_id, r.neighbor_id, r.rank, r.cosine)
                      for r in df.collect())

    exact = rows(ann_probe_against_index(probe, cents_df, vecs_df, k=5))
    adc_all = rows(ann_probe_against_index_adc(
        probe, cents_df, codes_df, cb_df, vecs_df, k=5, rerank=10**6))
    assert adc_all == exact and len(exact) > 0
    # deployment-shaped rerank: the k=1 dup decision (every probe is IN
    # the corpus, so its best neighbor is itself at cosine 1.0)
    exact1 = rows(ann_probe_against_index(probe, cents_df, vecs_df, k=1))
    adc1 = rows(ann_probe_against_index_adc(
        probe, cents_df, codes_df, cb_df, vecs_df, k=1, rerank=50))
    assert adc1 == exact1
    # rnorm invariant: the stored reconstruction norm equals the norm
    # of the reconstructed vector pq_dequantized would emit
    from tickdatapipeline_spark.operators.similarity import (
        pq_dequantized, pq_train)

    cbs = sorted((int(r["m"]), int(r["code"]), list(r["c"]))
                 for r in cb_df.collect())
    enc = {r.vec_id: r.rnorm
           for r in pq_encode(base, cbs, 16).collect()}
    rec = {r.vec_id: sum(x * x for x in r.v) ** 0.5
           for r in pq_dequantized(base, codebooks=cbs).collect()}
    assert enc.keys() == rec.keys()
    assert all(abs(enc[k] - rec[k]) < 1e-9 for k in enc)


@pytest.mark.heavy
def test_embedding_dedup_adc_equals_exact(spark, tmp_path):
    """embedding_dedup_against_index auto-detects the PQ artifacts and
    keeps/drops IDENTICALLY to the exact-scan probe on the same index:
    an exact dup of an indexed vector drops, a novel vector survives,
    under both probes (use_adc auto vs forced False)."""
    from tickdatapipeline_spark.operators.similarity import (
        embedding_dedup_against_index, write_ann_index)
    from tickdatapipeline_spark.sources.io import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "idx")
    write_ann_index(emb, idx, pq=True)

    dup = emb.where(F.col("vec_id") % 97 == 3).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding")
    novel = emb.where(F.col("vec_id") % 97 == 5).select(
        (F.col("vec_id") + 20_000).alias("vec_id"),
        F.transform("embedding", lambda x: -x).alias("embedding"))
    shard = dup.unionByName(novel)

    kept_adc = sorted(r.vec_id for r in embedding_dedup_against_index(
        shard, idx).collect())
    kept_exact = sorted(r.vec_id for r in embedding_dedup_against_index(
        shard, idx, use_adc=False).collect())
    assert kept_adc == kept_exact
    assert all(v >= 20_000 for v in kept_adc) and kept_adc


@pytest.mark.heavy
def test_embedding_dedup_against_index(spark, tmp_path):
    """The embedding daily-delta filter: a shard vector identical to an
    indexed one (cosine 1.0) is dropped, a genuinely novel vector
    survives with every input column intact, and the filter composes
    with append_ann_index (keepers appended, replayable)."""
    from tickdatapipeline_spark.operators.similarity import (
        append_ann_index,
        embedding_dedup_against_index,
        write_ann_index,
    )
    from tickdatapipeline_spark.sources.io import read_parquet

    emb = read_parquet(spark, "/root/testdata/sf0.001/embeddings.parquet")
    base = emb.where(F.col("vec_id") < 40)
    path = str(tmp_path / "idx")
    write_ann_index(base, path)

    dup_src = base.where(F.col("vec_id") == 5).collect()[0]
    novel = base.where(F.col("vec_id") == 7).collect()[0]
    shard = spark.createDataFrame(
        [
            (1005, dup_src.embedding, "dup-of-5"),
            # orthogonal-ish novel vector: reversed + sign-flipped copy
            (1007, [(-1.0) ** i * v for i, v in
                    enumerate(reversed(novel.embedding))], "novel"),
        ],
        "vec_id long, embedding array<float>, label string",
    )
    kept = embedding_dedup_against_index(shard, path, threshold=0.96)
    rows = kept.collect()
    assert [r.vec_id for r in rows] == [1007]
    assert rows[0].label == "novel"  # input columns ride through
    # the loop closes: keepers append idempotently
    append_ann_index(kept, path, "delta1")
    again = embedding_dedup_against_index(shard, path, threshold=0.96)
    assert [r.vec_id for r in again.collect()] == []  # 1007 now indexed


@pytest.mark.heavy
def test_ann_rebuild_due_trigger(spark, tmp_path):
    """The index lifecycle's rebuild trigger: a freshly-trained
    balanced index reports healthy; appending a heavily skewed delta
    (every vector in one cell) trips the max-cell-share trigger — the
    signal to schedule the write_ann_index retrain DEPLOYMENT.md
    leaves to the operator."""
    from tickdatapipeline_spark.operators.similarity import (
        ann_rebuild_due,
        append_ann_index,
        write_ann_index,
    )

    cents = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]
    base = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(4)]
        + [(i, [0.0, 1.0, 0.0, 0.0]) for i in range(4, 8)],
        "vec_id long, embedding array<double>")
    idx = str(tmp_path / "ann")
    write_ann_index(base, idx, n_cells=2, centroids=cents)
    healthy = ann_rebuild_due(spark, idx)
    assert healthy["n_vectors"] == 8 and healthy["n_cells"] == 2
    assert healthy["max_cell_frac"] == 0.5
    assert not healthy["rebuild_due"]

    # drift: 24 new vectors all land in cell 0 -> 28/32 = 0.875 share
    skew = spark.createDataFrame(
        [(100 + i, [1.0, 0.0, 0.0, 0.0]) for i in range(24)],
        "vec_id long, embedding array<double>")
    append_ann_index(skew, idx, "drift-day")
    drifted = ann_rebuild_due(spark, idx, max_cell_factor=1.5)
    assert drifted["n_vectors"] == 32
    assert drifted["max_cell_frac"] == 0.875
    assert drifted["rebuild_due"]

    # empty index: nothing to rebalance, never "due"
    empty_idx = str(tmp_path / "ann_empty")
    write_ann_index(base.limit(0), empty_idx, n_cells=2, centroids=cents)
    e = ann_rebuild_due(spark, empty_idx)
    assert e["n_vectors"] == 0 and not e["rebuild_due"]
