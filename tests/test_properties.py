"""Property-based tests (hypothesis) — beyond the reference's own test
strategy (SURVEY.md §5 notes it has none): randomized inputs pin the
operator contracts that the golden tests spot-check."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import make_ticks_raw
from tickdatapipeline_spark import constants as C
from tickdatapipeline_spark.config import SignalProcessingConfig
from tickdatapipeline_spark.operators.expansion import expand_volume
from tickdatapipeline_spark.operators.hotloop import hot_loop

TS = "20250319 120000 0000000"

price_strategy = st.integers(min_value=36600, max_value=43300)
spike_strategy = st.one_of(price_strategy, st.just(99999), st.just(1))
lines_strategy = st.lists(
    st.tuples(spike_strategy, st.integers(min_value=1, max_value=4)),
    min_size=1, max_size=12,
)

SET = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(lines=lines_strategy)
@SET
@pytest.mark.heavy
def test_expansion_contract(spark, lines):
    rows = [(i + 1, TS, p, v) for i, (p, v) in enumerate(lines)]
    got = expand_volume(make_ticks_raw(spark, rows)).orderBy("tick_idx").collect()
    # row count = sum of volumes; tick_idx dense
    assert len(got) == sum(v for _, v in lines)
    assert [r.tick_idx for r in got] == list(range(1, len(got) + 1))
    # replica 1 carries the line delta, replicas 2..V carry zero
    expected_deltas = []
    prev = None
    for p, v in lines:
        expected_deltas.append(0 if prev is None else p - prev)
        expected_deltas.extend([0] * (v - 1))
        prev = p
    assert [r.price_delta for r in got] == expected_deltas


@given(lines=lines_strategy)
@SET
@pytest.mark.heavy
def test_hotloop_invariants(spark, lines):
    rows = [(i + 1, TS, p, v) for i, (p, v) in enumerate(lines)]
    cfg = SignalProcessingConfig(encoder_type="derivative")
    got = hot_loop(
        expand_volume(make_ticks_raw(spark, rows)), cfg,
        stats_ticks_per_bar=4, keep_internals=True,
    ).orderBy("tick_idx").collect()
    for r in got:
        # flags are exactly one of OK / HOLDLAST / CLIPPED
        assert r.status_flag in (C.FLAG_OK, C.FLAG_HOLDLAST, C.FLAG_CLIPPED)
        assert r.normalization > 0
        if not r.is_valid:
            # invalid rows: zero-amplitude derivative signal, unit norm
            assert r.sig_re == 0.0 and r.sig_im == 0.0
            assert r.normalization == 1.0
        if r.is_core:
            assert abs(r.delta_w) <= min(cfg.max_jump, cfg.winsorize_delta_threshold)
            if abs(r.price_delta) > min(cfg.max_jump, cfg.winsorize_delta_threshold):
                assert r.status_flag == C.FLAG_CLIPPED


@given(
    lines=st.lists(
        st.tuples(price_strategy, st.integers(min_value=1, max_value=3)),
        min_size=4, max_size=10,
    ),
    split=st.integers(min_value=1, max_value=9),
)
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.heavy
def test_streaming_split_equivalence(spark, lines, split):
    from tickdatapipeline_spark.streaming import OUT_COLS, StreamState, advance

    split = min(split, len(lines) - 1)
    cfg = SignalProcessingConfig(encoder_type="cpm", cpm_modulation_index=0.2)
    rows = [(i + 1, TS, p, v) for i, (p, v) in enumerate(lines)]
    whole = hot_loop(
        expand_volume(make_ticks_raw(spark, rows)), cfg, stats_ticks_per_bar=4
    ).orderBy("tick_idx").collect()

    state = StreamState()
    got = []
    for chunk in (rows[:split], rows[split:]):
        renum = [(i + 1, ts, p, v) for i, (_, ts, p, v) in enumerate(chunk)]
        processed, state = advance(
            make_ticks_raw(spark, renum), cfg, state, stats_ticks_per_bar=4
        )
        got.extend(processed.select(*OUT_COLS).orderBy("tick_idx").collect())
        processed.unpersist()

    assert [tuple(r) for r in got] == [tuple(r) for r in whole]


@given(
    lines=st.lists(
        st.tuples(spike_strategy, st.integers(min_value=1, max_value=3)),
        min_size=4, max_size=14,
    ),
    cuts=st.lists(st.integers(min_value=1, max_value=13), min_size=1, max_size=3),
    data=st.data(),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.heavy
def test_advance_random_splits_equal_batch(spark, lines, cuts, data):
    """The streaming continuation contract, property-form: ANY split of
    the input into micro-batches equals the batch plan bit-for-bit."""
    from tickdatapipeline_spark.streaming.state import StreamState, advance
    from tickdatapipeline_spark.streaming import OUT_COLS

    enc = data.draw(st.sampled_from(["derivative", "cpm"]))
    cfg = SignalProcessingConfig(encoder_type=enc)
    rows = [(i + 1, TS, p, v) for i, (p, v) in enumerate(lines)]
    whole = hot_loop(
        expand_volume(make_ticks_raw(spark, rows)), cfg, stats_ticks_per_bar=4
    ).orderBy("tick_idx").collect()

    bounds = sorted({c for c in cuts if c < len(rows)} | {len(rows)})
    state, got, lo = StreamState(), [], 0
    for hi in bounds:
        chunk = [(j + 1, ts, p, v) for j, (_, ts, p, v) in enumerate(rows[lo:hi])]
        processed, state = advance(
            make_ticks_raw(spark, chunk), cfg, state, stats_ticks_per_bar=4
        )
        got.extend(processed.select(*OUT_COLS).orderBy("tick_idx").collect())
        processed.unpersist()
        lo = hi

    assert len(got) == len(whole)
    for g, w in zip(got, whole):
        for c in OUT_COLS:
            assert g[c] == w[c], f"tick {w['tick_idx']} col {c} ({enc})"


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    points=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=40),
    intervals=st.lists(
        st.tuples(st.integers(min_value=0, max_value=300),
                  st.integers(min_value=0, max_value=80)),
        min_size=1, max_size=15,
    ),
    bin_size=st.sampled_from([1, 3, 10, 64, 301]),
)
@pytest.mark.heavy
def test_binned_range_join_equals_naive_property(spark, points, intervals, bin_size):
    """Random points/intervals/bin sizes: the binned equi-join always
    equals the naive inequality join (incl. empty results, zero-length
    intervals, bins larger than the whole domain)."""
    from pyspark.sql import functions as F

    from tickdatapipeline_spark.operators.rangejoin import binned_range_join

    pdf = spark.createDataFrame(
        [(1, i, t) for i, t in enumerate(points)], "k long, pid long, t long"
    )
    idf = spark.createDataFrame(
        [(1, j, lo, lo + span) for j, (lo, span) in enumerate(intervals)],
        "k long, iid long, lo long, hi long",
    )
    got = {
        (r.pid, r.iid)
        for r in binned_range_join(pdf, idf, ["k"], "t", "lo", "hi", bin_size).collect()
    }
    naive = {
        (i, j)
        for i, t in enumerate(points)
        for j, (lo, span) in enumerate(intervals)
        if lo <= t <= lo + span
    }
    assert got == naive


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),          # user
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(min_value=0, max_value=50),          # hours
        ),
        min_size=1, max_size=30, unique=True,
    ),
    window_h=st.sampled_from([1, 10, 24]),
)
@pytest.mark.heavy
def test_event_funnel_equals_naive_property(spark, events, window_h):
    """Random event streams: the distributed funnel equals a per-user
    Python walk of the stage machine (first qualifying event within the
    window, strictly after the previous stage's entry)."""
    from tickdatapipeline_spark.plans.beyond import event_funnel

    H = 3600 * 1_000_000
    win = window_h * H

    def naive():
        entered = {"view_1": [], "click_2": [], "purchase_3": []}
        users = {u for u, _t, _h in events}
        for u in sorted(users):
            ts = sorted((h * H, t) for uu, t, h in events if uu == u)
            t1 = min((x for x, t in ts if t == "view"), default=None)
            if t1 is None:
                continue
            entered["view_1"].append(0)
            t2 = min((x for x, t in ts if t == "click" and t1 < x <= t1 + win),
                     default=None)
            if t2 is None:
                continue
            entered["click_2"].append(t2 - t1)
            t3 = min((x for x, t in ts if t == "purchase" and t2 < x <= t2 + win),
                     default=None)
            if t3 is None:
                continue
            entered["purchase_3"].append(t3 - t1)
        return {
            s: (len(v), (sum(v) / len(v) / 1e6) if v else 0.0)
            for s, v in entered.items()
        }

    ev = spark.createDataFrame(
        [(u, t, h * H) for u, t, h in events],
        "user_id long, event_type string, tus long",
    )
    got = {r.stage: (r.n_users, r.avg_secs_from_view)
           for r in event_funnel(ev, window_us=win).collect()}
    want = naive()
    assert {s: c for s, (c, _a) in got.items()} == {s: c for s, (c, _a) in want.items()}
    for s in want:
        assert got[s][1] == pytest.approx(want[s][1], abs=1e-6), s


corpus_strategy = st.lists(
    st.integers(min_value=0, max_value=40),  # token count per doc
    min_size=1, max_size=40,
)


@given(ntoks=corpus_strategy, budget=st.integers(min_value=0, max_value=600),
       n_buckets=st.sampled_from([1, 4, 16]))
@SET
@pytest.mark.heavy
def test_token_budget_sample_property(spark, ntoks, budget, n_buckets):
    """The two-level plan equals the naive single-order scan for ANY
    corpus/budget/bucket count, and the admitted token total never
    overshoots budget by more than the last admitted doc."""
    from tickdatapipeline_spark.operators.text import h60, token_budget_sample

    rows = [(i, " ".join(f"t{j}" for j in range(n)), "en")
            for i, n in enumerate(ntoks)]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    hashes = {
        r.doc_id: r.h
        for r in d.select("doc_id", h60(
            F.concat(F.lit("budget:"), F.col("doc_id").cast("string"))).alias("h")
        ).collect()
    }
    order = sorted(range(len(ntoks)),
                   key=lambda i: (hashes[i] % n_buckets, hashes[i], i))
    run, want = 0, {}
    for i in order:
        if run < budget:
            want[i] = ntoks[i]
        run += ntoks[i]
    got = {r.doc_id: r.n_tokens
           for r in token_budget_sample(d, budget, n_buckets=n_buckets).collect()}
    assert got == want
    if want:
        assert sum(want.values()) <= budget + max(ntoks)


@given(ntoks=corpus_strategy, n_shards=st.sampled_from([1, 3, 8]))
@SET
@pytest.mark.heavy
def test_shard_assignments_property(spark, ntoks, n_shards):
    """Partition property for ANY corpus: every doc in exactly one
    shard, positions contiguous per shard, assignment matches the
    direct hash computation."""
    from tickdatapipeline_spark.operators.text import h60, shard_assignments

    rows = [(i, f"doc {i}", "en") for i in range(len(ntoks))]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    hashes = {
        r.doc_id: r.h
        for r in d.select("doc_id", h60(
            F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))).alias("h")
        ).collect()
    }
    got = {r.doc_id: (r.shard, r.pos) for r in shard_assignments(d, n_shards).collect()}
    assert set(got) == set(hashes)
    by_shard: dict = {}
    for doc_id, (shard, pos) in got.items():
        assert shard == hashes[doc_id] % n_shards
        by_shard.setdefault(shard, []).append((pos, doc_id))
    for shard, items in by_shard.items():
        items.sort()
        assert [p for p, _ in items] == list(range(len(items)))
        # within-shard order is (h, doc_id)
        assert [d_ for _, d_ in items] == sorted(
            (d_ for _, d_ in items), key=lambda x: (hashes[x], x))


@given(docs=st.lists(
    st.lists(st.sampled_from(["a", "b", "c", "dog"]), min_size=0, max_size=12),
    min_size=1, max_size=15,
))
@SET
@pytest.mark.heavy
def test_repetition_score_property(spark, docs):
    """For ANY corpus over a tiny vocabulary, every metric matches the
    naive Python computation and sits in [0, 1]."""
    from tickdatapipeline_spark.operators.text import repetition_score

    rows = [(i, " ".join(toks), "en") for i, toks in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.doc_id: r for r in repetition_score(d).collect()}
    for i, toks in enumerate(docs):
        r = got[i]
        n = len(toks)
        bigrams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        assert r.n_tokens == n
        for v in (r.dup_token_frac, r.top_token_frac, r.dup_bigram_frac):
            assert 0.0 <= v <= 1.0
        if n:
            assert r.dup_token_frac == pytest.approx(1 - len(set(toks)) / n, abs=1e-6)
            assert r.top_token_frac == pytest.approx(
                max(toks.count(t) for t in set(toks)) / n, abs=1e-6)
        else:
            assert (r.dup_token_frac, r.top_token_frac) == (0.0, 0.0)
        if bigrams:
            assert r.dup_bigram_frac == pytest.approx(
                1 - len(set(bigrams)) / len(bigrams), abs=1e-6)
        else:
            assert r.dup_bigram_frac == 0.0


@given(
    groups=st.lists(
        st.integers(min_value=0, max_value=40), min_size=1, max_size=5
    ),
    cap=st.integers(min_value=1, max_value=12),
)
@SET
@pytest.mark.heavy
def test_source_cap_property(spark, groups, cap):
    """source_cap equals the Python mirror of its documented two-phase
    rule (oversample band on h60('cap:'||id), rank by (h, doc_id),
    keep <= cap) for arbitrary source sizes and caps — including empty
    sources, sub-cap sources (pass through whole) and the band
    boundary arithmetic."""
    import hashlib

    from tickdatapipeline_spark.operators.text import source_cap

    rows = []
    ids_by_src: dict[str, list[int]] = {}
    next_id = 0
    for gi, n in enumerate(groups):
        src = f"s{gi}"
        ids_by_src[src] = []
        for _ in range(n):
            rows.append((next_id, "text", "en", src))
            ids_by_src[src].append(next_id)
            next_id += 1
    if not rows:
        return
    d = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {(r.source, r.doc_id): r.sample_rank
           for r in source_cap(d, cap).collect()}

    def h(doc_id):
        return int(hashlib.md5(f"cap:{doc_id}".encode()).hexdigest()[17:], 16)

    expect = {}
    for src, ids in ids_by_src.items():
        if not ids:
            continue
        frac = min(1.0, 2.0 * cap / len(ids))
        band = [i for i in ids if float(h(i)) < frac * float(1 << 60)]
        for rk, i in enumerate(sorted(band, key=lambda i: (h(i), i))[:cap], start=1):
            expect[(src, i)] = rk
    assert got == expect
    # cap is a hard ceiling; sub-cap sources survive whole
    per_src: dict[str, int] = {}
    for (src, _i) in got:
        per_src[src] = per_src.get(src, 0) + 1
    for src, n in per_src.items():
        assert n <= cap
    for src, ids in ids_by_src.items():
        if 0 < len(ids) <= cap * 2 and len(ids) <= cap:
            assert per_src.get(src, 0) == len(ids)


@given(vals=st.lists(
    st.tuples(st.sampled_from(["m", "z"]),
              st.integers(min_value=0, max_value=2000)),
    min_size=1, max_size=40,
))
@SET
@pytest.mark.heavy
def test_robust_anomalies_matches_numpy_mirror(spark, tmp_path_factory, vals):
    """events_value_robust_anomalies equals the numpy median/MAD mirror
    (doubled-integer medians, MAD-0 exclusion, top-N tie order) for
    arbitrary per-type value multisets."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tickdatapipeline_spark.plans.beyond import ROBUST_TOP_N, robust_anomalies_fn

    sf = tmp_path_factory.mktemp("robust")
    tbl = pa.table({
        "event_id": pa.array(range(len(vals)), pa.int64()),
        "ts": pa.array([i * 1000 for i in range(len(vals))], pa.timestamp("ns")),
        "user_id": pa.array([1] * len(vals), pa.int64()),
        "event_type": pa.array([t for t, _ in vals]),
        "value": pa.array([c / 100.0 for _, c in vals]),
        "props": pa.array(["{}"] * len(vals)),
    })
    pq.write_table(tbl, sf / "events.parquet")
    got = [(r.event_id, r.event_type, r.robust_z)
           for r in robust_anomalies_fn(spark, str(sf)).collect()]

    # mirror: doubled integer medians per type
    rows = []
    by_type: dict[str, list[tuple[int, int]]] = {}
    for i, (t, c) in enumerate(vals):
        by_type.setdefault(t, []).append((i, c))
    for t, members in by_type.items():
        cs = sorted(c for _, c in members)
        n = len(cs)
        med2 = cs[(n - 1) // 2] + cs[n // 2]
        dev2 = {i: abs(2 * c - med2) for i, c in members}
        ds = sorted(dev2.values())
        mad4 = ds[(n - 1) // 2] + ds[n // 2]
        if mad4 <= 0:
            continue
        for i, _ in members:
            z = (2 * dev2[i]) / mad4
            rows.append((i, t, np.floor(z * 1e6 + 0.5) / 1e6))
    rows.sort(key=lambda r: (-r[2], r[0]))
    assert got == rows[:ROBUST_TOP_N]


@given(texts=st.lists(
    st.text(alphabet="ab x", min_size=0, max_size=12), min_size=1, max_size=8,
))
@SET
@pytest.mark.heavy
def test_char_bigram_likelihood_matches_python_mirror(spark, texts):
    """char_bigram_likelihood equals a pure-Python mirror (normalize,
    corpus bigram/prefix counts, mean of occ * (c_bg/c_prefix)) on
    arbitrary tiny corpora over a 3-letter alphabet."""
    import re
    from collections import Counter

    from tickdatapipeline_spark.operators.text import char_bigram_likelihood

    d = docs_df_local(spark, texts)
    got = {r.doc_id: (r.n_bigrams, r.avg_bigram_p)
           for r in char_bigram_likelihood(d).collect()}

    norm = [re.sub(r"\s+", " ", t.strip().lower()) for t in texts]
    docbg = [Counter(s[i:i + 2] for i in range(len(s) - 1)) for s in norm]
    model: Counter = Counter()
    for c in docbg:
        model.update(c)
    pre: Counter = Counter()
    for bg, n in model.items():
        pre[bg[0]] += n
    expect = {}
    for i, c in enumerate(docbg):
        n_tot = sum(c.values())
        if n_tot == 0:
            continue
        acc = 0.0
        for bg in sorted(c):
            acc += float(c[bg]) * (float(model[bg]) / float(pre[bg[0]]))
        import numpy as np

        expect[i] = (n_tot, float(np.floor(acc / n_tot * 1e6 + 0.5) / 1e6))
    assert got == expect


def docs_df_local(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string",
    )


@given(words=st.lists(
    st.text(alphabet="abc", min_size=1, max_size=5), min_size=1, max_size=10,
))
@SET
@pytest.mark.heavy
def test_bpe_learn_merges_matches_python_mirror(spark, words):
    """bpe_learn_merges equals a pure-Python greedy BPE mirror (pair
    counts over the word-frequency table, argmax with count-DESC /
    pair-ASC ties, leftmost non-overlapping re-segmentation) on
    arbitrary small corpora — the string-replace encoding must never
    diverge from true symbol-level greedy merging."""
    from collections import Counter

    from tickdatapipeline_spark.operators.text import bpe_learn_merges

    d = docs_df_local(spark, [" ".join(words)])
    got = [(r.merge_idx, r.sym_a, r.sym_b, r.pair_count)
           for r in bpe_learn_merges(d, n_merges=3).collect()]

    freq = Counter(words)
    segs = {w: list(w) for w in freq}
    expect = []
    for k in range(1, 4):
        pairs: Counter = Counter()
        for w, n in freq.items():
            s = segs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += n
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((k, a, b, cnt))
        for w in segs:
            s, out, i = segs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    assert got == expect[:len(got)] and len(got) == len(expect)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    lengths=st.lists(
        st.tuples(st.sampled_from(["sA", "sB", "sC"]),
                  st.integers(min_value=1, max_value=30)),
        min_size=2, max_size=40,
    ),
)
@pytest.mark.heavy
def test_length_ks_equals_naive_property(spark, lengths, tmp_path_factory):
    """Random (source, length) samples: the distributed two-sample KS
    must equal a direct python computation of max |F1 - F2| over pooled
    values via the same integer cross-multiplication."""
    from tickdatapipeline_spark.plans.beyond import length_ks_fn

    sources = sorted({s for s, _l in lengths})
    if len(sources) < 2:
        return
    td = tmp_path_factory.mktemp("ks")
    rows = [(i, "x" * ln, "en", s, ln) for i, (s, ln) in enumerate(lengths)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{td}/documents.parquet")

    got = {(r.s1, r.s2): (r.n1, r.n2, r.ks_num)
           for r in length_ks_fn(spark, str(td)).collect()}

    import itertools

    want = {}
    by_src = {s: sorted(ln for ss, ln in lengths if ss == s) for s in sources}
    for s1, s2 in itertools.combinations(sources, 2):
        a, b = by_src[s1], by_src[s2]
        n1, n2 = len(a), len(b)
        pooled = sorted(set(a) | set(b))
        d = max(abs(sum(1 for x in a if x <= v) * n2
                    - sum(1 for x in b if x <= v) * n1) for v in pooled)
        want[(s1, s2)] = (n1, n2, d)
    assert got == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    events=st.lists(
        st.tuples(st.integers(min_value=0, max_value=100),   # hours offset
                  st.integers(min_value=100, max_value=99999)),  # value cents
        min_size=1, max_size=25, unique_by=lambda t: t[0],
    ),
)
@pytest.mark.heavy
def test_value_resample_equals_naive_property(spark, events, tmp_path_factory):
    """Random irregular series: the distributed 6h-grid interpolation
    must equal a python walk (linear between brackets, hold-last after
    the final event, null before the first), bit-for-bit through the
    shared floor rounding."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tickdatapipeline_spark.plans.beyond import RESAMPLE_STEP_US, value_resample_fn

    td = tmp_path_factory.mktemp("rs")
    H = 3600 * 1_000_000_000
    rows = sorted(events)
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([h * H for h, _v in rows], pa.timestamp("ns")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array(["m"] * len(rows)),
        "value": pa.array([v / 100.0 for _h, v in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(tbl, td / "events.parquet")

    got = {r.grid_s: r.v_interp
           for r in value_resample_fn(spark, str(td)).collect()}

    pts = [(h * H // 1000, v / 100.0) for h, v in rows]  # micros
    lo = pts[0][0] // RESAMPLE_STEP_US
    hi = pts[-1][0] // RESAMPLE_STEP_US
    want = {}
    for i in range(lo, hi + 1):
        t = i * RESAMPLE_STEP_US
        prevs = [(x, v) for x, v in pts if x <= t]
        nexts = [(x, v) for x, v in pts if x > t]
        if not prevs:
            want[t // 1_000_000] = None
            continue
        pt_, pv = prevs[-1]
        if not nexts:
            v = pv
        else:
            nt_, nv = nexts[0]
            v = pv + (nv - pv) * ((t - pt_) / (nt_ - pt_))
        want[t // 1_000_000] = math.floor(v * 1e6 + 0.5) / 1e6
    assert got == want


def _events_from_counts(tmp_path_factory, counts, label):
    """counts: list of per-user event multiplicities -> events.parquet
    (one type 'm', distinct users, ns timestamps)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    td = tmp_path_factory.mktemp(label)
    rows = []
    for u, n in enumerate(counts, start=1):
        for k in range(n):
            rows.append((len(rows), len(rows) * 1_000_000_000, u))
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array(["m"] * len(rows)),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(tbl, td / "events.parquet")
    return str(td)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(counts=st.lists(st.integers(min_value=1, max_value=40),
                       min_size=1, max_size=25))
@pytest.mark.heavy
def test_key_skew_gini_equals_naive_property(spark, counts, tmp_path_factory):
    """Random per-user count multisets: the histogram-built Gini (tied
    groups collapsed to cnt*(a*m + m(m+1)/2)) must equal the naive
    sorted rank-sum Σ(2i-n-1)x_(i) / (n Σx), bit-for-bit through the
    shared floor rounding — heavy ties, all-equal, and singleton cases
    included."""
    import math

    from tickdatapipeline_spark.plans.beyond import key_skew_fn

    sf = _events_from_counts(tmp_path_factory, counts, "gini")
    r = key_skew_fn(spark, sf).collect()[0]

    xs = sorted(counts)
    n, sx = len(xs), sum(xs)
    assert (r.n_users, r.n_events, r.max_user_events) == (n, sx, max(xs))
    assert r.top_user_share == math.floor(max(xs) / sx * 1e6 + 0.5) / 1e6
    if n > 1:
        six = sum((i + 1) * x for i, x in enumerate(xs))
        want = math.floor((2 * six - (n + 1) * sx) / (n * sx) * 1e6 + 0.5) / 1e6
        assert r.gini == want
    else:
        assert r.gini == 0.0


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(counts=st.lists(st.integers(min_value=1, max_value=40),
                       min_size=1, max_size=25))
@pytest.mark.heavy
def test_power_pareto_equals_naive_property(spark, counts, tmp_path_factory):
    """Random per-user count multisets: every decile row of the
    histogram-built Pareto curve must equal the naive 'sort desc, take
    top k, sum' walk — the tie-split algebra is exactly tie-invariant."""
    import math

    from tickdatapipeline_spark.plans.beyond import power_users_pareto_fn

    sf = _events_from_counts(tmp_path_factory, counts, "pareto")
    got = {r.decile: (r.n_top_users, r.events_covered, r.share)
           for r in power_users_pareto_fn(spark, sf).collect()}

    xs = sorted(counts, reverse=True)
    n, total = len(xs), sum(xs)
    want = {}
    for d in range(1, 11):
        k = (n * d) // 10
        if k < 1:
            continue
        covered = sum(xs[:k])
        want[d] = (k, covered, math.floor(covered / total * 1e6 + 0.5) / 1e6)
    assert got == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=12),
    min_size=1, max_size=8))
@pytest.mark.heavy
def test_ngram_repetition_matches_naive(spark, docs, tmp_path_factory):
    """Random tiny-vocab corpora: the pooled duplicate 2-/3-gram
    counts and integer permilles must equal the naive Python mirror —
    short docs (0-2 tokens) contribute zero grams, permille uses
    floor division."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tickdatapipeline_spark.plans.beyond import ngram_repetition_fn

    td = tmp_path_factory.mktemp("rep")
    texts = [" ".join(toks) for toks in docs]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, td / "documents.parquet")
    r = ngram_repetition_fn(spark, str(td)).collect()[0]

    def grams(toks, n):
        return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)] \
            if len(toks) >= n else []

    n2 = sum(len(grams(t, 2)) for t in docs)
    d2 = sum(len(set(grams(t, 2))) for t in docs)
    n3 = sum(len(grams(t, 3)) for t in docs)
    d3 = sum(len(set(grams(t, 3))) for t in docs)
    assert (r.n_docs, r.n_2grams, r.dup_2grams) == (len(docs), n2, n2 - d2)
    assert (r.n_3grams, r.dup_3grams) == (n3, n3 - d3)
    assert r.dup2_permille == ((n2 - d2) * 1000 // n2 if n2 else None)
    assert r.dup3_permille == ((n3 - d3) * 1000 // n3 if n3 else None)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(hours=st.lists(st.integers(min_value=0, max_value=6),  # count per hour
                      min_size=1, max_size=72))
@pytest.mark.heavy
def test_seasonal_anomalies_match_naive(spark, hours, tmp_path_factory):
    """Random hourly count series: the flagged set and every
    rel_abs_permille/direction must equal the naive mirror computed
    over the SAME gap-filled grid (leading/trailing zero-count hours
    outside [first, last] event never enter the grid)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tickdatapipeline_spark.plans.beyond import (
        SEASONAL_ANOM_THRESH_PM,
        seasonal_anomalies_fn,
    )

    if sum(hours) == 0:
        return
    td = tmp_path_factory.mktemp("seas")
    rows = []
    for h, c in enumerate(hours):
        for k in range(c):
            rows.append((len(rows), h * 3_600_000_000_000 + k))
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array(["m"] * len(rows)),
        "value": pa.array([1.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(tbl, td / "events.parquet")
    got = {r.hour_s: (r.rel_abs_permille, r.direction)
           for r in seasonal_anomalies_fn(spark, str(td)).collect()}

    # naive mirror over the trimmed grid
    lo = next(i for i, c in enumerate(hours) if c)
    hi = max(i for i, c in enumerate(hours) if c)
    grid = {h: hours[h] for h in range(lo, hi + 1)}
    base = {}
    for h, x in grid.items():
        s, n = base.get(h % 24, (0, 0))
        base[h % 24] = (s + x, n + 1)
    want = {}
    for h, x in grid.items():
        s, n = base[h % 24]
        if s > 0:
            rel = abs(x * n - s) * 1000 // s
            if rel >= SEASONAL_ANOM_THRESH_PM:
                want[h * 3600] = (rel, 1 if x * n - s >= 0 else -1)
    assert got == want


def test_tick_rule_carry_forward_golden(spark):
    """Tick-rule direction: uptick -> +1 until a downtick flips it;
    zero-ticks inherit; the leading run before any price change is
    NULL (unclassified) — Lee & Ready's tick test, pinned on a
    constructed two-stream frame (streams must not bleed into each
    other's carry-forward)."""
    from tickdatapipeline_spark.plans.market import tick_rule_dirs

    rows = [
        # stream 0: flat, flat, up, flat, down, down
        (0, 1, 10), (0, 2, 10), (0, 3, 11), (0, 4, 11), (0, 5, 9), (0, 6, 8),
        # stream 1: starts with a downtick immediately
        (1, 1, 50), (1, 2, 49), (1, 3, 49),
    ]
    df = spark.createDataFrame(rows, "stream long, line_no long, last long")
    got = {(r.stream, r.line_no): r.dir for r in tick_rule_dirs(df).collect()}
    assert got == {
        (0, 1): None, (0, 2): None, (0, 3): 1, (0, 4): 1, (0, 5): -1, (0, 6): -1,
        (1, 1): None, (1, 2): -1, (1, 3): -1,
    }


@given(closes=st.lists(st.integers(min_value=1, max_value=99999),
                       min_size=20, max_size=26))
@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bollinger_integer_inequality_matches_exact_rationals(closes):
    """The plan's integer k-sigma test (W*close - sum)^2 > k^2 *
    (W*sumsq - sum^2) must agree with the textbook |close - mean| >
    k*sigma evaluated in EXACT rational arithmetic (Fraction) — the
    no-float claim, not just a float approximation of it."""
    from fractions import Fraction

    from tickdatapipeline_spark.plans.market import BOLLINGER_K, BOLLINGER_W

    W, k2 = BOLLINGER_W, BOLLINGER_K * BOLLINGER_K
    for i in range(W - 1, len(closes)):
        win = closes[i - W + 1:i + 1]
        c, s, sq = closes[i], sum(win), sum(v * v for v in win)
        d = W * c - s
        upper_int = d > 0 and d * d > k2 * (W * sq - s * s)
        lower_int = d < 0 and d * d > k2 * (W * sq - s * s)
        mean = Fraction(s, W)
        var = Fraction(sq, W) - mean * mean
        dev = Fraction(c) - mean
        # |dev| > k*sigma  <=>  dev^2 > k^2 * var (all non-negative)
        upper_frac = dev > 0 and dev * dev > BOLLINGER_K**2 * var
        lower_frac = dev < 0 and dev * dev > BOLLINGER_K**2 * var
        assert upper_int == upper_frac and lower_int == lower_frac


def test_count_min_matches_python_mirror_and_never_underestimates(spark, tmp_path_factory):
    """Count-Min audit vs a naive Python mirror of the same md5-backed
    lanes on a constructed skewed corpus: estimates match the mirror's
    min-over-lanes cell counts exactly, and the CM guarantee
    est >= exact holds for every probe (overest never negative)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tickdatapipeline_spark.plans.beyond import (
        CM_DEPTH,
        CM_PROBE_K,
        CM_WIDTH,
        count_min_fn,
    )

    # skewed: user 7 dominates, a tail of colliding-ish small users
    users = [7] * 40 + [11] * 15 + [13] * 15 + list(range(100, 130))
    td = tmp_path_factory.mktemp("cm")
    n = len(users)
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([i * 1_000_000_000 for i in range(n)], pa.timestamp("ns")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(["m"] * n),
        "value": pa.array([1.0] * n),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(tbl, td / "events.parquet")

    def h60_py(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[17:32], 16)

    cells: dict[tuple[int, int], int] = {}
    exact: dict[int, int] = {}
    for u in users:
        exact[u] = exact.get(u, 0) + 1
        for j in range(CM_DEPTH):
            b = h60_py(f"cm{j}:{u}") % CM_WIDTH
            cells[(j, b)] = cells.get((j, b), 0) + 1
    top = sorted(exact, key=lambda u: (-exact[u], str(u)))[:CM_PROBE_K]
    want = {
        u: min(cells[(j, h60_py(f"cm{j}:{u}") % CM_WIDTH)] for j in range(CM_DEPTH))
        for u in top
    }

    got = {r.user_id: (r.exact_cnt, r.cm_est, r.overest)
           for r in count_min_fn(spark, str(td)).collect()}
    assert set(got) == set(want)
    for u, (ex, est, over) in got.items():
        assert ex == exact[u]
        assert est == want[u]
        assert over == est - ex and over >= 0


@given(prices=st.lists(st.integers(min_value=1, max_value=99999),
                       min_size=2, max_size=40),
       vols=st.data())
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.heavy
def test_liquidity_panel_matches_exact_fraction_mirror(spark, prices, vols):
    """ticks_liquidity_panel's Roll covariance / spread, Amihud sum,
    and variance ratio vs a naive Python mirror computing the SAME
    integer five-sum algebra (Fraction-exact until the final float) —
    pins sign conventions, pair/return counting, the NULL arms
    (cov >= 0 => no spread; zero 1-period variance => no VR), and the
    per-tick Amihud integer division."""
    import math
    from fractions import Fraction

    from tickdatapipeline_spark.plans.market import AMIHUD_SCALE, VR_Q, liquidity_panel

    volumes = [vols.draw(st.integers(min_value=1, max_value=5)) for _ in prices]
    rows = [(0, i + 1, p, v) for i, (p, v) in enumerate(zip(prices, volumes))]
    df = spark.createDataFrame(
        rows, "stream long, line_no long, last long, volume long")
    got = liquidity_panel(df).collect()[0]

    d = [b - a for a, b in zip(prices, prices[1:])]
    pairs = list(zip(d, d[1:]))  # (x = d_{t-1}, y = d_t)
    n = len(pairs)
    assert got.n_moves == len(d) and got.n_pairs == n
    if n > 0:
        sx, sy = sum(x for x, _ in pairs), sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        cov = Fraction(n * sxy - sx * sy, n * n)
        assert got.roll_cov == math.floor(float(cov) * 1e6 + 0.5) / 1e6
        if cov < 0:
            want = math.floor(2.0 * math.sqrt(-float(cov)) * 1e6 + 0.5) / 1e6
            assert got.roll_spread == want
        else:
            assert got.roll_spread is None
    am = [abs(m) * AMIHUD_SCALE // v for m, v in zip(d, volumes[1:])]
    assert got.amihud_sum_pm == sum(am)
    r = [b - a for a, b in zip(prices, prices[VR_Q:])]
    n1, nq = len(d), len(r)
    var1 = n1 * sum(m * m for m in d) - sum(d) ** 2
    if nq > 0 and var1 > 0:
        varq = nq * sum(x * x for x in r) - sum(r) ** 2
        vr = (varq / (float(nq) * float(nq))) / (
            float(VR_Q) * (var1 / (float(n1) * float(n1))))
        assert got[f"vr{VR_Q}"] == math.floor(vr * 1e6 + 0.5) / 1e6
    else:
        assert got[f"vr{VR_Q}"] is None


def test_kyle_lambda_golden(spark):
    """Kyle's lambda on a constructed two-stream frame vs hand-computed
    OLS of price change on tick-rule-signed volume: stream 0 has a
    known positive-impact pattern; stream 1's leading unclassified run
    is excluded from the regression."""
    import math

    from tickdatapipeline_spark.plans.market import kyle_lambda

    rows = [
        # stream 0: prices 10,12,12,11 vols 1,2,3,4
        (0, 1, 10, 1), (0, 2, 12, 2), (0, 3, 12, 3), (0, 4, 11, 4),
        # stream 1: flat then one downtick: 5,5,4
        (1, 1, 5, 9), (1, 2, 5, 9), (1, 3, 4, 2),
    ]
    t = spark.createDataFrame(
        rows, "stream long, line_no long, last long, volume long")
    got = {r.stream: r for r in kyle_lambda(t).collect()}
    # stream 0 observations: t2 (dir +1, x=+2, y=+2), t3 (carry +1,
    # x=+3, y=0), t4 (dir -1, x=-4, y=-1); t1 has NULL y and NULL dir.
    xs, ys = [2, 3, -4], [2, 0, -1]
    n = 3
    assert (got[0].n_obs, got[0].sx, got[0].sy) == (n, sum(xs), sum(ys))
    assert got[0].sxy == sum(a * b for a, b in zip(xs, ys))
    assert got[0].sxx == sum(a * a for a in xs)
    num = n * got[0].sxy - got[0].sx * got[0].sy
    den = n * got[0].sxx - got[0].sx ** 2
    assert got[0].kyle_lambda == math.floor(num / den * 1e6 + 0.5) / 1e6
    # stream 1: the flat t2 precedes any move -> excluded; only the
    # downtick observes (x=-2, y=-1) -> degenerate single-point
    # regression (vx == 0) -> NULL lambda, n_obs 1
    assert (got[1].n_obs, got[1].sx, got[1].sy) == (1, -2, -1)
    assert got[1].kyle_lambda is None and got[1].impact_corr is None


def test_vol_signature_nonoverlapping_counts(spark):
    """Volatility-signature sampling: for a single 9-tick stream the
    q-grids are line_no 1,3,5,7,9 (q=2) etc., each consecutive-grid
    move counted exactly once, and RV at q=1 equals the sum of squared
    tick moves (= the realized-variance estimator's total)."""
    from tickdatapipeline_spark.plans import market as M

    prices = [10, 12, 11, 11, 15, 14, 14, 13, 16]
    rows = [(0, i + 1, p) for i, p in enumerate(prices)]
    t = spark.createDataFrame(rows, "stream long, line_no long, last long")
    agg = {r.q: (r.n_ret, r.rv) for r in M.vol_signature(t).collect()}

    def mirror(q):
        grid = prices[::q]
        ds = [b - a for a, b in zip(grid, grid[1:])]
        return (len(ds), sum(x * x for x in ds))

    for q in M.SIGNATURE_QS:
        assert agg[q] == mirror(q)
    # q=1 total == realized variance total over the whole stream
    assert agg[1][1] == sum((b - a) ** 2 for a, b in zip(prices, prices[1:]))


def test_lpa_communities_matches_python_mirror(spark):
    """Deterministic LPA vs a naive Python mirror of the same
    synchronous min-label-tie recurrence on two 4-cliques joined by a
    single bridge edge: the mirror must agree edge-for-edge, and the
    two cliques must land in DIFFERENT communities (where connected
    components would merge them through the bridge)."""
    from collections import Counter

    from tickdatapipeline_spark.operators.dedup import lpa_communities

    cliqueA = [1, 2, 3, 4]
    cliqueB = [10, 11, 12, 13]
    pairs = (
        [(a, b) for i, a in enumerate(cliqueA) for b in cliqueA[i + 1:]]
        + [(a, b) for i, a in enumerate(cliqueB) for b in cliqueB[i + 1:]]
        + [(4, 10)]  # the accidental bridge
    )
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    iters = 4
    got = {(r.node, r.community)
           for r in lpa_communities(df, "doc_a", "doc_b", iters=iters).collect()}

    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {n: n for n in adj}
    for _ in range(iters):
        labels = {
            n: min(
                lab for lab, c in Counter(
                    labels[m] for m in adj[n]).items()
                if c == max(Counter(labels[m] for m in adj[n]).values())
            )
            for n in adj
        }
    assert got == set(labels.items())
    comm = dict(got)
    assert len({comm[n] for n in cliqueA}) == 1
    assert len({comm[n] for n in cliqueB}) == 1
    assert comm[1] != comm[11]


def test_lee_ready_golden(spark):
    """Lee & Ready on hand-built quotes: above-midpoint prints are
    buys, below-mid sells, exact-midpoint ties fall back to the tick
    rule (inheriting the last move's sign), a leading at-mid run stays
    unclassified; quoted and 2x-effective spreads accumulate as exact
    integers."""
    from tickdatapipeline_spark.plans.market import lee_ready

    rows = [
        # (stream, line_no, last, volume, bq, aq) — mid = (bq+aq)/2
        (0, 1, 100, 1, 99, 101),   # last == mid -> tie, no prior move: NULL
        (0, 2, 103, 2, 100, 104),  # mid 102 -> buy (quote rule)
        (0, 3, 101, 3, 100, 104),  # mid 102 -> sell (quote rule)
        (0, 4, 101, 4, 98, 104),   # mid 101 -> tie -> tick rule: last
                                   # move was down (103->101) -> sell
    ]
    t = spark.createDataFrame(
        rows,
        "stream long, line_no long, last long, volume long, bq long, aq long")
    r = lee_ready(t).collect()[0]
    assert (r.n_ticks, r.n_quote_rule, r.n_tick_fallback) == (4, 2, 1)
    assert (r.buy_volume, r.sell_volume, r.unclassified_volume) == (2, 7, 1)
    # quoted spreads: 2 + 4 + 4 + 6 = 16; es2 = |2*last - bq - aq| =
    # 2*|price - mid| (the effective spread itself): 0 + 2 + 2 + 0 = 4
    # -> avg effective spread = 4 / 4 = 1.0
    assert (r.quoted_spread_sum, r.es2_sum) == (16, 4)
    assert r.avg_quoted_spread == 4.0 and r.avg_effective_spread == 1.0


def test_lee_ready_fixture_exercises_tie_fallback(spark):
    """The parity fixture's deterministic quote widening must hit all
    three classification paths — quote-rule rows, at-midpoint
    tick-rule fallbacks, AND an unclassified residue is not required
    but the first two are: a dead tie path would let a fallback
    wiring bug pass the full parity suite."""
    from tickdatapipeline_spark.plans.market import lee_ready_fn

    rows = lee_ready_fn(spark, "/root/testdata/sf0.001").collect()
    assert sum(r.n_quote_rule for r in rows) > 0
    assert sum(r.n_tick_fallback for r in rows) > 0


@given(docs=st.lists(
    st.tuples(
        st.sampled_from(["sa", "sb"]),
        st.lists(st.sampled_from(list("abcde")), min_size=0, max_size=12),
    ),
    min_size=1, max_size=8,
))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@pytest.mark.heavy
def test_dup_span_coverage_matches_python_mirror(spark, docs):
    """Random tiny-vocab corpora (collisions everywhere): the plan's
    per-source pooled span coverage equals a naive Python mirror of
    the same contract — distinct-doc df>=2 grams, interval union per
    doc, integer permille — across adjacent/overlapping/nested island
    layouts the single golden cannot enumerate."""
    from tickdatapipeline_spark.operators.text import dup_span_coverage

    N = 3
    rows = [(i + 1, " ".join(toks), src) for i, (src, toks) in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: (r.n_docs, r.docs_with_dup, r.total_tokens,
                      r.covered_tokens, r.coverage_permille)
           for r in dup_span_coverage(d, N).collect()}

    gram_docs: dict[tuple, set] = {}
    for doc_id, text, _src in rows:
        toks = text.split()
        for i in range(len(toks) - N + 1):
            gram_docs.setdefault(tuple(toks[i:i + N]), set()).add(doc_id)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    want: dict[str, list] = {}
    for doc_id, text, src in rows:
        toks = text.split()
        covered = set()
        for i in range(len(toks) - N + 1):
            if tuple(toks[i:i + N]) in dup:
                covered.update(range(i, i + N))
        want.setdefault(src, []).append((len(toks), len(covered)))
    for src, per_doc in want.items():
        n_docs = len(per_doc)
        with_dup = sum(1 for _n, c in per_doc if c > 0)
        tot = sum(n for n, _c in per_doc)
        cov = sum(c for _n, c in per_doc)
        assert got[src] == (n_docs, with_dup, tot, cov,
                            cov * 1000 // tot if tot else None), src


@given(closes=st.lists(st.integers(min_value=1, max_value=99999),
                       min_size=14, max_size=40),
       split=st.integers(min_value=0, max_value=40))
@settings(max_examples=60, deadline=None)
def test_wilder_rsi_step_matches_fraction_mirror_and_chunk_invariant(
        closes, split):
    """The shared Wilder stepper vs an EXACT rational (Fraction) mirror
    of the textbook recurrence: per-emitted-bar averages agree to float
    accumulation error (1e-9 relative), RSI stays in [0, 100], and the
    emit schedule (first bar with W trailing moves onward) matches.
    Also the stream==batch property at stepper level: feeding the same
    closes in two chunks with the carried state is bit-identical to
    one shot — the contract the GroupState twin rides on."""
    from fractions import Fraction

    from tickdatapipeline_spark.operators.stateful import (
        WILDER_STATE0,
        _wilder_rsi_step,
    )

    W = 14
    bar_ids = list(range(len(closes)))
    out, _ = _wilder_rsi_step(bar_ids, closes, WILDER_STATE0, W)

    # exact-rational mirror
    moves = [closes[i] - closes[i - 1] for i in range(1, len(closes))]
    gains = [m if m > 0 else 0 for m in moves]
    losses = [-m if m < 0 else 0 for m in moves]
    mirror = []
    ag = al = None
    for i in range(len(moves)):
        if i == W - 1:
            ag = Fraction(sum(gains[:W]), W)
            al = Fraction(sum(losses[:W]), W)
        elif i >= W:
            ag = (ag * (W - 1) + gains[i]) / W
            al = (al * (W - 1) + losses[i]) / W
        if ag is not None:
            s = ag + al
            rsi = None if s == 0 else float(100 * ag / s)
            mirror.append((i + 1, float(ag), float(al), rsi))

    assert [r[0] for r in out] == [r[0] for r in mirror]  # emit schedule
    for (b, g, lo, r), (mb, mg, ml, mr) in zip(out, mirror):
        assert abs(g - mg) <= 1e-9 * max(1.0, abs(mg))
        assert abs(lo - ml) <= 1e-9 * max(1.0, abs(ml))
        assert (r is None) == (mr is None)
        if r is not None:
            assert 0.0 <= r <= 100.0
            assert abs(r - mr) <= 1e-7

    # chunk invariance (bit-exact, not tolerance)
    k = min(split, len(closes))
    o1, st1 = _wilder_rsi_step(bar_ids[:k], closes[:k], WILDER_STATE0, W)
    o2, _ = _wilder_rsi_step(bar_ids[k:], closes[k:], st1, W)
    assert o1 + o2 == out
