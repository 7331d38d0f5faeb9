"""End-to-end daily-delta loop (delta_loop.run_daily_delta).

The pieces (index appends, index probes, upsert, TTL) are each pinned
in their own suites; THIS suite pins the seams between them on a 3-day
fixture with planted duplicates of every class the loop must catch:

- intra-day text near-dups (day 1 and day 2 each plant a pair),
- cross-day text near-dups against the persisted LSH index
  (day 2 dups a day-1 keeper; day 3 dups a DAY-2 keeper — proving the
  day-2 append actually landed),
- cross-day embedding near-dups against the persisted ANN index
  (day 2 and day 3 each plant one against an earlier keeper),

then proves: replay idempotency AFTER later days landed (the
exclude-own-shard contract), append-grown indexes row-identical to
from-scratch rebuilds over the kept corpus, and TTL expiry.
"""
import pytest
from pyspark.sql import functions as F

from tickdatapipeline_spark.delta_loop import run_daily_delta

CENTS = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])]


def _text(seed: int, mutate: bool = False) -> str:
    toks = [f"t{seed}w{j}" for j in range(12)]
    if mutate:  # change the last token: 9 of 10 3-shingles shared,
        toks[-1] = f"t{seed}MUT"  # exact Jaccard 9/11 ~ 0.82 >= 0.5
    return " ".join(toks)


# pairwise cosines of distinct directions all < 0.96; dups reuse the
# exact vector (cosine 1.0)
VEC = {
    0: [1.0, 0.0, 0.0, 0.0],
    1: [0.0, 1.0, 0.0, 0.0],
    2: [0.0, 0.0, 1.0, 0.0],
    3: [0.0, 0.0, 0.0, 1.0],
    4: [1.0, 1.0, 0.0, 0.0],
    5: [1.0, 0.0, 1.0, 0.0],
    10: [0.0, 1.0, 0.0, 1.0],
    11: [1.0, 1.0, 1.0, 0.0],
    12: [1.0, 2.0, 0.0, 0.0],
    13: [2.0, 1.0, 0.0, 1.0],
    14: [0.0, 0.0, 0.0, 1.0],   # == vec 3 -> ANN drop on day 2
    20: [1.0, 0.0, 0.0, 0.0],   # never checked (text-dropped first)
    21: [1.0, 2.0, 0.0, 0.0],   # == vec 12 -> ANN drop on day 3
    22: [0.0, 0.0, 1.0, 2.0],
}

DAYS = {
    "2024-01-01": [
        (0, _text(100)), (1, _text(101)), (2, _text(102)),
        (3, _text(103)), (4, _text(104)), (5, _text(104, mutate=True)),
    ],
    "2024-01-02": [
        (10, _text(102, mutate=True)),   # text-dups day-1 doc 2
        (11, _text(111)), (12, _text(112)),
        (13, _text(112, mutate=True)),   # intra-day pair with 12
        (14, _text(114)),                # embedding-dups day-1 doc 3
    ],
    "2024-01-03": [
        (20, _text(111, mutate=True)),   # text-dups day-2 keeper 11
        (21, _text(121)),                # embedding-dups day-2 keeper 12
        (22, _text(122)),
    ],
}


def _shard(spark, day):
    docs = spark.createDataFrame(DAYS[day], "doc_id long, text string")
    emb = spark.createDataFrame(
        [(i, VEC[i]) for i, _ in DAYS[day]],
        "vec_id long, embedding array<double>")
    return docs, emb


def _run(spark, wh, day, **kw):
    docs, emb = _shard(spark, day)
    return run_daily_delta(
        spark, docs, emb, wh, day,
        ann_centroids=CENTS, n_cells=2, nprobe=2, **kw)


def _corpus_rows(spark, wh):
    # partition-type inference reads 'day' back as DATE; compare in
    # string space (the value domain the runner writes)
    return sorted((r.doc_id, str(r.day)) for r in
                  spark.read.parquet(f"{wh}/corpus").collect())


def _index_state(spark, wh):
    bands = sorted(map(tuple, spark.read.parquet(f"{wh}/text_index/bands")
                       .drop("shard").collect()))
    sh = sorted(map(tuple, spark.read.parquet(f"{wh}/text_index/shingles")
                    .drop("shard").collect()))
    vecs = sorted((r.vec_id, r.cell, tuple(r.v)) for r in
                  spark.read.parquet(f"{wh}/ann_index/vectors").collect())
    return bands, sh, vecs


EXPECT_KEPT = {
    "2024-01-01": {0, 1, 2, 3, 4},
    "2024-01-02": {11, 12},
    "2024-01-03": {22},
}


@pytest.mark.heavy
def test_daily_delta_three_days(spark, tmp_path):
    wh = str(tmp_path / "wh")

    r1 = _run(spark, wh, "2024-01-01")
    assert (r1["n_in"], r1["n_intra_kept"], r1["n_text_kept"],
            r1["n_kept"]) == (6, 5, 5, 5)
    assert r1["bootstrapped_text"] and r1["bootstrapped_ann"]

    r2 = _run(spark, wh, "2024-01-02")
    assert (r2["n_in"], r2["n_intra_kept"], r2["n_text_kept"],
            r2["n_emb_checked"], r2["n_kept"]) == (5, 4, 3, 3, 2)
    assert not r2["bootstrapped_text"] and not r2["bootstrapped_ann"]

    r3 = _run(spark, wh, "2024-01-03")
    assert (r3["n_in"], r3["n_intra_kept"], r3["n_text_kept"],
            r3["n_kept"]) == (3, 3, 2, 1)

    expect = sorted((d, day) for day, ids in EXPECT_KEPT.items()
                    for d in ids)
    assert _corpus_rows(spark, wh) == expect

    # --- replay day 2 AFTER day 3 landed: the exclude-own-shard
    # contract means it must NOT see its own appended signatures and
    # must converge to the identical warehouse state and counters
    before = (_corpus_rows(spark, wh), *_index_state(spark, wh))
    r2b = _run(spark, wh, "2024-01-02")
    assert r2b == r2
    assert (_corpus_rows(spark, wh), *_index_state(spark, wh)) == before

    # --- append-grown indexes are row-identical to from-scratch
    # rebuilds over the kept corpus (same params, same centroids)
    kept_ids = sorted(i for ids in EXPECT_KEPT.values() for i in ids)
    all_docs = {i: t for day in DAYS for i, t in DAYS[day]}
    union_docs = spark.createDataFrame(
        [(i, all_docs[i]) for i in kept_ids], "doc_id long, text string")
    union_emb = spark.createDataFrame(
        [(i, VEC[i]) for i in kept_ids], "vec_id long, embedding array<double>")
    from tickdatapipeline_spark.operators.dedup import write_corpus_index
    from tickdatapipeline_spark.operators.similarity import write_ann_index
    ref = str(tmp_path / "ref")
    write_corpus_index(union_docs, f"{ref}/text_index")
    write_ann_index(union_emb, f"{ref}/ann_index", n_cells=2,
                    centroids=CENTS)
    got_b, got_s, got_v = _index_state(spark, wh)
    ref_b, ref_s, ref_v = _index_state(spark, ref)
    assert got_b == ref_b
    assert got_s == ref_s
    assert got_v == ref_v

    # --- TTL: a later run with retention expires day-1's partition
    # (directory surgery; indexes keep their shards by contract)
    r3b = _run(spark, wh, "2024-01-03", retain_before="2024-01-02")
    assert r3b["dropped_partitions"] == ["2024-01-01"]
    assert _corpus_rows(spark, wh) == sorted(
        (d, day) for day, ids in EXPECT_KEPT.items()
        if day != "2024-01-01" for d in ids)


@pytest.mark.heavy
def test_daily_delta_day1_replay(spark, tmp_path):
    """The bootstrap day itself must be replayable: its signatures live
    under shard=<day1> (NOT shard=base), so the replay's own-shard
    exclusion sees an empty corpus and keeps the same survivors — a
    write_corpus_index-style bootstrap would self-dedup day 1 to zero
    here."""
    wh = str(tmp_path / "wh")
    r1 = _run(spark, wh, "2024-01-01")
    state = (_corpus_rows(spark, wh), *_index_state(spark, wh))
    r1b = _run(spark, wh, "2024-01-01")
    assert r1b["n_kept"] == r1["n_kept"] == 5
    assert not r1b["bootstrapped_text"]  # index exists on replay
    assert (_corpus_rows(spark, wh), *_index_state(spark, wh)) == state


@pytest.mark.heavy
def test_daily_delta_trained_bootstrap(spark, tmp_path):
    """The DEFAULT bootstrap quantizer is now kmeans_train over the
    first day's kept vectors (r11 verdict #3), not the lowest-id
    stand-in: training must actually move the centroids, the 3-day
    outcome must match (nprobe = n_cells probes every cell, so recall
    is exact whatever the quantizer), replay stays idempotent, and the
    append-grown index must equal a from-scratch rebuild under the
    TRAINED centroids read back off the warehouse."""
    wh = str(tmp_path / "wh")

    def run_day(day):
        docs, emb = _shard(spark, day)
        return run_daily_delta(spark, docs, emb, wh, day,
                               n_cells=2, nprobe=2)  # no ann_centroids

    r1 = run_day("2024-01-01")
    assert r1["bootstrapped_ann"] and r1["n_kept"] == 5
    cents = sorted((r.cell, tuple(r.c)) for r in
                   spark.read.parquet(f"{wh}/ann_index/centroids").collect())
    # raw seeds would be kept vecs 0/1 verbatim; Lloyd's must have
    # moved cell 0 (it absorbs vecs 2/3/4 on the tie-to-lowest-cell
    # rule, pulling its centroid off the axis)
    assert cents[0][1] != tuple(VEC[0])
    assert len(cents) == 2

    r2 = run_day("2024-01-02")
    r3 = run_day("2024-01-03")
    assert (r2["n_kept"], r3["n_kept"]) == (2, 1)
    assert _corpus_rows(spark, wh) == sorted(
        (d, day) for day, ids in EXPECT_KEPT.items() for d in ids)

    # replay after later days: identical counters and warehouse state
    before = (_corpus_rows(spark, wh), *_index_state(spark, wh))
    assert run_day("2024-01-02") == r2
    assert (_corpus_rows(spark, wh), *_index_state(spark, wh)) == before

    # append-grown == rebuild under the SAME trained centroids
    from tickdatapipeline_spark.operators.similarity import write_ann_index
    kept_ids = sorted(i for ids in EXPECT_KEPT.values() for i in ids)
    union_emb = spark.createDataFrame(
        [(i, VEC[i]) for i in kept_ids], "vec_id long, embedding array<double>")
    ref = str(tmp_path / "ref")
    write_ann_index(union_emb, f"{ref}/ann_index", n_cells=2,
                    centroids=[(c, list(v)) for c, v in cents])
    got_v = sorted((r.vec_id, r.cell, tuple(r.v)) for r in
                   spark.read.parquet(f"{wh}/ann_index/vectors").collect())
    ref_v = sorted((r.vec_id, r.cell, tuple(r.v)) for r in
                   spark.read.parquet(f"{ref}/ann_index/vectors").collect())
    assert got_v == ref_v


@pytest.mark.heavy
def test_daily_delta_degenerate_bootstrap_falls_back(spark, tmp_path):
    """A bootstrap day with fewer kept vectors than cells skips the
    k-means (every vector IS a centroid — training is vacuous) and
    keeps the raw seeds, and the loop still completes."""
    wh = str(tmp_path / "wh")
    docs = spark.createDataFrame([(7, _text(700))], "doc_id long, text string")
    emb = spark.createDataFrame([(7, VEC[4])],
                                "vec_id long, embedding array<double>")
    r = run_daily_delta(spark, docs, emb, wh, "2024-01-01",
                        n_cells=2, nprobe=2)
    assert r["bootstrapped_ann"] and r["n_kept"] == 1
    cents = [(c.cell, tuple(c.c)) for c in
             spark.read.parquet(f"{wh}/ann_index/centroids").collect()]
    assert cents == [(0, tuple(VEC[4]))]  # untrained raw seed


@pytest.mark.heavy
def test_daily_delta_bootstrap_crash_replay(spark, tmp_path):
    """A crash in the bootstrap window — after both empty base-index
    writes landed but before the day's appends — must be recoverable by
    plain replay. The trap: centroids exist, so the replay skips the
    bootstrap branch and step 3 READS {ann_index}/vectors; a
    partitionBy-with-zero-rows write lands no parquet files, so without
    the schema anchor (similarity._anchor_vectors_schema) that read
    dies with UNABLE_TO_INFER_SCHEMA on every replay — permanent,
    manual-surgery-only failure of the advertised replay idempotency."""
    from tickdatapipeline_spark.operators.dedup import write_corpus_index
    from tickdatapipeline_spark.operators.similarity import write_ann_index

    wh = str(tmp_path / "wh")
    docs, emb = _shard(spark, "2024-01-01")
    # reproduce the exact crash state run_daily_delta step 4 leaves:
    # empty shard=base for both indexes, no day shard, no corpus
    write_corpus_index(docs.limit(0), f"{wh}/text_index")
    write_ann_index(emb.limit(0), f"{wh}/ann_index", n_cells=2,
                    centroids=CENTS)
    # the empty vectors table must be READABLE (the anchor contract)
    assert spark.read.parquet(f"{wh}/ann_index/vectors").count() == 0

    r = _run(spark, wh, "2024-01-01")
    # replay takes the non-bootstrap path (indexes exist) and converges
    # to the normal day-1 outcome
    assert not r["bootstrapped_text"] and not r["bootstrapped_ann"]
    assert r["n_kept"] == 5
    assert {d for d, _ in _corpus_rows(spark, wh)} == EXPECT_KEPT["2024-01-01"]
    vecs = {v.vec_id for v in
            spark.read.parquet(f"{wh}/ann_index/vectors").collect()}
    assert vecs == EXPECT_KEPT["2024-01-01"]


@pytest.mark.heavy
def test_append_ann_index_empty_shard_readable(spark, tmp_path):
    """An all-dropped day appends an EMPTY shard; the index must stay
    readable and the empty shard must not poison later probes."""
    from tickdatapipeline_spark.operators.similarity import (
        append_ann_index, embedding_dedup_against_index, write_ann_index)

    idx = str(tmp_path / "ann")
    _, emb = _shard(spark, "2024-01-01")
    write_ann_index(emb, idx, n_cells=2, centroids=CENTS)
    append_ann_index(emb.limit(0), idx, shard="2024-01-02")
    vecs = spark.read.parquet(f"{idx}/vectors")
    assert vecs.count() == emb.count()
    kept = embedding_dedup_against_index(emb, idx, threshold=0.96, nprobe=2,
                                         exclude_shard="2024-01-01")
    # base shard still indexed -> every probe self-hits and drops
    assert kept.count() == 0


def test_daily_delta_rejects_bad_day(spark, tmp_path):
    docs, emb = _shard(spark, "2024-01-01")
    with pytest.raises(ValueError, match="invalid day"):
        run_daily_delta(spark, docs, emb, str(tmp_path / "w"), "a/b")


@pytest.mark.heavy
def test_daily_delta_text_only(spark, tmp_path):
    """emb_shard=None runs the text-only loop: no ANN index is created
    and embedding-planted dups (doc 14/21) survive on text alone."""
    wh = str(tmp_path / "wh")
    import os
    for day in DAYS:
        docs, _ = _shard(spark, day)
        run_daily_delta(spark, docs, None, wh, day)
    assert not os.path.exists(f"{wh}/ann_index")
    got = {d for d, _ in _corpus_rows(spark, wh)}
    assert got == {0, 1, 2, 3, 4, 11, 12, 14, 21, 22}


@pytest.mark.heavy
def test_daily_delta_partial_embedding_coverage(spark, tmp_path):
    """Docs WITHOUT a vector pass on text alone (the documented
    contract: vectors gate only docs that have one), while docs with a
    near-dup vector still drop — pinned on a day-2 shard whose
    embeddings cover only part of the shard."""
    wh = str(tmp_path / "wh")
    _run(spark, wh, "2024-01-01")

    docs = spark.createDataFrame(
        [(50, _text(501)),   # has a near-dup vector -> dropped
         (51, _text(502)),   # has a novel vector -> kept
         (52, _text(503))],  # NO vector -> kept on text alone
        "doc_id long, text string")
    emb = spark.createDataFrame(
        [(50, VEC[3]),                  # == day-1 doc 3's vector
         (51, [3.0, 0.0, 1.0, 0.0])],   # novel direction
        "vec_id long, embedding array<double>")
    r = run_daily_delta(spark, docs, emb, wh, "2024-01-02",
                        ann_centroids=CENTS, n_cells=2, nprobe=2)
    assert r["n_emb_checked"] == 2  # only covered docs probed
    assert r["n_kept"] == 2
    kept = {d for d, day in _corpus_rows(spark, wh) if day == "2024-01-02"}
    assert kept == {51, 52}
    # the no-vector doc must not have invented an index vector either
    vecs = {r.vec_id for r in
            spark.read.parquet(f"{wh}/ann_index/vectors").collect()}
    assert 52 not in vecs and 51 in vecs and 50 not in vecs


# ================= streaming twin (live ingest) =================


def _write_jsonl(in_dir, fname, rows, i):
    """rows: (doc_id, text, emb-or-None); mtime-ordered micro-batches."""
    import json
    import os
    p = in_dir / fname
    with open(p, "w") as f:
        for d, t, e in rows:
            f.write(json.dumps(
                {"doc_id": d, "text": t, "embedding": e}) + "\n")
    os.utime(p, (1700000000 + i, 1700000000 + i))
    return p


def _stream_day2_rows():
    return [(i, t, VEC.get(i)) for i, t in DAYS["2024-01-02"]]


def _index_rows_ignoring_shard(spark, wh):
    """Index state in SHARD-BLIND row space — the stream twin lands the
    same rows under <day>.b<n> subshards (compaction normalizes)."""
    bands = sorted(map(tuple, spark.read.parquet(f"{wh}/text_index/bands")
                       .drop("shard").collect()))
    sh = sorted(map(tuple, spark.read.parquet(f"{wh}/text_index/shingles")
                    .drop("shard").collect()))
    vecs = sorted((r.vec_id, r.cell, tuple(r.v)) for r in
                  spark.read.parquet(f"{wh}/ann_index/vectors").collect())
    return bands, sh, vecs


@pytest.mark.heavy
def test_streaming_delta_equals_batch_loop(spark, tmp_path):
    """Stream-ingesting day 2 across three micro-batches (a text dup of
    an EARLIER micro-batch's keeper deliberately split into its own
    later batch) yields the same corpus keep/drop set and the same
    index rows (shard-blind) as run_daily_delta on the identical day-2
    shard — one keep/drop policy for live ingest and nightly curation
    (r11 verdict #2)."""
    wh_s, wh_b = str(tmp_path / "s"), str(tmp_path / "b")
    _run(spark, wh_s, "2024-01-01")
    _run(spark, wh_b, "2024-01-01")
    _run(spark, wh_b, "2024-01-02")  # the batch-loop reference

    from tickdatapipeline_spark.delta_loop import run_streaming_delta

    rows = _stream_day2_rows()
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # doc 13 text-dups doc 12 but arrives a BATCH LATER: only the
    # include-earlier-subshards text probe catches it
    _write_jsonl(in_dir, "b0.json", rows[:2], 0)   # 10 (x-day dup), 11
    _write_jsonl(in_dir, "b1.json", rows[2:3], 1)  # 12
    _write_jsonl(in_dir, "b2.json", rows[3:], 2)   # 13 (dups 12), 14 (emb dup)
    counters: list = []
    q = run_streaming_delta(
        spark, str(in_dir), wh_s, "2024-01-02", str(tmp_path / "ckpt"),
        nprobe=2, counters=counters)  # default staged corpus mode
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # staged mode: keepers sit in corpus_live until the day-close fold
    from tickdatapipeline_spark.delta_loop import fold_live_corpus

    assert fold_live_corpus(spark, wh_s, "2024-01-02") == 2
    import os
    assert not os.path.exists(f"{wh_s}/corpus_live/day=2024-01-02")
    assert fold_live_corpus(spark, wh_s, "2024-01-02") == 0  # replay no-op

    assert _corpus_rows(spark, wh_s) == _corpus_rows(spark, wh_b)
    assert (_index_rows_ignoring_shard(spark, wh_s)
            == _index_rows_ignoring_shard(spark, wh_b))
    assert [c["n_kept"] for c in counters] == [1, 1, 0]
    kept2 = {d for d, day in _corpus_rows(spark, wh_s)
             if day == "2024-01-02"}
    assert kept2 == EXPECT_KEPT["2024-01-02"]


@pytest.mark.heavy
def test_streaming_delta_restart_and_replay(spark, tmp_path):
    """(a) A mid-shard RESTART (new query instance, same checkpoint)
    converges to the same final state. (b) A REPLAYED micro-batch
    (same batch_id re-run after its appends landed) is idempotent —
    the exclude-own-subshard contract."""
    from tickdatapipeline_spark.delta_loop import (
        ingest_micro_batch, run_streaming_delta)

    wh_s, wh_b = str(tmp_path / "s"), str(tmp_path / "b")
    _run(spark, wh_s, "2024-01-01")
    _run(spark, wh_b, "2024-01-01")
    _run(spark, wh_b, "2024-01-02")

    rows = _stream_day2_rows()
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    counters: list = []

    def run_once():
        # upsert mode here: the other equality test covers staged+fold
        q = run_streaming_delta(
            spark, str(in_dir), wh_s, "2024-01-02",
            str(tmp_path / "ckpt"), nprobe=2, corpus_mode="upsert",
            counters=counters)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _write_jsonl(in_dir, "b0.json", rows[:2], 0)
    run_once()                                   # ingests batch 0, stops
    _write_jsonl(in_dir, "b1.json", rows[2:3], 1)
    _write_jsonl(in_dir, "b2.json", rows[3:], 2)
    run_once()                                   # restart finishes the day

    assert _corpus_rows(spark, wh_s) == _corpus_rows(spark, wh_b)
    assert (_index_rows_ignoring_shard(spark, wh_s)
            == _index_rows_ignoring_shard(spark, wh_b))

    # (b) replay batch 1 verbatim after everything landed
    state = (_corpus_rows(spark, wh_s), *_index_rows_ignoring_shard(spark, wh_s))
    bdf = spark.createDataFrame(
        [(d, t, e) for d, t, e in rows[2:3]],
        "doc_id long, text string, embedding array<double>")
    c1 = ingest_micro_batch(bdf, 1, wh_s, "2024-01-02", nprobe=2,
                            corpus_mode="upsert")
    assert c1["n_kept"] == 1  # same verdict as the live run
    assert (_corpus_rows(spark, wh_s),
            *_index_rows_ignoring_shard(spark, wh_s)) == state


def test_streaming_delta_requires_bootstrap_and_valid_day(spark, tmp_path):
    from tickdatapipeline_spark.delta_loop import ingest_micro_batch

    bdf = spark.createDataFrame(
        [(1, _text(1), None)], "doc_id long, text string, embedding array<double>")
    with pytest.raises(ValueError, match="bootstrap"):
        ingest_micro_batch(bdf, 0, str(tmp_path / "nope"), "2024-01-01")
    with pytest.raises(ValueError, match="invalid day"):
        ingest_micro_batch(bdf, 0, str(tmp_path / "nope"), "2024.01.01")


@pytest.mark.heavy
def test_streaming_delta_greedy_vs_cc_contract(spark, tmp_path):
    """The documented divergence boundary: a near-dup chain that runs
    ACROSS micro-batches THROUGH a dropped document. Batch (whole-day
    transitive closure + index probe) drops both B and C; the online
    path can only probe what it KEPT, so C survives. This is inherent
    to any streaming dedup — pinned so the contract is explicit, not
    an accident waiting to look like a bug."""
    from tickdatapipeline_spark.delta_loop import run_daily_delta as rdd
    from tickdatapipeline_spark.delta_loop import ingest_micro_batch

    # day 1: A. day 2: B (~A, ~C), C (~B only). 24-token docs, 22
    # 3-shingles each: B mutates A's last 4 tokens (changes shingles
    # 18-21 -> J(A,B) = 18/26 ~ 0.69), C mutates B's FIRST 4 (changes
    # shingles 0-3 -> J(B,C) = 18/26 ~ 0.69, but J(A,C) = 14/30 ~ 0.47
    # < 0.5 -> C is nobody's dup once B is gone)
    toks = [f"ch{j}" for j in range(24)]
    a = " ".join(toks)
    b = " ".join(toks[:20] + [f"bm{j}" for j in range(4)])
    c = " ".join([f"cm{j}" for j in range(4)] + b.split()[4:])

    for wh in ("s", "bt"):
        docs1 = spark.createDataFrame([(1, a)], "doc_id long, text string")
        rdd(spark, docs1, None, str(tmp_path / wh), "2024-01-01")

    # batch: B,C one shard -> CC cluster {B,C} keeps B, index drops B
    docs2 = spark.createDataFrame([(2, b), (3, c)], "doc_id long, text string")
    rb = rdd(spark, docs2, None, str(tmp_path / "bt"), "2024-01-02")
    assert rb["n_kept"] == 0

    # stream: B in batch 0 (dropped vs A), C in batch 1 (nothing kept
    # matches it) -> C survives
    mk = lambda rows: spark.createDataFrame(
        rows, "doc_id long, text string, embedding array<double>")
    c0 = ingest_micro_batch(mk([(2, b, None)]), 0, str(tmp_path / "s"),
                            "2024-01-02")
    c1 = ingest_micro_batch(mk([(3, c, None)]), 1, str(tmp_path / "s"),
                            "2024-01-02")
    assert (c0["n_kept"], c1["n_kept"]) == (0, 1)


# ================= scheduled compaction =================


@pytest.mark.heavy
def test_compact_warehouse(spark, tmp_path):
    """The scheduled compaction job: after the 3-day loop + TTL expiry
    of day 1, compact_warehouse collapses every delta shard into
    shard=base, re-applies the text index from the RETAINED corpus
    (expired day-1 signatures age out — a day-4 dup of an expired doc
    is kept, a dup of a retained keeper still drops), and retrains the
    ANN quantizer over the index's own vectors (row-identical to a
    from-scratch build with the same trained centroids)."""
    import os

    from tickdatapipeline_spark.delta_loop import compact_warehouse
    from tickdatapipeline_spark.operators.similarity import (
        kmeans_train, write_ann_index)

    wh = str(tmp_path / "wh")
    _run(spark, wh, "2024-01-01")
    _run(spark, wh, "2024-01-02")
    _run(spark, wh, "2024-01-03", retain_before="2024-01-02")

    r = compact_warehouse(spark, wh, n_cells=2)
    # retained corpus: day-2 {11,12} + day-3 {22}; all 8 kept vectors
    # stay in the index (vector expiry is documented as out of scope)
    assert r == {"n_docs": 3, "n_vectors": 8, "retrained": True,
                 "had_ann": True, "n_cells": 2}

    for sub in ("text_index/bands", "text_index/shingles",
                "ann_index/vectors"):
        shards = [d for d in os.listdir(f"{wh}/{sub}")
                  if d.startswith("shard=")]
        assert shards == ["shard=base"], (sub, shards)

    # text index == from-scratch build over the retained corpus
    from tickdatapipeline_spark.operators.dedup import write_corpus_index
    all_docs = {i: t for day in DAYS for i, t in DAYS[day]}
    ref = str(tmp_path / "ref")
    write_corpus_index(
        spark.createDataFrame([(i, all_docs[i]) for i in (11, 12, 22)],
                              "doc_id long, text string"),
        f"{ref}/text_index")
    def _text_rows(root):
        return (sorted(map(tuple, spark.read.parquet(
                    f"{root}/text_index/bands").drop("shard").collect())),
                sorted(map(tuple, spark.read.parquet(
                    f"{root}/text_index/shingles").drop("shard").collect())))

    assert _text_rows(wh) == _text_rows(ref)

    # ANN == from-scratch build under the SAME retrained quantizer
    kept = sorted(i for ids in EXPECT_KEPT.values() for i in ids)
    union_emb = spark.createDataFrame(
        [(i, VEC[i]) for i in kept], "vec_id long, embedding array<double>")
    seeds = [(0, VEC[kept[0]]), (1, VEC[kept[1]])]
    cents = kmeans_train(union_emb, k=2, seeds=seeds)
    write_ann_index(union_emb, f"{ref}/ann_index", n_cells=2,
                    centroids=cents)
    got_v = sorted((v.vec_id, v.cell, tuple(v.v)) for v in
                   spark.read.parquet(f"{wh}/ann_index/vectors").collect())
    ref_v = sorted((v.vec_id, v.cell, tuple(v.v)) for v in
                   spark.read.parquet(f"{ref}/ann_index/vectors").collect())
    assert got_v == ref_v

    # day 4 against the compacted warehouse: a dup of EXPIRED day-1
    # doc 2 is now kept (signatures aged out with the corpus); a dup
    # of retained day-2 keeper 11 still drops
    docs4 = spark.createDataFrame(
        [(40, _text(102)),                 # == expired doc 2's text
         (41, _text(111, mutate=True))],   # dups retained keeper 11
        "doc_id long, text string")
    # doc 40's vector must stay below the 0.96 cosine bar vs every
    # indexed vector (max is 0.866 vs vec 0) — a near-axis vector like
    # [5,1,1,0] would read 0.962 vs [1,0,0,0] and emb-drop the doc
    emb4 = spark.createDataFrame(
        [(40, [3.0, 1.0, 1.0, 1.0]), (41, [0.0, 5.0, 1.0, 1.0])],
        "vec_id long, embedding array<double>")
    r4 = run_daily_delta(spark, docs4, emb4, wh, "2024-01-04",
                         n_cells=2, nprobe=2)
    assert r4["n_kept"] == 1
    kept4 = {d for d, day in _corpus_rows(spark, wh) if day == "2024-01-04"}
    assert kept4 == {40}


def test_compact_warehouse_requires_corpus(spark, tmp_path):
    from tickdatapipeline_spark.delta_loop import compact_warehouse

    with pytest.raises(ValueError, match="nothing to compact"):
        compact_warehouse(spark, str(tmp_path / "empty_wh"))


@pytest.mark.heavy
def test_lifecycle_soak_end_to_end(spark, tmp_path):
    """The full warehouse lifecycle in ONE run (r12 verdict #3) —
    every stage is individually tested elsewhere; this pins the seams
    ACROSS the whole cycle:

      bootstrap nightly day -> live micro-batch day (staged + fold,
      with a cross-batch text dup) -> nightly day with TTL expiry of
      day 1 -> the ANN rebuild trigger observed flipping healthy ->
      DUE -> compact_warehouse(retrain=True) -> one more nightly day
      (a dup of the EXPIRED day-1 doc is now kept, a dup of a retained
      live keeper still drops)

    and asserts the final corpus and BOTH indexes row-equal from-
    scratch builds over the same retained data (shard-blind; the same
    trained quantizer).

    Fixture geometry (verified offline): four axis centroids, day-1
    vectors balanced 2-per-cell (healthy at max_cell_factor=1.5:
    0.25 <= 0.375); the live day's five keepers all land in cell 0
    (7/13 = 0.538 > 0.375 -> DUE); every cross-day cosine < the 0.96
    dup bar, so keep/drop is decided by TEXT alone."""
    import os

    from tickdatapipeline_spark.delta_loop import (
        compact_warehouse, fold_live_corpus, ingest_micro_batch)
    from tickdatapipeline_spark.operators.dedup import write_corpus_index
    from tickdatapipeline_spark.operators.similarity import (
        ann_rebuild_due, kmeans_train, write_ann_index)

    wh = str(tmp_path / "wh")
    AXES = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0]),
            (2, [0.0, 0.0, 1.0, 0.0]), (3, [0.0, 0.0, 0.0, 1.0])]
    V1 = {0: [1.0, 0, 0, 0], 1: [5.0, 1, 0, 0], 2: [0.0, 1, 0, 0],
          3: [1.0, 5, 0, 0], 4: [0.0, 0, 1, 0], 5: [0.0, 1, 4, 0],
          6: [0.0, 0, 0, 1], 7: [0.0, 0, 1, 3]}
    V2 = {10: [3.0, 2, 0, 0], 11: [3.0, -2, 0, 0], 12: [3.0, 2, 1, 0],
          13: [3.0, -1, 1, 0], 14: [5.0, 2, 2, 0], 15: [9.0, 9, 9, 9]}
    V3 = {20: [2.0, 3, 0, 0], 21: [0.0, 3, 2, 0]}

    V1 = {i: [float(x) for x in v] for i, v in V1.items()}
    V2 = {i: [float(x) for x in v] for i, v in V2.items()}
    V3 = {i: [float(x) for x in v] for i, v in V3.items()}

    def _df(pairs, vecs):
        docs = spark.createDataFrame(pairs, "doc_id long, text string")
        emb = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i, _ in pairs],
            "vec_id long, embedding array<double>")
        return docs, emb

    # --- day 1: nightly bootstrap (injected production quantizer) ---
    d1 = [(i, _text(900 + i)) for i in range(8)]
    docs, emb = _df(d1, V1)
    r1 = run_daily_delta(spark, docs, emb, wh, "2024-01-01",
                         ann_centroids=AXES, n_cells=4, nprobe=2)
    assert (r1["n_in"], r1["n_kept"]) == (8, 8)
    assert r1["bootstrapped_text"] and r1["bootstrapped_ann"]
    due1 = ann_rebuild_due(spark, f"{wh}/ann_index", max_cell_factor=1.5)
    assert due1["rebuild_due"] is False and due1["max_cell_frac"] == 0.25

    # --- day 2: LIVE (staged micro-batches + day-close fold); doc 15
    # text-dups doc 10 from the EARLIER batch -> cross-batch drop ---
    b0 = [(10, _text(910), V2[10]), (11, _text(911), V2[11]),
          (12, _text(912), V2[12])]
    b1 = [(13, _text(913), V2[13]), (14, _text(914), V2[14]),
          (15, _text(910, mutate=True), V2[15])]
    schema = "doc_id long, text string, embedding array<double>"
    c0 = ingest_micro_batch(spark.createDataFrame(b0, schema), 0, wh,
                            "2024-01-02", nprobe=2)
    c1 = ingest_micro_batch(spark.createDataFrame(b1, schema), 1, wh,
                            "2024-01-02", nprobe=2)
    assert (c0["n_in"], c0["n_kept"]) == (3, 3)
    assert (c1["n_in"], c1["n_text_kept"], c1["n_kept"]) == (3, 2, 2)
    assert fold_live_corpus(spark, wh, "2024-01-02") == 5
    due2 = ann_rebuild_due(spark, f"{wh}/ann_index", max_cell_factor=1.5)
    assert due2["rebuild_due"] is True          # the flip: healthy -> DUE
    assert due2["max_cell_frac"] == round(7 / 13, 6)

    # --- day 3: nightly + TTL expiry of day 1 ---
    d3 = [(20, _text(920)), (21, _text(921))]
    docs, emb = _df(d3, V3)
    r3 = run_daily_delta(spark, docs, emb, wh, "2024-01-03",
                         n_cells=4, nprobe=2, retain_before="2024-01-02")
    assert r3["n_kept"] == 2
    assert r3["dropped_partitions"] == ["2024-01-01"]
    assert ann_rebuild_due(spark, f"{wh}/ann_index",
                           max_cell_factor=1.5)["rebuild_due"] is True

    # --- the trigger fired: scheduled compaction with retrain ---
    rc = compact_warehouse(spark, wh, n_cells=4)
    assert rc == {"n_docs": 7, "n_vectors": 15, "retrained": True,
                  "had_ann": True, "n_cells": 4}
    for sub in ("text_index/bands", "text_index/shingles",
                "ann_index/vectors"):
        assert [d for d in os.listdir(f"{wh}/{sub}")
                if d.startswith("shard=")] == ["shard=base"]

    # --- day 4 on the compacted warehouse: dup of EXPIRED day-1 doc 0
    # is now KEPT (signatures aged out with the corpus); dup of the
    # retained live keeper 12 still drops ---
    d4 = [(30, _text(900, mutate=True)), (31, _text(912, mutate=True))]
    docs, emb = _df(d4, {30: [1.0, 1, 1, 1], 31: [7.0, 7, 7, 7]})
    r4 = run_daily_delta(spark, docs, emb, wh, "2024-01-04",
                         n_cells=4, nprobe=2)
    assert r4["n_kept"] == 1
    assert {d for d, day in _corpus_rows(spark, wh)
            if day == "2024-01-04"} == {30}

    # --- final state == from-scratch builds over the retained data ---
    assert _corpus_rows(spark, wh) == sorted(
        [(i, "2024-01-02") for i in (10, 11, 12, 13, 14)]
        + [(20, "2024-01-03"), (21, "2024-01-03"), (30, "2024-01-04")])

    ref = str(tmp_path / "ref")
    retained = {10: _text(910), 11: _text(911), 12: _text(912),
                13: _text(913), 14: _text(914), 20: _text(920),
                21: _text(921), 30: _text(900, mutate=True)}
    write_corpus_index(
        spark.createDataFrame(sorted(retained.items()),
                              "doc_id long, text string"),
        f"{ref}/text_index")
    got_t = _index_rows_ignoring_shard(spark, wh)[:2]
    ref_t = (sorted(map(tuple, spark.read.parquet(
                f"{ref}/text_index/bands").drop("shard").collect())),
             sorted(map(tuple, spark.read.parquet(
                f"{ref}/text_index/shingles").drop("shard").collect())))
    assert got_t == ref_t

    # ANN: compaction retrained over the index's 15 vectors (seeded
    # from the 4 lowest vec_ids); day 4 appended against those FROZEN
    # centroids — so a from-scratch write of all 16 vectors under the
    # same trained quantizer must be row-identical
    vecs15 = {**V1, **{i: V2[i] for i in (10, 11, 12, 13, 14)}, **V3}
    emb15 = spark.createDataFrame(
        sorted(vecs15.items()), "vec_id long, embedding array<double>")
    cents = kmeans_train(emb15, k=4,
                         seeds=[(i, vecs15[i]) for i in range(4)])
    emb16 = spark.createDataFrame(
        sorted({**vecs15, 30: [1.0, 1.0, 1.0, 1.0]}.items()),
        "vec_id long, embedding array<double>")
    write_ann_index(emb16, f"{ref}/ann_index", n_cells=4, centroids=cents)
    got_v = sorted((r.vec_id, r.cell, tuple(r.v)) for r in
                   spark.read.parquet(f"{wh}/ann_index/vectors").collect())
    ref_v = sorted((r.vec_id, r.cell, tuple(r.v)) for r in
                   spark.read.parquet(f"{ref}/ann_index/vectors").collect())
    assert got_v == ref_v

    # --- ~600x growth: a big delta shard lands, then the scheduled
    # compaction picks the sqrt(N) quantizer size WITHOUT a manual
    # knob (r13 verdict #3) — ann_rebuild_due recommends it and
    # compact_warehouse(n_cells=None) retrains to exactly that ---
    import math

    from tickdatapipeline_spark.operators.similarity import (
        IVF_CELLS, ann_rebuild_due as _due, append_ann_index)

    big = spark.range(100_000, 110_000).select(
        F.col("id").alias("vec_id"),
        F.array(((F.col("id") % 17) / 4.0).cast("double"),
                ((F.col("id") % 13) / 4.0).cast("double"),
                ((F.col("id") % 11) / 4.0).cast("double"),
                ((F.col("id") % 7) / 4.0).cast("double"))
        .alias("embedding"))
    append_ann_index(big, f"{wh}/ann_index", shard="2024-01-05")
    due = _due(spark, f"{wh}/ann_index")
    want = max(IVF_CELLS, math.isqrt(10_016))  # 16 + 10k vectors
    assert due["n_vectors"] == 10_016
    assert due["recommended_n_cells"] == want == 100
    rg = compact_warehouse(spark, wh)  # n_cells defaults to auto
    assert rg["retrained"] and rg["n_cells"] == want
    assert spark.read.parquet(
        f"{wh}/ann_index/centroids").count() == want


@pytest.mark.heavy
def test_pq_adc_delta_loop_equality(spark, tmp_path):
    """A ``pq=True`` warehouse — ADC live probe auto-enabled off the
    persisted codebooks (r13 verdict #4) — keeps/drops IDENTICALLY to
    the plain exact-probe warehouse across the 3-day fixture AND a
    live micro-batch with a planted embedding dup; compaction retrains
    and PRESERVES the PQ artifacts, and the compacted index still
    catches the dup."""
    import os

    from tickdatapipeline_spark.delta_loop import (
        compact_warehouse, fold_live_corpus, ingest_micro_batch)

    whp, whe = str(tmp_path / "pq"), str(tmp_path / "plain")
    counters = {}
    for wh, pq in ((whp, True), (whe, False)):
        rs = [_run(spark, wh, "2024-01-01", pq=pq),
              _run(spark, wh, "2024-01-02"),
              _run(spark, wh, "2024-01-03")]
        counters[wh] = [(r["n_in"], r["n_text_kept"], r["n_emb_checked"],
                         r["n_kept"]) for r in rs]
    assert counters[whp] == counters[whe]
    assert _corpus_rows(spark, whp) == _corpus_rows(spark, whe)
    assert os.path.isdir(f"{whp}/ann_index/pq_codebooks")
    assert os.path.isdir(f"{whp}/ann_index/pq_codes/shard=2024-01-02")
    assert not os.path.isdir(f"{whe}/ann_index/pq_codebooks")

    # live micro-batch: doc 30 embedding-dups the day-2 keeper 12,
    # doc 31 is novel — both warehouses must keep exactly {31}
    schema = "doc_id long, text string, embedding array<double>"
    batch = [(30, _text(300), VEC[12]),
             (31, _text(301), [3.0, 1.0, 2.0, 0.0])]
    for wh in (whp, whe):
        c = ingest_micro_batch(spark.createDataFrame(batch, schema),
                               0, wh, "2024-01-04")
        assert (c["n_in"], c["n_text_kept"], c["n_kept"]) == (2, 2, 1)
        assert fold_live_corpus(spark, wh, "2024-01-04") == 1
    assert _corpus_rows(spark, whp) == _corpus_rows(spark, whe)
    # the ADC warehouse encoded the micro-batch subshard too
    assert os.path.isdir(f"{whp}/ann_index/pq_codes/shard=2024-01-04.b0")

    # compaction: PQ-ness preserved (codebooks retrained, codes rebuilt
    # as shard=base), and the rebuilt index still drops a replayed dup
    rc = compact_warehouse(spark, whp, n_cells=2)
    assert rc["retrained"] and rc["had_ann"]
    assert os.path.isdir(f"{whp}/ann_index/pq_codebooks")
    assert sorted(
        d for d in os.listdir(f"{whp}/ann_index/pq_codes")
        if d.startswith("shard=")) == ["shard=base"]
    c2 = ingest_micro_batch(spark.createDataFrame(batch, schema),
                            0, whp, "2024-01-05")
    assert c2["n_kept"] == 0  # 30 = emb dup, 31 = text dup of itself


def test_daily_delta_rejects_dotted_day(spark, tmp_path):
    """'.' in a nightly day is rejected: it would collide with the
    streaming twin's '<day>.b<n>' subshard namespace — wrongly excluded
    by the streaming embedding probe's exclude_prefix='<day>.' and
    collapsed by compact_warehouse as if it were a micro-batch
    subshard."""
    docs, emb = _shard(spark, "2024-01-01")
    with pytest.raises(ValueError, match="invalid day"):
        run_daily_delta(spark, docs, emb, str(tmp_path / "w"), "2024-01-02.x")


@pytest.mark.heavy
def test_compact_warehouse_refuses_unfolded_staged_day(spark, tmp_path):
    """Compaction must not run over an in-flight staged streaming day:
    the text index is rebuilt from the canonical corpus only while the
    '<day>.b<n>' subshards are wiped, so an unfolded day's keepers
    would lose their signatures and their future duplicates would pass
    the text probe — the keep/drop-policy break the guard prevents.
    After fold_live_corpus, the same compaction proceeds and the folded
    day's signatures ARE in the rebuilt index (a dup still drops)."""
    from tickdatapipeline_spark.delta_loop import (
        compact_warehouse, fold_live_corpus, ingest_micro_batch)

    wh = str(tmp_path / "wh")
    _run(spark, wh, "2024-01-01")
    bdf = spark.createDataFrame(
        [(60, _text(601), None)],
        "doc_id long, text string, embedding array<double>")
    ingest_micro_batch(bdf, 0, wh, "2024-01-02")

    with pytest.raises(ValueError, match="fold them first"):
        compact_warehouse(spark, wh, n_cells=2)

    assert fold_live_corpus(spark, wh, "2024-01-02") == 1
    r = compact_warehouse(spark, wh, n_cells=2)
    assert r["n_docs"] == 6  # day-1 keepers {0..4} + folded doc 60
    # the folded keeper's signatures made it into the rebuilt index:
    # a day-3 duplicate of doc 60 still drops
    docs3 = spark.createDataFrame(
        [(61, _text(601, mutate=True))], "doc_id long, text string")
    r3 = run_daily_delta(spark, docs3, None, wh, "2024-01-03")
    assert r3["n_kept"] == 0
