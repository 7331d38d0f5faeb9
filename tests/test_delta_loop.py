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


def test_daily_delta_rejects_bad_day(spark, tmp_path):
    docs, emb = _shard(spark, "2024-01-01")
    with pytest.raises(ValueError, match="invalid day"):
        run_daily_delta(spark, docs, emb, str(tmp_path / "w"), "a/b")


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
