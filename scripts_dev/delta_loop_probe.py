"""Daily-delta loop scale probe: is a day's ingest cost O(shard)?

The 100 TB claim behind delta_loop.run_daily_delta is that a day's
ingest never recomputes corpus-wide signatures: the corpus side is a
persisted parquet index (bands/shingles + ANN cells) the shard probes
against. This probe measures the SAME fixed-size shard ingested
against corpora of growing size — if the claim holds, shard cost
grows far slower than the corpus (the only corpus-size-dependent work
is scanning the band/vector index tables, which is columnar I/O, not
signature recompute).

Method: for each base size B, bootstrap a fresh warehouse with a
B-doc day-0 (write_corpus_index-shaped via the runner itself), then
time run_daily_delta of a fixed S-doc day-1 shard (with embeddings,
~10% planted cross-day near-dups so the verify path does real work).

Usage: python scripts_dev/delta_loop_probe.py [base_sizes...]
Prints one line per base size; paste the table into PERF.md.
"""
from __future__ import annotations

import random
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

TMP = Path("/tmp/.delta_probe")
SHARD = 1_000
VOCAB = [f"w{i}" for i in range(5_000)]
DIM = 64


def make_docs(rng: random.Random, ids, dup_of=None):
    """(doc_id, text) rows; dup_of maps doc_id -> source text to
    near-duplicate (one token changed)."""
    rows = []
    for i in ids:
        if dup_of and i in dup_of:
            toks = dup_of[i].split()
            toks[-1] = "MUT"
            rows.append((i, " ".join(toks)))
        else:
            rows.append((i, " ".join(rng.choices(VOCAB, k=30))))
    return rows


def make_emb(rng: random.Random, ids):
    return [(i, [rng.uniform(-1, 1) for _ in range(DIM)]) for i in ids]


def main() -> None:
    bases = [int(s) for s in sys.argv[1:]] or [2_000, 8_000, 32_000]

    from tickdatapipeline_spark.delta_loop import run_daily_delta
    from tickdatapipeline_spark.session import get_spark

    spark = get_spark("delta-loop-probe")
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(7)

    for b in bases:
        wh = TMP / f"wh_{b}"
        shutil.rmtree(wh, ignore_errors=True)
        base_rows = make_docs(rng, range(b))
        base_docs = spark.createDataFrame(base_rows, "doc_id long, text string")
        base_emb = spark.createDataFrame(
            make_emb(rng, range(b)), "vec_id long, embedding array<double>")
        t0 = time.time()
        run_daily_delta(spark, base_docs, base_emb, str(wh), "2024-01-01")
        boot = time.time() - t0

        # fixed-size day-1 shard, ~10% near-dups of random base docs
        base_text = dict(base_rows)
        ids = list(range(b + 1, b + 1 + SHARD))
        dup_of = {i: base_text[rng.randrange(b)] for i in ids[: SHARD // 10]}
        docs = spark.createDataFrame(
            make_docs(rng, ids, dup_of), "doc_id long, text string")
        emb = spark.createDataFrame(
            make_emb(rng, ids), "vec_id long, embedding array<double>")
        t0 = time.time()
        r = run_daily_delta(spark, docs, emb, str(wh), "2024-01-02")
        day = time.time() - t0
        print(f"base={b:>7,}  bootstrap {boot:6.1f} s   "
              f"day-shard({SHARD}) {day:6.1f} s   kept {r['n_kept']}/"
              f"{r['n_in']}", flush=True)
        shutil.rmtree(wh, ignore_errors=True)
    spark.stop()
    shutil.rmtree(TMP, ignore_errors=True)


if __name__ == "__main__":
    main()
