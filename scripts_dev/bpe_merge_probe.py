"""BPE learner cost model: one measured point at a realistic merge
count (n_merges=100) on the 10x-sf0.1 corpus (~50K docs).

The learner's per-round cost is one map-side-combinable pair-count
aggregate over the distinct-word table plus a 1-row argmax broadcast
(operators/text.py:bpe_learn_merges) — so wall time should be ~linear
in n_merges with a per-round constant dominated by job-scheduling
overhead at this corpus size. This probe records s/merge so the
"k driver-rounds" cost model in the docstring carries a number; if the
1-row argmax round-trip dominates, the documented mitigation is top-m
non-conflicting merges per round (the standard fastBPE batching).

Usage: python scripts_dev/bpe_merge_probe.py [n_merges]  (default 100)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

TIER2 = "/tmp/spark_graft_tier2"


def main() -> None:
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 100

    from bench_tier2 import build_tier2

    from tickdatapipeline_spark.operators.text import bpe_learn_merges
    from tickdatapipeline_spark.session import get_spark

    spark = get_spark("bpe-merge-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if not Path(TIER2).exists():
        build_tier2(spark)
    docs = spark.read.parquet(f"{TIER2}/documents.parquet")
    n_docs = docs.count()

    t0 = time.time()
    merges = bpe_learn_merges(docs, n_merges=n_merges)
    rows = merges.collect()
    dt = time.time() - t0
    print(f"corpus: {n_docs:,} docs; learned {len(rows)} merges "
          f"in {dt:.1f} s = {dt / max(len(rows), 1):.2f} s/merge")
    print("first 5:", [(r.merge_idx, r.sym_a, r.sym_b, r.pair_count) for r in rows[:5]])
    print("last 2:", [(r.merge_idx, r.sym_a, r.sym_b, r.pair_count) for r in rows[-2:]])
    spark.stop()


if __name__ == "__main__":
    main()
