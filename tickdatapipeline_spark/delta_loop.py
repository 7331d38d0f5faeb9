"""The composed daily-delta corpus-maintenance loop.

DEPLOYMENT.md documents the nightly workflow a 100 TB corpus actually
runs — ingest a day's shard, dedup it against the persisted indexes,
append the keepers, upsert the curated partition, expire old data.
Every stage exists and is individually tested elsewhere
(`operators/dedup.py`, `operators/similarity.py`, `functions/scale.py`);
THIS module composes them into one tested runner so the seams between
their contracts (index shard names vs corpus partition values, replay
visibility of a day's own appended shard, bootstrap-vs-append
dispatch) are exercised end-to-end, not just described in prose.

Reference analogue: the reference repo has no corpus-maintenance
surface at all (it is a single-stream tick engine); this is part of
the beyond-reference LLM-training-data toolkit the brief requires.

Warehouse layout (all plain parquet, all under one root):

    {warehouse}/corpus/day=<day>/          curated documents (upsert_partitioned)
    {warehouse}/text_index/{bands,shingles}/shard=<day|base>/
    {warehouse}/ann_index/{centroids,vectors/shard=<day|base>/cell=*}

Replay contract: every stage is idempotent, so a failed-and-retried
(or duplicated) day-N job converges to the same warehouse state:

- the index probes EXCLUDE ``shard=<day>`` (a replay after the appends
  landed must not see the day's own signatures and self-dedup to zero
  — the seam bug this runner exists to pin);
- `append_corpus_index` / `append_ann_index` overwrite exactly their
  ``shard=<day>`` partitions;
- `upsert_partitioned` replaces same-key rows;
- `drop_partitions_before` no-ops on already-dropped partitions.

Scale posture: O(shard) signature work + O(touched partitions) I/O per
day — the corpus is never re-scanned, corpus-wide signatures never
recomputed (the entire point of the persisted indexes). The per-day
counters cost one job per counted stage over the pinned shard-sized
frames, which is bookkeeping a nightly job wants anyway.
"""
from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tickdatapipeline_spark.operators.dedup import (
    DEFAULT_MAX_BAND_BUCKET,
    append_corpus_index,
    dedup_against_index,
    deduplicated_corpus,
    write_corpus_index,
)
from tickdatapipeline_spark.operators.globalorder import pin
from tickdatapipeline_spark.operators.similarity import (
    IVF_CELLS,
    IVF_NPROBE,
    append_ann_index,
    embedding_dedup_against_index,
    kmeans_train,
    write_ann_index,
)
from tickdatapipeline_spark.functions.scale import (
    drop_partitions_before,
    upsert_partitioned,
)


def _exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def run_daily_delta(
    spark: SparkSession,
    docs_shard: DataFrame,
    emb_shard: DataFrame | None,
    warehouse: str,
    day: str,
    *,
    text_threshold: float = 0.5,
    emb_threshold: float = 0.96,
    nprobe: int = IVF_NPROBE,
    n_cells: int = IVF_CELLS,
    ann_centroids: "list | None" = None,
    max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET,
    retain_before: str | None = None,
    pq: bool = False,
) -> dict:
    """Ingest one day's shard through the full curation loop and
    return the stage counters a nightly job logs.

    ``docs_shard``: (doc_id long, text string, ...extra columns kept);
    ``emb_shard``: (vec_id long, embedding array<float|double>) with
    ``vec_id == doc_id`` (the corpus alignment contract used across
    the plans), or None to run the text-only loop. ``day`` is both the
    corpus partition value and the index shard name — ISO 'YYYY-MM-DD'
    sorts chronologically for `drop_partitions_before`, and contains
    no '/', '=' or '.' so it is a valid shard name by construction
    ('.' is additionally reserved for the streaming twin's
    '<day>.b<n>' subshards — see ingest_micro_batch).

    Stages (each independently idempotent — see module docstring):

    1. intra-shard near-dup removal (`deduplicated_corpus`);
    2. shard-vs-corpus text filter off the persisted LSH index
       (`dedup_against_index`, excluding ``shard=day``); bootstrap
       (no index yet) skips the probe;
    3. embedding filter off the persisted ANN index
       (`embedding_dedup_against_index`, excluding ``shard=day``) —
       a vector dropped here drops its DOCUMENT too (near-semantic-dup
       of indexed corpus); docs without a vector pass on text alone;
    4. append the keepers' signatures/vectors to both indexes
       (``shard=day`` partition overwrite). Bootstrap first writes an
       EMPTY ``shard=base`` index (schema + frozen centroids only) and
       then appends day 1 like any other day — every day's signatures
       live under its OWN shard, so the replay exclusion in steps 2-3
       works for the bootstrap day too (a `write_corpus_index`-style
       bootstrap would bury day 1 in ``shard=base``, and its replay
       would self-dedup to zero — the seam bug this symmetry removes).
       ``shard=base`` is populated only by the scheduled compaction
       rebuild, which wipes the delta shards and after which replays
       of pre-compaction days are out of contract (DEPLOYMENT.md);
    5. upsert the keepers into ``corpus`` partition ``day=<day>``;
    6. optional retention: drop corpus partitions before
       ``retain_before`` (indexes keep their shards — index compaction
       is the scheduled `write_corpus_index`/`write_ann_index` rebuild,
       a separate job by the DEPLOYMENT.md contract).

    Returns {"n_in", "n_intra_kept", "n_text_kept", "n_emb_checked",
    "n_kept", "bootstrapped_text", "bootstrapped_ann",
    "dropped_partitions"}.

    SIZE ``n_cells`` TO THE CORPUS (~sqrt(expected N)): every later
    probe scores probes x nprobe x (N / n_cells) cosines, so the toy
    default makes the ANN probe the dominant per-batch cost once the
    corpus outgrows it (measured: 57 s of an 80 s ingest at N=200 K
    under n_cells=8, 20 s total at n_cells=64 — PERF.md r13). Grow it
    later via ``compact_warehouse(n_cells=...)``.
    """
    if "/" in day or "=" in day or "." in day or not day:
        # '.' is reserved for the streaming twin's '<day>.b<n>' subshard
        # namespace: a dotted nightly shard would collide with it, be
        # wrongly excluded by the streaming embedding probe's
        # exclude_prefix='<day>.', and be collapsed by compact_warehouse
        # as if it were a micro-batch subshard.
        raise ValueError(f"invalid day {day!r}: used as a partition value "
                         "and an index shard name; no '/', '=' or '.'")
    text_index = f"{warehouse}/text_index"
    ann_index = f"{warehouse}/ann_index"
    corpus = f"{warehouse}/corpus"

    docs_shard = docs_shard.withColumn("doc_id", F.col("doc_id").cast("long"))
    n_in = docs_shard.count()

    # 1. intra-shard pass — survivors keep every input column
    intra_keep = deduplicated_corpus(
        docs_shard, text_threshold, max_band_bucket=max_band_bucket
    ).select("doc_id")
    shard = pin(docs_shard.join(intra_keep, "doc_id", "left_semi"))
    n_intra = shard.count()

    # 2. shard-vs-corpus text filter (bootstrap: no index, no probe)
    boot_text = not _exists(spark, f"{text_index}/bands")
    if not boot_text:
        shard = pin(dedup_against_index(
            spark, shard, text_index, threshold=text_threshold,
            max_band_bucket=max_band_bucket, exclude_shard=day))
    n_text = shard.count()

    # 3. embedding filter — drops documents, not just vectors
    n_emb_checked = 0
    boot_ann = emb_shard is not None and not _exists(
        spark, f"{ann_index}/centroids")
    if emb_shard is not None:
        emb_shard = emb_shard.withColumn(
            "vec_id", F.col("vec_id").cast("long"))
        emb = pin(emb_shard.join(
            shard.select(F.col("doc_id").alias("vec_id")),
            "vec_id", "left_semi"))
        n_emb_checked = emb.count()
        if not boot_ann:
            kept_vecs = pin(embedding_dedup_against_index(
                emb, ann_index, threshold=emb_threshold, nprobe=nprobe,
                exclude_shard=day))
            emb_dropped = emb.select("vec_id").join(
                kept_vecs.select("vec_id"), "vec_id", "left_anti")
            shard = pin(shard.join(
                emb_dropped.select(F.col("vec_id").alias("doc_id")),
                "doc_id", "left_anti"))
        else:
            kept_vecs = emb
    n_kept = shard.count()

    # 4. index maintenance — keepers only, shard=day overwrite.
    # Bootstrap = empty shard=base (schema/centroids) + normal append,
    # so day 1 is symmetric with every later day (see docstring).
    if boot_text:
        write_corpus_index(docs_shard.limit(0), text_index,
                           max_band_bucket=max_band_bucket)
    append_corpus_index(shard, text_index, shard=day,
                        max_band_bucket=max_band_bucket)
    if emb_shard is not None:
        # re-restrict to the final doc survivors (step 3's own drops)
        final_vecs = kept_vecs.join(
            shard.select(F.col("doc_id").alias("vec_id")),
            "vec_id", "left_semi")
        if boot_ann:
            cents = ann_centroids
            if cents is None:
                # default bootstrap quantizer: Lloyd's k-means over the
                # first day's kept vectors (r11 verdict #3 — the repo's
                # own trainer, not the lowest-id stand-in), seeded from
                # the day's n_cells lowest-id vectors (k rows collected
                # — O(n_cells) driver cost; the default vec_id < k init
                # would select nothing on arbitrary-id shards). Pass
                # ann_centroids to override (precomputed production
                # quantizer). Degenerate fallback: a day with fewer
                # vectors than cells keeps the raw seeds untrained —
                # every vector IS a centroid, training is vacuous.
                seeds = (final_vecs
                         .select(F.col("vec_id"),
                                 F.col("embedding").cast("array<double>")
                                 .alias("c"))
                         .orderBy("vec_id").limit(n_cells).collect())
                cents = [(i, list(r.c)) for i, r in enumerate(seeds)]
                if len(cents) == n_cells:
                    cents = kmeans_train(final_vecs, k=n_cells,
                                         seeds=cents)
            # pq=True (r14): train the ADC codebooks on the day's
            # keepers too (the base build is empty, so write_ann_index
            # could not train them itself — same injection contract as
            # ann_centroids); a zero-vector day downgrades to a plain
            # index rather than persisting an empty codebook
            cbs = None
            if pq:
                from tickdatapipeline_spark.operators.similarity import (
                    PQ_M, pq_train)

                head = final_vecs.select("embedding").head()
                if head is not None:
                    dim = len(head[0])
                    cbs = pq_train(final_vecs, math.gcd(dim, PQ_M),
                                   dim=dim)
            write_ann_index(emb_shard.limit(0), ann_index,
                            n_cells=n_cells, centroids=cents,
                            pq=bool(cbs), pq_codebooks=cbs)
        append_ann_index(final_vecs, ann_index, shard=day)

    # 5. curated-corpus upsert — O(touched partitions)
    upsert_partitioned(
        spark, corpus,
        shard.withColumn("day", F.lit(day)),
        key="doc_id", part_col="day")

    # 6. retention
    dropped = []
    if retain_before is not None:
        dropped = drop_partitions_before(spark, corpus, "day", retain_before)

    return {
        "n_in": n_in,
        "n_intra_kept": n_intra,
        "n_text_kept": n_text,
        "n_emb_checked": n_emb_checked,
        "n_kept": n_kept,
        "bootstrapped_text": boot_text,
        "bootstrapped_ann": boot_ann,
        "dropped_partitions": dropped,
    }


def compact_warehouse(
    spark: SparkSession,
    warehouse: str,
    *,
    n_cells: "int | None" = None,
    retrain: bool = True,
    max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET,
) -> dict:
    """The scheduled compaction job the daily/streaming loops defer to
    (DEPLOYMENT.md's "separate job", now a tested function): rebuild
    BOTH persisted indexes from the warehouse's own state, collapsing
    every accumulated delta shard — nightly ``shard=<day>`` AND
    streaming ``shard=<day>.b<n>`` subshards — into ``shard=base``.

    - text index: recomputed from the CURRENT curated corpus (all
      retained partitions), so the global band skew cap is re-applied
      and signatures of TTL-expired corpus partitions age out of the
      index (retention's `drop_partitions_before` touches only the
      corpus by contract; THIS is where the indexes catch up);
    - ANN index: rebuilt from the index's own vectors (the corpus does
      not store embeddings). ``retrain=True`` re-runs `kmeans_train`
      seeded from the n_cells lowest vec_ids — the cell-rebalance
      answer when `ann_rebuild_due` fires; ``retrain=False`` keeps the
      existing centroids (pure shard collapse). ``n_cells=None``
      (default) AUTO-SIZES the retrained quantizer to the measured
      sqrt(N) rule — max(IVF_CELLS, isqrt(n_vectors)) — so a corpus
      that grew 100x since bootstrap gets a proportionally finer
      quantizer without a manual knob (PERF.md r13 measured 4x ingest
      cost at N=200K between n_cells=8 and 64; probe cost per batch is
      ~ nprobe * N / n_cells). Pass an int to pin it. Vectors of expired
      corpus docs are NOT dropped here (vec_id-to-day mapping lives in
      the corpus, which no longer has those rows — pass the ids
      through `embedding_dedup` tooling if expiry must reach vectors).

    After compaction, replays of pre-compaction days are OUT OF
    CONTRACT (their ``shard=<day>`` no longer exists to exclude) —
    the documented replay boundary.

    ORDERING PREREQUISITE: every staged streaming day must be folded
    (`fold_live_corpus`) BEFORE compacting. The text index is rebuilt
    from ``{warehouse}/corpus`` alone while every ``shard=<day>.b<n>``
    subshard is wiped — an in-flight staged day's keepers (docs still
    in ``corpus_live``, signatures only in subshards) would lose their
    text-index signatures, and until the next compaction a duplicate
    of those keepers would pass the text probe and be kept, silently
    breaking the one-keep/drop-policy invariant the streaming twin
    establishes. This function therefore REFUSES to run while
    ``corpus_live`` holds any staged day (fold or discard them first).

    Returns {"n_docs", "n_vectors", "retrained", "had_ann"}.

    Scale: one full corpus signature pass + one full vectors
    re-assignment — the O(corpus) job compaction is BY DEFINITION,
    scheduled (weekly/monthly), amortized against every daily delta
    it keeps O(shard)."""
    corpus = f"{warehouse}/corpus"
    if not _exists(spark, corpus):
        raise ValueError(
            f"{corpus} does not exist — nothing to compact (run "
            "run_daily_delta at least once)")
    live = f"{warehouse}/corpus_live"
    if _exists(spark, live):
        jvm = spark._jvm
        p = jvm.org.apache.hadoop.fs.Path(live)
        fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
        staged_days = sorted(
            st.getPath().getName() for st in fs.listStatus(p)
            if st.isDirectory() and st.getPath().getName().startswith("day="))
        if staged_days:
            raise ValueError(
                f"{live} holds staged streaming day(s) "
                f"{staged_days} — fold them first (fold_live_corpus): "
                "compaction rebuilds the text index from the canonical "
                "corpus only and wipes the '<day>.b<n>' subshards, so an "
                "unfolded day's keepers would lose their signatures and "
                "their future duplicates would be KEPT (see docstring)")
    docs = spark.read.parquet(corpus).select("doc_id", "text")
    n_docs = docs.count()
    write_corpus_index(docs, f"{warehouse}/text_index",
                       max_band_bucket=max_band_bucket)

    had_ann = _exists(spark, f"{warehouse}/ann_index/centroids")
    n_vec = 0
    if had_ann:
        emb = pin(
            spark.read.parquet(f"{warehouse}/ann_index/vectors")
            .select("vec_id", F.col("v").alias("embedding")))
        n_vec = emb.count()
        if n_cells is None:
            n_cells = max(IVF_CELLS, math.isqrt(n_vec))
        if retrain and n_vec >= n_cells:
            seeds = (emb.select("vec_id", F.col("embedding").alias("c"))
                     .orderBy("vec_id").limit(n_cells).collect())
            cents = kmeans_train(
                emb, k=n_cells,
                seeds=[(i, list(r.c)) for i, r in enumerate(seeds)])
        else:
            cents = [(r.cell, list(r.c)) for r in spark.read.parquet(
                f"{warehouse}/ann_index/centroids").collect()]
            cents.sort()
        # PQ-enabled index stays PQ-enabled: the rebuild retrains the
        # ADC codebooks on the (deterministically sampled) collapsed
        # corpus, exactly like the coarse quantizer above (r14)
        had_pq = _exists(spark, f"{warehouse}/ann_index/pq_codebooks")
        write_ann_index(emb, f"{warehouse}/ann_index",
                        n_cells=len(cents), centroids=cents, pq=had_pq)
    # n_cells reports the index's ACTUAL cell count after compaction —
    # the auto-sized target when retrained, the surviving centroid
    # count on a pure shard collapse (retrain=False / tiny corpus)
    return {"n_docs": n_docs, "n_vectors": n_vec,
            "retrained": bool(had_ann and retrain and n_vec >= n_cells),
            "had_ann": had_ann,
            "n_cells": len(cents) if had_ann else 0}


# ================= streaming twin of the daily loop =================

INGEST_SCHEMA = "doc_id long, text string, embedding array<double>"


def ingest_micro_batch(
    bdf: DataFrame,
    batch_id: int,
    warehouse: str,
    day: str,
    *,
    text_threshold: float = 0.5,
    emb_threshold: float = 0.96,
    nprobe: int = IVF_NPROBE,
    max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET,
    corpus_mode: str = "staged",
) -> dict:
    """One micro-batch of the LIVE ingest path (r11 verdict #2): probe
    the batch (doc_id, text, embedding-nullable) against the PERSISTED
    text/ANN indexes the nightly `run_daily_delta` maintains, append
    the keepers' signatures/vectors as the ``shard=<day>.b<batch_id>``
    subshard of each index, and land the keepers in the curated
    corpus — so live ingest and nightly curation apply ONE keep/drop
    policy off one warehouse instead of two disagreeing ones.

    ``corpus_mode`` — how keepers reach the corpus:

    - ``"staged"`` (default, the 100 TB posture): keepers land as
      ``corpus_live/day=<day>/batch=<batch_id>`` — an idempotent
      O(batch) explicit-path overwrite, NO read-back. A day with B
      triggers costs O(day) corpus I/O total; `fold_live_corpus` at
      day close moves the day into the canonical day-partitioned
      corpus with ONE upsert.
    - ``"upsert"``: `upsert_partitioned` straight into the canonical
      corpus each batch — the canonical table is live-current, but
      every batch reads back and rewrites the whole day partition, so
      a day with B triggers costs O(B x day) corpus I/O. Fine for
      hourly triggers; wrong for per-minute ones.

    Semantics vs the batch loop, stage by stage:

    - intra-batch near-dup removal: `deduplicated_corpus` on the
      micro-batch (the batch loop's stage 1 on its visibility window);
    - text probe: vs the whole index EXCLUDING only this batch's own
      subshard — earlier same-day subshards are INCLUDED, so a dup of
      an earlier micro-batch's keeper drops exactly as the batch
      loop's whole-day intra-shard pass would have dropped it;
    - embedding probe: vs the index EXCLUDING every ``<day>.*``
      subshard — the batch loop has NO intra-day embedding dedup, so
      one micro-batch's vectors must never drop a later one's;
    - appends overwrite exactly ``shard=<day>.b<batch_id>`` and the
      probes exclude it, so a replayed micro-batch (restart from the
      checkpoint) is idempotent — the same seam contract as the
      nightly loop's exclude-own-shard rule.

    EQUALITY CONTRACT (pinned in tests/test_delta_loop.py): for a
    day's shard split across micro-batches in doc_id order, the final
    keep/drop set and index rows (ignoring shard labels — compaction
    normalizes those) equal `run_daily_delta` on the same data,
    PROVIDED near-dup clusters do not chain across micro-batches
    through a dropped document (batch dedup is transitive-closure
    over the whole day; an online path can only probe what it kept —
    the inherent greedy/CC divergence every streaming dedup has).
    DEPLOYMENT.md "When live keep/drop can diverge from nightly"
    spells out the operational consequences: divergence is only extra
    borderline keeps, compaction does NOT reconcile past divergence,
    and chain-sensitive corpora belong on the nightly path.

    The warehouse must already be bootstrapped (one `run_daily_delta`
    or explicit `write_corpus_index`/`write_ann_index`) — a live
    ingest path has no business inventing quantizers mid-stream.
    """
    if "/" in day or "=" in day or "." in day or not day:
        raise ValueError(
            f"invalid day {day!r} for streaming ingest: subshards are "
            "namespaced '<day>.b<batch_id>', so the day itself must be "
            "non-empty with no '/', '=' or '.'")
    spark = bdf.sparkSession
    text_index = f"{warehouse}/text_index"
    ann_index = f"{warehouse}/ann_index"
    sub = f"{day}.b{batch_id}"
    if not _exists(spark, f"{text_index}/bands"):
        raise ValueError(
            f"{text_index} does not exist — bootstrap the warehouse with "
            "run_daily_delta (or write_corpus_index) before streaming into it")
    has_ann = _exists(spark, f"{ann_index}/centroids")

    docs = pin(bdf.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        *[c for c in bdf.columns if c not in ("doc_id", "embedding")]))
    n_in = docs.count()

    intra_keep = deduplicated_corpus(
        docs, text_threshold, max_band_bucket=max_band_bucket
    ).select("doc_id")
    shard = pin(docs.join(intra_keep, "doc_id", "left_semi"))
    shard = pin(dedup_against_index(
        spark, shard, text_index, threshold=text_threshold,
        max_band_bucket=max_band_bucket, exclude_shard=sub))
    n_text = shard.count()

    n_emb_checked = 0
    kept_vecs = None
    if "embedding" in bdf.columns and has_ann:
        emb = pin(
            bdf.where(F.col("embedding").isNotNull())
            .select(F.col("doc_id").cast("long").alias("vec_id"), "embedding")
            .join(shard.select(F.col("doc_id").alias("vec_id")),
                  "vec_id", "left_semi"))
        n_emb_checked = emb.count()
        kept_vecs = pin(embedding_dedup_against_index(
            emb, ann_index, threshold=emb_threshold, nprobe=nprobe,
            exclude_prefix=f"{day}."))
        emb_dropped = emb.select("vec_id").join(
            kept_vecs.select("vec_id"), "vec_id", "left_anti")
        shard = pin(shard.join(
            emb_dropped.select(F.col("vec_id").alias("doc_id")),
            "doc_id", "left_anti"))
    n_kept = shard.count()

    append_corpus_index(shard, text_index, shard=sub,
                        max_band_bucket=max_band_bucket)
    if kept_vecs is not None:
        final_vecs = kept_vecs.join(
            shard.select(F.col("doc_id").alias("vec_id")),
            "vec_id", "left_semi")
        append_ann_index(final_vecs, ann_index, shard=sub)
    if corpus_mode == "staged":
        # explicit-path overwrite: O(batch) write, no read-back, and a
        # zero-keeper batch still lands a schema-bearing file (the
        # partitionBy-zero-rows trap the indexes already avoid)
        shard.write.mode("overwrite").parquet(
            f"{warehouse}/corpus_live/day={day}/batch={int(batch_id)}")
    elif corpus_mode == "upsert":
        upsert_partitioned(
            spark, f"{warehouse}/corpus",
            shard.withColumn("day", F.lit(day)),
            key="doc_id", part_col="day")
    else:
        raise ValueError(f"corpus_mode must be 'staged' or 'upsert', "
                         f"got {corpus_mode!r}")
    return {"batch_id": int(batch_id), "n_in": n_in, "n_text_kept": n_text,
            "n_emb_checked": n_emb_checked, "n_kept": n_kept}


def fold_live_corpus(spark: SparkSession, warehouse: str, day: str) -> int:
    """Day-close fold for ``corpus_mode='staged'``: move the day's
    ``corpus_live/day=<day>/batch=*`` keepers into the canonical
    day-partitioned corpus with ONE `upsert_partitioned`, then drop the
    staged directory. Idempotent: the upsert replaces same-key rows, and
    a replay after the staging wipe no-ops (missing staging = nothing
    to fold). Returns the number of docs folded.

    Scale: O(day) read + one partition rewrite — the cost the per-batch
    upsert mode would have paid PER BATCH."""
    live = f"{warehouse}/corpus_live/day={day}"
    if not _exists(spark, live):
        return 0
    staged = spark.read.option("basePath", f"{warehouse}/corpus_live") \
        .parquet(live).drop("day", "batch")
    n = staged.count()
    if n:
        upsert_partitioned(
            spark, f"{warehouse}/corpus",
            staged.withColumn("day", F.lit(day)),
            key="doc_id", part_col="day")
    from tickdatapipeline_spark.operators.dedup import _wipe_path

    _wipe_path(spark, live)
    return n


def run_streaming_delta(
    spark: SparkSession,
    input_dir: str,
    warehouse: str,
    day: str,
    checkpoint_dir: str,
    *,
    max_files_per_trigger: int = 1,
    text_threshold: float = 0.5,
    emb_threshold: float = 0.96,
    nprobe: int = IVF_NPROBE,
    max_band_bucket: int | None = DEFAULT_MAX_BAND_BUCKET,
    corpus_mode: str = "staged",
    counters: "list | None" = None,
):
    """Durable runner for the live-ingest twin: JSONL documents
    (INGEST_SCHEMA; ``embedding`` null for text-only docs) ->
    `ingest_micro_batch` via foreachBatch -> the same warehouse the
    nightly loop maintains. Restart-safe: the checkpoint replays the
    uncommitted micro-batch, whose subshard/staging writes (and upsert,
    in upsert mode) are idempotent (see ingest_micro_batch). With the
    default ``corpus_mode='staged'``, call `fold_live_corpus` at day
    close. ``counters``: optional list the per-batch counter dicts are
    appended to (driver-side bookkeeping only)."""
    def _on_batch(bdf: DataFrame, batch_id: int) -> None:
        c = ingest_micro_batch(
            bdf, batch_id, warehouse, day,
            text_threshold=text_threshold, emb_threshold=emb_threshold,
            nprobe=nprobe, max_band_bucket=max_band_bucket,
            corpus_mode=corpus_mode)
        if counters is not None:
            counters.append(c)

    return (
        spark.readStream.schema(INGEST_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(input_dir)
        .writeStream.foreachBatch(_on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
