"""Event-time streaming: watermarked windowed aggregation.

The tick pipeline itself is count-ordered by contract (SURVEY §2.9 — the
reference's Channel guarantees order, so the runner uses foreachBatch
with exact prefix-aggregate state and no watermark). The EVENTS surface
is different: event streams arrive out of order in any real deployment,
and the idiomatic Spark answer is `withWatermark` + `F.window` — late
rows within the watermark are merged into their window, rows later than
the watermark are dropped, and window results emit once finalized
(append mode). This module is the streaming twin of
plans/beyond.py::windowed_events_fn, sharing its bucket semantics
(1-hour tumbling, exact integer cents).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tickdatapipeline_spark.functions.rounding import rnd
from tickdatapipeline_spark.operators.text import h60

EVENT_SCHEMA = "event_id long, tus long, event_type string, value double"
SESSION_SCHEMA = "event_id long, tus long, user_id long"


def windowed_events_stream(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "2 hours",
    window: str = "1 hour",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """readStream over JSON event files -> watermarked tumbling-window
    aggregation. Returns the streaming DataFrame; callers attach a sink
    (append mode — a window emits exactly once, after the watermark
    passes its end).

    `tus` is epoch-micros (the cross-engine integer convention of the
    batch plans); it converts to a TIMESTAMP column only for the
    watermark/window machinery, and the emitted `window_start_s` is
    integer epoch-seconds again, matching the batch twin's output.
    """
    raw = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )
    ev = raw.withColumn("ts", F.timestamp_micros(F.col("tus")))
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")  # exact cents
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), (F.sum(vc) / 100.0).alias("sum_value"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("window_start_s"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def hourly_ohlc_stream(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "2 hours",
    window: str = "1 hour",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming twin of the batch hourly OHLC candles
    (plans/beyond.py::hourly_ohlc_fn): watermarked tumbling windows,
    each candle emitted exactly once after the watermark passes its
    end (append mode) — the live resampling every metrics dashboard
    charts.

    Open/close come from min_by/max_by on a STRUCT order key
    (tus, event_id) — total event-time order with the batch twin's
    event_id tie-break, equivalent to hourly_ohlc_fn's packed BIGINT
    key but valid for ANY window length (the packed form folds micros
    modulo one hour, which would mis-order opens/closes across a
    "2 hours" or "1 day" window) and with no packable-range
    raise_error to poison the stream. Finalized candles equal the
    batch query over the on-time rows bit-for-bit (pinned by the
    stream==batch test). min_by/max_by are declarative aggregates
    with a one-pair partial state, so the streaming agg state per
    open window is O(1) per (hour, type): four extremes + count,
    never the rows.

    Late contract: a row later than the watermark relative to its hour
    is dropped by the engine before the aggregate; an on-time late row
    within the watermark still lands in its (not-yet-finalized)
    candle — exactly the tumbling-window semantics of
    windowed_events_stream."""
    raw = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )
    # quarantine at ingest: no event time -> cannot window; no
    # event_id -> no deterministic open/close tie-break (and the batch
    # twin's packed key would raise on it) — the partial-JSON poison
    # row must not reach the aggregate
    raw = raw.where(F.col("tus").isNotNull() & F.col("event_id").isNotNull())
    ev = raw.withColumn("ts", F.timestamp_micros(F.col("tus")))
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    okey = F.struct(F.col("tus"), F.col("event_id"))
    return (
        ev.select("ts", "event_type", vc.alias("vc"), okey.alias("ok"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.min_by("vc", "ok") / 100.0).alias("open"),
            (F.max("vc") / 100.0).alias("high"),
            (F.min("vc") / 100.0).alias("low"),
            (F.max_by("vc", "ok") / 100.0).alias("close"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("hour_s"),
            "event_type", "n_events", "open", "high", "low", "close",
        )
    )


def run_hourly_ohlc_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    **kwargs,
):
    """Durable runner for hourly_ohlc_stream: finalized candles append
    to parquet (a native append-mode sink recovers from its checkpoint
    without foreachBatch bookkeeping — each window commits exactly
    once, so a restart neither drops nor duplicates candles; pinned by
    the restart test, which splits an hour's rows AND the finalizing
    watermark advance across two query instances)."""
    return (
        hourly_ohlc_stream(spark, input_dir, **kwargs)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def sessionized_events_stream(
    spark: SparkSession,
    input_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """readStream -> F.session_window sessionization: per-user sessions
    close after a `gap` of inactivity, finalize once the watermark
    passes session end + gap, and emit exactly once (append mode) — the
    streaming twin of the batch gaps-and-islands sessionization
    (plans/beyond.py::sessionize_fn, same 30-min default gap).

    Output: (user_id, session_start_s, n_events, duration_s) — session
    ids are start-times here rather than per-user ordinals (a streaming
    operator cannot number sessions it has not seen yet), and
    duration_s spans start to last-event + gap (F.session_window's end
    bound), unlike the batch twin's last-minus-first."""
    raw = (
        spark.readStream.schema(SESSION_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )
    ev = raw.withColumn("ts", F.timestamp_micros(F.col("tus")))
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("w.start")).cast("long").alias("session_start_s"),
            "n_events",
            (F.unix_timestamp(F.col("w.end")) - F.unix_timestamp(F.col("w.start")))
            .cast("long")
            .alias("duration_s"),
        )
    )


def deduped_events_stream(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "2 hours",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming exactly-once event dedup: `dropDuplicatesWithinWatermark`
    on event_id — at-least-once upstream delivery (retries, replayed
    files) collapses to one row per event as long as the duplicate
    arrives within the watermark of the original. State is one entry per
    event_id seen inside the watermark horizon, evicted as the watermark
    advances — bounded state, unlike a global dropDuplicates.

    The training-data analog: ingest-time dedup of a crawled event/log
    stream before it ever lands in the corpus."""
    raw = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )
    ev = raw.withColumn("ts", F.timestamp_micros(F.col("tus")))
    return (
        ev.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "tus", "event_type", "value")
    )


CLICK_SCHEMA = "event_id long, tus long, user_id long"
PURCHASE_SCHEMA = "event_id long, tus long, user_id long"


def attributed_clicks_stream(
    spark: SparkSession,
    clicks_dir: str,
    purchases_dir: str,
    lookback: str = "4 hours",
    watermark: str = "2 hours",
    max_files_per_trigger: int = 1,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream watermarked interval join — the streaming twin of
    the batch attribution range join (plans/beyond.py::attribution_fn):
    each click joins every purchase by the same user whose timestamp is
    within ``lookback`` AFTER the click.

    ``how="leftOuter"`` adds the UNCONVERTED clicks: a click that finds
    no purchase emits exactly once, with NULL purchase_event_id/lag_s,
    when the watermark has passed the end of its join window (click_ts
    + lookback) — the engine cannot know "no purchase will come"
    earlier, so outer results are inherently delayed by lookback +
    watermark; the matched rows are identical to the inner join's
    (both pinned in test_streaming). The funnel/abandonment shape every
    attribution pipeline also needs — an inner join silently loses the
    non-converting majority.

    Spark's stream-stream inner join keeps BOTH sides in state; the
    watermarks plus the explicit event-time range condition are what
    bound it — the engine derives, from ``click_ts >= purchase_ts -
    lookback`` and ``click_ts <= purchase_ts``, exactly how long a
    buffered click can still find a future purchase (lookback +
    watermark) and how long a purchase can still meet a late click
    (watermark), and evicts state past those horizons. Without the range
    condition the state would grow without bound; with it this runs
    forever on an unbounded clickstream. Late contract (append mode):
    a row later than its side's watermark can no longer join once the
    engine has run state eviction for the passed watermark — eviction
    executes at the END of the micro-batch in which the watermark
    advanced, so the guarantee takes effect from the following batch
    (pinned in test_streaming).

    Output matches the batch twin's shape: (user_id, click_event_id,
    purchase_event_id, lag_s).
    """
    clicks = (
        spark.readStream.schema(CLICK_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(clicks_dir)
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_event_id"),
            F.timestamp_micros(F.col("tus")).alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        spark.readStream.schema(PURCHASE_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(purchases_dir)
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_event_id"),
            F.timestamp_micros(F.col("tus")).alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"how must be 'inner' or 'leftOuter', got {how!r}")
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        how,
    )
    return joined.select(
        "user_id",
        "click_event_id",
        "purchase_event_id",
        F.expr(
            "(unix_micros(purchase_ts) - unix_micros(click_ts)) DIV 1000000"
        ).alias("lag_s"),
    )


def run_windowed_events_to_memory(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    table_name: str = "windowed_events_stream",
    **kwargs,
) -> "object":
    """Start the watermarked aggregation into an in-memory append sink
    (finalized windows only). Returns the StreamingQuery; callers drive
    it with processAllAvailable()/stop() and read
    `spark.table(table_name)`."""
    df = windowed_events_stream(spark, input_dir, **kwargs)
    return (
        df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def value_histogram_stream(
    spark: SparkSession,
    input_dir: str,
    bin_cents: int = 2_000,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming twin of plans/beyond.py::value_histogram_fn: a running
    equal-width histogram of event values per event type, updated every
    micro-batch. Same exact integer-cents binning (sign-safe FLOOR
    division) so the converged stream equals the batch histogram
    bit-for-bit (pinned by the stream==batch test).

    State posture: this is an UNWATERMARKED streaming aggregation — the
    legitimate case, because the state is the histogram itself:
    O(|types| x |bins|) rows bounded by the value range, NOT by stream
    length (unlike per-key aggregations over unbounded key spaces,
    which need a watermark to evict). Emit via complete/update mode.
    """
    ev = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(input_dir)
    )
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = bin_cents
    floor_div = (
        f"CASE WHEN vc < 0 THEN -((-vc + {w - 1}) DIV {w}) ELSE vc DIV {w} END"
    )
    return (
        ev.select("event_type", vc.alias("vc"))
        .withColumn("bin_id", F.expr(floor_div))
        .groupBy("event_type", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("vc") / 100.0).alias("sum_value"),
        )
        .select(
            "event_type", "bin_id", "n_events",
            (F.lit(bin_cents) * F.col("bin_id") / 100.0).alias("bin_lo"),
            "sum_value",
        )
    )


def run_value_histogram_to_memory(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    table_name: str = "value_histogram_stream",
    **kwargs,
) -> "object":
    """Start the running histogram into an in-memory COMPLETE sink (the
    whole small result re-emits per batch — correct for a dashboard
    gauge of bounded size). Returns the StreamingQuery."""
    df = value_histogram_stream(spark, input_dir, **kwargs)
    return (
        df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def enriched_events_stream(
    spark: SparkSession,
    input_dir: str,
    dim: DataFrame,
    on: str = "user_id",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Stream-static join: enrich the event stream with a batch
    dimension table — the remaining Structured Streaming join class
    (stream-stream lives in ``attributed_clicks_stream``). Stateless
    (each micro-batch joins independently, no watermark); Spark
    broadcasts the dimension when small.

    The static side's plan — including a file source's LISTING — is
    resolved ONCE at query start, so a dimension rewritten on disk
    mid-query is NOT picked up (Spark fails the batch with
    FILE_NOT_EXIST); ``spark.catalog.refreshByPath`` only helps plans
    built after the refresh, not a running stream. For a dimension that
    must refresh without a query restart use
    ``run_enriched_events_refreshable`` (foreachBatch re-reads the
    dimension every batch — the standard pattern).
    """
    raw = (
        spark.readStream.schema(SESSION_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )
    return raw.join(dim, on=on, how="left")


def run_enriched_events_refreshable(
    spark: SparkSession,
    input_dir: str,
    dim_path: str,
    out_dir: str,
    checkpoint_dir: str,
    on: str = "user_id",
    max_files_per_trigger: int = 1,
) -> "object":
    """Slowly-changing-dimension enrichment that picks up dimension
    refreshes WITHOUT restarting the query: ``foreachBatch`` constructs
    the dimension frame from ``dim_path`` inside every micro-batch, so
    each batch joins against the files present at that moment
    (overwrites included — nothing is cached across batches).

    Output is parquet under ``out_dir`` partitioned by ``batch_id``
    (readers see it as an extra partition column). foreachBatch is
    at-least-once — a micro-batch replayed after a failure between the
    write and the checkpoint commit runs the writer again — so the
    writer is made idempotent BY batch id: each batch dynamically
    overwrites exactly its own ``batch_id=N`` partition, and a replay
    rewrites the same files instead of appending duplicates. That
    checkpoint + idempotent-writer pair is what upgrades the sink to
    effectively exactly-once (the contract Delta's txn-id dedup gives
    for free; plain parquet needs the partition trick).

    This is the deployment answer to "my user table updates hourly":
    the stream-static plan-capture limitation (see
    ``enriched_events_stream``) disappears because the static plan is
    rebuilt per batch — at the cost of re-resolving + (when not
    broadcast) re-shuffling the dimension each interval.
    """
    raw = (
        spark.readStream.schema(SESSION_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )

    return (
        raw.writeStream.foreachBatch(_idempotent_enrich_writer(dim_path, out_dir, on))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def _write_batch_idempotent(df: DataFrame, out_dir: str, batch_id: int) -> None:
    """Idempotent-by-batch-id parquet write for foreachBatch sinks:
    stamps the batch id and dynamically overwrites ONLY the batch's own
    ``batch_id=N`` partition, so an at-least-once replay rewrites the
    same files instead of appending duplicates."""
    (
        df.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(out_dir)
    )


def _idempotent_enrich_writer(dim_path: str, out_dir: str, on: str):
    """Batch writer for run_enriched_events_refreshable: re-reads the
    dimension, joins, and writes via _write_batch_idempotent — calling
    it twice with the same batch_id (a foreachBatch replay) leaves the
    sink unchanged."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        dim = batch_df.sparkSession.read.parquet(dim_path)
        _write_batch_idempotent(batch_df.join(dim, on=on, how="left"), out_dir, batch_id)

    return _process


DOC_SCHEMA = "doc_id long, text string, lang string"


def run_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    delay: str = "1 hour",
    max_files_per_trigger: int = 1,
):
    """Streaming exact dedup at ingest: keep the FIRST arrival of each
    normalized content hash; later copies arriving within the watermark
    horizon are dropped — the streaming twin of
    operators/dedup.exact_duplicates, via the engine's native
    ``dropDuplicatesWithinWatermark`` (not a hand-rolled state store).

    Scale contract: the dedup state holds one entry per DISTINCT hash
    seen within the watermark horizon and is evicted as event time
    advances — bounded by arrival rate x horizon, unlike a bare
    ``dropDuplicates`` whose state grows forever. A duplicate arriving
    AFTER the horizon is readmitted by design (same trade every
    watermarked dedup makes); the batch `exact_duplicates` pass is the
    full-corpus backstop.

    Input JSONL: (doc_id, text, lang, ts event-time timestamp). Output
    parquet: first-arrival docs with their content_hash, appended per
    micro-batch.

    The dedup KEY is sha2-256 of the normalized text, not the 60-bit
    h60 the batch manifest reports: in `exact_duplicates` a cross-doc
    hash collision merely overcounts a manifest row, but here a
    collision within the watermark horizon would silently DROP a
    distinct document at ingest — unrecoverable loss in the sink. The
    reported `content_hash` column stays h60 for parity with the batch
    manifest.
    """
    raw = (
        spark.readStream.schema("doc_id long, text string, lang string, ts timestamp")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )
    # corrupt JSONL lines (all-null rows, null event time) cannot join
    # watermarked dedup — quarantine at ingest, same as the near-dup tier
    raw = raw.where(F.col("ts").isNotNull())
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    # sha2 of a NULL text is NULL, and dropDuplicatesWithinWatermark
    # treats null keys as EQUAL — distinct metadata-only docs within the
    # horizon would collapse to one. Fall back to a per-doc key (and
    # uuid for rows with neither text nor doc_id), mirroring the
    # near-dup stream's fallback_key arms.
    dedup_key = F.coalesce(
        F.sha2(F.encode(norm, "utf-8"), 256),
        F.concat(F.lit("null-text:"), F.col("doc_id").cast("string")),
        F.expr("uuid()"),
    )
    deduped = (
        raw.withColumn("content_hash", h60(norm))
        .withColumn("content_sha", dedup_key)
        .withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["content_sha"])
        .drop("content_sha")
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


NEARDUP_OUT = "doc_id long, text string, lang string, ts timestamp, matched boolean"
# per-bucket entries: MinHash signatures flattened end-to-end (every
# entry in one bucket has the same length — num_perm for real bands,
# 0 for the exact-fallback band -1 — so the stride is len//n_entries)
# plus each entry's first-arrival anchor in epoch-ms
NEARDUP_STATE = "sigs array<long>, anchors_ms array<long>"


def make_band_verify_kernel(delay_ms: int, num_perm: int, threshold: float):
    """applyInPandasWithState kernel for run_neardup_dedup_stream: one
    GroupState per (band, band_key) bucket holding the full MinHash
    signatures (plus first-arrival anchors) of the docs that ANCHORED
    the bucket within the horizon. An arrival is matched — dropped by
    the foreachBatch regroup — only when its estimated Jaccard against
    a stored signature (agreeing lanes / num_perm) clears ``threshold``:
    the LSH-then-VERIFY contract the perceptual stream
    (`make_phash_dedup_kernel`) already enforces. A band collision
    between NON-duplicates (est below threshold) leaves BOTH documents
    in the sink and registers the newcomer as its own entry — under the
    previous band-seen formulation it silently lost the second doc at
    ingest with no recovery short of re-ingesting from source. Entries
    in the exact-fallback bucket (band -1, keyed by content sha) carry
    EMPTY signatures; any same-bucket pair there is byte-identical
    content, so presence alone verifies.

    Rows of a micro-batch are concatenated across Arrow chunks and
    sorted by (ts, doc_id) BEFORE verification, so the survivor of a
    same-batch collision is the deterministic event-time-first arrival
    in EVERY bucket the pair shares.

    Expiry stays FIRST-ANCHORED per entry, matching
    dropDuplicatesWithinWatermark (and run_dedup_stream): an entry
    suppresses its near-dups for ``delay_ms`` past ITS first arrival's
    event time, matched (dropped) copies do NOT extend it, and anchors
    are checked against the watermark on every invocation — an expired
    entry readmits a same-batch arrival rather than over-suppressing
    until the timeout fires, and the readmitted arrival re-anchors.
    The event-time timeout is re-armed on EVERY invocation that leaves
    state behind (GroupState resets the timeout each call — setting it
    only when a new anchor lands would leave a bucket whose last batch
    was matched-only unexpirable, unbounded state growth)."""

    def kernel(key, pdfs, state) -> "Iterator[pd.DataFrame]":
        if state.hasTimedOut:
            state.remove()
            return
        wm = state.getCurrentWatermarkMs()
        sigs, anchors = [], []
        if state.exists:
            flat, anchors = list(state.get[0]), list(state.get[1])
            stride = len(flat) // len(anchors) if anchors else 0
            sigs = [flat[i * stride:(i + 1) * stride] for i in range(len(anchors))]
            live = [i for i, a in enumerate(anchors) if a + delay_ms > wm]
            sigs = [sigs[i] for i in live]
            anchors = [anchors[i] for i in live]
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            # defensive (non-timeout invocations normally carry rows):
            # persist the eviction and RE-ARM the timeout — GroupState
            # clears it every invocation, so skipping the re-arm here
            # would leave surviving entries unexpirable
            if anchors:
                state.update(([v for s in sigs for v in s], anchors))
                state.setTimeoutTimestamp(max(max(anchors) + delay_ms, wm + 1000))
            elif state.exists:
                state.remove()
            yield pdf[["doc_id", "text", "lang", "ts"]].assign(
                matched=pd.Series([], dtype=bool))
            return
        pdf = pdf.sort_values(["ts", "doc_id"], ignore_index=True)
        matched = []
        for sig, t in zip(pdf["sig"], pdf["ts"]):
            sig = [int(v) for v in sig]
            if sig:
                m = any(
                    sum(a == b for a, b in zip(sig, s)) >= threshold * num_perm
                    for s in sigs if s
                )
            else:  # exact-fallback bucket: same band_key == same content
                m = len(anchors) > 0
            matched.append(m)
            if not m:  # first-anchored: dropped copies never extend
                sigs.append(sig)
                anchors.append(int(t.value) // 1_000_000)
        out = pdf[["doc_id", "text", "lang", "ts"]].copy()
        out["matched"] = matched
        state.update(([v for s in sigs for v in s], anchors))
        state.setTimeoutTimestamp(max(max(anchors) + delay_ms, wm + 1000))
        yield out

    return kernel


def _delay_to_ms(delay: str) -> int:
    """'1 hour' / '30 minutes' / '10 seconds' -> milliseconds (the
    CalendarInterval subset the dedup streams accept)."""
    qty, unit = delay.strip().split()
    unit = unit.rstrip("s")
    factor = {"millisecond": 1, "second": 1000, "minute": 60_000,
              "hour": 3_600_000, "day": 86_400_000}[unit]
    return int(qty) * factor


def run_neardup_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    delay: str = "1 hour",
    num_perm: int = 32,
    band_size: int = 4,
    threshold: float = 0.5,
    max_files_per_trigger: int = 1,
):
    """Streaming NEAR-dup dedup at ingest — the fuzzy tier above
    `run_dedup_stream`: a token-perturbed copy of a recent document is
    dropped, not just a byte-identical one.

    Mechanics — streaming LSH-then-VERIFY, the same contract as the
    batch pass and the perceptual stream: each arrival's MinHash-LSH
    band keys AND its full MinHash signature are computed ROW-LOCALLY
    (operators/dedup.rowlocal_band_signature /
    rowlocal_minhash_signature — same lanes as the batch
    `_minhash_wide`, no shuffle), the doc explodes into one row per
    band carrying the signature, and a stateful verify operator
    (`make_band_verify_kernel` via applyInPandasWithState, one
    GroupState of (signature, anchor) entries per bucket) flags a row
    only when its ESTIMATED JACCARD (agreeing lanes / num_perm) against
    a stored horizon-live entry clears ``threshold`` — by an earlier
    batch within the watermark horizon, or by an earlier (ts, doc_id)-
    ordered row of the SAME batch, deterministically. The foreachBatch
    regroup keeps a doc iff NO band verified a match. A band collision
    between non-duplicates therefore passes BOTH docs (previously it
    dropped the newcomer at candidate level — unrecoverable loss); the
    estimate-vs-exact gap (binomial, s.d. ~ sqrt(J(1-J)/num_perm)) is
    the only divergence from the batch `jaccard_pairs` backstop, the
    same trade `minhash_jaccard_estimates` documents.

    Docs too short to shingle (< 3 tokens: no band keys, invisible to
    batch LSH too) fall back to EXACT dedup via a single synthetic band
    keyed by the sha2-256 of their normalized content (band -1) — never
    the empty key, which would alias every short doc together; a NULL
    text (metadata-only doc) gets a per-doc unique key instead of the
    null digest, because null keys comparing equal would silently
    dedupe distinct metadata-only records against each other.

    Scale contract: dedup state holds one num_perm-long signature plus
    an 8-byte anchor per ANCHORED doc per band within the horizon —
    bounded by arrival rate x horizon x (num_perm/band_size) x
    (num_perm + 1) longs, removed per-entry as the watermark passes
    each anchor and wholesale by event-time timeout (re-armed every
    invocation) for idle buckets. Per-arrival CPU is O(bucket
    occupancy x num_perm) lane comparisons — the verify work the batch
    pass does per candidate. The regroup is micro-batch-local (all of
    a doc's band rows explode inside its own batch), never a streaming
    aggregate; the sink write is replay-idempotent
    (_write_batch_idempotent).

    State-schema migration note: r10's LSH-then-verify rework changed
    the GroupState layout from (anchor_ms long) to the
    (sigs, anchors_ms) array pair — a checkpoint written by the old
    kernel fails Spark's state-schema compatibility check at restart.
    The sanctioned migration is a NEW checkpoint_dir + re-ingesting
    the horizon window from source (the batch pass backstops anything
    the fresh state misses); applyInPandasWithState has no in-place
    state upgrade path.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from tickdatapipeline_spark.operators.dedup import (
        rowlocal_bands_from_signature,
        rowlocal_minhash_signature,
    )

    raw = (
        spark.readStream.schema("doc_id long, text string, lang string, ts timestamp")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )
    # a corrupt JSONL line parses to an all-null row; without an event
    # time it cannot participate in watermarked dedup (and a NaT would
    # crash the kernel's timestamp math) — drop it at ingest, the same
    # posture as the batch reader's PERMISSIVE quarantine
    raw = raw.where(F.col("ts").isNotNull())
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    # final arm: uuid() so a row with NEITHER text NOR doc_id never
    # aliases another (concat with a null doc_id is itself null, and
    # null band_keys compare equal in the groupBy) — such anonymous
    # rows always pass, the only safe default for identity-less input
    fallback_key = F.coalesce(
        F.sha2(F.encode(norm, "utf-8"), 256),
        F.concat(F.lit("null-text:"), F.col("doc_id").cast("string")),
        F.expr("uuid()"),
    )
    # the signature is computed ONCE per arrival; band keys are pure
    # string concatenations of its slices (rowlocal_bands_from_signature),
    # so the ingest hot path pays the gram hashing + num_perm lane
    # minima a single time — the sig column rides to the verify kernel
    # anyway. The fallback (short/null-text) arm is the EMPTY array:
    # presence in the sha-keyed band -1 bucket already proves exact
    # equality
    sig = rowlocal_minhash_signature(F.col("text"), num_perm)
    staged = raw.select("doc_id", "text", "lang", "ts", sig.alias("sig"))
    keys = rowlocal_bands_from_signature(F.col("sig"), num_perm, band_size)
    bands = F.when(F.size(keys) > 0, keys).otherwise(F.array(F.struct(
        F.lit(-1).alias("band"), fallback_key.alias("band_key"),
    )))
    flagged = (
        staged.select("doc_id", "text", "lang", "ts", "sig",
                      F.explode(bands).alias("bk"))
        .select("doc_id", "text", "lang", "ts", "sig",
                F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
        .withWatermark("ts", delay)
        .groupBy("band", "band_key")
        .applyInPandasWithState(
            make_band_verify_kernel(_delay_to_ms(delay), num_perm, threshold),
            outputStructType=NEARDUP_OUT,
            stateStructType=NEARDUP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

    def _keep_unmatched(batch_df: DataFrame, batch_id: int) -> None:
        keep = (
            batch_df.groupBy("doc_id", "text", "lang", "ts")
            .agg(F.max(F.col("matched").cast("int")).alias("any_matched"))
            .where(F.col("any_matched") == 0)
            .drop("any_matched")
        )
        _write_batch_idempotent(keep, out_dir, batch_id)

    return (
        flagged.writeStream.foreachBatch(_keep_unmatched)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


PHASH_DEDUP_OUT = "media_id long, kind string, phash long, ts timestamp, matched boolean"
PHASH_DEDUP_STATE = "phashes array<long>, ts_ms array<long>"


def make_phash_dedup_kernel(max_hamming: int = 8):
    """applyInPandasWithState kernel for run_phash_dedup_stream: one
    GroupState per (band, band_key) bucket holding the (phash, event-ms)
    pairs seen within the watermark horizon. Each arrival is VERIFIED
    by exact Hamming distance against the bucket's stored phashes (the
    batch LSH-then-verify contract, not candidate-level drops — 7-bit
    band values saturate at ~128 distinct values, so unverified band
    collisions would reject everything once the horizon holds a few
    hundred payloads), then inserted so later arrivals match it.
    Arrow chunks of one micro-batch are CONCATENATED before the
    (ts, media_id) sort — a per-chunk sort would let a later-ts payload
    in an earlier chunk pre-register and drop the true first arrival
    nondeterministically whenever a bucket's batch spans chunks.
    Entries older than the watermark are evicted on every invocation;
    an idle bucket's whole state is removed by event-time timeout.

    Suppression is SLIDING, deliberately unlike the text stream's
    first-anchored verify kernel: every arrival — kept or dropped —
    registers its own (phash, ts) entry, so a perceptual copy chain
    (A, then B near A, then C near B but not A) keeps collapsing to A
    exactly as the batch connected-components cluster would, and a
    periodic perceptual copy stays suppressed for as long as copies
    keep arriving within the horizon of the LAST one. Deployments
    wanting horizon-readmission semantics run the batch pass on a
    schedule instead."""

    def kernel(key, pdfs, state) -> "Iterator[pd.DataFrame]":
        if state.hasTimedOut:
            state.remove()
            return
        phashes, ts_ms = (
            (list(state.get[0]), list(state.get[1])) if state.exists else ([], [])
        )
        wm = state.getCurrentWatermarkMs()
        if wm > 0 and ts_ms:
            live = [i for i, t in enumerate(ts_ms) if t >= wm]
            phashes = [phashes[i] for i in live]
            ts_ms = [ts_ms[i] for i in live]
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            # defensive (non-timeout invocations normally carry rows):
            # persist the eviction — skipping the update here would
            # resurrect the just-filtered stale entries — and RE-ARM
            # the timeout (GroupState clears it every invocation;
            # updating without re-arming would leave the surviving
            # entries unexpirable until another arrival)
            if ts_ms:
                state.update((phashes, ts_ms))
                state.setTimeoutTimestamp(max(max(ts_ms) + 1000, wm + 1000))
            elif state.exists:
                state.remove()
            out = pdf[["media_id", "kind", "phash", "ts"]].copy()
            out["matched"] = pd.Series([], dtype=bool)
            yield out
            return
        pdf = pdf.sort_values(["ts", "media_id"], ignore_index=True)
        matched = []
        for ph, t in zip(pdf["phash"], pdf["ts"]):
            ph = int(ph)
            matched.append(any(
                bin(ph ^ p).count("1") <= max_hamming for p in phashes
            ))
            phashes.append(ph)
            ts_ms.append(int(t.value) // 1_000_000)
        out = pdf[["media_id", "kind", "phash", "ts"]].copy()
        out["matched"] = matched
        state.update((phashes, ts_ms))
        state.setTimeoutTimestamp(max(max(ts_ms) + 1000, wm + 1000))
        yield out

    return kernel


def run_phash_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    delay: str = "1 hour",
    max_hamming: int = 8,
    max_files_per_trigger: int = 1,
    decode_matrix=None,
):
    """Streaming PERCEPTUAL media dedup at ingest — the media twin of
    `run_neardup_dedup_stream`: an arriving payload whose pHash sits
    within ``max_hamming`` bits of anything seen inside the watermark
    horizon is dropped (re-encode/crop-level copies, not just
    byte-identical ones), with the batch `phash_near_duplicates` exact
    semantics preserved.

    Mechanics — streaming LSH-then-VERIFY: `multimodal.
    perceptual_fingerprints` runs on the stream (mapInPandas works
    unchanged on streaming DataFrames; the event-time column rides
    through as a passthrough so the watermark survives the Arrow hop);
    the 63-bit phash splits into 9 pigeonhole bands of 7 bits —
    max_hamming <= 8 means a true near-dup ALWAYS lands in at least one
    shared bucket (the simhash no-recall-loss argument) — and a custom
    stateful operator (`applyInPandasWithState`, one GroupState per
    band bucket) checks EXACT Hamming distance against the bucket's
    horizon-bounded phash list. A payload is kept iff no band reported
    a verified match (micro-batch-local regroup in foreachBatch,
    replay-idempotent sink).

    Input JSONL: (media_id, kind, payload TEXT, ts) — payload utf-8
    encodes to the binary content, the same sanctioned-stub convention
    as synth_media_from_documents; a real deployment reads binary
    file/parquet streams and passes its real grayscale decoder as
    ``decode_matrix`` (forwarded verbatim to perceptual_fingerprints —
    it must accept empty/None payloads because of keep_empty below;
    injection is pinned by
    tests/test_streaming.py::test_phash_real_decoder_injection).

    State bound: each payload stores 9 (long, long) entries, one per
    band bucket, watermark-evicted — O(arrival rate x horizon), with
    idle buckets fully removed by event-time timeout. Per-arrival CPU
    is O(bucket occupancy) exact Hamming checks — the same verify work
    the batch pass does per candidate."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from tickdatapipeline_spark.operators.multimodal import perceptual_fingerprints

    raw = (
        spark.readStream.schema(
            "media_id long, kind string, payload string, ts timestamp")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )
    media = raw.where(
        F.col("ts").isNotNull() & F.col("media_id").isNotNull()
    ).select(
        "media_id", "kind", F.encode("payload", "utf-8").alias("content"), "ts"
    )  # null event time (corrupt line) cannot join watermarked dedup;
    # a null media_id (valid ts, corrupt id field) would crash the
    # fingerprint kernel's int64 cast — quarantine both at ingest
    # keep_empty: a no-content arrival must not silently vanish from the
    # sink — it fingerprints to phash 0 and dedups against other
    # no-content (and perceptually-flat) arrivals instead
    fp = perceptual_fingerprints(media, decode_matrix=decode_matrix,
                                 passthrough=("ts",), keep_empty=True)
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("phash"), b * 7)
            .bitwiseAND(F.lit(127)).alias("band_key"),
        )
        for b in range(9)
    ])
    flagged = (
        fp.select("media_id", "kind", "phash", "ts",
                  F.explode(band_structs).alias("bk"))
        .select("media_id", "kind", "phash", "ts",
                F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
        .withWatermark("ts", delay)
        .groupBy("band", "band_key")
        .applyInPandasWithState(
            make_phash_dedup_kernel(max_hamming),
            outputStructType=PHASH_DEDUP_OUT,
            stateStructType=PHASH_DEDUP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

    def _keep_unmatched(batch_df: DataFrame, batch_id: int) -> None:
        keep = (
            batch_df.groupBy("media_id", "kind", "phash", "ts")
            .agg(F.max(F.col("matched").cast("int")).alias("any_matched"))
            .where(F.col("any_matched") == 0)
            .drop("any_matched")
        )
        _write_batch_idempotent(keep, out_dir, batch_id)

    return (
        flagged.writeStream.foreachBatch(_keep_unmatched)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def run_ingest_decontamination(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    max_files_per_trigger: int = 1,
) -> "object":
    """Ingest-time decontamination: stream newly crawled documents and
    flag, per micro-batch, any that near-duplicate the existing corpus
    — the streaming composition of ``contamination_against_index``.

    The corpus side is the precomputed LSH index written by
    ``operators.dedup.write_corpus_index`` (band + shingle parquet
    tables); only the incoming micro-batch computes signatures, so
    per-batch cost is O(batch) map-side work plus index joins on
    compact band keys. The index is re-read from ``index_path`` every
    batch (same refresh contract as the refreshable dimension join:
    an on-disk index rebuild is picked up without a query restart).

    Output parquet under ``out_dir`` (partitioned by batch_id,
    idempotent under replay — see _write_batch_idempotent): one row per
    incoming document with its verdict —
    (doc_id, is_contaminated, corpus_doc_id, jaccard), where
    corpus_doc_id/jaccard describe the BEST matching corpus document
    (max jaccard, ties to the highest corpus id) or NULL when clean.
    """
    from tickdatapipeline_spark.operators.dedup import contamination_against_index

    raw = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        hits = contamination_against_index(
            batch_df,
            sp.read.parquet(f"{index_path}/bands"),
            sp.read.parquet(f"{index_path}/shingles"),
            threshold=threshold,
            # the index is skew-capped once at write_corpus_index time;
            # None here avoids re-sizing the static index every batch
            max_band_bucket=None,
        )
        best = (
            hits.groupBy("probe_doc_id")
            .agg(F.max(F.struct("jaccard", "corpus_doc_id")).alias("m"))
            .select(
                F.col("probe_doc_id").alias("doc_id"),
                F.col("m.corpus_doc_id").alias("corpus_doc_id"),
                F.col("m.jaccard").alias("jaccard"),
            )
        )
        verdicts = (
            batch_df.select("doc_id")
            .join(best, on="doc_id", how="left")
            .select(
                "doc_id",
                F.col("corpus_doc_id").isNotNull().alias("is_contaminated"),
                "corpus_doc_id",
                "jaccard",
            )
        )
        _write_batch_idempotent(verdicts, out_dir, batch_id)

    return (
        raw.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def run_snapshot_diff_stream(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    seed_fingerprints: str | None = None,
    max_files_per_trigger: int = 1,
) -> "object":
    """Live crawl-refresh audit: each arriving file is a NEW FULL
    corpus snapshot (one file per trigger); every micro-batch diffs it
    against the PREVIOUS snapshot's fingerprint parquet and classifies
    every doc_id as added / removed / changed / unchanged — the
    streaming twin of ``operators.text.snapshot_diff``, sharing its
    ``fingerprint_diff`` sub-DAG (one full-outer join on (doc_id,
    fp64), never text).

    Incremental by construction: the previous snapshot contributes only
    its stored fingerprints (``store_dir``/batch_id=N parquet) — its
    text is never re-read or re-hashed. The first batch diffs against
    ``seed_fingerprints`` (a parquet written by
    ``operators.text.fingerprint``) or, when None, an empty snapshot
    (everything reports "added").

    Replay-idempotent end to end: the diff goes through the
    ``batch_id=N``-partitioned sink (_write_batch_idempotent), the new
    fingerprints overwrite their own ``store_dir``/batch_id=N
    directory, and the diff always reads the LATEST store entry with id
    STRICTLY BELOW the current batch — so a foreachBatch replay of
    batch N re-reads the same predecessor and rewrites the same files.

    Scale: per batch, one fingerprint projection over the incoming
    snapshot (map-side) + one co-partitioned full-outer join of compact
    (doc_id, fp64) pairs; the store grows one fingerprint table per
    refresh (the audit trail), with old entries free to age out —
    only the latest is ever read.
    """
    from tickdatapipeline_spark.operators.text import fingerprint, fingerprint_diff

    raw = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )

    def _latest_store_batch(sp: SparkSession, below: int) -> int | None:
        # enumerate store_dir/batch_id=N children via the JVM Hadoop FS
        # (works on any supported filesystem, not just local paths)
        jvm = sp._jvm
        path = jvm.org.apache.hadoop.fs.Path(store_dir)
        fs = path.getFileSystem(sp._jsc.hadoopConfiguration())
        if not fs.exists(path):
            return None
        best = None
        for st in fs.listStatus(path):
            name = st.getPath().getName()
            if name.startswith("batch_id="):
                try:
                    n = int(name.split("=", 1)[1])
                except ValueError:
                    continue
                if n < below and (best is None or n > best):
                    best = n
        return best

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            # an empty trigger is NOT an empty snapshot: storing it
            # would make the next diff report the whole corpus removed
            return
        sp = batch_df.sparkSession
        new_fp = fingerprint(batch_df)
        prev_id = _latest_store_batch(sp, batch_id)
        if prev_id is not None:
            old_fp = sp.read.parquet(f"{store_dir}/batch_id={prev_id}")
        elif seed_fingerprints is not None:
            old_fp = sp.read.parquet(seed_fingerprints)
        else:
            old_fp = sp.createDataFrame([], "doc_id long, fingerprint long")
        old_fp = old_fp.select("doc_id", "fingerprint")
        # store first, then sink: the diff reads the batch's OWN stored
        # fingerprints back, so the hash pass over the snapshot runs
        # exactly once per batch (the store write), not once per consumer
        stored_path = _write_snapshot_fingerprints(new_fp, store_dir, batch_id)
        stored = sp.read.parquet(stored_path).select("doc_id", "fingerprint")
        diff = fingerprint_diff(old_fp, stored)
        _write_batch_idempotent(diff, out_dir, batch_id)

    return (
        raw.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def _write_snapshot_fingerprints(fp: DataFrame, store_dir: str, batch_id: int) -> str:
    """Overwrite this batch's own fingerprint directory (replay-safe)."""
    target = f"{store_dir}/batch_id={batch_id}"
    fp.write.mode("overwrite").parquet(target)
    return target


def write_value_reference(ev: DataFrame, path: str) -> None:
    """Materialize the reference value distribution for the streaming
    drift monitor: per-distinct-cent counts (vc, n) parquet — the
    frozen 'training window' CDF every incoming batch is compared
    against. Rebuild when the reference window rolls."""
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    (
        ev.select(vc.alias("vc"))
        .groupBy("vc")
        .agg(F.count(F.lit(1)).alias("n"))
        .write.mode("overwrite")
        .parquet(path)
    )


def run_value_drift_stream(
    spark: SparkSession,
    input_dir: str,
    reference_path: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> "object":
    """Streaming drift alarm: per micro-batch, the exact two-sample
    Kolmogorov-Smirnov distance between the BATCH's value distribution
    and the frozen reference written by ``write_value_reference`` —
    the live form of ``events_value_ks_drift`` ("did this feed's
    values move away from the training window"), one row per batch.

    Per batch: the batch reduces to per-cent counts map-side, full-
    outer joins the reference counts on vc, and the cumulative-CDF
    supremum runs over the BOUNDED distinct-value domain (value range,
    not stream length — the same bounded-grid posture as the batch
    twin). Reference re-read per batch (rolling rebuilds picked up
    live); sink batch_id-partitioned and replay-idempotent.

    Output: (n_batch, n_ref, ks_stat, ks_at_value) per batch_id.
    """
    from pyspark.sql import Window

    raw = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return  # no distribution to test; a null-KS row would be noise
        sp = batch_df.sparkSession
        vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        b = batch_df.select(vc.alias("vc")).groupBy("vc").agg(
            F.count(F.lit(1)).alias("nb")
        )
        r = sp.read.parquet(reference_path).select("vc", F.col("n").alias("nr"))
        per_v = (
            b.join(r, on="vc", how="full_outer")
            .select(
                "vc",
                F.coalesce("nb", F.lit(0).cast("long")).alias("nb"),
                F.coalesce("nr", F.lit(0).cast("long")).alias("nr"),
            )
        )
        tot = per_v.agg(F.sum("nb").alias("n_batch"), F.sum("nr").alias("n_ref"))
        w = Window.orderBy("vc").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cdf = (
            per_v.withColumn("cum_b", F.sum("nb").over(w))
            .withColumn("cum_r", F.sum("nr").over(w))
            .crossJoin(F.broadcast(tot))
            .select(
                "vc", "n_batch", "n_ref",
                F.abs(
                    rnd(F.col("cum_b").cast("double") / F.col("n_batch").cast("double"))
                    - rnd(F.col("cum_r").cast("double") / F.col("n_ref").cast("double"))
                ).alias("diff"),
            )
        )
        top = (
            cdf.orderBy(F.col("diff").desc(), "vc")
            .limit(1)
            .select(
                "n_batch", "n_ref",
                rnd(F.col("diff")).alias("ks_stat"),
                (F.col("vc") / 100.0).alias("ks_at_value"),
            )
        )
        _write_batch_idempotent(top, out_dir, batch_id)

    return (
        raw.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


EMB_SCHEMA = "vec_id long, embedding array<double>"


def run_ingest_ann_stream(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 5,
    nprobe: int = 2,
    max_files_per_trigger: int = 1,
) -> "object":
    """Ingest-time semantic lookup: stream newly embedded items and
    report, per micro-batch, each one's top-k cosine neighbors in the
    existing corpus — the embedding-side analogue of
    ``run_ingest_decontamination`` (semantic dedup, related-content
    lookup, or embedding-space contamination checks at ingest).

    The corpus side is the precomputed IVF index written by
    ``operators.similarity.write_ann_index`` (centroids + cell-
    partitioned vectors parquet); only the incoming micro-batch scores
    centroids, and the search touches just each probe's nprobe cells.
    The index is re-read per batch, so an on-disk rebuild is picked up
    without a query restart. Output parquet under ``out_dir``
    (batch_id-partitioned, replay-idempotent): (query_id, neighbor_id,
    rank, cosine).
    """
    from tickdatapipeline_spark.operators.similarity import ann_probe_against_index

    raw = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sp = batch_df.sparkSession
        hits = ann_probe_against_index(
            batch_df,
            sp.read.parquet(f"{index_path}/centroids"),
            sp.read.parquet(f"{index_path}/vectors"),
            k=k,
            nprobe=nprobe,
        )
        _write_batch_idempotent(hits, out_dir, batch_id)

    return (
        raw.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def run_ingest_curation(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    out_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    max_dup_token_frac: float = 0.9,
    max_files_per_trigger: int = 1,
) -> "object":
    """Ingest-time corpus curation: the full per-micro-batch gauntlet a
    crawled document passes before it may join the training corpus —

    1. PII scrubbing (operators.text.redact_pii): emails/IPs/phones
       replaced with typed placeholders; per-category counts kept.
    2. Quality gating on the SCRUBBED text: token count inside
       [min_tokens, max_tokens] and duplicate-token fraction at most
       ``max_dup_token_frac`` (the cheap Gopher-style boilerplate gate).
    3. Decontamination against the precomputed corpus LSH index
       (write_corpus_index), exactly like run_ingest_decontamination —
       only the batch computes signatures; the index is re-read per
       batch so an on-disk rebuild is picked up live.

    Output, one row per incoming document, partitioned by batch_id and
    idempotent under replay (_write_batch_idempotent):
    (doc_id, lang, clean_text, n_pii, n_tokens, dup_token_frac,
    quality_ok, is_contaminated, keep) with keep = quality_ok AND NOT
    contaminated — the downstream corpus write consumes rows where
    keep, reading clean_text only.

    Scale: steps 1-2 are pure map-side JVM expressions over the batch;
    step 3 joins compact band keys against the static index. Per-batch
    cost is O(batch) plus index probes — nothing reprocesses the
    corpus.
    """
    from tickdatapipeline_spark.functions.rounding import rnd
    from tickdatapipeline_spark.operators.dedup import contamination_against_index
    from tickdatapipeline_spark.operators.text import redact_pii, tokens

    raw = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.storagelevel import StorageLevel

        sp = batch_df.sparkSession
        # a crawled line with a missing/null text field must get a clean
        # reject verdict, not size(NULL)=-1 garbage in every count
        red = redact_pii(batch_df.withColumn("text", F.coalesce("text", F.lit(""))))
        t = tokens(F.col("clean_text"))
        n_tok = F.size(t)
        dup = F.when(
            n_tok > 0,
            (n_tok - F.size(F.array_distinct(t))).cast("double") / n_tok.cast("double"),
        ).otherwise(F.lit(0.0))
        scored = red.select(
            "doc_id", "lang", "clean_text",
            (F.col("n_emails") + F.col("n_ips") + F.col("n_phones")).alias("n_pii"),
            n_tok.cast("long").alias("n_tokens"),
            rnd(dup).alias("dup_token_frac"),
            # gate on the EXACT fraction; the rounded column is display
            (
                n_tok.cast("long").between(min_tokens, max_tokens)
                & (dup <= max_dup_token_frac)
            ).alias("quality_ok"),
        )
        # the contamination probe consumes `scored` three times (band
        # table, shingles, candidate joins) and the verdicts join a
        # fourth — persist so the regex scrub + tokenize run ONCE
        scored = scored.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            hits = contamination_against_index(
                scored.select("doc_id", F.col("clean_text").alias("text")),
                sp.read.parquet(f"{index_path}/bands"),
                sp.read.parquet(f"{index_path}/shingles"),
                threshold=threshold,
                max_band_bucket=None,  # index is skew-capped at build time
            )
            contaminated = hits.select(F.col("probe_doc_id").alias("doc_id")).distinct()
            verdicts = (
                scored.join(
                    contaminated.withColumn("_c", F.lit(True)), on="doc_id", how="left"
                )
                .withColumn("is_contaminated", F.coalesce("_c", F.lit(False)))
                .withColumn("keep", F.col("quality_ok") & ~F.col("is_contaminated"))
                .drop("_c")
            )
            _write_batch_idempotent(verdicts, out_dir, batch_id)
        finally:
            scored.unpersist()

    return (
        raw.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def run_value_cusum_stream(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> "object":
    """Live CUSUM changepoint monitor: every micro-batch folds its
    events into a durable hourly-sum store, recomputes the per-type
    CUSUM argmax over the WHOLE accumulated series, and emits one row
    per event type — the streaming twin of ``events_value_cusum``,
    sharing its ``cusum_over_hourly`` algebra, and the level-shift
    complement of the KS monitor (KS asks "does this batch's
    distribution match the reference"; CUSUM asks "WHEN did the level
    of the whole observed series change").

    Replay-idempotent: the store is parquet partitioned by batch_id —
    each batch overwrites only its OWN partition with its (type, hour)
    delta, and the recompute reads partitions with batch_id <= current
    (partition-pruned), so a foreachBatch replay rewrites the same
    delta and recomputes the same detection; the per-batch result goes
    through the batch_id-partitioned sink.

    Scale: raw events reduce map-side per batch before touching the
    store; the re-aggregate + windows run over O(hours x types)
    aggregate rows, never raw history. The store holds one compact
    delta per trigger — old partitions can be compacted into one
    (associative sums) without changing any future detection.
    """
    raw = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from tickdatapipeline_spark.plans.beyond import cusum_over_hourly

        sp = batch_df.sparkSession
        vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        delta = (
            batch_df.select(
                F.expr("(tus DIV 1000000 DIV 3600) * 3600").alias("hour_s"),
                "event_type", vc.alias("vc"),
            )
            .groupBy("event_type", "hour_s")
            .agg(F.sum("vc").alias("h_sum"))
        )
        delta.write.mode("overwrite").parquet(f"{store_dir}/batch_id={batch_id}")
        full = (
            sp.read.parquet(store_dir)
            .where(F.col("batch_id") <= batch_id)
            .groupBy("event_type", "hour_s")
            .agg(F.sum("h_sum").alias("h_sum"))
        )
        _write_batch_idempotent(cusum_over_hourly(full), out_dir, batch_id)

    return (
        raw.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


TOPK_EVENT_SCHEMA = "event_id long, tus long, user_id long, value double"


def run_hourly_topk_stream(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 3,
    max_files_per_trigger: int = 1,
) -> "object":
    """Live hourly heavy hitters: every micro-batch folds its events
    into a durable (hour, user) sum store and re-ranks each hour's
    top-k over the accumulated totals — the streaming twin of
    ``events_hourly_topk`` (same BIGINT cent sums, same
    u_sum DESC / user_id tie order), emitting the CURRENT leaderboard
    per batch so a late event can re-order an hour it lands in.

    Replay-idempotent exactly like the CUSUM monitor's store: the
    store is parquet partitioned by batch_id — each batch overwrites
    only its OWN partition with its (hour, user) delta and the re-rank
    reads partitions with batch_id <= current (partition-pruned), so a
    foreachBatch replay rewrites the same delta and re-emits the same
    leaderboard through the batch_id-partitioned sink.

    Scale: raw events reduce map-side per batch before touching the
    store; the re-rank runs over (hour, user) aggregate rows with the
    rnk <= k filter planning WindowGroupLimit, and old store
    partitions can be compacted into one (associative sums) without
    changing any future leaderboard.
    """
    from pyspark.sql import Window

    raw = (
        spark.readStream.schema(TOPK_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        delta = (
            batch_df.select(
                F.expr("(tus DIV 1000000 DIV 3600) * 3600").alias("hour_s"),
                "user_id", vc.alias("vc"),
            )
            .groupBy("hour_s", "user_id")
            .agg(F.sum("vc").alias("u_sum"), F.count(F.lit(1)).alias("n_events"))
        )
        delta.write.mode("overwrite").parquet(f"{store_dir}/batch_id={batch_id}")
        full = (
            sp.read.parquet(store_dir)
            .where(F.col("batch_id") <= batch_id)
            .groupBy("hour_s", "user_id")
            .agg(F.sum("u_sum").alias("u_sum"), F.sum("n_events").alias("n_events"))
        )
        w = Window.partitionBy("hour_s").orderBy(F.desc("u_sum"), "user_id")
        topk = (
            full.withColumn("rnk", F.row_number().over(w).cast("long"))
            .where(F.col("rnk") <= k)
            .select(
                "hour_s", "rnk", F.col("user_id").cast("long").alias("user_id"),
                (F.col("u_sum") / 100.0).alias("hour_value"), "n_events",
            )
        )
        _write_batch_idempotent(topk, out_dir, batch_id)

    return (
        raw.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def compact_batch_store(spark: SparkSession, store_dir: str,
                        group_cols: list, sum_cols: list,
                        upto_batch_id: int) -> None:
    """Compact a batch_id-partitioned delta store (the CUSUM monitor's
    hourly sums, the heavy-hitter leaderboard's (hour, user) sums):
    fold every partition with batch_id <= upto into ONE cumulative
    partition at batch_id = upto. Because the stored columns are
    associative sums and every reader prunes `batch_id <= current`,
    a completed compaction leaves every future recompute bit-identical
    while cutting the partition count from O(triggers) to O(1) — the
    maintenance op the per-trigger store design assumes.

    The staging dir starts with '_', so Spark/Hadoop readers ignore it
    until the rename. NOT crash-atomic on plain parquet (the window
    between the old-partition deletes and the rename): at deployment
    run it under a transactional table format (Delta/Iceberg
    RewriteFiles) or while the stream is stopped, which is also when
    batch ids are stable.

    Scale: one distributed aggregate over the store's own aggregate
    rows; nothing reaches the driver."""
    import glob
    import os
    import shutil

    agg = (
        spark.read.parquet(store_dir)
        .where(F.col("batch_id") <= upto_batch_id)
        .groupBy(*group_cols)
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
    )
    tmp = os.path.join(store_dir, "_compact_tmp")
    agg.write.mode("overwrite").parquet(tmp)
    for p in glob.glob(os.path.join(store_dir, "batch_id=*")):
        if int(p.rsplit("batch_id=", 1)[1]) <= upto_batch_id:
            shutil.rmtree(p)
    os.rename(tmp, os.path.join(store_dir, f"batch_id={upto_batch_id}"))


def run_quality_observed_ingest(
    spark: SparkSession,
    input_dir: str,
    data_dir: str,
    metrics_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> "object":
    """Ingest with data-quality counters that RIDE the write
    (``df.observe``): per micro-batch, row count, null-field count and
    event-time bounds are accumulated by the executors DURING the same
    pass that writes the batch — at 100 TB the difference between "DQ
    metrics for free" and "a second full scan per trigger". One
    metrics row per batch lands next to the data through the same
    replay-idempotent batch_id sink, giving the freshness/completeness
    ledger every ingest pipeline needs (and the input the CUSUM/KS
    monitors can alarm on).

    Late/malformed contract: the JSON source parses with an explicit
    schema, so malformed fields surface as NULLs — counted, never
    dropped silently; rows_null therefore bounds the quarantine size.
    """
    raw = (
        spark.readStream.schema(TOPK_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from pyspark.sql import Observation

        sp = batch_df.sparkSession
        obs = Observation(f"dq_{batch_id}")
        observed = batch_df.observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                (F.col("user_id").isNull() | F.col("value").isNull()
                 | F.col("tus").isNull()).cast("long")
            ).alias("n_null_fields"),
            F.min("tus").alias("min_tus"),
            F.max("tus").alias("max_tus"),
        )
        _write_batch_idempotent(observed, data_dir, batch_id)
        m = obs.get  # filled by the write above — no second scan
        metrics = sp.createDataFrame(
            [(int(m["n_rows"]), int(m["n_null_fields"]),
              m["min_tus"], m["max_tus"])],
            "n_rows long, n_null_fields long, min_tus long, max_tus long",
        )
        _write_batch_idempotent(metrics, metrics_dir, batch_id)

    return (
        raw.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def backfill_hourly_store(spark: SparkSession, events_parquet: str,
                          store_dir: str) -> None:
    """Warm-start a batch_id-partitioned hourly store from historical
    batch data: aggregates the parquet history into the store's
    (event_type, hour_s) delta shape and writes it as partition
    batch_id=-1 — BELOW every streaming trigger's id, so the stream's
    own `batch_id <= current` reads fold history in from the first
    trigger and a checkpoint replay still rewrites only its own
    partitions. The CUSUM/KS/leaderboard monitors then start with full
    context instead of a cold window.

    Scale: one map-side-combinable aggregate over the history scan;
    the store gains ONE compact partition regardless of history size
    (compact_batch_store semantics are unaffected: -1 <= every
    upto_batch_id)."""
    from tickdatapipeline_spark.sources.io import read_parquet

    ev = read_parquet(spark, events_parquet)
    surfaced = ev.schema["ts"].dataType.simpleString() if "ts" in ev.columns else None
    if surfaced == "bigint":
        tus = F.expr("ts DIV 1000")
    elif surfaced is not None:
        tus = F.unix_micros(F.col("ts"))
    else:
        tus = F.col("tus")
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    hist = (
        ev.select(tus.cast("long").alias("tus"), "event_type", vc.alias("vc"))
        # integer DIV, same algebra as the stream's per-batch fold
        .select(F.expr("(tus DIV 1000000 DIV 3600) * 3600").alias("hour_s"),
                "event_type", "vc")
        .groupBy("event_type", "hour_s")
        .agg(F.sum("vc").alias("h_sum"))
    )
    hist.write.mode("overwrite").parquet(f"{store_dir}/batch_id=-1")


def run_value_trend_stream(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> "object":
    """Live trend monitor: per micro-batch, fold the batch into the
    SAME durable hourly store the CUSUM monitor uses and re-run the
    exact OLS slope (plans/beyond.py::trend_over_hourly) over the
    accumulated series — one (type, slope) row per batch, the drift
    rate/direction feed next to the changepoint and KS alarms. Store
    layout, replay idempotence and compaction/backfill semantics are
    identical to run_value_cusum_stream (a deployment can point BOTH
    monitors at one store)."""
    raw = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from tickdatapipeline_spark.plans.beyond import trend_over_hourly

        sp = batch_df.sparkSession
        vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
        delta = (
            batch_df.select(
                F.expr("(tus DIV 1000000 DIV 3600) * 3600").alias("hour_s"),
                "event_type", vc.alias("vc"),
            )
            .groupBy("event_type", "hour_s")
            .agg(F.sum("vc").alias("h_sum"))
        )
        delta.write.mode("overwrite").parquet(f"{store_dir}/batch_id={batch_id}")
        full = (
            sp.read.parquet(store_dir)
            .where(F.col("batch_id") <= batch_id)
            .groupBy("event_type", "hour_s")
            .agg(F.sum("h_sum").alias("h_sum"))
            .select("event_type", F.expr("hour_s DIV 3600").alias("h"),
                    F.col("h_sum").alias("y"))
        )
        _write_batch_idempotent(trend_over_hourly(full), out_dir, batch_id)

    return (
        raw.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


SESSION_OUT = ("user_id long, start_ts timestamp, end_ts timestamp, "
               "n_events long, duration_s long")
SESSION_STATE = "starts_us array<long>, lasts_us array<long>, counts array<long>"


def make_session_kernel(gap_us: int):
    """applyInPandasWithState kernel for run_sessionization_stream:
    one GroupState per user holding that user's OPEN sessions as
    parallel (start_us, last_us, n_events) arrays. Each micro-batch's
    arrivals (Arrow chunks concatenated, sorted by (ts, event_id))
    INTERVAL-MERGE into the open set: an event within ``gap_us`` of a
    session on EITHER side joins it, and an event bridging two open
    sessions merges them — so out-of-order arrival inside the
    watermark can never split a session the batch gaps-and-islands
    pass would keep whole (same gap semantics as
    plans/beyond.sessionize_fn: strictly-greater gap starts a new
    session, boundary-equal extends).

    A session is EMITTED (closed) only when last_us + gap_us <
    watermark: any event that could still extend it would carry
    ts <= last + gap <= wm and is dropped by the watermark as late —
    strict inequality because a ts == wm arrival is still admitted.
    Open sessions stay in state; the event-time timeout re-arms every
    invocation to the EARLIEST open session's close time (GroupState
    clears it per call), so an idle user's tail sessions flush as the
    global watermark advances, without any further arrivals."""

    def kernel(key, pdfs, state) -> "Iterator[pd.DataFrame]":
        wm_us = state.getCurrentWatermarkMs() * 1000
        sessions: "list[list[int]]" = []
        if state.exists:
            s, l, c = state.get
            sessions = [[int(a), int(b), int(n)] for a, b, n in zip(s, l, c)]
        pdf_list = [] if state.hasTimedOut else list(pdfs)
        pdf = (pd.concat(pdf_list, ignore_index=True)
               if pdf_list else pd.DataFrame(columns=["user_id", "event_id", "ts"]))
        if len(pdf):
            pdf = pdf.sort_values(["ts", "event_id"], ignore_index=True)
            for t in pdf["ts"]:
                tus = int(t.value) // 1_000
                hits, rest = [], []
                for s in sessions:
                    (hits if s[0] - gap_us <= tus <= s[1] + gap_us else rest
                     ).append(s)
                merged = [min([tus] + [h[0] for h in hits]),
                          max([tus] + [h[1] for h in hits]),
                          1 + sum(h[2] for h in hits)]
                sessions = rest + [merged]
        closed = sorted(s for s in sessions if s[1] + gap_us < wm_us)
        open_s = sorted(s for s in sessions if s[1] + gap_us >= wm_us)
        if open_s:
            state.update((
                [s[0] for s in open_s], [s[1] for s in open_s],
                [s[2] for s in open_s],
            ))
            earliest_close_ms = min(s[1] for s in open_s) // 1000 + gap_us // 1000
            state.setTimeoutTimestamp(
                max(earliest_close_ms + 1000, state.getCurrentWatermarkMs() + 1000))
        elif state.exists:
            state.remove()
        uid = int(key[0])
        yield pd.DataFrame({
            "user_id": pd.Series([uid] * len(closed), dtype="int64"),
            "start_ts": pd.to_datetime([s[0] * 1000 for s in closed], unit="ns"),
            "end_ts": pd.to_datetime([s[1] * 1000 for s in closed], unit="ns"),
            "n_events": pd.Series([s[2] for s in closed], dtype="int64"),
            "duration_s": pd.Series([(s[1] - s[0]) // 1_000_000 for s in closed],
                                    dtype="int64"),
        })

    return kernel


def run_sessionization_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_min: int = 30,
    delay: str = "30 minutes",
    max_files_per_trigger: int = 1,
):
    """Streaming SESSIONIZATION: gap-based session windows per user,
    emitted as they CLOSE — the custom stateful operator twin of the
    batch gaps-and-islands pass (plans/beyond.sessionize_fn), built on
    applyInPandasWithState rather than F.session_window so the merge/
    close semantics stay explicit and testable (and so the state
    carries exact integer microseconds end to end).

    Emission contract: a session row appears once its close is
    WATERMARK-SAFE (no admissible event can extend it — see
    make_session_kernel); the tail sessions of a stopped stream remain
    open in state and flush on a later run as the watermark advances.
    Output: (user_id, start_ts, end_ts, n_events, duration_s), exactly
    the batch pass's (n_events, duration_s) per session.

    Scale contract: state per user is O(open sessions) 24-byte
    entries — bounded by watermark horizon / gap (a user can hold at
    most horizon/gap open sessions once the watermark trails the max
    event time by `delay`); closed sessions leave state immediately,
    idle users' state expires via the re-armed event-time timeout.
    Input JSONL: (event_id, user_id, ts); null-ts corrupt lines are
    quarantined at ingest like every dedup stream."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    raw = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )
    sessions = (
        raw.where(F.col("ts").isNotNull() & F.col("user_id").isNotNull())
        .withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_kernel(gap_min * 60 * 1_000_000),
            outputStructType=SESSION_OUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        sessions.writeStream.foreachBatch(_write_batch_idempotent_fb(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def _write_batch_idempotent_fb(out_dir: str):
    def _process(batch_df: DataFrame, batch_id: int) -> None:
        _write_batch_idempotent(batch_df, out_dir, batch_id)

    return _process


# ===== streaming heavy hitters: sharded Misra-Gries sketch state =====

HH_OUT = "shard int, user_id long, mg_count long, shard_seen long"
HH_STATE = "keys array<long>, counts array<long>, n_seen long"


def make_mg_kernel(k: int):
    """applyInPandasWithState kernel for run_heavy_hitters_stream: one
    GroupState per SHARD holding that shard's Misra-Gries summary
    (<= k counters) — the streaming twin of
    operators/sketches.misra_gries_candidates with the same vectorized
    merge (per-batch exact value_counts folded in; when more than k
    keys survive, subtract the (k+1)-th largest count and drop the
    non-positive).

    Sharding by key (shard = f(user_id)) means a key's entire count
    lives in ONE shard, so each shard's MG guarantee applies to the
    key's GLOBAL count: any key with count > n_shard/(k+1) — and a
    fortiori any key with count > n_total/(k+1) — is present in its
    shard's summary. The union of shard summaries is therefore a
    provable candidate superset of the true heavy hitters at every
    point in the stream.

    Each invocation emits the shard's CURRENT candidate snapshot
    (mg_count is the summary's lower-bound count: true count minus at
    most n_shard/(k+1)); downstream reads the LATEST batch per shard
    (latest-wins snapshot semantics, like the refreshable-dim sink).
    State is permanently bounded at k (key,count) pairs per shard —
    this is a CUMULATIVE all-time sketch, so it uses NoTimeout and
    never expires (the windowed analogue is run_hourly_topk_stream)."""

    def kernel(key, pdfs, state) -> "Iterator[pd.DataFrame]":
        import numpy as np

        if state.exists:
            keys, counts, n_seen = state.get
            acc = pd.Series(
                np.asarray(counts, dtype="int64"),
                index=np.asarray(keys, dtype="int64"),
            )
            n_seen = int(n_seen)
        else:
            acc = pd.Series(dtype="int64")
            n_seen = 0
        for pdf in pdfs:
            s = pdf["user_id"].value_counts()
            n_seen += int(s.sum())
            acc = acc.add(s, fill_value=0)
            if len(acc) > k:
                kth = acc.nlargest(k + 1).iloc[-1]
                acc = acc[acc - kth > 0] - kth
        acc = acc.astype("int64")
        state.update((
            [int(x) for x in acc.index],
            [int(x) for x in acc.to_numpy()],
            n_seen,
        ))
        shard = int(key[0])
        yield pd.DataFrame({
            "shard": pd.Series([shard] * len(acc), dtype="int32"),
            "user_id": pd.Series(acc.index.to_numpy(), dtype="int64"),
            "mg_count": pd.Series(acc.to_numpy(), dtype="int64"),
            "shard_seen": pd.Series([n_seen] * len(acc), dtype="int64"),
        })

    return kernel


def run_heavy_hitters_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    k: int = 64,
    n_shards: int = 8,
    max_files_per_trigger: int = 1,
):
    """Streaming heavy-hitter CANDIDATE maintenance: a sharded
    Misra-Gries sketch over the event stream — the streaming twin of
    the batch two-pass operator (plans/beyond.heavy_hitters_fn). The
    stream maintains the bounded sketch; the EXACT answer remains a
    batch recount of the candidate union against the at-rest table
    (same verify-backstop contract as the dedup streams: the stream
    does the bounded-state narrowing, batch does the exactness).

    Scale contract: state is k counters x n_shards TOTAL regardless of
    stream length or key cardinality — the only streaming top-k state
    bound that needs no watermark at all. n_shards spreads kernel work
    across executors (shard = xxhash64(user_id) % n_shards keeps each
    key's count whole within one shard, preserving the MG guarantee
    per key).

    Input JSONL: (event_id, user_id, ts); null-user rows are
    quarantined at ingest (a null key cannot be a nameable heavy
    hitter — batch twin excludes them identically). Snapshot output
    per micro-batch into batch_id-partitioned parquet (replay-
    idempotent); readers take the LATEST batch per shard."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    raw = (
        spark.readStream.schema("event_id long, user_id long, ts timestamp")
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )
    sketches = (
        raw.where(F.col("user_id").isNotNull())
        .select(
            F.pmod(F.xxhash64("user_id"), F.lit(n_shards)).cast("int").alias("shard"),
            "user_id",
        )
        .groupBy("shard")
        .applyInPandasWithState(
            make_mg_kernel(k),
            outputStructType=HH_OUT,
            stateStructType=HH_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return (
        sketches.writeStream.foreachBatch(_write_batch_idempotent_fb(out_dir))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
