"""Live-mode pipeline: Structured Streaming file source + stateful
foreachBatch.

The reference's live mode is a Channel push loop with flow-control delay
(/root/reference/src/PipelineOrchestrator.jl:340-432,
VolumeExpansion.jl:18-30). The Spark analogue: watch a directory for
tick files (one file = one session/stream segment, the 100 TB partition
unit), process each micro-batch with the exact batch operators seeded by
StreamState (streaming/state.py), and fan out via TripleSplitManager.
Rate limiting is `maxFilesPerTrigger` instead of a busy-wait nanosleep —
the idiomatic Spark knob for the same goal (SURVEY.md §2.2 P10).

Ordering: Spark's file source admits files in MODIFICATION-TIME order
across micro-batches; within a batch this runner processes them in
lexicographic name order, and each file is re-read through
sources.tickfile.read_tick_file, which defines line order. The stream
contract is therefore: session files arrive (mtime) in stream order and
are named monotonically — which is how session/day capture files are
produced. A count-ordered stream cannot admit late data — there is no
watermark by design, matching the reference's strictly-ordered Channel
(SURVEY §2.9).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tickdatapipeline_spark.config import SignalProcessingConfig
from tickdatapipeline_spark.sources.tickfile import read_tick_file
from tickdatapipeline_spark.streaming.fanout import TripleSplitManager
from tickdatapipeline_spark.streaming.metrics import PipelineMetrics
from tickdatapipeline_spark.streaming.state import OUT_COLS, StreamState, advance


class StreamingTickPipeline:
    """run_pipeline! in live mode (O2/O3): start()/stop() lifecycle,
    per-batch metrics, graceful stop."""

    def __init__(
        self,
        spark: SparkSession,
        input_dir: str,
        cfg: SignalProcessingConfig,
        manager: TripleSplitManager,
        checkpoint_dir: str,
        max_files_per_trigger: int = 1,
        on_batch: Callable[[int, int], None] | None = None,
        bar_cfg=None,
        bar_sink: Callable[[DataFrame, int], None] | None = None,
        stream_key: Callable[[str], str] | None = None,
        enrich: bool = False,
        state_path: str | None = None,
    ) -> None:
        """``stream_key`` maps a file path to a logical stream id; files
        of the same stream continue each other's state, different streams
        are independent (e.g. per-symbol or per-day files). None = the
        reference's model: every file continues ONE stream.

        ``state_path`` makes continuation state durable: a post-batch
        JSON snapshot (streaming/persistence.py) restored on restart;
        replayed batches (id <= snapshot's) are skipped, so state
        evolves exactly once even though foreachBatch is at-least-once.

        ``enrich`` broadcasts B7-enriched ticks (bar columns on each
        bar-completing tick, nulls elsewhere — the managed live loop's
        process_tick_for_bars! message enrichment,
        /root/reference/src/PipelineOrchestrator.jl:155-156); requires
        an enabled ``bar_cfg``. Exact across batch splits because a
        bar's completing tick is always in the bar's completing batch."""
        from tickdatapipeline_spark.operators.bars import BarSeed

        self.spark = spark
        self.input_dir = input_dir
        self.cfg = cfg
        self.manager = manager
        self.checkpoint_dir = checkpoint_dir
        self.max_files_per_trigger = max_files_per_trigger
        self.on_batch = on_batch
        self.bar_cfg = bar_cfg
        self.bar_sink = bar_sink
        self.stream_key = stream_key
        if enrich and (bar_cfg is None or not bar_cfg.enabled):
            raise ValueError("enrich=True requires an enabled bar_cfg")
        self.enrich = enrich
        self.state_path = state_path
        self._single = StreamState()
        self._single_bars = BarSeed()
        self.states: dict[str, StreamState] = {}
        self.bar_states: dict[str, BarSeed] = {}
        self.ticks_processed = 0
        self._last_batch_id = -1
        if state_path is not None:
            from tickdatapipeline_spark.streaming.persistence import load_snapshot

            snap = load_snapshot(state_path)
            if snap is not None:
                (self._last_batch_id, self._single, self._single_bars,
                 self.states, self.bar_states, self.ticks_processed) = snap
        self.metrics = PipelineMetrics()  # O2 accumulator, one obs/batch
        self._query = None

    def _commit_state(self, batch_id: int) -> None:
        self._last_batch_id = batch_id
        if self.state_path is not None:
            from tickdatapipeline_spark.streaming.persistence import save_snapshot

            save_snapshot(
                self.state_path, batch_id=batch_id, single=self._single,
                single_bars=self._single_bars, states=self.states,
                bar_states=self.bar_states, ticks_processed=self.ticks_processed,
            )

    # -- one micro-batch: resolve files -> ordered read -> seeded ops -----
    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        import time

        from tickdatapipeline_spark.streaming.state import advance_bars

        from tickdatapipeline_spark.operators.bars import BarSeed

        if batch_id <= self._last_batch_id:
            return  # replayed batch: state already reflects it
        batch_t0 = time.perf_counter()
        signal_us = broadcast_us = broadcasts = 0
        ticks_before = self.ticks_processed
        files = sorted(
            r["f"] for r in batch_df.select(F.input_file_name().alias("f")).distinct().collect()
        )
        if self.stream_key is not None and len(files) > 1:
            by_stream: dict[str, list[str]] = {}
            for path in files:
                by_stream.setdefault(self.stream_key(path), []).append(path)
            if len(by_stream) > 1 and all(len(v) == 1 for v in by_stream.values()):
                # scale path: thousands of streams, one file each -> a
                # CONSTANT number of Spark jobs for the whole batch
                self._process_batch_multistream(
                    {k: v[0] for k, v in by_stream.items()}, batch_id, batch_t0
                )
                return
        for path in files:
            key = self.stream_key(path) if self.stream_key else None
            state = self._single if key is None else self.states.get(key, StreamState())
            bar_state = (
                self._single_bars if key is None else self.bar_states.get(key, BarSeed())
            )
            raw = read_tick_file(self.spark, path)
            t_sig = time.perf_counter()
            processed, state = advance(raw, self.cfg, state)
            signal_us += int((time.perf_counter() - t_sig) * 1e6)
            out = processed.select(*OUT_COLS)
            bars = None
            if self.bar_cfg is not None and self.bar_cfg.enabled:
                bars, bar_state = advance_bars(
                    processed.select(*OUT_COLS), self.bar_cfg, bar_state
                )
            if self.enrich:
                from tickdatapipeline_spark.operators.bars import enrich_ticks_with_bars

                out = enrich_ticks_with_bars(out, bars)
            if key is not None:
                out = out.withColumn("stream", F.lit(key))
            t_bc = time.perf_counter()
            self.manager.broadcast_batch(out, batch_id)
            broadcast_us += int((time.perf_counter() - t_bc) * 1e6)
            broadcasts += 1
            if bars is not None:
                if self.bar_sink is not None:
                    out_bars = bars.withColumn("stream", F.lit(key)) if key is not None else bars
                    self.bar_sink(out_bars, batch_id)
                bars.unpersist()
            if key is None:
                self._single, self._single_bars = state, bar_state
            else:
                self.states[key], self.bar_states[key] = state, bar_state
            processed.unpersist()
        self.ticks_processed = (
            self._single.tick0 if self.stream_key is None
            else sum(s.tick0 for s in self.states.values())
        )
        self.metrics.record_batch(
            ticks=self.ticks_processed - ticks_before,
            total_us=int((time.perf_counter() - batch_t0) * 1e6),
            signal_us=signal_us,
            broadcast_us=broadcast_us,
            broadcasts=broadcasts,
        )
        self._commit_state(batch_id)
        if self.on_batch is not None:
            self.on_batch(batch_id, self.ticks_processed)

    def _process_batch_multistream(
        self, file_of: dict[str, str], batch_id: int, batch_t0: float
    ) -> None:
        """One-file-per-stream batch: union the tagged reads and run the
        whole thing through advance_streams / advance_bars_streams — per
        -stream seeds travel as broadcast-joined tables, state extraction
        is O(streams) collected rows (streaming/state.py). Batches where
        one stream spans several files keep the ordered per-file loop."""
        import time

        from tickdatapipeline_spark.streaming.state import advance_streams, advance_bars_streams

        raw = None
        for key, path in sorted(file_of.items()):
            part = read_tick_file(self.spark, path).withColumn("stream", F.lit(key))
            raw = part if raw is None else raw.unionByName(part)

        t_sig = time.perf_counter()
        processed, self.states = advance_streams(raw, self.cfg, self.states, "stream")
        signal_us = int((time.perf_counter() - t_sig) * 1e6)
        out = processed.select("stream", *OUT_COLS)
        bars = None
        if self.bar_cfg is not None and self.bar_cfg.enabled:
            bars, self.bar_states = advance_bars_streams(
                out, self.bar_cfg, self.bar_states, "stream"
            )
        bc_out = out
        if self.enrich:
            from tickdatapipeline_spark.operators.bars import enrich_ticks_with_bars

            bc_out = enrich_ticks_with_bars(out, bars, stream_id="stream")
        t_bc = time.perf_counter()
        self.manager.broadcast_batch(bc_out, batch_id)
        broadcast_us = int((time.perf_counter() - t_bc) * 1e6)
        if bars is not None:
            if self.bar_sink is not None:
                self.bar_sink(bars, batch_id)
            bars.unpersist()
        processed.unpersist()
        ticks_before = self.ticks_processed
        self.ticks_processed = sum(s.tick0 for s in self.states.values())
        self.metrics.record_batch(
            ticks=self.ticks_processed - ticks_before,
            total_us=int((time.perf_counter() - batch_t0) * 1e6),
            signal_us=signal_us,
            broadcast_us=broadcast_us,
            broadcasts=1,
        )
        self._commit_state(batch_id)
        if self.on_batch is not None:
            self.on_batch(batch_id, self.ticks_processed)

    def start(self) -> None:
        stream = (
            self.spark.readStream.format("text")
            .option("maxFilesPerTrigger", str(self.max_files_per_trigger))
            .load(self.input_dir)
        )
        self._query = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .start()
        )

    def await_idle(self, timeout_s: float = 60.0) -> None:
        """Block until all currently-visible input is processed, or raise
        TimeoutError after ``timeout_s``.

        processAllAvailable() has no timeout of its own, so it runs on a
        worker thread that we join with the deadline; on timeout the
        stream keeps processing in the background (call stop() to halt)."""
        import threading

        assert self._query is not None, "start() first"
        exc: list[BaseException] = []

        def _drain() -> None:
            try:
                self._query.processAllAvailable()
            except BaseException as e:  # surfaced on the caller thread
                exc.append(e)

        t = threading.Thread(target=_drain, daemon=True)
        t.start()
        t.join(timeout_s)
        if t.is_alive():
            raise TimeoutError(f"stream did not drain within {timeout_s}s")
        if exc:
            raise exc[0]

    def stop(self) -> None:
        """Graceful stop (O3, PipelineOrchestrator.jl:454-457)."""
        if self._query is not None:
            self._query.stop()
            self._query = None
