from tickdatapipeline_spark.streaming.fanout import (
    Consumer,
    ConsumerStats,
    ConsumerType,
    TripleSplitManager,
)
from tickdatapipeline_spark.streaming.eventtime import (
    attributed_clicks_stream,
    deduped_events_stream,
    enriched_events_stream,
    run_enriched_events_refreshable,
    run_ingest_ann_stream,
    run_ingest_curation,
    run_ingest_decontamination,
    run_snapshot_diff_stream,
    run_value_cusum_stream,
    run_value_drift_stream,
    run_value_histogram_to_memory,
    write_value_reference,
    run_windowed_events_to_memory,
    sessionized_events_stream,
    value_histogram_stream,
    windowed_events_stream,
)
from tickdatapipeline_spark.streaming.runner import StreamingTickPipeline
from tickdatapipeline_spark.streaming.state import OUT_COLS, StreamState, advance
from tickdatapipeline_spark.streaming.stateful import (
    ema_stream,
    type_transitions_stream,
)

__all__ = [
    "Consumer",
    "ConsumerStats",
    "ConsumerType",
    "TripleSplitManager",
    "StreamingTickPipeline",
    "StreamState",
    "advance",
    "OUT_COLS",
    "windowed_events_stream",
    "sessionized_events_stream",
    "deduped_events_stream",
    "attributed_clicks_stream",
    "enriched_events_stream",
    "run_enriched_events_refreshable",
    "run_value_histogram_to_memory",
    "value_histogram_stream",
    "run_ingest_ann_stream",
    "run_ingest_curation",
    "run_ingest_decontamination",
    "run_snapshot_diff_stream",
    "run_value_cusum_stream",
    "run_value_drift_stream",
    "write_value_reference",
    "run_windowed_events_to_memory",
    "ema_stream",
    "type_transitions_stream",
]
