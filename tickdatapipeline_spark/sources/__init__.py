from tickdatapipeline_spark.sources.io import (
    read_documents_jsonl,
    read_events,
    read_parquet,
)
from tickdatapipeline_spark.sources.tickfile import read_tick_file, ticks_from_events, TICKS_FROM_EVENTS_SQL

__all__ = [
    "read_documents_jsonl", "read_events", "read_parquet",
    "read_tick_file", "ticks_from_events", "TICKS_FROM_EVENTS_SQL",
]
