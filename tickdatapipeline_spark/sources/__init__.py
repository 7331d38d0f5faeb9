from tickdatapipeline_spark.sources.tickfile import read_tick_file, ticks_from_events, TICKS_FROM_EVENTS_SQL

__all__ = ["read_tick_file", "ticks_from_events", "TICKS_FROM_EVENTS_SQL"]
