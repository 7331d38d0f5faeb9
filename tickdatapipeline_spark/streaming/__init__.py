from tickdatapipeline_spark.streaming.fanout import (
    Consumer,
    ConsumerStats,
    ConsumerType,
    TripleSplitManager,
)
from tickdatapipeline_spark.streaming.runner import StreamingTickPipeline
from tickdatapipeline_spark.streaming.state import OUT_COLS, StreamState, advance

__all__ = [
    "Consumer",
    "ConsumerStats",
    "ConsumerType",
    "TripleSplitManager",
    "StreamingTickPipeline",
    "StreamState",
    "advance",
    "OUT_COLS",
]
