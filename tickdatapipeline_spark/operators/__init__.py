from tickdatapipeline_spark.operators.expansion import expand_volume
from tickdatapipeline_spark.operators.hotloop import hot_loop
from tickdatapipeline_spark.operators.bars import bar_aggregate, enrich_ticks_with_bars

__all__ = ["expand_volume", "hot_loop", "bar_aggregate", "enrich_ticks_with_bars"]
