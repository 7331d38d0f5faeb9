"""tickdatapipeline_spark — a from-scratch PySpark-native analytics engine
with the query and data-processing capabilities of TickDataPipeline.jl
(reference at /root/reference, read-only), re-expressed as DataFrame /
SQL plans that Catalyst can optimize, plus a beyond-reference relational,
dedup, similarity and text-analysis surface for large-scale training-data
pipelines.
"""

__version__ = "0.1.0"
