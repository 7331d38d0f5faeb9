"""Session-independent parquet reading.

The driver's testdata writes `events.ts` as INT64 TIMESTAMP(NANOS), which
Spark refuses to read unless ``spark.sql.legacy.parquet.nanosAsLong`` is
set. Our own session builder (session.py) sets it at build time, but the
query surface (``__spark_entry__.queries()``) must run on ANY caller-built
SparkSession — the correctness harness constructs a plain one. The conf is
runtime-settable, so every shared reader goes through this helper instead
of assuming who built the session.

Under nanosAsLong the ts column surfaces as epoch-nanos BIGINT; all
event-time plans do integer epoch math on it (see plans/beyond.py), which
is also the cross-engine-exact representation for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet that works on a plain session for nanos-ts files."""
    spark.conf.set(NANOS_CONF, "true")
    return spark.read.parquet(path)
