"""SparkSession factory with scale-aware defaults.

Local testing runs on local[N]; the same settings (AQE, shuffle
partitions, Arrow) are the ones you would set cluster-wide on a
1000-executor deployment, where `spark.sql.shuffle.partitions` should be
sized to ~2-3x total cores and AQE coalesces the rest.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "tickdatapipeline-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # deterministic cross-engine comparisons (DuckDB oracle is tz-naive)
        .config("spark.sql.session.timeZone", "UTC")
        # driver testdata uses nanosecond timestamps; read them as raw
        # epoch-nanos longs (DuckDB side uses epoch_ns(ts) to match)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalescePartitions.minPartitionSize stays at the Spark default:
        # a 64k floor was measured r14 and is a wash — it widens the
        # chunked tick chain's coalesced window stages (-0.6 s solo) but
        # adds per-task overhead across the join-heavy dedup queries'
        # many small exchanges (+0.9 s on dedup_decontaminate)
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
