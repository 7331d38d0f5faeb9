"""SQL-first entry point: register the fixture tables as temp views so
users drive the engine with spark.sql(...) instead of the Python
helpers — the same catalog names the DuckDB oracle uses, so any oracle
SQL in plans/*.py is ALSO a valid starting point for a user query
(modulo dialect)."""

from __future__ import annotations

from pyspark.sql import SparkSession

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def register_views(spark: SparkSession, sf_dir: str,
                   tables: tuple = TABLES) -> None:
    """CREATE OR REPLACE TEMP VIEW for every fixture table in sf_dir.

    Views are lazy — each spark.sql query still gets full pushdown,
    pruning and partition elimination on the parquet scan (nothing is
    materialized by registration). `events` keeps its RAW parquet type
    here (ns-int64 or timestamp, driver-dependent); event-time queries
    should go through sources.io.read_events, which normalizes — the
    views serve ad-hoc relational SQL."""
    for t in tables:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
