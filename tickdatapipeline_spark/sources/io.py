"""Session-independent parquet reading.

The driver's testdata generator has emitted `events.ts` under two
physical types across rounds: INT64 TIMESTAMP(NANOS) (which Spark only
reads with ``spark.sql.legacy.parquet.nanosAsLong``, surfacing epoch-nanos
BIGINT) and TIMESTAMP(MICROS) (which Spark reads as TIMESTAMP_NTZ).
``read_events`` normalizes both to epoch-nanos BIGINT so every event-time
plan does integer epoch math — the cross-engine-exact representation the
DuckDB oracle can reproduce (``epoch_us(ts) * 1000``).

The query surface (``__spark_entry__.queries()``) must run on ANY
caller-built SparkSession — the correctness harness constructs a plain
one. Both confs involved are runtime-settable, so every shared reader
goes through these helpers instead of assuming who built the session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.parquet that works on a plain session for nanos-ts files."""
    spark.conf.set(NANOS_CONF, "true")
    return spark.read.parquet(path)


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`events` with ts normalized to epoch-nanos BIGINT whatever the
    parquet physical type, branching on the SURFACED Spark type:

    - bigint: already epoch nanos (INT64 TIMESTAMP(NANOS) + nanosAsLong).
    - timestamp (TIMESTAMP_LTZ, from isAdjustedToUTC=true micros): an
      absolute instant — ``unix_micros`` is timezone-independent; casting
      it to NTZ first would bake in the session zone and silently skew
      every event-time plan vs the DuckDB oracle's ``epoch_us``.
    - timestamp_ntz (isAdjustedToUTC=false micros): wall time with no
      zone — timestampdiff against the NTZ epoch literal yields the same
      micros DuckDB's ``epoch_us`` computes, independent of session TZ.
    """
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    surfaced = ev.schema["ts"].dataType.simpleString()
    if surfaced == "timestamp":
        ev = ev.withColumn("ts", F.unix_micros("ts") * F.lit(1000))
    elif surfaced == "timestamp_ntz":
        ev = ev.withColumn(
            "ts",
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ) * F.lit(1000),
        )
    elif surfaced != "bigint":
        raise TypeError(f"events.ts surfaced as unsupported type {surfaced}")
    return ev


DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_documents_jsonl(spark: SparkSession, path: str,
                         schema: str = DOCUMENTS_SCHEMA) -> DataFrame:
    """Documents from JSON-lines crawl drops — the wire format most raw
    text corpora actually arrive in before anyone parquets them.

    Reads PERMISSIVE with an explicit schema (never schema inference —
    an inference pass is a full extra scan of 100 TB and makes the
    surfaced types depend on the data): malformed lines do not abort
    the job; they surface with every schema field NULL and the raw line
    preserved in `_corrupt_record` so ingest can count/quarantine them
    (``where col('_corrupt_record').isNotNull()``). Well-formed rows
    carry NULL in `_corrupt_record`.

    Scale: JSONL splits on newlines, so the scan parallelizes per
    HDFS-block like any text source; with an explicit schema Spark
    prunes unreferenced JSON fields at parse time.
    """
    full = schema + ", _corrupt_record string"
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
