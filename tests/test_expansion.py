"""Volume expansion golden tests.

Mirrors the reference's exact-value test style for the signature
operator (/root/reference/test/test_volume_expansion.jl:110-153 volume
replication, :238-263 delta rule, :5-15 timestamp round-trip) — values
here are hand-computed from the operator contract, not copied.
"""

from __future__ import annotations

from tests.conftest import make_ticks_raw
from tickdatapipeline_spark.operators.expansion import expand_volume


def test_replication_and_delta_rule(spark):
    # line 1: last=100 vol=1; line 2: last=105 vol=3 -> 4 ticks
    df = expand_volume(
        make_ticks_raw(spark, [(1, "20250319 120000 0000000", 100, 1),
                               (2, "20250319 120001 0000000", 105, 3)])
    ).orderBy("tick_idx")
    rows = df.collect()
    assert [r.tick_idx for r in rows] == [1, 2, 3, 4]
    # replica 1 of line 2 carries last - prev_last = 5; replicas 2..3 carry 0
    assert [r.price_delta for r in rows] == [0, 5, 0, 0]
    assert [r.raw_price for r in rows] == [100, 105, 105, 105]
    assert [r.replica_idx for r in rows] == [1, 1, 2, 3]


def test_negative_delta_and_row_total(spark):
    df = expand_volume(
        make_ticks_raw(spark, [(1, "20250319 120000 0000000", 200, 2),
                               (2, "20250319 120001 0000000", 197, 2),
                               (3, "20250319 120002 0000000", 197, 1)])
    ).orderBy("tick_idx")
    rows = df.collect()
    assert len(rows) == 5  # sum of volumes
    assert [r.price_delta for r in rows] == [0, 0, -3, 0, 0]


def test_zero_and_negative_volume_emit_no_replicas(spark):
    # Julia `for 1:0` is empty; Spark sequence(1, 0) would be [1, 0] —
    # the guard must drop those lines' replicas entirely, while the line
    # itself still advances the prev_last chain.
    df = expand_volume(
        make_ticks_raw(spark, [(1, "20250319 120000 0000000", 200, 2),
                               (2, "20250319 120001 0000000", 250, 0),
                               (3, "20250319 120002 0000000", 300, 1),
                               (4, "20250319 120003 0000000", 310, -5)])
    ).orderBy("tick_idx")
    rows = df.collect()
    assert [r.line_no for r in rows] == [1, 1, 3]
    assert [r.tick_idx for r in rows] == [1, 2, 3]
    assert [r.price_delta for r in rows] == [0, 0, 50]  # 300 - prev_last(250)


def test_timestamp_pack_unpack_round_trip(spark):
    from pyspark.sql import functions as F

    from tickdatapipeline_spark.operators.expansion import unpacked_timestamp

    df = expand_volume(
        make_ticks_raw(spark, [(1, "20250319 120000 0000000", 100, 1),
                               (2, "19991231 235959 9999999", 101, 1)])
    ).withColumn("decoded", unpacked_timestamp(F.col("timestamp")))
    rows = df.orderBy("tick_idx").collect()
    assert rows[0].decoded == "20250319"
    assert rows[1].decoded == "19991231"


def test_timestamp_pack_first8_chars(spark):
    # pack = fold (acc<<8)|ascii over first 8 chars of "20250319"
    expected = 0
    for ch in "20250319":
        expected = (expected << 8) | ord(ch)
    rows = expand_volume(
        make_ticks_raw(spark, [(1, "20250319 120000 0000000", 100, 1),
                               (2, "20250319 235959 9999999", 101, 1)])
    ).orderBy("tick_idx").collect()
    assert rows[0].timestamp == expected
    # same first 8 chars -> same packed value regardless of the rest
    assert rows[1].timestamp == expected
