from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tickdatapipeline_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def make_ticks_raw(spark, rows):
    """rows: list of (line_no, ts_str, last, volume) -> ticks_raw frame."""
    data = [(ln, ts, last - 1, last + 1, last, vol) for ln, ts, last, vol in rows]
    return spark.createDataFrame(
        data, "line_no long, ts_str string, bid long, ask long, last long, volume long"
    )
