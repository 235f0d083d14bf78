"""As-of join operator."""

import datetime

import pytest
from pyspark.sql import Row

from opentelemetry_collector_contrib_spark.operators.asof_join import asof_join

T0 = datetime.datetime(2024, 1, 1)


def _t(minutes):
    return T0 + datetime.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def frames(spark):
    trades = spark.createDataFrame(
        [
            Row(sym="A", ts=_t(1), qty=10),
            Row(sym="A", ts=_t(5), qty=20),
            Row(sym="A", ts=_t(10), qty=30),
            Row(sym="B", ts=_t(3), qty=40),
            Row(sym="C", ts=_t(3), qty=50),  # no quotes at all
        ],
        "sym string, ts timestamp, qty int",
    )
    quotes = spark.createDataFrame(
        [
            Row(sym="A", ts=_t(0), px=100.0),
            Row(sym="A", ts=_t(4), px=105.0),
            Row(sym="A", ts=_t(10), px=110.0),  # exact tie with a trade
            Row(sym="B", ts=_t(9), px=200.0),   # only AFTER B's trade
        ],
        "sym string, ts timestamp, px double",
    )
    return trades, quotes


def test_backward_asof(spark, frames):
    trades, quotes = frames
    out = asof_join(trades, quotes, ["sym"], "ts", ["px"])
    got = {(r.sym, r.qty): r.px_asof for r in out.collect()}
    assert got[("A", 10)] == 100.0   # latest quote at t1 is t0
    assert got[("A", 20)] == 105.0   # t5 → t4 quote
    assert got[("A", 30)] == 110.0   # equal timestamps match (right first)
    assert got[("B", 40)] is None    # quote exists only later
    assert got[("C", 50)] is None    # key never quoted
    assert out.count() == trades.count()  # left rows preserved exactly
