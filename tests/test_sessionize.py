"""Gap sessionization operator."""

import datetime

import pytest
from pyspark.sql import Row

from opentelemetry_collector_contrib_spark.operators.sessionize import (
    session_aggregate,
    sessionize,
)


@pytest.fixture(scope="module")
def events(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: 3 events close, 30min gap, 2 events close
    for m in (0, 1, 2, 40, 41):
        rows.append(Row(user_id=1, ts=t0 + datetime.timedelta(minutes=m)))
    # user 2: single event
    rows.append(Row(user_id=2, ts=t0))
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_sessionize_ids(spark, events):
    out = sessionize(events, ["user_id"], "ts", gap_seconds=600)
    u1 = [r.session_id for r in out.filter("user_id=1").orderBy("ts").collect()]
    assert u1 == [0, 0, 0, 1, 1]
    assert out.filter("user_id=2").collect()[0].session_id == 0


def test_session_aggregate(spark, events):
    agg = session_aggregate(events, ["user_id"], "ts", 600)
    rows = {(r.user_id, r.session_id): r for r in agg.collect()}
    assert rows[(1, 0)].n_events == 3 and rows[(1, 0)].duration_s == 120
    assert rows[(1, 1)].n_events == 2 and rows[(1, 1)].duration_s == 60
    assert rows[(2, 0)].n_events == 1 and rows[(2, 0)].duration_s == 0


def test_exact_gap_boundary(spark):
    """gap strictly-greater semantics: an event exactly gap seconds later
    stays in the same session."""
    t0 = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [Row(user_id=1, ts=t0), Row(user_id=1, ts=t0 + datetime.timedelta(seconds=600))],
        "user_id long, ts timestamp",
    )
    out = sessionize(df, ["user_id"], "ts", 600).collect()
    assert {r.session_id for r in out} == {0}
