"""Tail-based sampling: policy decisions, precedence combiner, stateful
rate budgets — semantics mirrored from
processor/tailsamplingprocessor/internal/sampling/*.go with a pure-Python
reference replay as the golden model (the reference's own unit-test
strategy: build a trace, assert the Decision)."""

import datetime as dt

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.hashing import (
    SAMPLER_BUCKETS,
)
from opentelemetry_collector_contrib_spark.operators import tailsampling as ts

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    """rows: (trace_key, offset_s, event_type, value)"""
    data = [
        (int(k), T0 + dt.timedelta(seconds=off), et, float(v))
        for k, off, et, v in rows
    ]
    return spark.createDataFrame(
        data, "trace_key long, ts timestamp, event_type string, value double"
    )


def _decisions(spark, rows, policies):
    df = _events(spark, rows)
    out = ts.trace_decisions(df, "trace_key", "ts", policies)
    return {r["trace_key"]: r.asDict() for r in out.collect()}


def test_latency_policy(spark):
    # latency.go: duration >= threshold (upper 0); (thr, upper] otherwise
    rows = [(1, 0, "a", 0), (1, 120, "a", 0),   # 120 s
            (2, 0, "a", 0), (2, 30, "a", 0)]    # 30 s
    d = _decisions(spark, rows, [ts.latency("lat", 60_000)])
    assert d[1]["d_lat"] == ts.SAMPLED and d[1]["sampled"] == 1
    assert d[2]["d_lat"] == ts.NOT_SAMPLED and d[2]["sampled"] == 0
    d = _decisions(spark, rows, [ts.latency("band", 60_000, 100_000)])
    assert d[1]["d_band"] == ts.NOT_SAMPLED  # above upper bound
    assert d[2]["d_band"] == ts.NOT_SAMPLED


def test_status_and_string_invert_precedence(spark):
    # status_code.go (any error span samples) + string_tag_filter.go
    # invert_match (a matching span vetoes via InvertNotSampled, which
    # processor.go:283 gives top precedence)
    rows = [
        (1, 0, "error", 0), (1, 1, "view", 0),
        (2, 0, "error", 0), (2, 1, "signup", 0),   # error AND signup
        (3, 0, "view", 0),
    ]
    pol = [
        ts.string_attr("nosignup", "event_type", ["signup"], invert=True),
        ts.status_code("err", "event_type", ["error"]),
    ]
    d = _decisions(spark, rows, pol)
    assert d[1]["sampled"] == 1          # error, no signup
    assert d[2]["d_err"] == ts.SAMPLED
    assert d[2]["d_nosignup"] == ts.INVERT_NOT_SAMPLED
    assert d[2]["sampled"] == 0          # veto wins over Sampled
    # trace 3: InvertSampled from the invert filter, but the status policy
    # voted NotSampled, which blocks the InvertSampled path
    # (processor.go:287 requires no NotSampled vote)
    assert d[3]["d_nosignup"] == ts.INVERT_SAMPLED
    assert d[3]["sampled"] == 0


def test_invert_sampled_alone_samples(spark):
    # processor.go:287: InvertSampled wins when no policy said NotSampled
    rows = [(1, 0, "view", 0), (2, 0, "signup", 0)]
    pol = [ts.string_attr("nosignup", "event_type", ["signup"], invert=True)]
    d = _decisions(spark, rows, pol)
    assert d[1]["d_nosignup"] == ts.INVERT_SAMPLED and d[1]["sampled"] == 1
    assert d[2]["d_nosignup"] == ts.INVERT_NOT_SAMPLED and d[2]["sampled"] == 0


def test_invert_sampled_blocked_by_not_sampled(spark):
    rows = [(1, 0, "view", 0)]
    pol = [
        ts.string_attr("nosignup", "event_type", ["signup"], invert=True),
        ts.status_code("err", "event_type", ["error"]),  # NotSampled vote
    ]
    d = _decisions(spark, rows, pol)
    assert d[1]["d_nosignup"] == ts.INVERT_SAMPLED
    assert d[1]["d_err"] == ts.NOT_SAMPLED
    assert d[1]["sampled"] == 0


def test_numeric_span_count_and(spark):
    rows = [
        (1, 0, "a", 500), (1, 1, "a", 10), (1, 2, "a", 10),  # 3 spans, hot value
        (2, 0, "a", 500),                                     # 1 span, hot value
        (3, 0, "a", 10), (3, 1, "a", 10), (3, 2, "a", 10),    # 3 spans, cold
    ]
    pol = [ts.and_("both", [
        ts.numeric_attr("hot", "value", 100, 1000),
        ts.span_count("n3", 3),
    ])]
    d = _decisions(spark, rows, pol)
    assert d[1]["d_both"] == ts.SAMPLED
    assert d[2]["d_both"] == ts.NOT_SAMPLED
    assert d[3]["d_both"] == ts.NOT_SAMPLED


def test_probabilistic_matches_bucket_hash(spark):
    rows = [(k, 0, "a", 0) for k in range(200)]
    pct = 25.0
    d = _decisions(spark, rows, [ts.probabilistic("p", pct, seed=7)])
    from opentelemetry_collector_contrib_spark.functions.hashing import (
        sampler_bucket_col,
    )
    buckets = {
        r["k"]: r["b"]
        for r in spark.range(200)
        .select(F.col("id").alias("k"), sampler_bucket_col(F.col("id"), 7).alias("b"))
        .collect()
    }
    thr = pct * SAMPLER_BUCKETS / 100.0
    for k in range(200):
        assert d[k]["d_p"] == (ts.SAMPLED if buckets[k] < thr else ts.NOT_SAMPLED)
    frac = sum(v["sampled"] for v in d.values()) / 200
    assert 0.1 < frac < 0.45  # deterministic but roughly 25%


def test_rate_limiting_greedy_budget(spark):
    # rate_limiting.go: within one second, accept in completion order while
    # accepted+n < limit; rejected traces don't consume budget.
    rows = []
    # 4 traces completing at t=0s with 3 spans each; limit 10 spans/s
    for k in range(4):
        for j in range(3):
            rows.append((k, 0, "a", 0))
    # next second: 2 more traces
    for k in (10, 11):
        for j in range(3):
            rows.append((k, 1, "a", 0))
    d = _decisions(spark, rows, [ts.rate_limiting("rl", 10)])
    # order within the second is (max_ts, trace_key): 0,1,2 fit (9 < 10),
    # 3 would make 12 → rejected
    assert [d[k]["d_rl"] for k in range(4)] == [1, 1, 1, 0]
    # budget resets next second
    assert d[10]["d_rl"] == 1 and d[11]["d_rl"] == 1


def test_composite_allocations(spark):
    # composite.go: first sub that votes Sampled decides, under per-sub and
    # total spans-per-second budgets (inclusive <=).
    rows = [
        (1, 0, "error", 0), (1, 0, "error", 0),       # errors, 2 spans
        (2, 0, "error", 0), (2, 0, "error", 0),
        (3, 0, "error", 0), (3, 0, "error", 0),       # exceeds error alloc 4
        (4, 0, "view", 500), (4, 0, "view", 500),     # hot value sub
    ]
    pol = [ts.composite("comp", 8, [
        (ts.status_code("errsub", "event_type", ["error"]), 4),
        (ts.numeric_attr("hotsub", "value", 100, 1000), 4),
    ])]
    d = _decisions(spark, rows, pol)
    assert d[1]["d_comp"] == 1 and d[2]["d_comp"] == 1
    assert d[3]["d_comp"] == 0          # error alloc exhausted (4+2 > 4)
    assert d[4]["d_comp"] == 1          # second sub's own allocation


def test_ottl_condition_policy(spark):
    rows = [(1, 0, "error", 42.0), (2, 0, "view", 1.0)]
    pol = [ts.ottl_condition("o", ['event_type == "error" and value > 10.0'])]
    d = _decisions(spark, rows, pol)
    assert d[1]["d_o"] == ts.SAMPLED
    assert d[2]["d_o"] == ts.NOT_SAMPLED


def test_trace_state_policy(spark):
    # trace_state_filter.go: parse W3C tracestate, match key's value
    data = [
        (1, T0, "a", 0.0, "vendor=acme,tier=gold"),
        (2, T0, "a", 0.0, "tier=silver"),
        (3, T0, "a", 0.0, None),
    ]
    df = spark.createDataFrame(
        data,
        "trace_key long, ts timestamp, event_type string, value double, "
        "tracestate string",
    )
    out = ts.trace_decisions(
        df, "trace_key", "ts",
        [ts.trace_state("gold", "tracestate", "tier", ["gold"])],
    )
    d = {r["trace_key"]: r["d_gold"] for r in out.collect()}
    assert d == {1: ts.SAMPLED, 2: ts.NOT_SAMPLED, 3: ts.NOT_SAMPLED}


def test_tail_sample_keeps_whole_traces(spark):
    rows = [(1, 0, "error", 0), (1, 1, "view", 0), (2, 0, "view", 0)]
    df = _events(spark, rows)
    kept = ts.tail_sample(df, "trace_key", "ts",
                          [ts.status_code("err", "event_type", ["error"])])
    got = sorted((r["trace_key"], r["event_type"]) for r in kept.collect())
    assert got == [(1, "error"), (1, "view")]  # all-or-nothing per trace
