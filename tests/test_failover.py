"""failoverconnector: priority routing, walk-down on error, retry
cycle, max_retries exhaustion, fan-out levels, streaming wiring.

Reference semantics under test: `connector/failoverconnector/logs.go`
(ConsumeLogs/FailoverLogs) and `internal/state/pipeline_selector.go`
(stable/current movement, retry passes, retry-count bookkeeping)."""

import pytest

from opentelemetry_collector_contrib_spark.operators.failover import (
    AllPipelinesFailed,
    FailoverRouter,
    failover_stream,
)


class Sink:
    def __init__(self, name, fail=False):
        self.name, self.fail, self.got = name, fail, []

    def __call__(self, df, bid):
        if self.fail:
            raise IOError(f"{self.name} down")
        self.got.append((bid, df))


def _router(sinks, clock, **kw):
    kw.setdefault("retry_interval", 100.0)
    kw.setdefault("retry_gap", 10.0)
    kw.setdefault("max_retries", 2)
    return FailoverRouter(sinks, clock=lambda: clock[0], **kw)


def test_validation():
    with pytest.raises(ValueError):
        FailoverRouter([])
    with pytest.raises(ValueError):  # interval must exceed gap × levels
        FailoverRouter([Sink("a"), Sink("b")], retry_interval=20, retry_gap=10)


def test_healthy_stays_at_level_zero():
    t = [0.0]
    a, b = Sink("a"), Sink("b")
    r = _router([a, b], t)
    assert r.consume("batch0", 0) == 0
    assert r.consume("batch1", 1) == 0
    assert len(a.got) == 2 and not b.got and r.stable == 0


def test_walk_down_on_error_and_failover():
    t = [0.0]
    a, b, c = Sink("a", fail=True), Sink("b", fail=True), Sink("c")
    r = _router([a, b, c], t)
    assert r.consume("x", 0) == 2  # a, b error → c accepts
    assert r.stable == 2
    assert r.consume("y", 1) == 2  # next batch goes straight to c
    assert [bid for bid, _ in c.got] == [0, 1]


def test_all_levels_fail_drops_batch():
    t = [0.0]
    r = _router([Sink("a", fail=True), Sink("b", fail=True)], t)
    with pytest.raises(AllPipelinesFailed):
        r.consume("x", 0)


def test_retry_pass_recovers_higher_level():
    t = [0.0]
    a, b = Sink("a", fail=True), Sink("b")
    r = _router([a, b], t)
    assert r.consume("x", 0) == 1 and r.stable == 1
    # before the first retry pass: still level 1
    t[0] = 50.0
    assert r.consume("y", 1) == 1
    # level 0 recovers; first pass tick (interval + gap) repoints current
    a.fail = False
    t[0] = 100.0 + 10.0
    assert r.current() == 0
    assert r.consume("z", 2) == 0  # probe succeeds → stable back to 0
    assert r.stable == 0
    assert r.consume("w", 3) == 0  # retry cycle stopped; stays at 0
    assert [bid for bid, _ in a.got] == [2, 3]


def test_failed_probe_returns_to_stable_until_next_tick():
    t = [0.0]
    a, b = Sink("a", fail=True), Sink("b")
    r = _router([a, b], t)
    r.consume("x", 0)
    t[0] = 110.0  # first retry tick: current repoints to level 0
    assert r.current() == 0
    assert r.consume("y", 1) == 1  # probe fails → lands on stable level 1
    assert r.retry_count(0) == 1
    assert r.current() == 0 or r.current() == 1
    # no new tick yet → next batch stays at stable
    t[0] = 115.0
    assert r.consume("z", 2) == 1
    # next pass repoints again
    t[0] = 210.0
    assert r.current() == 0


def test_max_retries_exhausts_level():
    t = [0.0]
    a, b = Sink("a", fail=True), Sink("b")
    r = _router([a, b], t)
    r.consume("x", 0)
    for i, when in enumerate((110.0, 210.0)):  # max_retries=2 failed probes
        t[0] = when
        assert r.consume(f"p{i}", 1 + i) == 1
    assert r.retry_count(0) == 2
    # retries exhausted: ticks no longer repoint to level 0
    t[0] = 310.0
    assert r.current() == 1
    assert r.consume("q", 9) == 1
    assert len(a.got) == 0


def test_fanout_level_partial_failure_is_unhealthy():
    t = [0.0]
    ok, bad, lower = Sink("ok"), Sink("bad", fail=True), Sink("lower")
    r = _router([[ok, bad], lower], t)
    assert r.consume("x", 0) == 1  # any consumer failing fails the level
    assert r.stable == 1
    # at-least-once caveat: the healthy sibling already consumed it
    assert len(ok.got) == 1 and len(lower.got) == 1


def test_failover_stream_wiring(spark, tmp_path):
    df = spark.createDataFrame([(i,) for i in range(10)], "v long")
    src = str(tmp_path / "src")
    df.write.parquet(src)
    stream = spark.readStream.schema("v long").parquet(src)

    got = []
    primary = Sink("primary", fail=True)

    def secondary(batch_df, bid):
        got.extend(r.v for r in batch_df.collect())

    r = FailoverRouter(
        [primary, secondary], retry_interval=100, retry_gap=10
    )
    q = (
        failover_stream(stream, r)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert sorted(got) == list(range(10))
    assert r.stable == 1
