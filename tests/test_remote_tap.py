"""remotetap processor: transparent pass-through, OTLP/JSON broadcast to
live TCP subscribers, non-blocking rate limit, dead-subscriber eviction.

Reference semantics under test: `processor/remotetapprocessor/processor.go`
ConsumeLogs (marshal whole batch → one JSON document → every subscriber,
return data unchanged) and `channelset.go` (no subscribers → no-op; write
error → subscriber closed and removed)."""

import json
import socket
import time

import pytest

from opentelemetry_collector_contrib_spark.streaming.remote_tap import (
    TapServer,
    TokenBucket,
    remote_tap_stream,
    tap_batch,
)


# ---------------------------------------------------------------- TokenBucket


def test_token_bucket_rate_and_burst():
    t = [0.0]
    b = TokenBucket(limit=1.0, burst=2, clock=lambda: t[0])
    assert b.allow() and b.allow()  # burst drains
    assert not b.allow()  # empty → non-blocking drop
    t[0] = 0.5
    assert not b.allow()  # half a token is not a token
    t[0] = 1.6  # +1.1 tokens accrued since last refill
    assert b.allow()
    assert not b.allow()
    t[0] = 100.0
    assert b.allow() and b.allow()  # refill caps at burst...
    assert not b.allow()  # ...never beyond


# ------------------------------------------------------------------ TapServer


def _connect(port: int) -> socket.socket:
    c = socket.create_connection(("127.0.0.1", port), timeout=2)
    c.settimeout(2)
    return c


def _wait_clients(srv: TapServer, n: int, timeout: float = 2.0) -> None:
    deadline = time.monotonic() + timeout
    while srv.client_count() < n and time.monotonic() < deadline:
        time.sleep(0.01)
    assert srv.client_count() >= n


def test_tap_server_broadcast_and_zero_subscribers():
    srv = TapServer()
    try:
        srv.broadcast(b"nobody-listening")  # channelset.go: no-op, no error
        c1, c2 = _connect(srv.port), _connect(srv.port)
        try:
            _wait_clients(srv, 2)
            srv.broadcast(b"hello")
            assert c1.makefile().readline() == "hello\n"
            assert c2.makefile().readline() == "hello\n"
        finally:
            c1.close()
            c2.close()
    finally:
        srv.stop()


def test_tap_server_drops_dead_subscriber():
    srv = TapServer()
    try:
        c = _connect(srv.port)
        _wait_clients(srv, 1)
        c.close()
        # first write may land in the kernel buffer of the half-closed
        # socket; a subsequent write surfaces the error → eviction
        deadline = time.monotonic() + 3
        while srv.client_count() > 0 and time.monotonic() < deadline:
            srv.broadcast(b"x" * 65536)
            time.sleep(0.05)
        assert srv.client_count() == 0
    finally:
        srv.stop()


# ------------------------------------------------------------------ tap_batch


@pytest.fixture()
def flat_df(spark):
    rows = [
        (
            "2024-01-01 12:00:00",
            9,
            "Info",
            f"msg-{i}",
            {"k": str(i)},
            {"host.name": "h1"},
            "lib",
            "",
            "",
        )
        for i in range(5)
    ]
    df = spark.createDataFrame(
        rows,
        "ts string, severity_number int, severity_text string, body string,"
        " attributes map<string,string>, resource map<string,string>,"
        " scope_name string, trace_id string, span_id string",
    )
    return df.withColumn("ts", df.ts.cast("timestamp"))


def test_tap_batch_pass_through_and_payload(spark, flat_df):
    srv = TapServer()
    try:
        c = _connect(srv.port)
        try:
            _wait_clients(srv, 1)
            out = tap_batch(flat_df, srv, bucket=None)
            assert out is flat_df  # ConsumeLogs returns ld unchanged
            line = c.makefile().readline()
            doc = json.loads(line)
            recs = doc["resourceLogs"][0]["scopeLogs"][0]["logRecords"]
            assert len(recs) == 5
            assert {r["body"]["stringValue"] for r in recs} == {
                f"msg-{i}" for i in range(5)
            }
        finally:
            c.close()
    finally:
        srv.stop()


def test_tap_batch_rate_limited_drops(spark, flat_df):
    t = [0.0]
    bucket = TokenBucket(limit=1.0, burst=1, clock=lambda: t[0])
    srv = TapServer()
    try:
        c = _connect(srv.port)
        try:
            _wait_clients(srv, 1)
            tap_batch(flat_df, srv, bucket)  # allowed
            tap_batch(flat_df, srv, bucket)  # dropped, NOT blocked
            t[0] = 1.5
            tap_batch(flat_df, srv, bucket)  # allowed again
            f = c.makefile()
            first, second = f.readline(), f.readline()
            assert json.loads(first) == json.loads(second)
            c.settimeout(0.3)
            try:
                extra = c.recv(1)
                assert extra == b""  # connection closed, not a third doc
            except socket.timeout:
                pass  # nothing further arrived — the middle tap dropped
        finally:
            c.close()
    finally:
        srv.stop()


# ------------------------------------------------------------------ streaming


def test_remote_tap_stream_transparent(spark, flat_df, tmp_path):
    src = str(tmp_path / "src")
    flat_df.write.parquet(src)
    stream = spark.readStream.schema(flat_df.schema).parquet(src)

    seen = []

    def sink(batch_df, batch_id):
        seen.extend(r.body for r in batch_df.select("body").collect())

    srv = TapServer()
    try:
        c = _connect(srv.port)
        try:
            _wait_clients(srv, 1)
            q = (
                remote_tap_stream(stream, srv, sink, limit=100.0, burst=10)
                .option("checkpointLocation", str(tmp_path / "ck"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(60)
            # sink saw every row (tap never filtered or blocked the data)
            assert sorted(seen) == [f"msg-{i}" for i in range(5)]
            doc = json.loads(c.makefile().readline())
            recs = doc["resourceLogs"][0]["scopeLogs"][0]["logRecords"]
            assert len(recs) == 5
        finally:
            c.close()
    finally:
        srv.stop()
