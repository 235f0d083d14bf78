"""fluentforward receiver parity tests.

Golden parity runs against the reference's OWN capture fixtures
(`receiver/fluentforwardreceiver/testdata/*.hexdump` — real fluent
bit/fluentd wire bytes) with the expected values from
`receiver_test.go:93-326`, when the read-only reference checkout is
present; codec/mode/ack/socket semantics are pinned by self-contained
tests either way.
"""

from __future__ import annotations

import gzip
import os
import re
import socket
import time

import pytest

from opentelemetry_collector_contrib_spark.sources.fluentforward import (
    EventTime,
    Truncated,
    decode_event_stream,
    encode_event,
    encode_value,
    fluent_log_records,
    fluent_spool_listener,
)

REF_TESTDATA = "/root/reference/receiver/fluentforwardreceiver/testdata"


def parse_hexdump(path: str) -> bytes:
    """`hexdump -C` output → bytes (util_test.go's parseHexDump)."""
    out = bytearray()
    with open(path) as f:
        for line in f:
            if not re.match(r"^[0-9a-f]{8}\s\s", line):
                continue
            out += bytes.fromhex("".join(line[10:58].split()))
    return bytes(out)


# ---------------------------------------------------------------------------
# codec round trips
# ---------------------------------------------------------------------------


def test_message_event_roundtrip():
    ev = encode_event(
        "app.x",
        [(EventTime(1704067200, 123), {"log": "hello", "k": 3})],
        mode="message",
    )
    recs, acks = decode_event_stream(ev)
    assert acks == []
    assert recs == [
        {
            "time_unix_nano": 1704067200_000000123,
            "body": "hello",
            "attributes": {"fluent.tag": "app.x", "k": 3},
        }
    ]


def test_forward_event_roundtrip_int_time_and_types():
    ev = encode_event(
        "fw",
        [
            (1704067201, {"message": "m1", "b": True, "neg": -7}),
            (1704067202, {"message": "m2", "f": 2.5, "arr": [1, "a"]}),
        ],
    )
    recs, _ = decode_event_stream(ev)
    assert [r["body"] for r in recs] == ["m1", "m2"]
    assert recs[0]["time_unix_nano"] == 1704067201_000000000
    assert recs[0]["attributes"]["b"] is True
    assert recs[0]["attributes"]["neg"] == -7
    assert recs[1]["attributes"]["arr"] == [1, "a"]


@pytest.mark.parametrize("compressed", [False, True])
def test_packedforward_roundtrip(compressed):
    entries = [
        (1704067203, {"log": "p1", "pid": 17}),
        (EventTime(1704067204, 7), {"log": "p2"}),
    ]
    ev = encode_event(
        "pf", entries, mode="packedforward", compressed=compressed
    )
    recs, _ = decode_event_stream(ev)
    assert len(recs) == 2
    assert recs[0]["attributes"]["pid"] == 17
    assert recs[1]["time_unix_nano"] == 1704067204_000000007
    # deterministic bytes (gzip mtime pinned to 0)
    assert ev == encode_event(
        "pf", entries, mode="packedforward", compressed=compressed
    )


def test_message_and_log_keys_become_body():
    # fluentd uses message, fluent bit log (conversion.go:171-176)
    for key in ("message", "log"):
        ev = encode_event("t", [(1, {key: "b", "o": 1})], mode="message")
        recs, _ = decode_event_stream(ev)
        assert recs[0]["body"] == "b"
        assert "o" in recs[0]["attributes"]
        assert key not in recs[0]["attributes"]


def test_ack_bytes_match_reference_shape():
    # AckResponse golden: 0x81 (fixmap 1) 0xa3 "ack" + str chunk
    # (ack.go:12-25, exercised by receiver_test.go:171-199)
    chunk = "abcdef01234576789"
    ev = encode_event(
        "my-tag",
        [(5000, {"a": 5.0})],
        mode="message",
        options={"chunk": chunk},
    )
    _, acks = decode_event_stream(ev)
    assert acks == [b"\x81\xa3ack" + bytes([0xB1]) + chunk.encode()]
    assert acks[0] == encode_value({"ack": chunk})


def test_truncated_and_malformed():
    ev = encode_event("t", [(1, {"log": "x"})], mode="message")
    with pytest.raises(Truncated):
        decode_event_stream(ev[:-3])
    with pytest.raises(ValueError, match="not a fixarray"):
        decode_event_stream(b"\xc0")
    # second element of the wrong type (bool) → unknown mode
    with pytest.raises(ValueError, match="unable to determine"):
        decode_event_stream(encode_value(["tag", True, {}]))
    # record must be a map
    with pytest.raises(ValueError, match="must be a map"):
        decode_event_stream(encode_value(["tag", 5, "notamap"]))


def test_multi_event_stream_mixed_modes():
    stream = (
        encode_event("a", [(1, {"log": "1"})], mode="message")
        + encode_event("b", [(2, {"log": "2"}), (3, {"log": "3"})])
        + encode_event(
            "c", [(4, {"log": "4"})], mode="packedforward", compressed=True
        )
    )
    recs, _ = decode_event_stream(stream)
    assert [r["attributes"]["fluent.tag"] for r in recs] == [
        "a",
        "b",
        "b",
        "c",
    ]


# ---------------------------------------------------------------------------
# golden parity vs the reference's own captures
# ---------------------------------------------------------------------------


@pytest.mark.skipif(
    not os.path.isdir(REF_TESTDATA), reason="reference checkout absent"
)
def test_reference_capture_goldens():
    # expectations transcribed from receiver_test.go:93-326
    recs, _ = decode_event_stream(
        parse_hexdump(f"{REF_TESTDATA}/message-event.hexdump")
    )
    assert len(recs) == 1
    r = recs[0]
    assert r["time_unix_nano"] == 1593031012000000000
    assert r["body"] == "..."
    assert r["attributes"]["fluent.tag"] == "b00a67eb6458"
    assert r["attributes"]["container_name"] == "/unruffled_cannon"
    assert r["attributes"]["source"] == "stdout"
    assert r["attributes"]["container_id"] == (
        "b00a67eb645849d6ab38ff8beb4aad035cc7e917bf123c3e9057c7e89fc73d2d"
    )

    recs, _ = decode_event_stream(
        parse_hexdump(f"{REF_TESTDATA}/forward-event.hexdump")
    )
    assert [r["time_unix_nano"] for r in recs] == [
        1593032377776693638,
        1593032378756829346,
    ]
    assert recs[0]["body"] is None
    assert recs[0]["attributes"]["Mem.free"] == 848908
    assert recs[0]["attributes"]["Swap.total"] == 0

    for fixture, t0, t4 in [
        ("forward-packed", 1593032517024597622, 1593032522187382822),
        (
            "forward-packed-compressed",
            1593032426012197420,
            1593032434346935532,
        ),
    ]:
        recs, acks = decode_event_stream(
            parse_hexdump(f"{REF_TESTDATA}/{fixture}.hexdump")
        )
        assert len(recs) == 5
        assert recs[0]["time_unix_nano"] == t0
        assert recs[4]["time_unix_nano"] == t4
        assert (
            recs[0]["body"]
            == "starting fluentd worker pid=17 ppid=7 worker=0"
        )
        assert recs[0]["attributes"]["pid"] == 17
        assert recs[4]["body"] == "fluentd worker is now stopping worker=0"
        assert len(acks) == 1  # both captures carry a chunk option


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def test_fluent_log_records_distributed(spark):
    streams = [
        encode_event(
            f"app.{i % 3}",
            [
                (
                    EventTime(1704067200 + i, i * 1000 + j),
                    {"log": f"line {i}/{j}", "n": i * 10 + j},
                )
                for j in range(3)
            ],
            mode=("message", "forward", "packedforward")[i % 3],
            compressed=(i % 3 == 2),
        )
        if i % 3 != 0
        else encode_event(
            f"app.{i % 3}",
            [(EventTime(1704067200 + i, i * 1000), {"log": f"line {i}/0", "n": i * 10})],
            mode="message",
        )
        for i in range(30)
    ]
    df = spark.createDataFrame(
        [(s,) for s in streams], "value binary"
    ).repartition(4)
    out = fluent_log_records(df).collect()
    # message mode events carry 1 record, forward/packed 3
    expected = sum(1 if i % 3 == 0 else 3 for i in range(30))
    assert len(out) == expected
    by_body = {r.body: r for r in out}
    r = by_body["line 4/2"]
    assert r.tag == "app.1"
    assert r.time_unix_nano == (1704067204) * 10**9 + 4002
    assert r.attributes["n"] == "42"
    assert r.attributes["fluent.tag"] == "app.1"


def test_live_socket_ack_heartbeat_spool(spark, tmp_path):
    spool = str(tmp_path / "spool")
    srv, stop = fluent_spool_listener("127.0.0.1", 0, spool, flush_every=2)
    port = srv.getsockname()[1]
    try:
        conn = socket.create_connection(("127.0.0.1", port), timeout=5)
        conn.sendall(
            encode_event("s.a", [(100, {"log": "one"})], mode="message")
        )
        # chunked event → ack must come back on the same connection
        chunk = "c2h1bmsx"
        conn.sendall(
            encode_event(
                "s.b",
                [(101, {"log": "two"}), (102, {"log": "three"})],
                options={"chunk": chunk},
            )
        )
        conn.settimeout(5)
        ack = conn.recv(1024)
        assert ack == encode_value({"ack": chunk})
        conn.close()

        # UDP heartbeat echo (heartbeat.go:32-36)
        hb = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        hb.settimeout(5)
        hb.sendto(b"\x00", ("127.0.0.1", port))
        data, _ = hb.recvfrom(16)
        assert data == b"\x00"
        hb.close()

        deadline = time.time() + 10
        while time.time() < deadline:
            files = [f for f in os.listdir(spool) if not f.startswith(".")]
            if files:
                break
            time.sleep(0.1)
    finally:
        stop()

    df = (
        spark.read.format("binaryFile")
        .load(spool + "/*.ffwd")
        .select("content")
    )
    out = fluent_log_records(df, blob_col="content").collect()
    assert sorted(r.body for r in out) == ["one", "three", "two"]
    assert {r.tag for r in out} == {"s.a", "s.b"}


def test_packed_str_payload_and_gzip_flag():
    # a str-typed payload (spec allows str; conversion.go:346-353) must
    # parse identically to the bin-typed one
    entries = [(7, {"log": "strpay"})]
    packed = b"".join(encode_value([ts, rec]) for ts, rec in entries)
    # hand-build: [tag, str(payload), {"compressed": "text"}]
    ev = bytearray()
    ev.append(0x93)
    ev += encode_value("t")
    ev.append(0xDB)
    ev += len(packed).to_bytes(4, "big") + packed
    ev += encode_value({"compressed": "text"})
    recs, _ = decode_event_stream(bytes(ev))
    assert recs[0]["body"] == "strpay"

    # gzip flag honored only when options say so
    gz = gzip.compress(packed, mtime=0)
    ev2 = bytearray()
    ev2.append(0x93)
    ev2 += encode_value("t")
    ev2 += encode_value(gz)
    ev2 += encode_value({"compressed": "gzip"})
    recs2, _ = decode_event_stream(bytes(ev2))
    assert recs2[0]["body"] == "strpay"


def test_fluent_to_splunk_hec_scenario(spark):
    """The reference testbed's cross-protocol FluentForward→SplunkHEC
    pipeline (`testbed/tests/log_test.go:118-125`): forward-protocol
    bytes in, HEC event JSON out, composed from the receiver and
    exporter halves with no intermediate materialization."""
    import json

    from opentelemetry_collector_contrib_spark.operators.splunk_exporter import (
        hec_events,
    )

    stream = encode_event(
        "svc.web",
        [
            (EventTime(1704067205, 500_000_000), {"log": "GET /", "code": 200}),
            (1704067206, {"log": "POST /x", "code": 503}),
        ],
    )
    df = spark.createDataFrame([(stream,)], "value binary")
    flat = fluent_log_records(df)
    rows = hec_events(flat).collect()
    assert len(rows) == 2
    events = sorted(
        (json.loads(r["value"]) for r in rows), key=lambda d: d["time"]
    )
    assert events[0]["event"] == "GET /"
    assert events[0]["time"] == 1704067205.5
    assert events[0]["fields"]["fluent.tag"] == "svc.web"
    assert events[0]["fields"]["code"] == "200"
    assert events[1]["event"] == "POST /x"
    assert events[1]["time"] == 1704067206.0


def test_stringify_nonfinite_floats():
    """NaN/Inf float attribute values must not crash the decode —
    regression for `v == int(v)` raising on non-finite floats (the
    reference passes them through as doubles)."""
    from opentelemetry_collector_contrib_spark.sources.fluentforward import (
        _stringify,
    )

    assert _stringify(float("nan")) == "nan"
    assert _stringify(float("inf")) == "inf"
    assert _stringify(float("-inf")) == "-inf"
    assert _stringify(2.0) == "2"
    assert _stringify(2.5) == "2.5"
