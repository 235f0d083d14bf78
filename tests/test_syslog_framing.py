"""RFC 6587 syslog TCP framing (receive direction).

Reference semantics under test: `pkg/stanza/operator/input/syslog/
input.go:54-84` (octet frame split incl. EOF flush of malformed/short
remainders) and `pkg/stanza/operator/parser/syslog/parser.go:97-104`
(prefix strip; LF/NUL non-transparent trailers). Round-trips the
syslog exporter's octet_counting output by construction."""

import pytest

from opentelemetry_collector_contrib_spark.sources.syslog_framing import (
    split_nontransparent_frames,
    split_octet_frames,
    strip_octet_prefix,
    syslog_frame_lines,
)


def _frame(msg: bytes) -> bytes:
    return str(len(msg)).encode() + b" " + msg


def test_octet_split_basic_and_embedded_newlines():
    # ≥3 frames of DIFFERENT lengths: a splitter that only handles the
    # first frame and EOF-flushes the rest cannot pass by coincidence
    msgs = [
        b"<34>1 2024-01-01T00:00:00Z h app 1 M1 - line1\nline2",
        b"<34>1 2024-01-01T00:00:01Z h app 1 M2 - ok",
        b"<165>1 2024-01-01T00:00:02Z host2 app2 77 M3 - third message",
        b"<1>1 - - - - - - x",
    ]
    stream = b"".join(_frame(m) for m in msgs)
    frames = split_octet_frames(stream)
    assert [strip_octet_prefix(f) for f in frames] == msgs


def test_octet_split_flushes_malformed_and_short():
    # no length prefix at position 0 → whole remainder flushes
    assert split_octet_frames(b"garbage") == [b"garbage"]
    # valid frame then short final frame → frame + flushed remainder
    stream = _frame(b"ok") + b"100 tooshort"
    frames = split_octet_frames(stream)
    assert strip_octet_prefix(frames[0]) == b"ok"
    assert frames[1] == b"100 tooshort"
    # leading zero doesn't match ^[1-9]
    assert split_octet_frames(b"07 msgmsgg")[0] == b"07 msgmsgg"


def test_nontransparent_trailers():
    assert split_nontransparent_frames(b"a\nb\nc\n") == [b"a", b"b", b"c"]
    assert split_nontransparent_frames(b"a\nb") == [b"a", b"b"]  # flush
    assert split_nontransparent_frames(b"a\x00b\x00", "NUL") == [b"a", b"b"]
    with pytest.raises(ValueError):
        split_nontransparent_frames(b"", "CR")


def test_syslog_frame_lines_roundtrip_with_exporter(spark):
    """syslog exporter octet_counting output → framing split → the
    existing RFC 5424 parser: the embedded-newline message survives."""
    from opentelemetry_collector_contrib_spark.operators.parse import (
        syslog_parser,
    )
    from opentelemetry_collector_contrib_spark.operators.syslog_exporter import (
        format_rfc5424,
    )

    msgs = [
        {
            "time_unix_nano": 1_704_067_200_000_000_000,
            "attributes": {
                "priority": "34", "hostname": "h1", "appname": "app",
                "proc_id": "7", "msg_id": "M1",
                "message": "multi\nline body",
            },
        },
        {
            "time_unix_nano": 1_704_067_201_000_000_000,
            "attributes": {
                "priority": "13", "hostname": "h2", "appname": "app",
                "proc_id": "8", "msg_id": "M2", "message": "plain",
            },
        },
    ]
    stream = "".join(format_rfc5424(m, octet_counting=True) for m in msgs)
    df = spark.createDataFrame([("c1", stream.encode())], "conn string, value binary")
    lines = syslog_frame_lines(df, conn_col="conn")
    got = lines.collect()
    assert [r.frame_idx for r in sorted(got, key=lambda r: r.frame_idx)] == [0, 1]
    parsed = syslog_parser(
        lines, protocol="rfc5424", multiline_msg=True
    ).collect()
    by = {r.msgid: r for r in parsed}
    assert by["M1"].host == "h1"
    assert by["M1"].facility == 4 and by["M1"].syslog_severity == 2
    assert "multi\nline body" in by["M1"].msg
    assert by["M2"].host == "h2" and by["M2"].msg.rstrip("\n") == "plain"


def test_syslog_frame_lines_rejects_unknown_framing(spark):
    df = spark.createDataFrame([(b"x",)], "value binary")
    with pytest.raises(ValueError):
        syslog_frame_lines(df, framing="cr")
