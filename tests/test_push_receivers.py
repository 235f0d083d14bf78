"""Loki + Splunk HEC receiver halves: label/event unmarshaling parity
and exporter→receiver round-trips.

Reference semantics under test: `pkg/translator/loki/loki_to_otlp.go`
(labels parse, __-internal filter, keepTimestamp, skip-bad-stream) and
`receiver/splunkhecreceiver/splunk_to_logdata.go` (event/raw endpoints,
metadata mapping, fields→attributes, time seconds→nanos)."""

import json

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.sources.loki_receiver import (
    loki_log_records,
    parse_label_string,
)
from opentelemetry_collector_contrib_spark.sources.splunk_receiver import (
    hec_log_records,
    hec_raw_log_records,
    parse_hec_events,
)


# ------------------------------------------------------------- loki labels


def test_parse_label_string_basic_and_escapes():
    assert parse_label_string('{a="x", b="y"}') == {"a": "x", "b": "y"}
    assert parse_label_string('{q="say \\"hi\\"", nl="a\\nb"}') == {
        "q": 'say "hi"',
        "nl": "a\nb",
    }
    assert parse_label_string('{u="\\u00e9\\x41"}') == {"u": "éA"}
    assert parse_label_string("{}") == {}
    # trailing comma and bare (braceless) form both parse
    assert parse_label_string('{a="x",}') == {"a": "x"}
    assert parse_label_string('a="x"') == {"a": "x"}


@pytest.mark.parametrize(
    "bad",
    ['{a=x}', '{a="x"', '{1a="x"}', '{a="x" b="y"}', '{a="x\\"}'],
)
def test_parse_label_string_malformed(bad):
    with pytest.raises(ValueError):
        parse_label_string(bad)


def test_loki_log_records_semantics(spark):
    rows = [
        ('{app="web", __internal="drop", level="INFO"}', 1704067200_000000000, "hello"),
        ('{app="web", __internal="drop", level="INFO"}', 0, "no-ts"),
        ("{not-valid", 1704067201_000000000, "skipped"),
    ]
    df = spark.createDataFrame(rows, "labels string, ts_ns long, line string")
    got = {r.body: r for r in loki_log_records(df).collect()}
    # malformed stream skipped entirely (loki_to_otlp.go:38-42)
    assert set(got) == {"hello", "no-ts"}
    assert got["hello"].attributes == {"app": "web", "level": "INFO"}
    assert got["hello"].time_unix_nano == 1704067200_000000000
    assert got["no-ts"].time_unix_nano == 0  # zero entry ts → no stamp
    assert got["hello"].resource == {}
    # keep_timestamp off: every record unstamped (observed-time pinned out)
    off = loki_log_records(df, keep_timestamp=False).collect()
    assert {r.time_unix_nano for r in off} == {0}


def test_loki_exporter_receiver_roundtrip(spark):
    """loki_entries (format raw) → loki_log_records: body and the label
    set survive; ts_ns is the record timestamp."""
    from opentelemetry_collector_contrib_spark.operators.loki_exporter import (
        loki_entries,
    )

    flat = spark.createDataFrame(
        [
            (
                1704067200_000000000,
                9,
                "Info",
                f"msg-{i}",
                {"k": str(i), "loki.format": "raw"},
                {"service.name": "svc1"},
                "scope",
                "",
                "",
            )
            for i in range(4)
        ],
        "time_unix_nano long, severity_number int, severity_text string,"
        " body string, attributes map<string,string>,"
        " resource map<string,string>, scope_name string,"
        " trace_id string, span_id string",
    )
    entries = loki_entries(flat)
    back = loki_log_records(entries).collect()
    assert {r.body for r in back} == {f"msg-{i}" for i in range(4)}
    r = back[0]
    assert r.attributes["exporter"] == "OTLP"
    assert r.attributes["job"] == "svc1"
    assert r.attributes["level"] == "INFO"  # severity 9 → INFO band start
    assert r.time_unix_nano == 1704067200_000000000


# -------------------------------------------------------------- splunk hec


def test_parse_hec_events_stream():
    body = '{"event":"a","host":"h"} {"event":"b"}\n{"event":"c"}'
    evs = parse_hec_events(body)
    assert [e["event"] for e in evs] == ["a", "b", "c"]
    with pytest.raises(ValueError):
        parse_hec_events('["not","an","object"]')
    with pytest.raises(json.JSONDecodeError):
        parse_hec_events('{"event":')


def test_hec_log_records_event_endpoint(spark):
    events = [
        {
            "time": 1704067200.0,
            "host": "h1",
            "source": "app",
            "sourcetype": "st",
            "index": "main",
            "event": "hello",
            "fields": {"k": "v", "n": 7, "arr": [1, 2], "deep": {"a": True}},
        },
        # string time, empty metadata, object body
        {"time": "1704067201.5", "event": {"msg": "obj"}},
    ]
    df = spark.createDataFrame(
        [(json.dumps(e),) for e in events], "value string"
    )
    got = sorted(hec_log_records(df).collect(), key=lambda r: r.time_unix_nano)
    a, b = got
    assert a.body == "hello"
    assert a.resource == {
        "host.name": "h1",
        "com.splunk.source": "app",
        "com.splunk.sourcetype": "st",
        "com.splunk.index": "main",
    }
    # fields → attributes; non-strings render to Go JSON bytes
    assert a.attributes == {
        "k": "v",
        "n": "7",
        "arr": "[1,2]",
        "deep": '{"a":true}',
    }
    assert a.time_unix_nano == 1704067200_000000000
    # string time parses as float64 (common.go:94-107)
    assert b.time_unix_nano == int(1704067201.5 * 1e9)
    assert b.resource == {}  # empty metadata never becomes attributes
    assert b.body == '{"msg":"obj"}'


def test_hec_event_strictness_and_time_types():
    from opentelemetry_collector_contrib_spark.sources.splunk_receiver import (
        _event_time_ns,
        _event_to_record,
    )

    # non-string metadata fails the typed unmarshal (400 path)
    with pytest.raises(ValueError):
        _event_to_record({"host": 5, "event": "x"})
    # time: float64 / numeric string parse; other JSON types → 0 (the
    # Go switch has no default case)
    assert _event_time_ns(1.5) == 1_500_000_000
    assert _event_time_ns("2") == 2_000_000_000
    assert _event_time_ns(True) == 0
    assert _event_time_ns([1]) == 0
    assert _event_time_ns(None) == 0


def test_hec_raw_endpoint_splitting(spark):
    df = spark.createDataFrame([("line1\nline2\nline3",)], "value string")
    lines = hec_raw_log_records(
        df, host="h", sourcetype="st", timestamp_ns=123
    ).collect()
    assert [r.body for r in sorted(lines, key=lambda r: r.body)] == [
        "line1",
        "line2",
        "line3",
    ]
    assert all(r.time_unix_nano == 123 for r in lines)
    assert all(
        r.resource == {"host.name": "h", "com.splunk.sourcetype": "st"}
        for r in lines
    )
    whole = hec_raw_log_records(df, splitting="none").collect()
    assert len(whole) == 1 and whole[0].body == "line1\nline2\nline3"
    with pytest.raises(ValueError):
        hec_raw_log_records(df, splitting="word")


def test_hec_exporter_receiver_roundtrip(spark):
    """hec_events (exporter) → hec_log_records (receiver): body, time
    (ms-rounded), metadata, and the lifted severity/trace fields survive
    as attributes."""
    from opentelemetry_collector_contrib_spark.operators.splunk_exporter import (
        hec_events,
    )

    flat = spark.createDataFrame(
        [
            (
                1704067200_123000000,
                17,
                "Error",
                "boom",
                {"k": "1"},
                {"host.name": "h9", "com.splunk.index": "main"},
                "scope",
                "0102030405060708090a0b0c0d0e0f10",
                "0102030405060708",
            )
        ],
        "time_unix_nano long, severity_number int, severity_text string,"
        " body string, attributes map<string,string>,"
        " resource map<string,string>, scope_name string,"
        " trace_id string, span_id string",
    )
    msgs = hec_events(flat)
    back = hec_log_records(msgs).collect()
    assert len(back) == 1
    r = back[0]
    assert r.body == "boom"
    assert r.resource == {"host.name": "h9", "com.splunk.index": "main"}
    assert r.attributes["k"] == "1"
    assert r.attributes["otel.log.severity.text"] == "Error"
    assert r.attributes["otel.log.severity.number"] == "17"
    assert r.attributes["trace_id"] == "0102030405060708090a0b0c0d0e0f10"
    assert r.attributes["span_id"] == "0102030405060708"
    # exporter rounds ns→ms, receiver multiplies seconds back:
    # 1704067200.123 s — float64 path, Go-truncation parity
    assert r.time_unix_nano == int(1704067200.123 * 1e9)
