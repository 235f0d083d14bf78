"""splunkhecexporter parity tests — goldens hand-built from
`exporter/splunkhecexporter/logdata_to_splunk.go` and
`internal/splunk/common.go` semantics.
"""

import json

from opentelemetry_collector_contrib_spark.operators.splunk_exporter import (
    hec_events,
    map_record_to_hec_event,
    marshal_hec_event,
)

NS = 1_000_000_000


def rec(**kw):
    base = dict(
        time_unix_nano=1704067205 * NS,
        severity_number=9,
        severity_text="Info",
        body="hello",
        attributes={},
        resource={},
        trace_id="",
        span_id="",
    )
    base.update(kw)
    return base


def test_metadata_lift_and_defaults():
    ev = map_record_to_hec_event(
        rec(resource={"host.name": "h1", "com.splunk.source": "s1",
                      "extra": "r"},
            attributes={"com.splunk.index": "idx1", "k": "v",
                        "com.splunk.hec.access_token": "secret"})
    )
    assert ev["host"] == "h1" and ev["source"] == "s1"
    assert ev["index"] == "idx1"
    # token consumed, never serialized; lifted keys not in fields
    assert "com.splunk.hec.access_token" not in ev["fields"]
    assert ev["fields"]["extra"] == "r" and ev["fields"]["k"] == "v"
    # record attrs override resource lift
    ev2 = map_record_to_hec_event(
        rec(resource={"host.name": "rhost"},
            attributes={"host.name": "ahost"})
    )
    assert ev2["host"] == "ahost"
    # no host anywhere → "unknown" (metricdata_to_splunk.go:22)
    assert map_record_to_hec_event(rec())["host"] == "unknown"


def test_severity_ids_and_flatten():
    ev = map_record_to_hec_event(
        rec(trace_id="a" * 32, span_id="b" * 16,
            attributes={"nested": {"x": {"y": 1}}, "flat": [1, 2],
                        "deep": [[1], 2]})
    )
    f = ev["fields"]
    assert f["trace_id"] == "a" * 32 and f["span_id"] == "b" * 16
    assert f["otel.log.severity.text"] == "Info"
    assert f["otel.log.severity.number"] == 9
    assert f["nested.x.y"] == 1          # dotted flatten
    assert f["flat"] == [1, 2]           # flat array stays an array
    assert f["deep"] == "[[1],2]"        # nested array JSON-stringified
    # empty severity / zero ids omitted
    f0 = map_record_to_hec_event(
        rec(severity_text="", severity_number=0, trace_id="0" * 32)
    )["fields"]
    assert f0 == {}


def test_marshal_field_order_and_omitempty():
    ev = map_record_to_hec_event(
        rec(body="a<b", attributes={"k": "v"}),
        source="src", index="main",
    )
    out = marshal_hec_event(ev).decode()
    assert out == (
        '{"time":1704067205,"host":"unknown","source":"src","index":"main"'
        ',"event":"a\\u003cb"'
        ',"fields":{"k":"v"'
        ',"otel.log.severity.number":9,"otel.log.severity.text":"Info"}}'
    )
    # time 0 + empty source/sourcetype/index/fields dropped; host+event stay
    ev0 = map_record_to_hec_event(
        rec(time_unix_nano=0, severity_text="", severity_number=0, body=None)
    )
    assert marshal_hec_event(ev0) == b'{"host":"unknown","event":""}'


def test_time_rounds_to_milliseconds():
    ev = map_record_to_hec_event(rec(time_unix_nano=5 * NS + 1_499_999))
    assert ev["time"] == 5.001
    assert b'"time":5.001,' in marshal_hec_event(ev)
    ev2 = map_record_to_hec_event(rec(time_unix_nano=5 * NS + 500_000))
    assert ev2["time"] == 5.001  # Go rounds half away from zero


def test_hec_events_spark(spark):
    df = spark.createDataFrame(
        [(5 * NS, 9, "Info", "b1", {"k": "1"},
          {"host.name": "h", "com.splunk.index": "main"}, "", "")],
        "time_unix_nano long, severity_number int, severity_text string,"
        "body string, attributes map<string,string>,"
        "resource map<string,string>, trace_id string, span_id string",
    )
    row = hec_events(df).collect()[0]
    assert row["index"] == "main" and row["host"] == "h"
    d = json.loads(row["value"])
    assert d["event"] == "b1" and d["fields"]["k"] == "1"
    assert "index" in d and d["index"] == "main"
