"""skywalkingexporter (log path).

Reference semantics under test: `exporter/skywalkingexporter/
logrecord_to_logdata.go` — service defaults, ordered tag list,
empty-body short-circuit, hex flags, trace/span placement."""

import json

from opentelemetry_collector_contrib_spark.operators.skywalking_exporter import (
    skywalking_log_data,
    skywalking_log_rows,
)

TS = 1704067200_000000000


def test_log_data_full():
    d = skywalking_log_data(
        {
            "time_unix_nano": TS,
            "body": "hello",
            "severity_number": 9,
            "severity_text": "Info",
            "flags": 5,
            "trace_id": "ab" * 16,
            "span_id": "cd" * 8,
            "resource": {"service.name": "svc",
                         "service.instance.id": "i-1", "team": "core"},
            "attributes": {"k": "v"},
            "scope_name": "lib", "scope_version": "1.0",
        }
    )
    assert d["service"] == "svc" and d["service_instance"] == "i-1"
    assert d["timestamp_ms"] == TS // 10**6
    assert d["body"] == "hello" and d["body_type"] == "body-type"
    assert d["trace_id"] == "ab" * 16
    tags = json.loads(d["tags_json"])
    assert [(t["key"], t["value"]) for t in tags] == [
        ("service.name", "svc"), ("service.instance.id", "i-1"),
        ("team", "core"), ("otlp.name", "lib"), ("otlp.version", "1.0"),
        ("severityNumber", "9"), ("severityText", "Info"), ("k", "v"),
        ("flags", "5"), ("spanID", "cd" * 8),
    ]


def test_defaults_and_empty_body_short_circuit():
    # no service.name → default; empty body → resource tags only
    d = skywalking_log_data(
        {"time_unix_nano": TS, "severity_number": 9,
         "resource": {"team": "x"}, "attributes": {"k": "v"}},
    )
    assert d["service"] == "otel-collector"
    assert d["body"] is None and d["body_type"] is None
    assert d["timestamp_ms"] == 0  # record half skipped
    assert json.loads(d["tags_json"]) == [{"key": "team", "value": "x"}]

    # zero severity still appends "0"; zero flags appends "0"
    d2 = skywalking_log_data({"body": "b"})
    tags = [(t["key"], t["value"]) for t in json.loads(d2["tags_json"])]
    assert ("severityNumber", "0") in tags and ("flags", "0") in tags
    assert d2["trace_id"] is None


def test_spark_rows(spark):
    df = spark.createDataFrame(
        [(TS, "m", 9, {"service.name": "s"}, {"a": "1"})],
        "time_unix_nano long, body string, severity_number int, "
        "resource map<string,string>, attributes map<string,string>",
    )
    rows = skywalking_log_rows(df).collect()
    assert rows[0]["service"] == "s"
    assert '"key":"a"' in rows[0]["tags_json"]
