"""logzioexporter (log path).

Reference semantics under test: `exporter/logzioexporter/jsonlog.go`
(field set, milli timestamp skip-zero, body str/map handling) and
`exporter.go:153-180` (mergeMapEntries collision arrays)."""

import json

from opentelemetry_collector_contrib_spark.operators.logzio_exporter import (
    logzio_json_log,
    logzio_lines,
    merge_map_entries,
)

TS = 1704067200_000000000


def test_merge_collision_arrays():
    assert merge_map_entries({"a": "1"}, {"b": "2"}) == {"a": "1", "b": "2"}
    assert merge_map_entries({"a": "1"}, {"a": "2"}) == {"a": ["1", "2"]}
    assert merge_map_entries({"a": ["1", "2"]}, {"a": "3"}) \
        == {"a": ["1", "2", "3"]}


def test_json_log_fields_and_sorting():
    line = logzio_json_log(
        {
            "time_unix_nano": TS,
            "body": "hello",
            "severity_text": "Warn",
            "trace_id": "ab" * 16,
            "span_id": "cd" * 8,
            "resource": {"env": "prod"},
            "scope_attributes": {"env": "scoped"},
            "scope_name": "lib",
        }
    )
    assert line == (
        '{"@timestamp":1704067200000,"env":["prod","scoped"],'
        '"level":"Warn","message":"hello","scopeName":"lib",'
        '"spanID":"' + "cd" * 8 + '","traceID":"' + "ab" * 16 + '"}'
    )
    # sub-millisecond timestamp vanishes; empty severity omitted;
    # scopeName always present
    assert logzio_json_log({"time_unix_nano": 500_000, "body": ""}) == \
        '{"message":"","scopeName":""}'
    # map body merges fields at top level
    d = json.loads(logzio_json_log({"body": {"x": 1, "message": "m"}}))
    assert d["x"] == 1 and d["message"] == "m" and "spanID" not in d


def test_logzio_lines_spark(spark):
    df = spark.createDataFrame(
        [(TS, "m1", "Info", {"team": "core"}, "s1")],
        "time_unix_nano long, body string, severity_text string, "
        "resource map<string,string>, scope_name string",
    )
    lines = logzio_lines(df).collect()
    d = json.loads(lines[0]["line"])
    assert d["message"] == "m1" and d["team"] == "core"
    assert d["scopeName"] == "s1" and d["@timestamp"] == TS // 10**6
