"""Google Cloud Logging LogEntry translation.

Reference semantics under test: `receiver/googlecloudpubsubreceiver/
internal/log_entry.go` (special-field unpacking, LogSeverity table,
trace/span hex decoding, snake_cased resource labels and leftovers)."""

import json

import pytest

from opentelemetry_collector_contrib_spark.sources.gcp_logs import (
    gcp_log_records,
    parse_log_entry,
    to_snake,
)


def test_to_snake():
    assert to_snake("insertId") == "insert_id"
    assert to_snake("requestMethod") == "request_method"
    assert to_snake("gcp.projectId") == "gcp.project_id"
    assert to_snake("cacheFillBytes") == "cache_fill_bytes"
    assert to_snake("HTTPRequest") == "http_request"


def _entry(**kw):
    base = {
        "insertId": "uid-1",
        "timestamp": "2024-01-01T00:00:00.123456789Z",
        "receiveTimestamp": "2024-01-01T00:00:01Z",
        "logName": "projects/p/logs/syslog",
        "severity": "ERROR",
        "textPayload": "boom",
        "resource": {
            "type": "gce_instance",
            "labels": {"projectId": "p1", "instanceId": "i-9"},
        },
        "trace": "projects/p/traces/4ebc71f1def9274798cac4e8960d0095",
        "spanId": "0102030405060708",
        "labels": {"env": "prod"},
    }
    base.update(kw)
    return base


def test_parse_log_entry_full():
    r = parse_log_entry(json.dumps(_entry()))
    assert r["time_unix_nano"] == 1704067200 * 10**9 + 123456789
    assert r["observed_time_unix_nano"] == 1704067201 * 10**9
    assert r["severity_number"] == 17 and r["severity_text"] == "ERROR"
    assert r["body"] == "boom"
    assert r["trace_id"] == "4ebc71f1def9274798cac4e8960d0095"
    assert r["span_id"] == "0102030405060708"
    assert r["attributes"]["log.record.uid"] == "uid-1"
    assert r["attributes"]["gcp.log_name"] == "projects/p/logs/syslog"
    assert r["attributes"]["env"] == "prod"
    assert r["resource"] == {
        "gcp.resource_type": "gce_instance",
        "gcp.project_id": "p1",
        "gcp.instance_id": "i-9",
    }


@pytest.mark.parametrize(
    "sev,num",
    [
        ("DEBUG", 5), ("INFO", 9), ("NOTICE", 10), ("WARNING", 13),
        ("ERROR", 17), ("CRITICAL", 21), ("ALERT", 22), ("EMERGENCY", 24),
        ("DEFAULT", 0), ("bogus", 0),
    ],
)
def test_severity_table(sev, num):
    r = parse_log_entry(json.dumps(_entry(severity=sev)))
    assert r["severity_number"] == num and r["severity_text"] == sev


def test_invalid_trace_and_span():
    r = parse_log_entry(
        json.dumps(_entry(trace="no-slashes", spanId="xyz"))
    )
    assert r["trace_id"] == "" and r["span_id"] == ""
    short = parse_log_entry(
        json.dumps(_entry(trace="projects/p/traces/abcd"))
    )
    assert short["trace_id"] == ""


def test_json_payload_and_http_request_and_leftovers():
    r = parse_log_entry(
        json.dumps(
            _entry(
                jsonPayload={"msg": "hello", "n": 7},
                httpRequest={
                    "requestMethod": "GET",
                    "status": 200,
                    "cacheFillBytes": "123",
                },
                sourceLocation={"file": "a.go"},
            )
        )
    )
    assert json.loads(r["body"]) == {"msg": "hello", "n": 7}
    hr = json.loads(r["attributes"]["gcp.http_request"])
    assert hr == {"request_method": "GET", "status": 200,
                  "cache_fill_bytes": "123"}
    assert r["attributes"]["gcp.source_location"] == '{"file":"a.go"}'


def test_wrong_typed_special_field_raises():
    with pytest.raises(ValueError):
        parse_log_entry(json.dumps(_entry(insertId=7)))
    with pytest.raises(ValueError):
        parse_log_entry(json.dumps(_entry(timestamp="garbage")))
    with pytest.raises(ValueError):
        parse_log_entry("[1]")


def test_gcp_log_records_spark(spark):
    df = spark.createDataFrame(
        [(json.dumps(_entry()),), (json.dumps(_entry(severity="INFO")),)],
        "value string",
    )
    got = gcp_log_records(df).collect()
    assert sorted(r.severity_number for r in got) == [9, 17]
    assert all(
        r.resource["gcp.resource_type"] == "gce_instance" for r in got
    )
