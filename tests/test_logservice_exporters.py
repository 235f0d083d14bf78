"""alibabacloudlogserviceexporter (log path).

Reference semantics under test:
`exporter/alibabacloudlogserviceexporter/logsdata_to_logservice.go`
(content key set + order, host/service extraction, Go-JSON leftover
resource + attribute maps, hex flags, empty-body skip, ns→s Time)."""

from opentelemetry_collector_contrib_spark.operators.alibaba_logservice_exporter import (
    sls_log_rows,
)

TS = 1704067200_000000000


def test_sls_rows(spark):
    df = spark.createDataFrame(
        [
            (
                TS + 5, "hello", 9, "Info", 5,
                {"z": "1", "a": "2"},
                {"host.name": "h1", "service.name": "svc", "team": "<core>"},
                "lib", "1.0", "ab" * 16, "cd" * 8,
            ),
            # zero ts → now_sec; absent host/service → ""
            (0, "b2", 0, "", 0, None, None, "", "", "", ""),
            # None body → skipped
            (TS, None, 0, "", 0, None, None, "", "", "", ""),
        ],
        "time_unix_nano long, body string, severity_number int, "
        "severity_text string, flags int, attributes map<string,string>, "
        "resource map<string,string>, scope_name string, "
        "scope_version string, trace_id string, span_id string",
    )
    rows = sls_log_rows(df, now_sec=1704000000).orderBy("content").collect()
    assert len(rows) == 2
    r = {x["content"]: x for x in rows}["hello"]
    assert r["host"] == "h1" and r["service"] == "svc"
    # leftover resource attrs: sorted keys, HTML-escaped Go JSON
    assert r["resource_json"] == '{"team":"\\u003ccore\\u003e"}'
    assert r["attribute_json"] == '{"a":"2","z":"1"}'
    assert r["otlp_name"] == "lib" and r["otlp_version"] == "1.0"
    assert r["time_unix_nano"] == str(TS + 5)
    assert r["severity_number"] == "9" and r["severity_text"] == "Info"
    assert r["flags_hex"] == "5"
    assert r["trace_id"] == "ab" * 16 and r["span_id"] == "cd" * 8
    assert r["time_sec"] == TS // 10**9

    z = {x["content"]: x for x in rows}["b2"]
    assert z["host"] == "" and z["service"] == ""
    assert z["resource_json"] == "{}" and z["attribute_json"] == "{}"
    assert z["time_unix_nano"] == "0" and z["flags_hex"] == "0"
    assert z["time_sec"] == 1704000000
