"""azuredataexplorerexporter (log path).

Reference semantics under test:
`exporter/azuredataexplorerexporter/logsdata_to_adx.go:16-46` —
RFC3339Nano timestamps, scope overlay onto cloned log attributes."""

from opentelemetry_collector_contrib_spark.operators.adx_exporter import (
    adx_log_rows,
)

TS = 1704067200_000000000


def test_adx_rows(spark):
    df = spark.createDataFrame(
        [
            (TS + 5, TS, "ab" * 16, "cd" * 8, "Info", 9, "b1",
             {"team": "core"}, {"k": "v", "scope.name": "overridden"},
             "lib", "1.0"),
            (0, 0, None, None, None, None, None, None, None, None, None),
        ],
        "time_unix_nano long, observed_time_unix_nano long, "
        "trace_id string, span_id string, severity_text string, "
        "severity_number int, body string, resource map<string,string>, "
        "attributes map<string,string>, scope_name string, "
        "scope_version string",
    )
    rows = {r["Body"]: r for r in adx_log_rows(df).collect()}
    r = rows["b1"]
    assert r["Timestamp"] == "2024-01-01T00:00:00.000000005Z"
    assert r["ObservedTimestamp"] == "2024-01-01T00:00:00Z"
    assert r["TraceID"] == "ab" * 16 and r["SpanID"] == "cd" * 8
    assert r["ResourceAttributes"] == {"team": "core"}
    # scope entries overlay the cloned record attributes (last wins)
    assert r["LogsAttributes"] == {
        "k": "v", "scope.name": "lib", "scope.version": "1.0",
    }
    z = rows[""]
    assert z["Timestamp"] == "1970-01-01T00:00:00Z"
    assert z["SeverityNumber"] == 0 and z["LogsAttributes"] == {}
