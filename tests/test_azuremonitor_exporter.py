"""azuremonitorexporter (log path).

Reference semantics under test: `exporter/azuremonitorexporter/
log_to_envelope.go` (severity buckets, ts fallback chain, envelope
shape) and `contracts_utils.go` (cloud tags, Str()-typed resource
properties, scope property keys)."""

from opentelemetry_collector_contrib_spark.operators.azuremonitor_exporter import (
    azuremonitor_envelopes,
    log_record_to_envelope,
)

TS = 1704067200_000000000


def test_envelope_shape_and_tags():
    env = log_record_to_envelope(
        {
            "time_unix_nano": TS + 5,
            "severity_number": 17,
            "body": "boom",
            "trace_id": "ab" * 16,
            "span_id": "cd" * 8,
            "resource": {
                "service.name": "svc", "service.namespace": "ns",
                "service.instance.id": "i-1", "team": "core",
            },
            "attributes": {"k": "v"},
            "scope_name": "lib", "scope_version": "1.0",
        },
        sdk_version="otelcol-x",
    )
    assert env["time"] == "2024-01-01T00:00:00.000000005Z"
    assert env["name"] == "Microsoft.ApplicationInsights.Message"
    assert env["base_type"] == "MessageData"
    assert env["severity_level"] == 3 and env["message"] == "boom"
    assert env["tags"] == {
        "ai.operation.id": "ab" * 16,
        "ai.operation.parentId": "cd" * 8,
        "ai.cloud.role": "ns.svc",
        "ai.cloud.roleInstance": "i-1",
        "ai.internal.sdkVersion": "otelcol-x",
    }
    assert env["properties"] == {
        "service.name": "svc", "service.namespace": "ns",
        "service.instance.id": "i-1", "team": "core",
        "instrumentationlibrary.name": "lib",
        "instrumentationlibrary.version": "1.0",
        "k": "v",
    }


def test_severity_buckets_and_ts_chain():
    levels = {1: 0, 8: 0, 9: 1, 12: 1, 13: 2, 16: 2, 17: 3, 20: 3,
              21: 4, 24: 4, 0: 1, 99: 1}
    for sn, lvl in levels.items():
        assert log_record_to_envelope(
            {"severity_number": sn}
        )["severity_level"] == lvl
    # ts → observed → now; operation ids always present (empty)
    env = log_record_to_envelope(
        {"observed_time_unix_nano": TS}, now_ns=1
    )
    assert env["time"] == "2024-01-01T00:00:00Z"
    env2 = log_record_to_envelope({}, now_ns=TS + 10**9)
    assert env2["time"] == "2024-01-01T00:00:01Z"
    assert env2["tags"]["ai.operation.id"] == ""
    assert "ai.cloud.role" not in env2["tags"]


def test_truncation_limits():
    env = log_record_to_envelope(
        {"body": "x" * 40000, "attributes": {"k" * 200: "v" * 9000},
         "trace_id": "f" * 200},
    )
    assert len(env["message"]) == 32768
    assert set(len(k) for k in env["properties"]) == {150}
    assert set(len(v) for v in env["properties"].values()) == {8192}
    assert len(env["tags"]["ai.operation.id"]) == 128


def test_spark_envelopes(spark):
    df = spark.createDataFrame(
        [(TS, "m", 9, {"service.name": "s"}, None)],
        "time_unix_nano long, body string, severity_number int, "
        "resource map<string,string>, attributes map<string,string>",
    )
    rows = azuremonitor_envelopes(df, sdk_version="v").collect()
    assert rows[0]["severity_level"] == 1
    assert rows[0]["tags"]["ai.cloud.role"] == "s"
    assert rows[0]["properties"]["service.name"] == "s"
