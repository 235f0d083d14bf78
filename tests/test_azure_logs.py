"""Azure resource-logs translator.

Reference semantics under test:
`pkg/translator/azure/resourcelogs_to_logs.go` (resource grouping,
time/timeStamp fallback + skip, Level severity mapping, attribute
extraction incl. durationMs int parse and identity/properties raw
values)."""

import json

import pytest

from opentelemetry_collector_contrib_spark.sources.azure_logs import (
    azure_log_records,
    iso8601_to_ns,
    parse_azure_body,
)


def test_iso8601_to_ns_precision_and_offsets():
    # Azure's 7-digit (100 ns) ticks survive beyond datetime precision
    assert iso8601_to_ns("2022-11-11T04:48:27.6767145Z") == (
        1668142107 * 10**9 + 676714500
    )
    assert iso8601_to_ns("2024-01-01T00:00:00Z") == 1704067200 * 10**9
    assert iso8601_to_ns("2024-01-01T01:00:00+01:00") == 1704067200 * 10**9
    with pytest.raises(ValueError):
        iso8601_to_ns("not-a-time")


def _record(**kw):
    base = {
        "time": "2024-01-01T00:00:00.1234567Z",
        "resourceId": "/SUB/1/RG/A",
        "operationName": "SecretGet",
        "category": "AuditEvent",
        "Level": 4,
    }
    base.update(kw)
    return base


def test_parse_azure_body_full_attrs():
    recs = parse_azure_body(
        json.dumps(
            {
                "records": [
                    _record(
                        durationMs="21",
                        callerIpAddress="10.0.0.1",
                        correlationId="c-1",
                        location="eastus",
                        identity={"claim": {"upn": "x@y"}},
                        properties={"k": 1},
                        resultType="Success",
                        tenantId="t-1",
                    )
                ]
            }
        )
    )
    (r,) = recs
    assert r["time_unix_nano"] == 1704067200 * 10**9 + 123456700
    assert r["severity_number"] == 4 and r["severity_text"] == "4"
    assert r["resource"] == {"azure.resource.id": "/SUB/1/RG/A"}
    assert r["scope_name"] == "otelcol/azureresourcelogs"
    a = r["attributes"]
    assert a["azure.category"] == "AuditEvent"
    assert a["azure.operation.name"] == "SecretGet"
    assert a["azure.duration"] == "21"
    assert a["azure.identity"] == '{"claim":{"upn":"x@y"}}'
    assert a["azure.properties"] == '{"k":1}'
    assert a["azure.result.type"] == "Success"
    assert a["azure.tenant.id"] == "t-1"
    assert a["cloud.region"] == "eastus"
    assert a["cloud.provider"] == "azure"
    assert a["net.sock.peer.addr"] == "10.0.0.1"


def test_named_severities_and_timestamp_fallback_and_skip():
    body = json.dumps(
        {
            "records": [
                _record(Level="Informational"),
                _record(Level="Warning"),
                _record(Level="Error"),
                _record(Level="Critical"),
                {**_record(), "time": "", "timeStamp": "2024-01-01T00:00:09Z"},
                {**_record(), "time": "garbage"},   # skipped
                {k: v for k, v in _record().items() if k != "time"},  # missing → skipped
            ]
        }
    )
    recs = parse_azure_body(body)
    sev = [(r["severity_number"], r["severity_text"]) for r in recs[:4]]
    assert sev == [
        (9, "Informational"), (13, "Warning"), (17, "Error"), (21, "Critical")
    ]
    assert len(recs) == 5  # two skipped
    assert recs[4]["time_unix_nano"] == 1704067209 * 10**9


def test_resource_grouping_first_seen_order():
    body = json.dumps(
        {
            "records": [
                _record(resourceId="/B"),
                _record(resourceId="/A"),
                _record(resourceId="/B"),
            ]
        }
    )
    recs = parse_azure_body(body)
    assert [r["resource"]["azure.resource.id"] for r in recs] == [
        "/B", "/B", "/A",
    ]


def test_duration_unparseable_is_omitted():
    (r,) = parse_azure_body(
        json.dumps({"records": [_record(durationMs="fast")]})
    )
    assert "azure.duration" not in r["attributes"]


def test_azure_log_records_spark(spark):
    df = spark.createDataFrame(
        [(json.dumps({"records": [_record(), _record(resourceId="/X")]}),)],
        "value string",
    )
    got = azure_log_records(df).collect()
    assert len(got) == 2
    assert {r.resource["azure.resource.id"] for r in got} == {
        "/SUB/1/RG/A", "/X",
    }
    assert all(r.scope_name == "otelcol/azureresourcelogs" for r in got)
