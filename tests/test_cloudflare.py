"""cloudflare receiver.

Reference semantics under test: `receiver/cloudflarereceiver/logs.go`
(NDJSON parse, zone grouping, timestamp_field RFC3339 parse with
warn-skip, EdgeResponseStatus severity bands, typed attribute mapping,
whole-object body)."""

import json

import pytest

from opentelemetry_collector_contrib_spark.sources.cloudflare_receiver import (
    cloudflare_log_records,
    parse_cloudflare_payload,
)


def _log(**kw):
    base = {
        "ZoneName": "example.com",
        "EdgeStartTimestamp": "2024-01-01T00:00:00Z",
        "EdgeResponseStatus": 200,
        "ClientIP": "10.0.0.9",
    }
    base.update(kw)
    return base


def test_parse_payload_and_grouping():
    payload = "\n".join(
        [
            json.dumps(_log()),
            "",  # empty lines skipped
            json.dumps(_log(ZoneName="other.com")),
            json.dumps({k: v for k, v in _log().items() if k != "ZoneName"}),
        ]
    )
    recs = parse_cloudflare_payload(payload)
    assert len(recs) == 3
    zones = [r["resource"] for r in recs]
    assert {"cloudflare.zone": "example.com"} in zones
    assert {"cloudflare.zone": "other.com"} in zones
    assert {} in zones  # missing zone → empty resource
    assert all(r["scope_name"] == "otelcol/cloudflare" for r in recs)


@pytest.mark.parametrize(
    "status,num,text",
    [
        (200, 9, "Info"), (302, 10, "Info2"), (404, 13, "Warn"),
        (503, 17, "Error"), (700, 0, ""), ("404", 13, "Warn"),
        (201.0, 9, "Info"), ("bogus", 0, ""),
    ],
)
def test_severity_bands(status, num, text):
    (r,) = parse_cloudflare_payload(
        json.dumps(_log(EdgeResponseStatus=status))
    )
    assert (r["severity_number"], r["severity_text"]) == (num, text)


def test_timestamp_parse_and_warn_skip():
    ok = parse_cloudflare_payload(
        json.dumps(_log(EdgeStartTimestamp="2024-01-01T01:00:00.25+01:00"))
    )[0]
    assert ok["time_unix_nano"] == 1704067200 * 10**9 + 250_000_000
    bad = parse_cloudflare_payload(
        json.dumps(_log(EdgeStartTimestamp="01 Jan 2024"))
    )[0]
    assert bad["time_unix_nano"] == 0
    nonstr = parse_cloudflare_payload(
        json.dumps(_log(EdgeStartTimestamp=1704067200))
    )[0]
    assert nonstr["time_unix_nano"] == 0  # non-string warns, no stamp
    # custom timestamp field
    custom = parse_cloudflare_payload(
        json.dumps(_log(MyTs="2024-01-01T00:00:09Z")),
        timestamp_field="MyTs",
    )[0]
    assert custom["time_unix_nano"] == 1704067209 * 10**9


def test_attribute_mapping_typed_and_skipped():
    (r,) = parse_cloudflare_payload(
        json.dumps(
            _log(
                BoolField=True,
                FloatField=1.5,
                ObjField={"nested": 1},
            )
        ),
        attributes={
            "ClientIP": "http.client_ip",
            "EdgeResponseStatus": "http.status",
            "BoolField": "b",
            "FloatField": "f",
            "ObjField": "o",
            "Missing": "m",
        },
    )
    a = r["attributes"]
    assert a["http.client_ip"] == "10.0.0.9"
    assert a["http.status"] == "200"
    assert a["b"] == "true" and a["f"] == "1.5"
    assert "o" not in a and "m" not in a  # unsupported type / missing


def test_body_is_whole_object():
    (r,) = parse_cloudflare_payload(json.dumps(_log()))
    body = json.loads(r["body"])
    assert body["ClientIP"] == "10.0.0.9"
    assert body["EdgeResponseStatus"] == 200


def test_malformed_line_raises():
    with pytest.raises(json.JSONDecodeError):
        parse_cloudflare_payload('{"ok": 1}\n{broken')
    with pytest.raises(ValueError):
        parse_cloudflare_payload("[1,2]")


def test_cloudflare_log_records_spark(spark):
    df = spark.createDataFrame(
        [(json.dumps(_log()) + "\n" + json.dumps(_log(ZoneName="z2")),)],
        "value string",
    )
    got = cloudflare_log_records(
        df, attributes={"ClientIP": "ip"}
    ).collect()
    assert len(got) == 2
    assert {r.resource.get("cloudflare.zone") for r in got} == {
        "example.com", "z2",
    }
    assert all(r.attributes["ip"] == "10.0.0.9" for r in got)
