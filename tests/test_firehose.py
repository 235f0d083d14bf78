"""awsfirehosereceiver (cwmetrics record type).

Reference semantics under test: `receiver/awsfirehosereceiver/
receiver.go` (request framing, base64 records, common-attributes
header, response codes) and `internal/unmarshaler/cwmetricstream/`
(newline-split datums, isValid skip, resource/metric grouping,
(timestamp, fmt.Sprint(dims)) dedup, summary datapoint fields)."""

import base64
import json

from opentelemetry_collector_contrib_spark.sources.firehose_receiver import (
    firehose_cwmetrics,
    firehose_responses,
    go_map_print,
    parse_firehose_request,
    unmarshal_cwmetrics,
)


def _datum(**over):
    d = {
        "metric_stream_name": "s1",
        "account_id": "123",
        "region": "us-east-1",
        "namespace": "AWS/EC2",
        "metric_name": "CPUUtilization",
        "dimensions": {"InstanceId": "i-1", "az": "a"},
        "timestamp": 1704067200000,
        "value": {"max": 9.0, "min": 1.0, "sum": 10.0, "count": 2.9},
        "unit": "Percent",
    }
    d.update(over)
    return d


def _record(*datums) -> bytes:
    return b"\n".join(json.dumps(d).encode() for d in datums)


def _request(rid, *records):
    return json.dumps(
        {
            "requestId": rid,
            "timestamp": 1704067200123,
            "records": [
                {"data": base64.b64encode(r).decode()} for r in records
            ],
        }
    )


# ------------------------------------------------------------- unmarshal


def test_go_map_print_sorted():
    assert go_map_print({"b": "2", "a": "1"}) == "map[a:1 b:2]"
    assert go_map_print({}) == "map[]"


def test_unmarshal_grouping_dedup_and_truncation():
    dup = _datum(value={"max": 99.0, "min": 0.0, "sum": 77.0, "count": 5.0})
    second = _datum(timestamp=1704067260000)
    other_metric = _datum(metric_name="NetworkIn", unit="Bytes")
    rows, err = unmarshal_cwmetrics(
        [_record(_datum(), dup), _record(second, other_metric)]
    )
    assert err is None
    # dup dropped: same (timestamp, sorted-dims) key for the same metric
    assert [(r["metric_name"], r["time_unix_nano"]) for r in rows] == [
        ("CPUUtilization", 1704067200000 * 10**6),
        ("CPUUtilization", 1704067260000 * 10**6),
        ("NetworkIn", 1704067200000 * 10**6),
    ]
    first = rows[0]
    assert first["count"] == 2  # uint64(2.9) truncates
    assert first["sum"] == 10.0 and first["min"] == 1.0 and first["max"] == 9.0
    assert first["resource"] == {
        "cloud.provider": "aws",
        "cloud.account.id": "123",
        "cloud.region": "us-east-1",
        "service.namespace": "AWS",
        "service.name": "EC2",
        "aws.cloudwatch.metric_stream_name": "s1",
    }


def test_unmarshal_service_split_casefold_and_custom_namespace():
    rows, _ = unmarshal_cwmetrics([_record(_datum(namespace="aws/Firehose"))])
    assert rows[0]["resource"]["service.namespace"] == "aws"
    assert rows[0]["resource"]["service.name"] == "Firehose"
    rows, _ = unmarshal_cwmetrics([_record(_datum(namespace="Custom NS"))])
    assert "service.namespace" not in rows[0]["resource"]
    assert rows[0]["resource"]["service.name"] == "Custom NS"


def test_unmarshal_skips_invalid_datums_and_errors_when_none_survive():
    rows, err = unmarshal_cwmetrics(
        [
            _record(
                _datum(unit=""),                 # isValid: empty unit
                {"not": "a metric"},             # isValid: empty names
                _datum(timestamp=1.5),           # int64 field, fractional
                _datum(dimensions={"k": 1}),     # map[string]string mismatch
                _datum(metric_name="Good"),
            ),
            b"not json\n\n",                     # malformed + empty lines
        ]
    )
    assert err is None and [r["metric_name"] for r in rows] == ["Good"]

    rows, err = unmarshal_cwmetrics([b"junk", _record(_datum(unit=""))])
    assert rows == [] and err == "record format invalid"


def test_unmarshal_common_attributes_put_if_absent():
    rows, _ = unmarshal_cwmetrics(
        [_record(_datum())],
        common={"env": "prod", "cloud.region": "OVERRIDE"},
    )
    res = rows[0]["resource"]
    assert res["env"] == "prod"
    assert res["cloud.region"] == "us-east-1"  # never overwritten


# -------------------------------------------------------------- framing


def test_framing_rejections():
    body = _request("r1", _record(_datum()))
    # missing header id
    recs, _, code, err = parse_firehose_request(None, body)
    assert recs is None and code == 400 and "header" in err
    # body id mismatch / missing
    recs, _, code, err = parse_firehose_request("r2", body)
    assert recs is None and code == 400 and err == "different request id in body"
    nobody = json.dumps({"timestamp": 1, "records": []})
    recs, _, code, err = parse_firehose_request("r1", nobody)
    assert recs is None and err == "missing request id in body"
    # malformed JSON body
    recs, _, code, err = parse_firehose_request("r1", "{nope")
    assert recs is None and code == 400
    # invalid base64 rejects the whole request
    bad = json.dumps(
        {"requestId": "r1", "records": [{"data": "!!notb64!!"}]}
    )
    recs, _, code, err = parse_firehose_request("r1", bad)
    assert recs is None and "index 0" in err
    # access key: non-empty header must equal the configured key
    recs, _, code, err = parse_firehose_request(
        "r1", body, access_key_header="wrong", expected_access_key="k"
    )
    assert recs is None and code == 401
    recs, _, code, _ = parse_firehose_request(
        "r1", body, access_key_header="k", expected_access_key="k"
    )
    assert recs is not None and code == 200


def test_framing_common_attributes_header_malformed_is_dropped():
    body = _request("r1", _record(_datum()))
    recs, common, code, _ = parse_firehose_request(
        "r1", body, common_header="{broken"
    )
    assert recs is not None and common == {} and code == 200
    recs, common, _, _ = parse_firehose_request(
        "r1", body, common_header='{"commonAttributes": {"env": "prod"}}'
    )
    assert common == {"env": "prod"}


# ---------------------------------------------------------------- spark


def test_firehose_spark_end_to_end(spark):
    rows = [
        ("r0", _request("r0", _record(_datum(), _datum(unit=""))),
         '{"commonAttributes": {"env": "prod"}}'),
        ("r1", _request("r1", _record(_datum(unit=""))), None),  # all invalid
        ("r2", json.dumps({"requestId": "r2", "records": [{"data": "!!"}]}),
         None),
    ]
    df = spark.createDataFrame(
        rows, "request_id string, body string, common string"
    )
    dps = firehose_cwmetrics(df, common_col="common").collect()
    assert [d["request_id"] for d in dps] == ["r0"]
    assert dps[0]["resource"]["env"] == "prod"
    assert dps[0]["count"] == 2 and dps[0]["max"] == 9.0
    assert dps[0]["time_unix_nano"] == 1704067200000 * 10**6

    resp = {
        r["request_id"]: r
        for r in firehose_responses(df, common_col="common").collect()
    }
    assert resp["r0"]["status_code"] == 200
    assert resp["r0"]["error_message"] == ""
    assert resp["r1"]["status_code"] == 400
    assert resp["r1"]["error_message"] == "record format invalid"
    assert resp["r2"]["status_code"] == 400
    assert "base64" in resp["r2"]["error_message"]
    assert all(r["timestamp"] == 0 for r in resp.values())
