"""elasticsearchexporter + awss3exporter marshaling parity tests.

Golden docs are hand-built from the reference semantics
(`exporter/elasticsearchexporter/internal/objmodel/objmodel.go`,
`model.go`; `exporter/awss3exporter/s3_writer.go`, `sumo_marshaler.go`,
`body_marshaler.go`) — not copied from its test files.
"""

import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.es_exporter import (
    bulk_create_action,
    encode_log_document,
    es_bulk_messages,
    resolve_index,
)
from opentelemetry_collector_contrib_spark.operators.s3_exporter import (
    marshal_log_group,
    read_s3_body_objects,
    s3_object_key,
    sumo_json_line,
    write_s3_objects,
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
        scope_name="scope",
        trace_id="",
        span_id="",
    )
    base.update(kw)
    return base


# --------------------------------------------------------------- ES docs


def test_es_default_doc_sorted_nested():
    # default config: mode none, dedup=true → sorted keys, dedot=true →
    # nested objects (factory.go:55-59)
    out = encode_log_document(
        rec(attributes={"k": "2"}, resource={"service.name": "svc1"},
            trace_id="0" * 31 + "5", span_id="00000000000000a1")
    ).decode()
    assert out == (
        '{"@timestamp":"2024-01-01T00:00:05.000000000Z"'
        ',"Attributes":{"k":"2"}'
        ',"Body":"hello"'
        ',"Resource":{"service":{"name":"svc1"}}'
        ',"Scope":{"name":"scope","version":""}'
        ',"SeverityNumber":9,"SeverityText":"Info"'
        ',"SpanId":"00000000000000a1"'
        ',"TraceFlags":0'
        ',"TraceId":"00000000000000000000000000000005"}'
    )
    # it is valid JSON with the nested shape
    d = json.loads(out)
    assert d["Resource"]["service"]["name"] == "svc1"


def test_es_flat_doc_insertion_order():
    # dedup=false dedot=false: model.go field order, dotted keys
    out = encode_log_document(
        rec(attributes={"k": "2"}, resource={"service.name": "svc1"}),
        dedup=False, dedot=False,
    ).decode()
    assert out == (
        '{"@timestamp":"2024-01-01T00:00:05.000000000Z"'
        ',"TraceFlags":0,"SeverityText":"Info","SeverityNumber":9'
        ',"Body":"hello","Attributes.k":"2"'
        ',"Resource.service.name":"svc1"'
        ',"Scope.name":"scope","Scope.version":""}'
    )


def test_es_empty_ids_and_text_skipped():
    # AddTraceID/AddSpanID skip all-zero ids (objmodel.go:128-142);
    # AddString skips "" (objmodel.go:122-126); observed ts fallback
    out = json.loads(
        encode_log_document(
            rec(time_unix_nano=0, severity_text="", trace_id="0" * 32,
                span_id="", body=None)
            | {"observed_time_unix_nano": 7 * NS}
        )
    )
    assert out["@timestamp"] == "1970-01-01T00:00:07.000000000Z"
    assert "TraceId" not in out and "SpanId" not in out
    assert "SeverityText" not in out and "Body" not in out


def test_es_dedup_rename_and_last_wins():
    # (x=1, x.a=2) → (x.value, x.a) rename (objmodel.go:211-221);
    # duplicate keys keep the LAST value (objmodel.go:227-231)
    out = json.loads(
        encode_log_document(rec(attributes={"x": "1", "x.a": "2"}))
    )
    assert out["Attributes"]["x"] == {"value": "1", "a": "2"}
    d1 = encode_log_document(rec(body="first", attributes={"Body": "dup"}),
                             mode="raw")
    # raw mode flattens attrs at top level → two Body fields → last wins
    assert json.loads(d1)["Body"] == "dup"


def test_es_ecs_mode():
    out = json.loads(
        encode_log_document(
            rec(
                attributes={"exception.type": "E", "k": "v"},
                resource={"service.name": "svc"},
                severity_number=3,
            ),
            mode="ecs",
        )
    )
    assert out["@timestamp"] == "2024-01-01T00:00:05.000000000Z"
    assert out["event"]["severity"] == 3
    assert out["log"]["level"] == "Info"
    assert out["message"] == "hello"
    assert out["error"]["type"] == "E"  # exception.type → error.type
    assert out["k"] == "v"
    assert out["service"]["name"] == "svc"
    # severity 0 / empty level skipped in ECS (model.go:56-60)
    out0 = json.loads(
        encode_log_document(rec(severity_number=0, severity_text=""),
                            mode="ecs")
    )
    assert "event" not in out0 and "log" not in out0


def test_es_nan_array_and_nested_values():
    out = json.loads(
        encode_log_document(
            rec(attributes={"bad": float("nan"), "arr": [1, "a", {"b": 2}],
                            "f": 1.5, "t": True})
        )
    )
    a = out["Attributes"]
    assert a["bad"] is None  # NaN → null (objmodel.go:468-471)
    assert a["arr"] == [1, "a", {"b": 2}]
    assert a["f"] == 1.5 and a["t"] is True


def test_es_index_routing():
    r = rec(resource={"elasticsearch.index.prefix": "res-"},
            attributes={"elasticsearch.index.prefix": "attr-",
                        "elasticsearch.index.suffix": "-sfx"})
    # resource beats record for prefix; suffix only in record attrs
    assert resolve_index(r, dynamic_index=True) == (
        "res-logs-generic-default-sfx"
    )
    assert resolve_index(r, logstash_format=True) == (
        "logs-generic-default-2024.01.01"
    )
    assert bulk_create_action("idx") == b'{"create":{"_index":"idx"}}'


def test_es_bulk_messages_spark(spark):
    df = spark.createDataFrame(
        [(5 * NS, 9, "Info", "b<5>", {"k": "1"}, {"service.name": "s"},
          "sc", "a" * 32, "b" * 16)],
        "time_unix_nano long, severity_number int, severity_text string,"
        "body string, attributes map<string,string>,"
        "resource map<string,string>, scope_name string,"
        "trace_id string, span_id string",
    )
    row = es_bulk_messages(df).collect()[0]
    assert row["index"] == "logs-generic-default"
    action, doc, trail = bytes(row["value"]).split(b"\n")
    assert trail == b""
    assert action == b'{"create":{"_index":"logs-generic-default"}}'
    d = json.loads(doc)
    assert d["Body"] == "b<5>" and d["TraceId"] == "a" * 32
    # structform escaping: no HTML escapes in the doc bytes
    assert b"<" in doc and b"\\u003c" not in doc


# --------------------------------------------------------------- S3 sink


def test_s3_key_layout():
    key = s3_object_key(
        "year=2024/month=01/day=01/hour=00/minute=05",
        s3_prefix="otel", file_prefix="fp-", file_format="txt",
        unique_id=123456789,
    )
    assert key == (
        "otel/year=2024/month=01/day=01/hour=00/minute=05/"
        "fp-logs_123456789.txt"
    )
    assert s3_object_key("t", file_format="json", compression="gzip",
                         unique_id=1).endswith("logs_1.json.gz")
    # deterministic id: stable across calls, in the reference's range
    k1 = s3_object_key("t", s3_prefix="p")
    assert k1 == s3_object_key("t", s3_prefix="p")
    uid = int(k1.rsplit("_", 1)[1].split(".")[0])
    assert 100000000 <= uid <= 999999999


def test_sumo_line_and_body_marshal():
    r = rec(
        body="msg <1>",
        attributes={"k": "v"},
        resource={"_sourceCategory": "cat", "_sourceHost": "host",
                  "_sourceName": "name", "extra": "e"},
    )
    line = sumo_json_line(r).decode()
    assert line == (
        '{"date": "2024-01-01 00:00:05 +0000 UTC"'
        ',"sourceName":"name","sourceHost":"host","sourceCategory":"cat"'
        ',"fields":{"extra":"e"}'
        ',"message":{"k":"v","log":"msg \\u003c1\\u003e"}}\n'
    )
    # encoding/json HTML-escapes the body in message; fields exclude the
    # consumed _source* attributes (sumo_marshaler.go:111-119)
    with pytest.raises(ValueError, match="_sourceHost"):
        sumo_json_line(rec(resource={"_sourceCategory": "c",
                                     "_sourceName": "n"}))
    assert marshal_log_group([rec(body="a"), rec(body=None)], "body") == (
        b"a\n\n"
    )


def test_sumo_fractional_date():
    r = rec(time_unix_nano=5 * NS + 120_000_000,
            resource={"_sourceCategory": "c", "_sourceHost": "h",
                      "_sourceName": "n"})
    assert b'"date": "1970-01-01 00:00:05.12 +0000 UTC"' in sumo_json_line(r)


def test_s3_write_read_roundtrip(spark, tmp_path):
    root = str(tmp_path / "bucket")
    df = spark.createDataFrame(
        [(i, (1704067200 + i * 61) * NS, 9, "Info", f"line-{i}",
          {}, {}, "sc", "", "") for i in range(8)],
        "i long, time_unix_nano long, severity_number int,"
        "severity_text string, body string,"
        "attributes map<string,string>, resource map<string,string>,"
        "scope_name string, trace_id string, span_id string",
    ).drop("i")
    manifest = write_s3_objects(df, root, marshaler="body").collect()
    # 61 s stride → every record lands in its own minute partition
    assert len(manifest) == 8
    for m in manifest:
        assert m["key"].startswith("otel/year=2024/month=01/day=01/")
        assert m["records"] == 1
        assert os.path.exists(os.path.join(root, m["key"]))
    back = read_s3_body_objects(spark, root).orderBy("body").collect()
    assert [r["body"] for r in back] == [f"line-{i}" for i in range(8)]
    assert back[0]["minute"] == 0 and back[1]["minute"] == 1


def test_s3_gzip_and_otlp_formats(spark, tmp_path):
    root = str(tmp_path / "bucket2")
    df = spark.createDataFrame(
        [(1704067200 * NS, 9, "Info", "x", {}, {}, "sc", "", "")],
        "time_unix_nano long, severity_number int, severity_text string,"
        "body string, attributes map<string,string>,"
        "resource map<string,string>, scope_name string,"
        "trace_id string, span_id string",
    )
    m = write_s3_objects(df, root, marshaler="otlp_json",
                         compression="gzip").collect()
    assert len(m) == 1 and m[0]["key"].endswith(".json.gz")
    with open(os.path.join(root, m[0]["key"]), "rb") as fh:
        doc = json.loads(gzip.decompress(fh.read()))
    lr = doc["resourceLogs"][0]["scopeLogs"][0]["logRecords"][0]
    assert lr["body"]["stringValue"] == "x"
    # otlp_proto round-trips through the wire codec
    from opentelemetry_collector_contrib_spark.functions.otlp_proto import (
        decode_logs,
    )

    m2 = write_s3_objects(df, root, marshaler="otlp_proto").collect()
    assert m2[0]["key"].endswith(".binpb")
    with open(os.path.join(root, m2[0]["key"]), "rb") as fh:
        recs = decode_logs(fh.read())
    assert recs[0]["body"] == "x"
