"""lokiexporter / loki translator parity tests.

Goldens hand-built from `pkg/translator/loki/` semantics (convert.go,
logs_to_loki.go, encode.go, prometheus normalize_label.go) — not copied
from its test files.
"""

import json

from opentelemetry_collector_contrib_spark.operators.loki_exporter import (
    label_set_string,
    log_to_loki_entry,
    loki_entries,
    loki_push_streams,
    normalize_label,
    severity_level,
)

NS = 1_000_000_000


def rec(**kw):
    base = dict(
        time_unix_nano=5 * NS,
        severity_number=9,
        severity_text="Info",
        body="hello",
        attributes={},
        resource={},
        scope_name="",
        trace_id="",
        span_id="",
    )
    base.update(kw)
    return base


def test_severity_levels_and_label_normalization():
    # logs_to_loki.go:228-254 band table
    assert [severity_level(n) for n in (1, 4, 5, 9, 13, 17, 21, 24)] == [
        "TRACE", "TRACE4", "DEBUG", "INFO", "WARN", "ERROR", "FATAL",
        "FATAL4",
    ]
    assert severity_level(0) == "UNSPECIFIED"
    # normalize_label.go:27-53
    assert normalize_label("service.name") == "service_name"
    assert normalize_label("9lives") == "key_9lives"
    assert normalize_label("_under") == "key_under"
    assert normalize_label("__meta") == "__meta"


def test_default_labels_and_level():
    e = log_to_loki_entry(
        rec(resource={"service.name": "svc", "service.namespace": "ns",
                      "service.instance.id": "i-1"})
    )
    # exporter + job (ns/name) + instance + promoted level, name-sorted
    assert e["labels"] == (
        '{exporter="OTLP", instance="i-1", job="ns/svc", level="INFO"}'
    )
    # level was promoted → removed from attributes → not in the line
    assert '"level"' not in e["line"]
    # defaults individually defeatable (convert.go:61-81)
    e2 = log_to_loki_entry(
        rec(resource={"service.name": "svc"}),
        default_labels_enabled={"exporter": False, "level": False},
    )
    assert e2["labels"] == '{job="svc"}'


def test_label_hints_and_removal():
    e = log_to_loki_entry(
        rec(
            attributes={"sev": "hi", "loki.attribute.labels": "sev",
                        "keep": "x"},
            resource={"region": "eu", "loki.resource.labels": "region"},
        ),
        default_labels_enabled={"level": False},
    )
    assert e["labels"] == '{exporter="OTLP", region="eu", sev="hi"}'
    line = json.loads(e["line"])
    # promoted keys + the loki.* hints removed from both maps
    assert line["attributes"] == {"keep": "x"}
    assert "resources" not in line  # region was the only resource attr


def test_json_line_shape_and_escaping():
    e = log_to_loki_entry(
        rec(body="a<b", trace_id="a" * 32, span_id="b" * 16,
            attributes={"z": "1", "a": "2"},
            resource={"service.name": "s"}, scope_name="sc"),
        default_labels_enabled={"level": False},
    )
    # struct field order + encoding/json HTML escaping + sorted map keys
    assert e["line"] == (
        '{"body":"a\\u003cb"'
        ',"traceid":"' + "a" * 32 + '"'
        ',"spanid":"' + "b" * 16 + '"'
        ',"severity":"Info"'
        ',"attributes":{"a":"2","z":"1"}'
        # service.name stays: removal matches label NAMES (job), not the
        # attributes a default label was derived from (convert.go:139-148)
        ',"resources":{"service.name":"s"}'
        ',"instrumentation_scope":{"name":"sc"}}'
    )
    # omitempty: no body/ids/severity/attrs → bare braces
    e0 = log_to_loki_entry(
        rec(body=None, severity_text="", severity_number=0),
    )
    assert e0["line"] == "{}"


def test_logfmt_and_raw_formats():
    e = log_to_loki_entry(
        rec(body="msg with spaces", attributes={"loki.format": "logfmt",
                                                "k": "v 1"}),
        default_labels_enabled={"level": False},
    )
    # plain text fails logfmt parse (spaces → bare keys parse OK; this one
    # parses as bare keys) — reference behavior: parse wins when no error
    assert e["line"].startswith("msg= with= spaces=")
    assert 'attribute_k="v 1"' in e["line"]
    # a valid logfmt body keeps its keyvals; severity replaces in place
    e2 = log_to_loki_entry(
        rec(body="severity=old x=1", attributes={"loki.format": "logfmt"}),
        default_labels_enabled={"level": False},
    )
    assert e2["line"] == "severity=Info x=1"
    e3 = log_to_loki_entry(
        rec(body="evt <5>", attributes={"loki.format": "raw"}),
        default_labels_enabled={"level": False},
    )
    assert e3["line"] == "evt <5>"
    # invalid format → record dropped (convert.go:188)
    assert log_to_loki_entry(
        rec(attributes={"loki.format": "xml"})
    ) is None


def test_tenant_hint():
    e = log_to_loki_entry(
        rec(attributes={"loki.tenant": "tn", "tn": "acme"}),
        default_labels_enabled={"level": False},
    )
    assert e["tenant"] == "acme"
    # resource hint wins and resolves from resource first
    e2 = log_to_loki_entry(
        rec(attributes={"loki.tenant": "other", "t2": "from-attr"},
            resource={"loki.tenant": "t2", "t2": "from-res"}),
        default_labels_enabled={"level": False},
    )
    assert e2["tenant"] == "from-res"


def test_label_set_string_quoting():
    assert label_set_string({"a": 'x"y', "b": "p"}) == (
        '{a="x\\"y", b="p"}'
    )


def test_loki_entries_and_streams_spark(spark):
    df = spark.createDataFrame(
        [
            (i * NS, 9 if i % 2 == 0 else 17, "Info", f"line-{i}",
             {"k": str(i % 2)}, {"service.name": "svc"}, "", "", "")
            for i in range(6)
        ],
        "time_unix_nano long, severity_number int, severity_text string,"
        "body string, attributes map<string,string>,"
        "resource map<string,string>, scope_name string,"
        "trace_id string, span_id string",
    )
    ents = loki_entries(df).collect()
    assert len(ents) == 6
    assert {e["labels"] for e in ents} == {
        '{exporter="OTLP", job="svc", level="INFO"}',
        '{exporter="OTLP", job="svc", level="ERROR"}',
    }
    streams = loki_push_streams(df).collect()
    assert len(streams) == 2
    s = {r["labels"]: r for r in streams}
    info = s['{exporter="OTLP", job="svc", level="INFO"}']
    assert info["entry_count"] == 3
    doc = json.loads(info["stream_json"])
    assert doc["stream"] == {"exporter": "OTLP", "job": "svc",
                             "level": "INFO"}
    # ts-sorted ["<ns>", "<line>"] pairs
    assert [v[0] for v in doc["values"]] == [str(i * NS) for i in (0, 2, 4)]
    assert json.loads(doc["values"][0][1])["body"] == "line-0"
