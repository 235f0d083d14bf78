"""mezmoexporter.

Reference semantics under test: `exporter/mezmoexporter/exporter.go`
(line mapping: appname/level defaults, meta hostname/trace/span +
Str()-typed attrs, struct field order; body builder with the
flush-strips-trailing-comma loop) and `utils.go` (byte truncation),
size caps `config.go:27-31`."""

import json

from opentelemetry_collector_contrib_spark.operators.mezmo_exporter import (
    MAX_APPNAME_LEN,
    MAX_LOG_LEVEL_LEN,
    MAX_MESSAGE_SIZE,
    assemble_bodies,
    mezmo_bodies,
    mezmo_line_json,
    mezmo_lines,
    truncate_string,
)

NOW = 1704067200000


def test_line_mapping_and_field_order():
    ts, line = mezmo_line_json(
        {
            "time_unix_nano": NOW * 10**6,
            "body": "hello",
            "severity_text": "Warning",
            "trace_id": "ab" * 16,
            "span_id": "cd" * 8,
            "attributes": {"appname": "svc", "k": "v"},
            "resource": {"host.name": "h1"},
        }
    )
    assert ts == NOW
    assert line == (
        '{"timestamp":' + str(NOW)
        + ',"line":"hello","app":"svc","level":"Warning",'
        '"meta":{"appname":"svc","hostname":"h1","k":"v",'
        '"span.id":"' + "cd" * 8 + '","trace.id":"' + "ab" * 16 + '"}}'
    )


def test_line_defaults_and_truncation():
    # zero ts → now; empty level → "info"; empty meta stays {}
    ts, line = mezmo_line_json({"body": "b"}, now_ms=42)
    assert ts == 42
    assert json.loads(line) == {
        "timestamp": 42, "line": "b", "app": "", "level": "info", "meta": {},
    }
    # caps: body 16 KiB, app 512, level 80
    _, line = mezmo_line_json(
        {
            "body": "x" * (MAX_MESSAGE_SIZE + 5),
            "severity_text": "L" * (MAX_LOG_LEVEL_LEN + 5),
            "attributes": {"appname": "a" * (MAX_APPNAME_LEN + 5)},
        },
        now_ms=1,
    )
    d = json.loads(line)
    assert len(d["line"]) == MAX_MESSAGE_SIZE
    assert len(d["app"]) == MAX_APPNAME_LEN
    assert len(d["level"]) == MAX_LOG_LEVEL_LEN
    # truncate_string cuts at len == max too (Go `<` comparison)
    assert truncate_string("abc", 3) == "abc"
    assert truncate_string("abcd", 3) == "abc"


def test_body_assembly_flush_strips_comma():
    lines = ['{"a":1}', '{"b":2}', '{"c":3}']
    # big cap: single body
    assert assemble_bodies(lines) == ['{"lines": [{"a":1},{"b":2},{"c":3}]}']
    # cap forces a flush before the third line; flushed batch had a
    # trailing comma that gets stripped
    cap = len('{"lines": [{"a":1},{"b":2},') + 2
    got = assemble_bodies(lines, max_body_size=cap)
    assert got == ['{"lines": [{"a":1},{"b":2}]}', '{"lines": [{"c":3}]}']
    for g in got:
        json.loads(g)


def test_mezmo_spark_end_to_end(spark):
    df = spark.createDataFrame(
        [
            ("p0", 0, NOW * 10**6, "m0", "Info", {"appname": "a"}, None),
            ("p0", 1, 0, "m1", "", None, {"host.name": "h"}),
            ("p1", 2, NOW * 10**6, "m2", "Err", None, None),
        ],
        "batch_key string, arrival long, time_unix_nano long, body string, "
        "severity_text string, attributes map<string,string>, "
        "resource map<string,string>",
    )
    lines = mezmo_lines(df, now_ms=7).orderBy("arrival").collect()
    assert [r["timestamp_ms"] for r in lines] == [NOW, 7, NOW]
    assert json.loads(lines[1]["line_json"])["meta"] == {"hostname": "h"}
    assert json.loads(lines[1]["line_json"])["level"] == "info"

    bodies = {r["batch_key"]: r for r in
              mezmo_bodies(mezmo_lines(df, now_ms=7)).collect()}
    p0 = json.loads(bodies["p0"]["body"])
    assert [ln["line"] for ln in p0["lines"]] == ["m0", "m1"]
    p1 = json.loads(bodies["p1"]["body"])
    assert [ln["line"] for ln in p1["lines"]] == ["m2"]
