"""syslogexporter formatting parity — goldens hand-built from
`exporter/syslogexporter/rfc5424_formatter.go` / `rfc3164_formatter.go` /
`sender.go`, plus a render→parse round trip through this repo's own
syslog_parser (the exporter is the parser's inverse).
"""

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.parse import (
    syslog_parser,
)
from opentelemetry_collector_contrib_spark.operators.syslog_exporter import (
    format_rfc3164,
    format_rfc5424,
    syslog_lines,
)

NS = 1_000_000_000
TS = 1704067205  # 2024-01-01T00:00:05Z


def rec(**attrs):
    return dict(time_unix_nano=TS * NS, attributes=attrs)


def test_rfc5424_full_and_defaults():
    line = format_rfc5424(
        rec(priority="34", hostname="h1", appname="app", proc_id="42",
            msg_id="ID7", message="hello world")
    )
    assert line == "<34>1 2024-01-01T00:00:05Z h1 app 42 ID7 - hello world\n"
    # defaults: pri 165, version 1, '-' fields, empty message (no space)
    assert format_rfc5424(rec()) == "<165>1 2024-01-01T00:00:05Z - - - - -\n"


def test_rfc5424_timestamp_fraction_and_octets():
    line = format_rfc5424(
        dict(time_unix_nano=TS * NS + 120_000_000, attributes={}),
    )
    assert line.startswith("<165>1 2024-01-01T00:00:05.12Z ")
    framed = format_rfc5424(rec(message="x"), octet_counting=True)
    body = framed.split(" ", 1)[1]
    assert framed == f"{len(body.encode())} {body}"


def test_rfc5424_structured_data():
    line = format_rfc5424(
        rec(structured_data={"my@123": {"k": "v", "a": "b"},
                             "other@1": {"z": "1"}},
            message="m")
    )
    # fmt.Sprint([]string) shape, ids + params key-sorted (repo pin)
    assert '[my@123 a="b" k="v" other@1 z="1"]' in line
    # non-map sd attr → '-' (rfc5424_formatter.go:79-82)
    assert format_rfc5424(
        rec(structured_data="oops")
    ).rstrip("\n").split(" ")[6] == "-"


def test_rfc3164_shapes():
    line = format_rfc3164(
        rec(priority="34", hostname="h1", appname="su", message="boom")
    )
    assert line == "<34>Jan 01 00:00:05 h1 su: boom\n"
    # no appname → no colon, no delimiter
    assert format_rfc3164(rec(hostname="h", message="m")) == (
        "<165>Jan 01 00:00:05 h m\n"
    )
    # appname without message → no trailing space
    assert format_rfc3164(rec(hostname="h", appname="a")) == (
        "<165>Jan 01 00:00:05 h a:\n"
    )


def test_render_parse_roundtrip_spark(spark):
    df = spark.createDataFrame(
        [
            (TS * NS + i * NS,
             {"priority": str(30 + i), "hostname": f"host{i}",
              "appname": "app", "proc_id": str(100 + i),
              "msg_id": f"M{i}", "message": f"event {i} ok"})
            for i in range(5)
        ],
        "time_unix_nano long, attributes map<string,string>",
    )
    lines = syslog_lines(df, protocol="rfc5424")
    parsed = syslog_parser(
        lines.select(F.rtrim(F.col("value")).alias("line")),
        protocol="rfc5424",
    ).orderBy("host").collect()
    assert len(parsed) == 5
    for i, row in enumerate(parsed):
        assert row["host"] == f"host{i}"
        assert row["app"] == "app"
        assert row["procid"] == str(100 + i)
        assert row["msg"] == f"event {i} ok"
        assert row["facility"] == (30 + i) // 8
        assert row["syslog_severity"] == (30 + i) % 8
        assert str(row["ts"]).startswith("2024-01-01 00:00:")
