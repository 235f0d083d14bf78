"""Source reader tests: filelog lines + offsets, multiline framing, OTLP-JSON."""

import json

import pytest

from opentelemetry_collector_contrib_spark.sources.readers import (
    read_log_lines,
    read_multiline,
    read_otlp_json,
)


@pytest.fixture(scope="module")
def logdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("logs")
    (d / "a.log").write_text(
        "ERROR boom\n  at frame1\n  at frame2\nINFO ok\nERROR again\n  at frame3\n"
    )
    (d / "b.log").write_text("INFO solo\n")
    return str(d)


def test_read_log_lines_offsets(spark, logdir):
    df = read_log_lines(spark, logdir)
    rows = df.collect()
    assert len(rows) == 7
    a = sorted(
        [r for r in rows if r.file.endswith("a.log")], key=lambda r: r.offset
    )
    assert [r.offset for r in a] == list(range(6))
    assert a[0].line == "ERROR boom"


def test_multiline_framing(spark, logdir):
    df = read_multiline(spark, logdir, r"^\S", combine_with="\n")
    entries = {r.line for r in df.collect()}
    assert "ERROR boom\n  at frame1\n  at frame2" in entries
    assert "INFO ok" in entries
    assert "ERROR again\n  at frame3" in entries
    assert "INFO solo" in entries


@pytest.fixture(scope="module")
def otlp_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("otlp")
    payload = {
        "resourceLogs": [
            {
                "resource": {
                    "attributes": [
                        {"key": "host.name", "value": {"stringValue": "h1"}}
                    ]
                },
                "scopeLogs": [
                    {
                        "scope": {"name": "lib"},
                        "logRecords": [
                            {
                                "timeUnixNano": "1704067200000000000",
                                "severityNumber": 9,
                                "severityText": "Info",
                                "body": {"stringValue": "hello"},
                                "attributes": [
                                    {"key": "k", "value": {"stringValue": "v"}}
                                ],
                                "traceId": "0102030405060708090a0b0c0d0e0f10",
                                "spanId": "0102030405060708",
                            },
                            {
                                "timeUnixNano": "1704067201000000000",
                                "severityNumber": 17,
                                "severityText": "Error",
                                "body": {"stringValue": "boom"},
                                "attributes": [],
                                "traceId": "",
                                "spanId": "",
                            },
                        ],
                    }
                ],
            }
        ]
    }
    f = d / "logs.json"
    f.write_text(json.dumps(payload))
    return str(f)


def test_read_otlp_json(spark, otlp_file):
    df = read_otlp_json(spark, otlp_file)
    rows = sorted(df.collect(), key=lambda r: r.severity_number)
    assert len(rows) == 2
    r = rows[0]
    assert r.body == "hello" and r.severity_text == "Info"
    assert r.resource == {"host.name": "h1"}
    assert r.attributes == {"k": "v"}
    assert r.scope_name == "lib"
    assert str(r.ts).startswith("2024-01-01")
    assert rows[1].body == "boom" and rows[1].severity_number == 17


def test_read_log_lines_structural_offsets(spark, tmp_path_factory):
    """Offsets are structural (wholetext + posexplode), not an artifact of
    input-split ordering: a many-line file keeps exact line ordinals, a
    trailing newline adds no phantom line, an empty file yields no rows,
    and a file ending without a newline keeps its last line."""
    d = tmp_path_factory.mktemp("biglogs")
    n = 50_000
    (d / "big.log").write_text("\n".join(f"line-{i:06d}" for i in range(n)) + "\n")
    (d / "empty.log").write_text("")
    (d / "nonl.log").write_text("a\nb")  # no trailing newline
    df = read_log_lines(spark, str(d))
    rows = df.collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r.file.rsplit("/", 1)[-1], []).append((r.offset, r.line))
    assert "empty.log" not in by_file
    assert sorted(by_file["nonl.log"]) == [(0, "a"), (1, "b")]
    big = sorted(by_file["big.log"])
    assert len(big) == n
    assert all(line == f"line-{off:06d}" for off, line in big)


def test_namedpipe_spool_source(spark, tmp_path):
    """namedpipe receiver analog: lines written into a FIFO land in the
    spool and read back intact (order within a spool file preserved)."""
    import os
    import time as _time

    from opentelemetry_collector_contrib_spark.sources.readers import (
        pipe_spool_listener,
    )

    fifo = str(tmp_path / "in.pipe")
    spool = str(tmp_path / "spool")
    stop = pipe_spool_listener(fifo, spool, flush_every=10)
    try:
        with open(fifo, "w") as w:
            for i in range(25):
                w.write(f"pipe line {i}\n")
        deadline = _time.time() + 15
        while _time.time() < deadline:
            try:
                if spark.read.text(spool).count() >= 25:
                    break
            except Exception:
                pass
            _time.sleep(0.3)
    finally:
        stop()
    got = sorted(r.value for r in spark.read.text(spool).collect())
    assert got == sorted(f"pipe line {i}" for i in range(25))


def test_stdin_reader(spark, monkeypatch):
    """stdin receiver analog: drain stdin into a batch DataFrame."""
    import io

    from opentelemetry_collector_contrib_spark.sources.readers import read_stdin_lines

    monkeypatch.setattr("sys.stdin", io.StringIO("alpha\nbeta\ngamma\n"))
    rows = [r.line for r in read_stdin_lines(spark).collect()]
    assert rows == ["alpha", "beta", "gamma"]
