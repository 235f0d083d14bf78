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


def test_otlp_json_write_read_roundtrip(spark, otlp_file, tmp_path_factory):
    """write_otlp_json is the exact inverse of read_otlp_json: write the
    flat records back out as OTLP/JSON lines, read them again, and the
    record set is identical (fileexporter marshaling round-trip)."""
    from opentelemetry_collector_contrib_spark.sources.readers import (
        write_otlp_json,
    )

    df = read_otlp_json(spark, otlp_file)
    out = str(tmp_path_factory.mktemp("otlp_out") / "export")
    write_otlp_json(df, out)

    back = read_otlp_json(spark, out)

    def key(r):
        return (
            str(r.ts), r.severity_number, r.severity_text, r.body,
            tuple(sorted((r.attributes or {}).items())),
            tuple(sorted((r.resource or {}).items())),
            r.scope_name, r.trace_id, r.span_id,
        )

    assert sorted(map(key, df.collect())) == sorted(map(key, back.collect()))


def test_generate_input(spark):
    """stanza generate input: count copies of a static entry; non-static
    stamps deterministic sequential timestamps."""
    from opentelemetry_collector_contrib_spark.sources.readers import (
        generate_input,
    )

    df = generate_input(
        spark, "hello", 5, attributes={"k": "v"}, severity_text="INFO"
    )
    rows = sorted(df.collect(), key=lambda r: r.seq)
    assert len(rows) == 5
    assert all(r.body == "hello" and r.attributes == {"k": "v"} for r in rows)

    ts = generate_input(
        spark, "x", 3, static=False,
        base_ts="2024-01-01 00:00:00", interval_us=1_000_000,
    )
    got = sorted(str(r.ts) for r in ts.collect())
    assert got == [
        "2024-01-01 00:00:00",
        "2024-01-01 00:00:01",
        "2024-01-01 00:00:02",
    ]


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


def test_read_log_lines_crlf(spark, tmp_path_factory):
    """CRLF (and legacy CR) files must yield lines with no trailing '\\r' —
    a trailing '\\r' silently breaks anchored regex parsers (ADVICE r03)."""
    d = tmp_path_factory.mktemp("crlf")
    (d / "win.log").write_bytes(b"ERROR boom\r\nINFO ok\r\nWARN last")
    (d / "mac.log").write_bytes(b"a\rb\rc\r")
    rows = read_log_lines(spark, str(d)).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r.file.rsplit("/", 1)[-1], []).append((r.offset, r.line))
    assert sorted(by_file["win.log"]) == [
        (0, "ERROR boom"), (1, "INFO ok"), (2, "WARN last")]
    assert sorted(by_file["mac.log"]) == [(0, "a"), (1, "b"), (2, "c")]


class TestChunkedReader:
    """Byte-range chunked batch reader: a file larger than one split must
    keep exact lines, offsets, and multiline framing across chunk seams
    (round-2 ask #9, now at real-split granularity)."""

    @pytest.fixture(scope="class")
    def seamdir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("seams")
        # ~64 KB of variable-width lines so 4 KB chunks cut mid-line,
        # at line starts, and inside multiline groups; CRLF rows mixed in;
        # no trailing newline at EOF
        lines = []
        for i in range(3000):
            if i % 7 == 0:
                lines.append(f"HEAD-{i:05d} " + "x" * (i % 53))
            else:
                lines.append(f"  cont-{i:05d} " + "y" * (i % 29))
        body = "\r\n".join(lines[:100]) + "\r\n" + "\n".join(lines[100:])
        (d / "big.log").write_text(body)  # no trailing newline
        (d / "tiny.log").write_text("solo\n")
        return str(d), lines

    def test_matches_wholetext(self, spark, seamdir):
        from opentelemetry_collector_contrib_spark.sources.readers import (
            read_log_lines_chunked,
        )

        d, lines = seamdir
        want = [
            (r.file.rsplit("/", 1)[-1], r.offset, r.line)
            for r in read_log_lines(spark, d).collect()
        ]
        got = [
            (r.file.rsplit("/", 1)[-1], r.offset, r.line)
            for r in read_log_lines_chunked(
                spark, d, chunk_bytes=4096, offsets="ordinal"
            ).collect()
        ]
        assert sorted(got) == sorted(want)
        assert len(got) == 3001

    def test_byte_offsets_monotone_and_exact(self, spark, seamdir):
        from opentelemetry_collector_contrib_spark.sources.readers import (
            read_log_lines_chunked,
        )

        d, _ = seamdir
        rows = sorted(
            (r.offset, r.line)
            for r in read_log_lines_chunked(spark, d, chunk_bytes=4096)
            .collect()
            if r.file.endswith("big.log")
        )
        # each line's byte offset equals the previous offset + previous
        # line length + its terminator width (structural exactness)
        raw = open(f"{d}/big.log", "rb").read()
        for off, line in rows:
            assert raw[off : off + len(line.encode())].decode() == line

    def test_line_longer_than_chunk(self, spark, tmp_path_factory):
        """A single line spanning many chunks is emitted once, whole, by
        the chunk owning its first byte; memory stays bounded by design."""
        from opentelemetry_collector_contrib_spark.sources.readers import (
            read_log_lines_chunked,
        )

        d = tmp_path_factory.mktemp("longline")
        mega = "z" * 20_000
        (d / "l.log").write_text(f"start\n{mega}\nend\n")
        rows = sorted(
            (r.offset, r.line)
            for r in read_log_lines_chunked(
                spark, str(d), chunk_bytes=1024, offsets="ordinal"
            ).collect()
        )
        assert [(o, l[:5]) for o, l in rows] == [
            (0, "start"), (1, "zzzzz"), (2, "end")]
        assert len(rows[1][1]) == 20_000

    def test_auto_routing_preserves_contract(self, spark, seamdir):
        """read_log_lines with a small max_file_bytes routes the big file
        through the chunked path and must return the identical result set,
        so multiline framing downstream is unaffected."""
        d, _ = seamdir
        want = sorted(
            (r.file.rsplit("/", 1)[-1], r.offset, r.line)
            for r in read_log_lines(spark, d, max_file_bytes=None).collect()
        )
        got = sorted(
            (r.file.rsplit("/", 1)[-1], r.offset, r.line)
            for r in read_log_lines(spark, d, max_file_bytes=8192).collect()
        )
        assert got == want

    def test_multiline_framing_across_seams(self, spark, seamdir):
        """HEAD/cont groups written across 4 KB seams frame identically to
        the wholetext path."""
        d, lines = seamdir
        whole = {
            r.line
            for r in read_multiline(spark, d, r"^HEAD").collect()
        }
        # route big.log chunked by shrinking the cap below its size
        from opentelemetry_collector_contrib_spark.operators.recombine import (
            recombine,
        )
        from opentelemetry_collector_contrib_spark.sources.readers import (
            read_log_lines_chunked,
        )

        chunked_lines = read_log_lines_chunked(spark, d, chunk_bytes=4096)
        out = recombine(
            chunked_lines, "file", "offset", "line", r"^HEAD", combine_with="\n"
        )
        got = {r.combined for r in out.collect()}
        assert got == whole


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


def test_journald_export(spark, tmp_path):
    # Shapes from `journalctl -o json` (input/journald/input.go:172-214):
    # timestamp removed from body, cursor kept, binary-array field string-
    # coerced to its raw JSON text (JacksonParser) with the line preserved.
    recs = [
        {
            "__CURSOR": "s=aa;i=1",
            "__REALTIME_TIMESTAMP": "1700000000000001",
            "PRIORITY": "3",
            "MESSAGE": "disk failure",
            "_SYSTEMD_UNIT": "smartd.service",
        },
        {
            "__CURSOR": "s=aa;i=2",
            "__REALTIME_TIMESTAMP": "1700000000000002",
            "PRIORITY": "6",
            "MESSAGE": "started",
            "_SYSTEMD_UNIT": "nginx.service",
        },
    ]
    d = tmp_path / "journal"
    d.mkdir()
    binary_line = '{"__CURSOR":"s=aa;i=3","__REALTIME_TIMESTAMP":"1700000000000003","MESSAGE":[104,105]}'
    (d / "export.json").write_text(
        "\n".join(json.dumps(r) for r in recs) + "\n" + binary_line + "\n"
    )
    from opentelemetry_collector_contrib_spark.sources.readers import read_journald_export

    rows = read_journald_export(spark, str(d)).collect()
    out = sorted(rows, key=lambda r: r.cursor)
    assert len(out) == 3
    assert out[0].ts_unix_us == 1700000000000001
    assert out[0].cursor == "s=aa;i=1"
    assert out[0].body["MESSAGE"] == "disk failure"
    assert out[0].body["_SYSTEMD_UNIT"] == "smartd.service"
    # timestamp is deleted from the body, cursor stays (reference parity)
    assert "__REALTIME_TIMESTAMP" not in out[0].body
    assert out[0].body["__CURSOR"] == "s=aa;i=1"
    assert sorted(out[1].body.keys()) == [
        "MESSAGE", "PRIORITY", "_SYSTEMD_UNIT", "__CURSOR",
    ]
    # binary-valued field: string-coerced to raw JSON text; line preserved
    assert out[2].body["MESSAGE"] == "[104,105]"
    assert out[2].line == binary_line


def test_read_log_lines_gzip(spark, tmp_path_factory):
    """Gzipped log files decompress transparently (Hadoop codec by
    extension) and NEVER route to the byte-range chunked reader — gzip is
    non-splittable, a range read would return raw compressed bytes. A .gz
    whose compressed size exceeds max_file_bytes stays on the wholetext
    path; plain files mix freely in the same directory."""
    import gzip

    from opentelemetry_collector_contrib_spark.sources.readers import read_log_lines

    d = tmp_path_factory.mktemp("gzlogs")
    lines = [f"2024-01-01T00:00:{i:02d}Z INFO line-{i}" for i in range(50)]
    with gzip.open(d / "a.log.gz", "wt") as f:
        f.write("\n".join(lines) + "\n")
    (d / "b.log").write_text("plain-0\nplain-1\n")

    rows = read_log_lines(spark, str(d)).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r.file.rsplit("/", 1)[-1], []).append((r.offset, r.line))
    assert [l for _, l in sorted(by_file["a.log.gz"])] == lines
    assert [l for _, l in sorted(by_file["b.log"])] == ["plain-0", "plain-1"]

    # a .gz larger than max_file_bytes must NOT be chunk-routed (content
    # would be garbage); it stays wholetext and still reads correctly
    rows2 = read_log_lines(spark, str(d), max_file_bytes=100).collect()
    got = sorted(
        (r.offset, r.line) for r in rows2 if r.file.endswith("a.log.gz")
    )
    assert [l for _, l in got] == lines


def test_subprocess_spool_follower_journald_live(spark, tmp_path):
    """Live subscription half of the journald input: a long-lived
    subprocess (stub `journalctl -f -o json` emitter) tails into spool
    files, which the batch/streaming file source + journald_parser consume
    unchanged (input/journald/input.go's follow mode)."""
    import sys
    import time

    from opentelemetry_collector_contrib_spark.operators.parse import (
        journald_parser,
    )
    from opentelemetry_collector_contrib_spark.sources.readers import (
        subprocess_spool_follower,
    )

    spool = str(tmp_path / "spool")
    emitter = (
        "import json,sys,time\n"
        "for i in range(25):\n"
        "    rec={'__CURSOR':'s=aa;i=%d'%i,"
        "'__REALTIME_TIMESTAMP':str(1700000000000000+i),"
        "'PRIORITY':str(i%8),'MESSAGE':'live msg %d'%i,"
        "'_SYSTEMD_UNIT':'u%d.service'%(i%3)}\n"
        "    sys.stdout.write(json.dumps(rec)+'\\n')\n"
        "    sys.stdout.flush()\n"
        "    time.sleep(0.01)\n"
    )
    proc, stop = subprocess_spool_follower(
        [sys.executable, "-u", "-c", emitter], spool, flush_every=10
    )
    try:
        deadline = time.time() + 20
        while proc.poll() is None and time.time() < deadline:
            time.sleep(0.2)
    finally:
        stop()
    lines = spark.read.text(spool).withColumnRenamed("value", "line")
    parsed = journald_parser(lines, parse_from="line")
    rows = sorted(parsed.collect(), key=lambda r: int(r.cursor.split("=")[-1]))
    assert len(rows) == 25
    assert rows[0].body["MESSAGE"] == "live msg 0"
    assert rows[24].body["MESSAGE"] == "live msg 24"
    assert {r.body["_SYSTEMD_UNIT"] for r in rows} == {
        "u0.service", "u1.service", "u2.service"
    }
