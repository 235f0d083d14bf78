"""statsdreceiver: line-protocol parse + flush-interval aggregation.

Reference semantics under test: `receiver/statsdreceiver/internal/
protocol/statsd_parser.go` (grammar, gauge addition, counter sampling,
DogStatsD tags/container/timestamp) and `metric_translator.go`
(counter truncation, weighted summary percentiles)."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.sources.statsd_receiver import (
    parse_statsd_line,
    statsd_datapoints,
    statsd_flush,
)

START, NOW = 1_704_067_200_000_000_000, 1_704_067_260_000_000_000


# ----------------------------------------------------------------- parse


def test_parse_statsd_line_full_grammar():
    p = parse_statsd_line("http.req:12|c|@0.25|#env:prod,region:eu")
    assert p["name"] == "http.req" and p["metric_type"] == "c"
    assert p["value"] == 12.0 and p["sample_rate"] == 0.25
    assert p["attrs"] == {"env": "prod", "region": "eu"}
    assert not p["addition"]

    g = parse_statsd_line("temp:+3.5|g")
    assert g["addition"] and g["value"] == 3.5
    assert parse_statsd_line("temp:-2|g")["addition"]

    c = parse_statsd_line("mem:1|c|c:abc123")
    assert c["attrs"] == {"container.id": "abc123"}

    t = parse_statsd_line("hits:5|c|T1700000000")
    assert t["ts_ns"] == 1_700_000_000 * 10**9

    mt = parse_statsd_line("lat:9|ms", enable_metric_type=True)
    assert mt["attrs"] == {"metric_type": "timing"}

    st = parse_statsd_line("x:1|c|#simple", enable_simple_tags=True)
    assert st["attrs"] == {"simple": ""}

    # empty tag-set part is tolerated (statsd_parser.go:395-399)
    assert parse_statsd_line("x:1|c|#")["attrs"] == {}


@pytest.mark.parametrize(
    "bad",
    [
        "nopipe",              # no | at all
        "noval|c",             # no <name>:<value>
        ":1|c",                # empty name
        "x:|c",                # empty value
        "x:1|bogus",           # unknown type
        "x:1|c|@fast",         # bad sample rate
        "x:1|c|#:v",           # empty tag key
        "x:1|c|#simple",       # simple tag w/o enable_simple_tags
        "x:1|ms|T1700000000",  # timestamp on a timer
        "x:1|c|Tnot-a-number",
        "x:1|c|junkpart",
        "x:nan-ish|c",
    ],
)
def test_parse_statsd_line_malformed(bad):
    with pytest.raises(ValueError):
        parse_statsd_line(bad)


def test_statsd_datapoints_drops_malformed(spark):
    df = spark.createDataFrame(
        [(0, "a:1|c"), (1, "broken"), (2, "b:2|g")],
        "line_id long, line string",
    )
    got = statsd_datapoints(df).collect()
    assert sorted(r.name for r in got) == ["a", "b"]


# ----------------------------------------------------------------- flush


def _flush(spark, lines, **kw):
    df = spark.createDataFrame(
        [(i, ln) for i, ln in enumerate(lines)], "line_id long, line string"
    )
    return statsd_flush(statsd_datapoints(df), START, NOW, **kw).collect()


def test_counter_aggregation_and_sampling(spark):
    rows = _flush(
        spark,
        ["req:3|c", "req:5|c|@0.5", "req:1|c", "other:7|c|#k:v"],
    )
    by = {(r.name, tuple(sorted((r.attrs or {}).items()))): r for r in rows}
    req = by[("req", ())]
    # 3 + int64(5/0.5) + 1 = 14; counters are delta sums
    assert req.kind == "counter" and req.int_value == 14
    assert req.start_ns == START and req.ts_ns == NOW
    assert by[("other", (("k", "v"),))].int_value == 7


def test_counter_first_timestamp_wins(spark):
    rows = _flush(spark, ["req:1|c|T1700000009", "req:2|c|T1700000044"])
    (r,) = rows
    assert r.int_value == 3
    assert r.ts_ns == 1_700_000_009 * 10**9  # first line's T, not the last


def test_gauge_last_writer_and_additions(spark):
    rows = _flush(
        spark,
        [
            "g1:10|g", "g1:+5|g", "g1:3|g", "g1:-1|g", "g1:+2|g",  # 3-1+2
            "g2:+4|g", "g2:+6|g",  # first line establishes: 4+6
        ],
        timer_observer="disabled",
    )
    by = {r.name: r for r in rows}
    assert by["g1"].kind == "gauge" and by["g1"].double_value == 4.0
    assert by["g2"].double_value == 10.0
    assert by["g1"].ts_ns == NOW


def test_timer_summary_percentiles(spark):
    lines = [f"lat:{v}|ms" for v in (10, 20, 30, 40, 50, 60, 70, 80, 90, 100)]
    (r,) = _flush(spark, lines, timer_observer="summary")
    assert r.kind == "summary"
    assert r["count"] == 10 and r["sum"] == 550.0
    # gonum Empirical: smallest sample with cum weight >= p*total
    assert (r.q0, r.q10, r.q50, r.q90, r.q95, r.q100) == (
        10.0, 10.0, 50.0, 90.0, 100.0, 100.0,
    )


def test_timer_summary_weighted_by_sample_rate(spark):
    (r,) = _flush(
        spark, ["lat:100|ms|@0.25", "lat:200|ms"], timer_observer="summary"
    )
    # weights 4 and 1: count=5, sum=100*4+200*1
    assert r["count"] == 5 and r["sum"] == 600.0
    assert r.q50 == 100.0 and r.q100 == 200.0


def test_timer_gauge_observer_one_point_per_line(spark):
    rows = _flush(spark, ["lat:1|ms", "lat:2|ms"], timer_observer="gauge")
    assert sorted(r.double_value for r in rows) == [1.0, 2.0]
    assert {r.kind for r in rows} == {"timer_gauge"}


def test_histogram_observer_surface(spark):
    rows = _flush(
        spark,
        ["sz:4|h", "sz:8|h", "ign:1|ms"],
        timer_observer="disabled",
        histogram_observer="histogram",
    )
    (r,) = rows  # timers disabled → only the h-type survives
    assert r.kind == "histogram" and r["count"] == 2 and r["sum"] == 12.0


def test_flush_schema_stable_without_summaries(spark):
    """Every observer config yields the same typed flush schema — no
    NullType columns when the summary branch never runs."""
    df = spark.createDataFrame([(0, "a:1|c")], "line_id long, line string")
    out = statsd_flush(statsd_datapoints(df), START, NOW,
                       timer_observer="disabled")
    kinds = dict(out.dtypes)
    assert kinds["q50"] == "double" and kinds["count"] == "bigint"
    assert kinds["sum"] == "double" and kinds["int_value"] == "bigint"
    assert out.collect()[0].kind == "counter"


def test_statsd_live_udp_spool(spark, tmp_path):
    """Live half: the statsd transport reads UDP datagrams and splits
    them on newline (`internal/transport/udp_server.go:89`); the repo's
    udp spool bridge + line reader reproduce exactly that framing, so
    datagrams → spool → statsd_datapoints is the full receiver."""
    import socket
    import time as _t

    from pyspark.sql import functions as F
    from opentelemetry_collector_contrib_spark.sources.readers import (
        read_log_lines,
        udp_spool_listener,
    )

    import glob

    spool = str(tmp_path / "statsd_spool")
    sock, stop2 = udp_spool_listener("127.0.0.1", 0, spool, flush_every=2)
    port = sock.getsockname()[1]
    client = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    client.sendto(b"req:3|c\nreq:4|c", ("127.0.0.1", port))  # multi-metric
    client.sendto(b"req:5|c|@0.5\n", ("127.0.0.1", port))
    client.sendto(b"other:7|c|#k:v", ("127.0.0.1", port))
    deadline = _t.time() + 5
    while _t.time() < deadline and len(glob.glob(f"{spool}/udp-*")) < 2:
        _t.sleep(0.1)
    stop2()
    client.close()

    lines = read_log_lines(spark, spool).select(
        F.col("offset").alias("line_id"), "line"
    )
    flushed = statsd_flush(statsd_datapoints(lines), START, NOW).collect()
    by = {r.name: r for r in flushed}
    assert by["req"].int_value == 3 + 4 + 10  # 5/@0.5 → 10
    assert by["other"].int_value == 7 and by["other"].attrs == {"k": "v"}


def test_flush_rejects_unknown_observer(spark):
    df = spark.createDataFrame([(0, "a:1|c")], "line_id long, line string")
    with pytest.raises(ValueError):
        statsd_flush(statsd_datapoints(df), START, NOW, timer_observer="wat")
