"""datasetexporter (log path).

Reference semantics under test: `exporter/datasetexporter/
logs_exporter.go` (severity bucket + text fallback tables, ts
fallback chain, attr set) and `datasetexporter.go:89-168`
(prefixed flatten w/ collision suffix, inferServerHost chain)."""

from opentelemetry_collector_contrib_spark.operators.dataset_exporter import (
    build_dataset_event,
    dataset_events,
    map_severity_number,
    map_severity_text,
    update_with_prefixed_values,
)

TS = 1704067200_000000000


def test_severity_tables():
    assert [map_severity_number(n) for n in (1, 4, 5, 9, 13, 17, 21, 24)] \
        == [1, 1, 2, 3, 4, 5, 6, 6]
    assert map_severity_number(0) == 3 and map_severity_number(99) == 3
    assert map_severity_text("FINEST") == 0
    assert map_severity_text("Warning") == 4
    assert map_severity_text("emergency") == 6
    assert map_severity_text("whatever") == 3


def test_flatten_and_collision_suffix():
    t = {}
    update_with_prefixed_values(
        t, "", ".", "_", {"a": {"b": 1, "c": [10, 20]}, "d": "x"}
    )
    assert t == {"a.b": 1, "a.c.0": 10, "a.c.1": 20, "d": "x"}
    # collision: the new value lands under key + suffix
    t2 = {"k": "old"}
    update_with_prefixed_values(t2, "k", ".", "_", "new")
    assert t2 == {"k": "old", "k_": "new"}


def test_event_build_ts_chain_and_server_host():
    ev = build_dataset_event(
        {
            "time_unix_nano": TS, "observed_time_unix_nano": TS + 1,
            "severity_number": 17, "body": "boom",
            "trace_id": "ab" * 16, "span_id": "cd" * 8,
            "attributes": {"k": "v"},
            "resource": {"host.name": "h9"},
            "scope_name": "lib", "scope_attributes": {"s": "1"},
        },
    )
    assert ev["ts"] == str(TS) and ev["sev"] == 5
    assert ev["server_host"] == "h9"
    assert ev["log_id"] == "LL" and ev["thread_id"] == "TL"
    a = ev["attrs"]
    assert a["message"] == "boom"
    assert a["sca:observedTime"] == str(TS + 1)
    assert a["trace_id"] == "ab" * 16 and a["span_id"] == "cd" * 8
    assert a["scope.name"] == "lib" and a["scope.attributes.s"] == "1"
    assert a["k"] == "v"
    assert "resource.attributes.host.name" not in a  # off by default

    # zero ts → observed; zero both → now; serverHost attr wins
    ev2 = build_dataset_event(
        {"observed_time_unix_nano": 7,
         "attributes": {"serverHost": "attr-host"}},
        server_host="cfg-host",
    )
    assert ev2["ts"] == "7" and ev2["server_host"] == "attr-host"
    ev3 = build_dataset_event({}, server_host="cfg-host", now_ns=55)
    assert ev3["ts"] == "55" and ev3["server_host"] == "cfg-host"
    assert ev3["sev"] == 3 and "message" not in ev3["attrs"]

    # text fallback applies only when the number is 0
    ev4 = build_dataset_event({"severity_text": "trace"})
    assert ev4["sev"] == 1


def test_dataset_events_spark(spark):
    df = spark.createDataFrame(
        [(TS, "m", 9, {"k": "v"}, {"host.name": "h"})],
        "time_unix_nano long, body string, severity_number int, "
        "attributes map<string,string>, resource map<string,string>",
    )
    rows = dataset_events(df, export_scope_info=False).collect()
    assert rows[0]["sev"] == 3 and rows[0]["server_host"] == "h"
    assert rows[0]["attrs"]["message"] == "m"
