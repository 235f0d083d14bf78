"""awscloudwatchlogsexporter.

Reference semantics under test: `exporter/awscloudwatchlogsexporter/
exporter.go` (cwLogBody field order + omitempty, raw/EMF destination
override) and `internal/aws/cwlogs/pusher.go` (validate/truncate/
drop-window, per-stream batching with the 256 KiB byte-cap quirk,
24 h spread, stable timestamp sort)."""

import json

from opentelemetry_collector_contrib_spark.operators.cwlogs_exporter import (
    DEFAULT_MAX_EVENT_BYTES,
    PER_EVENT_HEADER_BYTES,
    TRUNCATED_SUFFIX,
    assign_cwlog_batches,
    cwlog_body_json,
    cwlog_events,
    put_log_events_inputs,
    resolve_emf_destination,
    validate_cwlog_event,
)

NOW_MS = 1704067200000


# -------------------------------------------------------------- marshal


def test_body_json_field_order_and_omitempty():
    msg = cwlog_body_json(
        {
            "body": "hello <&>",
            "severity_number": 9,
            "severity_text": "Info",
            "dropped_attributes_count": 0,   # omitted
            "flags": 1,
            "trace_id": "0102" * 8,
            "span_id": "",                   # omitted
            "attributes": {"b": "2", "a": 1},
            "scope_name": "lib",
            "scope_version": "1.0",
            "resource": {"team": "core"},
        }
    )
    assert msg == (
        '{"body":"hello \\u003c\\u0026\\u003e",'
        '"severity_number":9,"severity_text":"Info","flags":1,'
        '"trace_id":"' + "0102" * 8 + '",'
        '"attributes":{"a":1,"b":"2"},'
        '"scope":{"name":"lib","version":"1.0"},'
        '"resource":{"team":"core"}}'
    )
    # empty-string body is an interface holding "" — NOT omitted
    assert cwlog_body_json({"body": ""}) == '{"body":""}'
    # nil body, zero severities, no scope when name empty
    assert cwlog_body_json({"scope_version": "9"}) == "{}"


def test_emf_destination_resolution():
    g, s = resolve_emf_destination("not json", "G", "S")
    assert (g, s) == ("G", "S")
    v1 = json.dumps({"_aws": {"logGroupName": "g1", "logStreamName": "s1"},
                     "log_group_name": "g0"})
    assert resolve_emf_destination(v1, "G", "S") == ("g1", "s1")
    v1_nostream = json.dumps({"_aws": {"logGroupName": "g1"}})
    assert resolve_emf_destination(v1_nostream, "G", "S") == ("g1", "S")
    v0 = json.dumps({"log_group_name": "g0", "log_stream_name": "s0"})
    assert resolve_emf_destination(v0, "G", "S") == ("g0", "s0")
    # wrong-typed field = Go Unmarshal error = not EMF
    bad = json.dumps({"_aws": {"logGroupName": 5}})
    assert resolve_emf_destination(bad, "G", "S") == ("G", "S")
    assert resolve_emf_destination('"just a string"', "G", "S") == ("G", "S")


# ------------------------------------------------------------- validate


def test_validate_truncation_zero_ts_and_window():
    big = "x" * DEFAULT_MAX_EVENT_BYTES
    msg, ts = validate_cwlog_event(big, NOW_MS, NOW_MS)
    assert msg.endswith(TRUNCATED_SUFFIX)
    assert (
        len(msg.encode()) + PER_EVENT_HEADER_BYTES == DEFAULT_MAX_EVENT_BYTES
    )
    # zero timestamp → generated time (which then faces the same window)
    assert validate_cwlog_event(
        "m", 0, NOW_MS, generated_time_ms=NOW_MS - 5
    ) == ("m", NOW_MS - 5)
    assert validate_cwlog_event("m", 0, NOW_MS, generated_time_ms=42) is None
    # empty message dropped
    assert validate_cwlog_event("", NOW_MS, NOW_MS) is None
    # older than 14 days / >2h future dropped; boundaries kept
    day14 = 14 * 24 * 3600 * 1000
    assert validate_cwlog_event("m", NOW_MS - day14 - 1, NOW_MS) is None
    assert validate_cwlog_event("m", NOW_MS - day14, NOW_MS) is not None
    two_h = 2 * 3600 * 1000
    assert validate_cwlog_event("m", NOW_MS + two_h + 1, NOW_MS) is None
    assert validate_cwlog_event("m", NOW_MS + two_h, NOW_MS) is not None


# ---------------------------------------------------------------- spark


def _records(spark, rows):
    return spark.createDataFrame(
        rows,
        "arrival long, time_unix_nano long, body string, "
        "severity_number int, attributes map<string,string>",
    )


def test_cwlog_events_and_batching(spark):
    ns = NOW_MS * 10**6
    rows = [
        (0, ns, "a", 9, {"k": "v"}),
        (1, ns + 10**6, "b", 0, None),
        (2, (NOW_MS - 15 * 24 * 3600 * 1000) * 10**6, "old", 9, None),
        (3, ns, "c", 5, None),
    ]
    ev = cwlog_events(
        _records(spark, rows), "G", "S", now_ms=NOW_MS
    ).collect()
    assert [e["arrival"] for e in ev] == [0, 1, 3]  # "old" dropped
    assert json.loads(ev[0]["message"]) == {
        "body": "a", "severity_number": 9, "attributes": {"k": "v"},
    }
    assert ev[1]["message"] == '{"body":"b"}'

    batched = assign_cwlog_batches(
        cwlog_events(_records(spark, rows), "G", "S", now_ms=NOW_MS),
        max_batch_events=2,
    )
    got = {r["arrival"]: r for r in batched.collect()}
    assert [got[a]["batch_id"] for a in (0, 1, 3)] == [0, 0, 1]
    # within batch 0, seq follows the stable timestamp sort
    assert got[0]["seq"] == 0 and got[1]["seq"] == 1

    inputs = put_log_events_inputs(batched).collect()
    by_batch = {r["batch_id"]: r for r in inputs}
    assert by_batch[0]["event_count"] == 2
    assert [e["message"] for e in by_batch[0]["log_events"]] == [
        got[0]["message"], got[1]["message"],
    ]
    assert by_batch[0]["byte_total"] == sum(
        len(got[a]["message"].encode()) + PER_EVENT_HEADER_BYTES
        for a in (0, 1)
    )


def test_batching_byte_cap_quirk_and_day_spread(spark):
    # byte cap: three 100-byte messages with a 130-byte cap → the
    # running batch rotates when byteTotal+next exceeds the cap
    msg = "x" * 100
    ev = spark.createDataFrame(
        [("G", "S", i, NOW_MS, msg) for i in range(3)],
        "group_name string, stream_name string, arrival long, "
        "timestamp_ms long, message string",
    )
    got = assign_cwlog_batches(ev, max_batch_bytes=260).collect()
    assert [r["batch_id"] for r in sorted(got, key=lambda r: r["arrival"])] \
        == [0, 0, 1]

    # 24h spread: an event >24h after the batch min starts a new batch
    day = 24 * 3600 * 1000
    ev2 = spark.createDataFrame(
        [
            ("G", "S", 0, NOW_MS, "a"),
            ("G", "S", 1, NOW_MS + day, "b"),          # spread == 24h: kept
            ("G", "S", 2, NOW_MS + day + 1, "c"),      # > 24h: new batch
        ],
        "group_name string, stream_name string, arrival long, "
        "timestamp_ms long, message string",
    )
    got2 = {r["arrival"]: r["batch_id"] for r in
            assign_cwlog_batches(ev2).collect()}
    assert got2 == {0: 0, 1: 0, 2: 1}


def test_raw_mode_emf_routing(spark):
    emf = json.dumps({"_aws": {"logGroupName": "eg", "logStreamName": "es"},
                      "m": 1})
    df = spark.createDataFrame(
        [(0, NOW_MS * 10**6, emf, 0, None),
         (1, NOW_MS * 10**6, "plain", 0, None)],
        "arrival long, time_unix_nano long, body string, "
        "severity_number int, attributes map<string,string>",
    )
    ev = {r["arrival"]: r for r in
          cwlog_events(df, "G", "S", raw_log=True, now_ms=NOW_MS).collect()}
    assert (ev[0]["group_name"], ev[0]["stream_name"]) == ("eg", "es")
    assert ev[0]["message"] == emf  # raw body passes through untouched
    assert (ev[1]["group_name"], ev[1]["stream_name"]) == ("G", "S")
