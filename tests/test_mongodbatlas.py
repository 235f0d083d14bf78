"""mongodbatlasreceiver (log + audit paths).

Reference semantics under test: `receiver/mongodbatlasreceiver/
log_decoder.go` (JSON + 4.2 console decode, skip-malformed),
`mongodb_event_to_logdata.go` (severity table, attribute set,
resource attrs, exact-3-digit timestamp layouts)."""

import json

from opentelemetry_collector_contrib_spark.sources.mongodbatlas_receiver import (
    SEVERITY_MAP,
    mongodb_audit_records,
    mongodb_log_records,
    parse_atlas_timestamp,
)

TS = "2024-01-01T00:16:40.123+00:00"
TS_NS = (1704067200 + 1000) * 10**9 + 123 * 10**6


def test_timestamp_layouts():
    assert parse_atlas_timestamp(TS) == TS_NS
    # console layout: no colon in the offset
    assert parse_atlas_timestamp("2024-01-01T00:16:40.123+0000", "4.2") \
        == TS_NS
    assert parse_atlas_timestamp("2024-01-01T01:16:40.123+01:00") == TS_NS
    # Go's .000 layout demands exactly 3 fraction digits
    assert parse_atlas_timestamp("2024-01-01T00:16:40.1+00:00") == 0
    assert parse_atlas_timestamp("2024-01-01T00:16:40+00:00") == 0
    assert parse_atlas_timestamp("garbage") == 0


def test_severity_table():
    assert SEVERITY_MAP == {
        "F": 21, "E": 17, "W": 13, "I": 9, "D": 5,
        "D1": 5, "D2": 6, "D3": 7, "D4": 8, "D5": 8,
    }


def _line(**over):
    d = {
        "t": {"$date": TS}, "s": "I", "c": "NETWORK", "id": 22943,
        "ctx": "conn1", "msg": "connection accepted",
        "attr": {"remote": "1.2.3.4:27017", "connectionCount": 5},
    }
    d.update(over)
    return json.dumps(d)


def test_json_log_records(spark):
    lines = [
        (_line(),),
        (_line(s="X"),),          # unknown severity → unset
        ("not json",),            # skipped
        (_line(id="oops"),),      # type mismatch → line skipped
    ]
    df = spark.createDataFrame(lines, "value string")
    rows = mongodb_log_records(
        df, org="o1", project="p1", cluster="c1", region="r1",
        provider="AWS", hostname="h1", log_name="mongodb.gz",
        observed_ns=7,
    ).collect()
    assert len(rows) == 2
    r = rows[0]
    assert r["time_unix_nano"] == TS_NS
    assert r["severity_number"] == 9 and r["severity_text"] == "I"
    assert r["body"] == _line()
    assert r["attributes"]["message"] == "connection accepted"
    assert r["attributes"]["component"] == "NETWORK"
    assert r["attributes"]["context"] == "conn1"
    assert r["attributes"]["id"] == "22943"
    assert r["attributes"]["remote"] == "1.2.3.4:27017"
    assert r["attributes"]["connectionCount"] == "5"
    assert r["attributes"]["log_name"] == "mongodb.gz"
    assert r["resource"]["mongodb_atlas.org"] == "o1"
    assert r["resource"]["mongodb_atlas.host.name"] == "h1"
    assert rows[1]["severity_number"] == 0
    assert rows[1]["severity_text"] == ""


def test_console_42_records(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-01T00:16:40.123+0000 I NETWORK  [conn1] ok",),
            ("no match here",),
        ],
        "value string",
    )
    rows = mongodb_log_records(
        df, org="o", project="p", cluster="c", version="4.2",
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["time_unix_nano"] == TS_NS
    assert r["attributes"]["component"] == "NETWORK"
    assert r["attributes"]["context"] == "conn1"
    assert r["attributes"]["message"] == "ok"
    assert "id" not in r["attributes"]  # not present on 4.2


def test_audit_records(spark):
    entry = {
        "atype": "authenticate", "ts": {"$date": TS},
        "uuid": {"$binary": "abc=", "$type": "04"},
        "local": {"ip": "127.0.0.1", "port": 27017},
        "remote": {"isSystemUser": True, "unix": "/tmp/x.sock"},
        "users": [{"user": "u1", "db": "admin"}],
        "roles": [{"role": "readWrite", "db": "test"}],
        "result": 0, "param": {"mechanism": "SCRAM-SHA-256"},
    }
    df = spark.createDataFrame(
        [(json.dumps(entry),), ("broken",)], "value string"
    )
    rows = mongodb_audit_records(
        df, org="o", project="p", cluster="c", observed_ns=9
    ).collect()
    assert len(rows) == 1
    a = rows[0]["attributes"]
    assert rows[0]["severity_number"] == 9
    assert rows[0]["severity_text"] == "INFO"
    assert a["atype"] == "authenticate"
    assert a["local.ip"] == "127.0.0.1" and a["local.port"] == "27017"
    assert a["remote.isSystemUser"] == "true"
    assert a["remote.unix"] == "/tmp/x.sock"
    assert a["uuid.binary"] == "abc=" and a["uuid.type"] == "04"
    assert a["result"] == "0"
    assert a["param"] == '{"mechanism":"SCRAM-SHA-256"}'
    assert a["users"] == '[{"db":"admin","user":"u1"}]'
    assert a["roles"] == '[{"db":"test","role":"readWrite"}]'
