"""carbon + webhookevent receivers.

Reference semantics under test: `receiver/carbonreceiver/protocol/`
(plaintext/regex path parsers, int-first value/timestamp typing) and
`receiver/webhookeventreceiver/req_to_log.go` (line split + query
metadata)."""

import pytest

from opentelemetry_collector_contrib_spark.sources.carbon_receiver import (
    RegexRule,
    carbon_datapoints,
    parse_carbon_line,
)
from opentelemetry_collector_contrib_spark.sources.webhook_receiver import (
    webhook_log_records,
)


# ------------------------------------------------------------------ carbon


def test_carbon_plaintext_grammar():
    p = parse_carbon_line("svc.cpu.seconds 42 1704067200")
    assert p["name"] == "svc.cpu.seconds" and p["kind"] == "gauge"
    assert p["is_int"] and p["int_value"] == 42 and p["double_value"] is None
    assert p["ts_ns"] == 1_704_067_200 * 10**9

    tagged = parse_carbon_line("mem.used;env=prod;dc=eu 1.5 1704067200")
    assert tagged["attrs"] == {"env": "prod", "dc": "eu"}
    assert not tagged["is_int"] and tagged["double_value"] == 1.5

    # k= yields empty value (plaintext_parser.go:66-68)
    assert parse_carbon_line("m;k= 1 1")["attrs"] == {"k": ""}

    # float timestamp: modf seconds/nanos split
    f = parse_carbon_line("m 1 1704067200.5")
    assert f["ts_ns"] == 1_704_067_200 * 10**9 + 500_000_000


@pytest.mark.parametrize(
    "bad",
    [
        "onlytwo 42",                # 2 fields
        "a b c d",                   # 4 fields
        ";env=prod 1 1",             # empty name
        "m;noequals 1 1",            # tag without =
        "m;=v 1 1",                  # separator at position 0
        "m notanumber 1",            # bad value
        "m 1 notatime",              # bad timestamp
        "m 1_0 1",                   # Go rejects _ separators
    ],
)
def test_carbon_malformed(bad):
    with pytest.raises(ValueError):
        parse_carbon_line(bad)


def test_carbon_regex_rules():
    rules = [
        RegexRule(
            r"(?P<key_svc>[^.]+)\.(?P<key_host>[^.]+)\.cpu\.seconds",
            name_prefix="cpu_seconds",
            labels={"k": "v"},
            metric_type="cumulative",
        ),
        RegexRule(
            r"^(?P<key_svc>[^.]+)\.(?P<key_host>[^.]+)\.(?P<name_0>[^.]+)\.(?P<name_1>[^.]+)$"
        ),
    ]
    p = parse_carbon_line("service_name.host00.cpu.seconds 13 1", rules)
    assert p["name"] == "cpu_seconds" and p["kind"] == "cumulative"
    assert p["attrs"] == {"svc": "service_name", "host": "host00", "k": "v"}

    # name_* captures join sorted-by-name onto the (empty) prefix
    q = parse_carbon_line("svc_02.host02.avg.duration 5 1", rules)
    assert q["name"] == "avgduration" and q["kind"] == "gauge"
    assert q["attrs"] == {"svc": "svc_02", "host": "host02"}

    # separator config
    s = parse_carbon_line("svc_02.host02.avg.duration 5 1", rules, "_")
    assert s["name"] == "_avg_duration"

    # no rule matches → plaintext fallback
    f = parse_carbon_line("plain.metric;a=b 7 1", rules)
    assert f["name"] == "plain.metric" and f["attrs"] == {"a": "b"}


def test_carbon_regex_rule_validation():
    with pytest.raises(ValueError):
        RegexRule(r"(?P<bogus_x>a)")
    with pytest.raises(ValueError):
        RegexRule(r"(?P<key_x>a)", metric_type="delta")


def test_carbon_datapoints_spark(spark):
    df = spark.createDataFrame(
        [
            ("a.b 1 1704067200",),
            ("broken",),
            ("c.d;env=prod 2.5 1704067201",),
        ],
        "line string",
    )
    got = {r.name: r for r in carbon_datapoints(df).collect()}
    assert set(got) == {"a.b", "c.d"}
    assert got["a.b"].int_value == 1 and got["a.b"].is_int
    assert got["c.d"].double_value == 2.5
    assert got["c.d"].attrs == {"env": "prod"}


# ----------------------------------------------------------------- webhook


def test_webhook_log_records(spark):
    df = spark.createDataFrame(
        [("evt1\nevt2\nevt3",), ("solo",)], "value string"
    )
    got = webhook_log_records(
        df, query={"source": "gh", "empty": ""}
    ).collect()
    assert sorted(r.body for r in got) == ["evt1", "evt2", "evt3", "solo"]
    r = got[0]
    assert r.resource == {"source": "gh"}  # empty query values dropped
    assert r.scope_name == "otlp/webhookevent"
    assert r.time_unix_nano == 0
