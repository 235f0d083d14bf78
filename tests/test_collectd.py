"""collectd receiver.

Reference semantics under test: `receiver/collectdreceiver/collectd.go`
(per-dsname datapoints, event skip, shared-label build-up with
per-point snapshots, json.Number int-first typing, name assembly) and
`receiver.go:145-160` (prefixed query params as default attributes)."""

import json

import pytest

from opentelemetry_collector_contrib_spark.sources.collectd_receiver import (
    collectd_datapoints,
    parse_collectd_body,
)


def _rec(**kw):
    base = {
        "dsnames": ["value"],
        "dstypes": ["gauge"],
        "values": [42],
        "host": "h1",
        "plugin": "cpu",
        "time": 1704067200,
        "interval": 10,
        "type": "load",
    }
    base.update(kw)
    return base


def test_single_dsname_becomes_attribute():
    (dp,) = parse_collectd_body(json.dumps([_rec(type_instance="avg")]))
    assert dp["name"] == "load.avg"
    assert dp["attrs"]["dsname"] == "value"  # single dsname → label
    assert dp["attrs"]["plugin"] == "cpu" and dp["attrs"]["host"] == "h1"
    assert dp["is_int"] and dp["int_value"] == 42
    assert dp["ts_ns"] == 1_704_067_200 * 10**9


def test_multi_dsname_joins_name_and_labels_accumulate():
    dps = parse_collectd_body(
        json.dumps(
            [
                _rec(
                    dsnames=["rx", "tx"],
                    dstypes=["derive", "derive"],
                    values=[1, "2.5"],
                    type="if_octets",
                )
            ]
        )
    )
    assert [d["name"] for d in dps] == ["if_octets.rx", "if_octets.tx"]
    assert all(d["kind"] == "cumulative" for d in dps)
    assert dps[0]["int_value"] == 1
    assert dps[1]["double_value"] == 2.5 and not dps[1]["is_int"]
    # multi dsname → no dsname attribute
    assert "dsname" not in dps[0]["attrs"]


def test_type_instance_bracket_extraction_and_event_skip():
    body = json.dumps(
        [
            _rec(type_instance="avg[k=v]"),
            {  # event: time+severity+message → ignored
                "time": 1,
                "severity": "warning",
                "message": "oops",
            },
        ]
    )
    dps = parse_collectd_body(body)
    assert len(dps) == 1
    assert dps[0]["name"] == "load.avg"
    assert dps[0]["attrs"]["k"] == "v"


def test_plugin_instance_and_host_bracket_extraction():
    (dp,) = parse_collectd_body(
        json.dumps(
            [_rec(plugin_instance="core0[dc=eu]", host="web[rack=r1]")]
        )
    )
    assert dp["attrs"]["plugin_instance"] == "core0"
    assert dp["attrs"]["dc"] == "eu"
    assert dp["attrs"]["host"] == "web"
    assert dp["attrs"]["rack"] == "r1"


def test_default_attrs_and_missing_time():
    (dp,) = parse_collectd_body(
        json.dumps([_rec(time=None)]), {"env": "prod"}
    )
    assert dp["ts_ns"] == 0 and dp["attrs"]["env"] == "prod"


def test_malformed_bodies_raise():
    with pytest.raises(ValueError):
        parse_collectd_body('{"not": "an array"}')
    with pytest.raises(ValueError):
        parse_collectd_body("[1, 2]")
    with pytest.raises(json.JSONDecodeError):
        parse_collectd_body("[{")


def test_collectd_datapoints_spark(spark):
    df = spark.createDataFrame(
        [(json.dumps([_rec()]),), (json.dumps([_rec(type="mem")]),)],
        "value string",
    )
    got = sorted(
        collectd_datapoints(df, default_attrs={"dc": "eu"}).collect(),
        key=lambda r: r.name,
    )
    assert [r.name for r in got] == ["load", "mem"]
    assert got[0].attrs["dc"] == "eu"
    assert got[0].int_value == 42
