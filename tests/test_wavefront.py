"""wavefront receiver parser.

Reference semantics under test:
`receiver/wavefrontreceiver/wavefront_parser.go` (line grammar, quoted
tag values with the \\"/\\n-only escape rule, omitted timestamps,
int-first typing) and `internal/collectd/labels.go` (bracket-block
label extraction)."""

import pytest

from opentelemetry_collector_contrib_spark.sources.wavefront_receiver import (
    labels_from_name,
    parse_wavefront_line,
    wavefront_datapoints,
)


def test_wavefront_basic_grammar():
    p = parse_wavefront_line("cpu.idle 42 1704067200 source=h1 env=prod")
    assert p["name"] == "cpu.idle" and p["kind"] == "gauge"
    assert p["is_int"] and p["int_value"] == 42
    assert p["ts_ns"] == 1_704_067_200 * 10**9
    assert p["attrs"] == {"source": "h1", "env": "prod"}

    q = parse_wavefront_line('"quoted.name" 1.5 1 source=h')
    assert q["name"] == "quoted.name" and q["double_value"] == 1.5


def test_wavefront_quoted_tag_values_and_escapes():
    p = parse_wavefront_line(
        'm 1 1 source=h msg="hello world" quoted="say \\"hi\\"" nl="a\\nb"'
    )
    assert p["attrs"]["msg"] == "hello world"
    assert p["attrs"]["quoted"] == 'say "hi"'
    assert p["attrs"]["nl"] == "a\nb"


def test_wavefront_omitted_timestamp_pins_zero():
    p = parse_wavefront_line("m 7 source=h1 env=prod")
    assert p["ts_ns"] == 0
    assert p["attrs"] == {"source": "h1", "env": "prod"}


@pytest.mark.parametrize(
    "bad",
    [
        "name 42",                    # <3 fields
        '"" 42 1 source=h',           # empty quoted name
        "m 1 notatime-notag",         # bad ts, not a tag either
        "m 1 1 source=h bad="" x",    # nothing
        "m 1 1 nokey",                # tag without =
        'm 1 1 k="unterminated',      # partially quoted value
        "m notanum 1 source=h",       # bad value
    ],
)
def test_wavefront_malformed(bad):
    with pytest.raises(ValueError):
        parse_wavefront_line(bad)


def test_labels_from_name_and_collectd_extraction():
    assert labels_from_name("name[k=v,f=x]-more") == (
        "name-more",
        {"k": "v", "f": "x"},
    )
    # malformed pair aborts extraction, original name returned
    assert labels_from_name("name[k=v=w]-x") == ("name[k=v=w]-x", {})
    assert labels_from_name("plain") == ("plain", {})

    p = parse_wavefront_line(
        "disk[dev=sda].io[op=read].time 3 1 source=h",
        extract_collectd_tags=True,
    )
    assert p["name"] == "disk.io.time"
    assert p["attrs"] == {"dev": "sda", "op": "read", "source": "h"}


def test_wavefront_datapoints_spark(spark):
    df = spark.createDataFrame(
        [
            ("a.b 1 1704067200 source=h0",),
            ("broken",),
            ("c.d 2.5 1704067201 source=h1 env=prod",),
        ],
        "line string",
    )
    got = {r.name: r for r in wavefront_datapoints(df).collect()}
    assert set(got) == {"a.b", "c.d"}
    assert got["a.b"].int_value == 1
    assert got["c.d"].double_value == 2.5
    assert got["c.d"].attrs == {"source": "h1", "env": "prod"}
