"""prometheusexporter text-exposition parity tests — goldens built from
`exporter/prometheusexporter/collector.go` + client_golang expfmt
semantics.
"""

from opentelemetry_collector_contrib_spark.operators.metrics import (
    histogram_buckets,
)
from opentelemetry_collector_contrib_spark.operators.prometheus_exporter import (
    build_compliant_name,
    escape_label_value,
    prometheus_histogram_lines,
    prometheus_series_lines,
    prometheus_text,
)


def test_name_and_escaping():
    assert build_compliant_name("log.record.count") == "log_record_count"
    assert build_compliant_name("9count") == "_9count"
    assert build_compliant_name("count", "otel") == "otel_count"
    assert build_compliant_name("a:b") == "a:b"  # colon allowed
    assert escape_label_value('a"b\\c\nd') == 'a\\"b\\\\c\\nd'


def test_series_lines(spark):
    df = spark.createDataFrame(
        [("error", "svc1", 3), ("info", "svc2", 41)],
        "severity_text string, source string, n long",
    )
    lines = sorted(
        r["line"]
        for r in prometheus_series_lines(
            df, "log.record.count", label_cols=["severity_text", "source"],
            value_col="n", const_labels={"exporter": "otel"},
        ).collect()
    )
    assert lines == [
        'log_record_count{exporter="otel",severity_text="error",source="svc1"} 3',
        'log_record_count{exporter="otel",severity_text="info",source="svc2"} 41',
    ]
    # full block with headers, series sorted
    txt = prometheus_text(
        df, "log.record.count", help_text="records seen",
        label_cols=["severity_text"], value_col="n",
    )
    assert txt.startswith(
        "# HELP log_record_count records seen\n"
        "# TYPE log_record_count counter\n"
        'log_record_count{severity_text="error"} 3\n'
    )


def test_label_value_escaping_spark(spark):
    df = spark.createDataFrame(
        [('quo"te\\slash', 1)], "k string, value long"
    )
    line = prometheus_series_lines(df, "m", label_cols=["k"]).collect()[0][
        "line"
    ]
    assert line == 'm{k="quo\\"te\\\\slash"} 1'


def test_histogram_lines(spark):
    df = spark.createDataFrame(
        [("a", 0.3), ("a", 0.7), ("a", 5.0), ("b", 0.1)],
        "route string, latency double",
    )
    wide = histogram_buckets(df, ["route"], "latency", [0.5, 1.0])
    lines = sorted(
        r["line"]
        for r in prometheus_histogram_lines(
            wide, "latency", dims=["route"], bounds=[0.5, 1.0]
        ).collect()
    )
    assert lines == [
        'latency_bucket{le="+Inf",route="a"} 3',
        'latency_bucket{le="+Inf",route="b"} 1',
        'latency_bucket{le="0.5",route="a"} 1',
        'latency_bucket{le="0.5",route="b"} 1',
        'latency_bucket{le="1",route="a"} 2',
        'latency_bucket{le="1",route="b"} 1',
        'latency_count{route="a"} 3',
        'latency_count{route="b"} 1',
        'latency_sum{route="a"} 6',
        'latency_sum{route="b"} 0.1',
    ]
