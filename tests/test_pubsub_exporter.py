"""googlecloudpubsubexporter.

Reference semantics under test: `exporter/googlecloudpubsubexporter/
exporter.go:112-171` (CloudEvents attributes, gzip payload) and
`watermark.go:33-60` (current/earliest with drift floor)."""

import gzip

from opentelemetry_collector_contrib_spark.functions.otlp_proto import (
    decode_logs,
)
from opentelemetry_collector_contrib_spark.operators.pubsub_exporter import (
    ce_time_attr,
    logs_watermark,
    pubsub_messages,
)

TS = 1704067200_000000000


def _df(spark):
    rows = [
        ("b0", TS + 5_000_000_000, "m0"),
        ("b0", TS + 1_000_000_000, "m1"),
        ("b1", TS - 10_000_000_000, "m2"),  # before the drift floor
    ]
    return spark.createDataFrame(
        rows, "batch_key string, time_unix_nano long, body string"
    )


def test_watermark_behaviors(spark):
    proc = TS + 60_000_000_000
    cur = {r["batch_key"]: r["watermark_ns"]
           for r in logs_watermark(_df(spark), "current",
                                   processing_time_ns=proc).collect()}
    assert cur == {"b0": proc, "b1": proc}

    # earliest: min ts, floored at proc - drift, capped at proc
    drift = 65_000_000_000
    early = {r["batch_key"]: r["watermark_ns"]
             for r in logs_watermark(_df(spark), "earliest",
                                     processing_time_ns=proc,
                                     allowed_drift_ns=drift).collect()}
    assert early["b0"] == TS + 1_000_000_000
    assert early["b1"] == proc - drift  # floored


def test_messages_attributes_and_payload(spark):
    msgs = {r["batch_key"]: r
            for r in pubsub_messages(_df(spark), "otelcol/1").collect()}
    m = msgs["b0"]
    assert m["ce_specversion"] == "1.0"
    assert m["ce_source"] == "otelcol/1"
    assert m["ce_type"] == "org.opentelemetry.otlp.logs.v1"
    assert m["content_type"] == "application/protobuf"
    assert m["content_encoding"] == ""
    assert len(m["ce_id"]) == 32
    assert len(decode_logs(bytes(m["data"]))) == 2

    gz = pubsub_messages(_df(spark), "s", compression="gzip").collect()[0]
    assert gz["content_encoding"] == "gzip"
    assert decode_logs(gzip.decompress(bytes(gz["data"])))


def test_ce_time_text():
    assert ce_time_attr(TS) == "2024-01-01T00:00:00Z"
    assert ce_time_attr(TS + 120) == "2024-01-01T00:00:00.00000012Z"
