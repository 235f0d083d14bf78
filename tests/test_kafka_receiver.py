"""kafkareceiver unmarshaling parity — goldens hand-built from
`receiver/kafkareceiver/{raw,text,json}_unmarshaler.go` and
`header_extraction.go`, plus exporter→receiver round trips (the receiver
is `operators.kafka_exporter`'s inverse for otlp_proto / otlp_json).
"""

import pytest
from pyspark.sql import functions as F, types as T

from opentelemetry_collector_contrib_spark.operators.kafka_exporter import (
    kafka_messages,
)
from opentelemetry_collector_contrib_spark.sources.kafka_receiver import (
    kafka_log_records,
)

NS = 1_000_000_000


def _flat_df(spark, n=20):
    return spark.range(n).select(
        (
            (F.lit(1704067200).cast("long") + F.col("id").cast("long"))
            * F.lit(NS).cast("long")
        ).alias("time_unix_nano"),
        (F.col("id") % 24 + 1).cast("int").alias("severity_number"),
        F.lit("INFO").alias("severity_text"),
        F.concat(F.lit("msg "), F.col("id")).alias("body"),
        F.create_map(F.lit("k"), (F.col("id") % 3).cast("string")).alias(
            "attributes"
        ),
        F.create_map(
            F.lit("service.name"),
            F.concat(F.lit("svc"), (F.col("id") % 2).cast("string")),
        ).alias("resource"),
        F.lit("recv/otlp").alias("scope_name"),
        F.lpad(F.lower(F.conv(F.col("id").cast("string"), 10, 16)), 32, "0")
        .alias("trace_id"),
        F.lpad(F.lower(F.conv(F.col("id").cast("string"), 10, 16)), 16, "0")
        .alias("span_id"),
    )


def _values_df(spark, payloads, headers=None):
    """(value binary[, headers map<string,string>]) message rows."""
    if headers is None:
        return spark.createDataFrame(
            [(bytearray(p),) for p in payloads],
            T.StructType([T.StructField("value", T.BinaryType())]),
        )
    return spark.createDataFrame(
        [(bytearray(p), h) for p, h in zip(payloads, headers)],
        T.StructType(
            [
                T.StructField("value", T.BinaryType()),
                T.StructField(
                    "headers", T.MapType(T.StringType(), T.StringType())
                ),
            ]
        ),
    )


def _key(r):
    return (r["trace_id"], r["span_id"], r["time_unix_nano"], r["body"])


def test_otlp_proto_roundtrip(spark):
    flat = _flat_df(spark)
    msgs = kafka_messages(flat, "t", encoding="otlp_proto")
    back = kafka_log_records(msgs, "otlp_proto")
    orig = sorted((r.asDict(True) for r in flat.collect()), key=_key)
    got = sorted((r.asDict(True) for r in back.collect()), key=_key)
    assert got == orig


def test_otlp_json_roundtrip(spark):
    flat = _flat_df(spark)
    msgs = kafka_messages(flat, "t", encoding="otlp_json")
    back = kafka_log_records(msgs, "otlp_json")
    orig = sorted((r.asDict(True) for r in flat.collect()), key=_key)
    got = sorted((r.asDict(True) for r in back.collect()), key=_key)
    assert got == orig


def test_raw_one_record_per_message_bytes_body(spark):
    # raw_unmarshaler.go:16-20: body = the message bytes, nothing else
    payloads = [b"hello", b"\x00\xffbin", b""]
    out = kafka_log_records(_values_df(spark, payloads), "raw").collect()
    assert sorted(bytes(r["body"]) for r in out) == sorted(payloads)
    assert all(r["resource"] == {} for r in out)


def test_text_decodes_charset(spark):
    # text_unmarshaler.go:23-37: body = charset-decoded string
    out = kafka_log_records(
        _values_df(spark, ["caf\xe9".encode("latin-1")]),
        "text",
        text_encoding="latin-1",
    ).collect()
    assert out[0]["body"] == "caf\xe9"
    utf = kafka_log_records(
        _values_df(spark, ["日本".encode()]), "text"
    ).collect()
    assert utf[0]["body"] == "日本"


def test_json_object_body_map(spark):
    # json_unmarshaler.go:20-39: body = the parsed JSON object as a map
    out = kafka_log_records(
        _values_df(spark, [b'{"a": 1, "b": "x"}']), "json"
    ).collect()
    assert out[0]["body"] == {"a": "1", "b": "x"}


def test_json_non_object_raises(spark):
    # jsoniter.Unmarshal into map[string]any errors on arrays/scalars
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        kafka_log_records(_values_df(spark, [b"[1,2]"]), "json").collect()
    assert isinstance(ei.value, Py4JJavaError) or "JSON object" in str(
        ei.value
    )


def test_header_extraction_map_shape(spark):
    # header_extraction.go:45-57: kafka.header.<key> on every resource
    out = kafka_log_records(
        _values_df(spark, [b"x"], headers=[{"tenant": "acme", "skip": "y"}]),
        "raw",
        header_keys=("tenant", "absent"),
    ).collect()
    assert out[0]["resource"] == {"kafka.header.tenant": "acme"}


def test_header_extraction_array_struct_shape(spark):
    # Spark kafka-source shape: array<struct<key string, value binary>>
    schema = T.StructType(
        [
            T.StructField("value", T.BinaryType()),
            T.StructField(
                "headers",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("key", T.StringType()),
                            T.StructField("value", T.BinaryType()),
                        ]
                    )
                ),
            ),
        ]
    )
    df = spark.createDataFrame(
        [(bytearray(b"x"), [("tenant", bytearray(b"acme"))])], schema
    )
    out = kafka_log_records(df, "raw", header_keys=("tenant",)).collect()
    assert out[0]["resource"] == {"kafka.header.tenant": "acme"}


def test_header_extraction_on_otlp_resources(spark):
    # headers land on EVERY resource of the message (header_extraction.go:52-56)
    flat = _flat_df(spark, n=6)
    msgs = kafka_messages(flat, "t", encoding="otlp_proto").withColumn(
        "headers",
        F.create_map(F.lit("origin"), F.lit("dc1")),
    )
    out = kafka_log_records(
        msgs, "otlp_proto", header_keys=("origin",)
    ).collect()
    assert len(out) == 6
    assert all(r["resource"]["kafka.header.origin"] == "dc1" for r in out)
    assert all("service.name" in r["resource"] for r in out)


def test_unknown_encoding_raises(spark):
    with pytest.raises(ValueError):
        kafka_log_records(_values_df(spark, [b"x"]), "zipkin")
