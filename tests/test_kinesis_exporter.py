"""awskinesisexporter.

Reference semantics under test: `exporter/awskinesisexporter/internal/
batch/` (per-ResourceLogs marshal, AddRecord validation, 500-record
chunking with clamps) and `internal/compress/` (BestSpeed formats)."""

import gzip
import zlib

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.kinesis_exporter import (
    MAX_BATCHED_RECORDS,
    compress_record,
    kinesis_put_records,
)

TS = 1704067200_000000000


def test_compress_roundtrip():
    data = b"hello kinesis " * 100
    assert compress_record(data, "none") == data
    assert gzip.decompress(compress_record(data, "gzip")) == data
    assert zlib.decompress(compress_record(data, "zlib")) == data
    assert (
        zlib.decompress(compress_record(data, "flate"), wbits=-15) == data
    )


def _records(spark, n_resources=5, rows_per=4):
    rows = [
        (
            TS + i * 10**9,
            f"m{i}-{r}",
            9,
            "Info",
            {"k": str(i)},
            {"team": f"t{r}"},
            "scope",
            "", "",
        )
        for r in range(n_resources)
        for i in range(rows_per)
    ]
    return spark.createDataFrame(
        rows,
        "time_unix_nano long, body string, severity_number int, "
        "severity_text string, attributes map<string,string>, "
        "resource map<string,string>, scope_name string, "
        "trace_id string, span_id string",
    )


def test_put_records_chunking_and_roundtrip(spark):
    from opentelemetry_collector_contrib_spark.sources.readers import (
        parse_otlp_json,
    )

    recs = kinesis_put_records(
        _records(spark), max_records_per_batch=2
    )
    got = recs.collect()
    assert len(got) == 5  # one record per resource group
    assert sorted(r["chunk_id"] for r in got) == [0, 0, 1, 1, 2]
    assert all(len(r["partition_key"]) == 32 for r in got)
    assert all(r["size"] == len(r["data"]) for r in got)

    # decode the record bytes back: full row set must survive
    back = parse_otlp_json(
        recs.select(F.col("data").cast("string").alias("value")),
        json_col="value",
    )
    assert back.count() == 20
    assert back.where(F.col("resource")["team"] == "t3").count() == 4


def test_put_records_drops_oversized(spark):
    # a 1KB body with a 100-byte record cap → the whole resource's
    # record is skipped (AddRecord error path), others survive
    df = _records(spark, n_resources=2, rows_per=1)
    big = df.withColumn(
        "body",
        F.when(F.col("resource")["team"] == "t0",
               F.lit("x" * 1024)).otherwise(F.col("body")),
    )
    got = kinesis_put_records(big, max_record_size=400).collect()
    assert len(got) == 1
    assert got[0]["size"] <= 400


def test_batch_clamps(spark):
    recs = kinesis_put_records(
        _records(spark, n_resources=3, rows_per=1),
        max_records_per_batch=10**6,  # clamped to 500
    ).collect()
    assert MAX_BATCHED_RECORDS == 500
    assert all(r["chunk_id"] == 0 for r in recs)


def test_otlp_proto_encoding_roundtrip(spark):
    from opentelemetry_collector_contrib_spark.functions.otlp_proto import (
        decode_logs,
    )

    got = kinesis_put_records(
        _records(spark, n_resources=2, rows_per=3), encoding="otlp_proto"
    ).collect()
    assert len(got) == 2
    rows = decode_logs(bytes(got[0]["data"]))
    assert len(rows) == 3
