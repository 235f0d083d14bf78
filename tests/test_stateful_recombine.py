"""Streaming stateful recombine: segments assemble across micro-batches."""

import time

import pytest
from pyspark.sql import types as T

from opentelemetry_collector_contrib_spark.streaming.stateful_recombine import (
    stateful_recombine,
)

SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("line", T.StringType()),
    ]
)


def _write_batch(spark, d, name, rows):
    # flat append: the file stream source only discovers files directly in
    # the watched directory, not nested batch subdirectories
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(d)


def test_cross_batch_assembly(spark, tmp_path):
    src_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    # batch 1: entry A starts and continues; no second boundary yet
    _write_batch(
        spark, src_dir, "b1",
        [("s1", 0, "START a"), ("s1", 1, "cont a1"), ("s1", 2, "cont a2")],
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    combined = stateful_recombine(stream, r"^START", combine_with="|", flush_timeout_ms=12000)
    q = (
        combined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        time.sleep(3)
        # batch 2 arrives before the flush timeout: its boundary flushes
        # the pending entry A; entry B then only flushes via timeout
        _write_batch(spark, src_dir, "b2", [("s1", 3, "START b"), ("s1", 4, "cont b1")])
        deadline = time.time() + 60
        seen = set()
        while time.time() < deadline:
            try:
                rows = spark.read.parquet(out_dir).collect()
                seen = {(r.combined, r.flushed_by) for r in rows}
                if any(c.startswith("START a") for c, _ in seen) and any(
                    c.startswith("START b") for c, _ in seen
                ):
                    break
            except Exception:
                pass
            time.sleep(1)
    finally:
        q.stop()

    combos = {c for c, _ in seen}
    # entry A assembled across state (flushed when B's boundary arrived)
    assert "START a|cont a1|cont a2" in combos
    # entry B flushed by the processing-time timeout (no further boundary)
    assert "START b|cont b1" in combos
    by = dict((c, f) for c, f in seen)
    assert by["START a|cont a1|cont a2"] == "boundary"
    assert by["START b|cont b1"] == "timeout"
