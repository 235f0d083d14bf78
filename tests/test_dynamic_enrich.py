"""k8sattributes dynamic-store streaming enrich: rows before/after a
lookup mutation must enrich differently (watch-fed store analog,
`processor/k8sattributesprocessor/internal/kube/client.go:373`)."""

import os

from pyspark.sql import functions as F, types as T

from opentelemetry_collector_contrib_spark.streaming.dynamic_enrich import (
    run_dynamic_enrich,
)

_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("source", T.StringType()),
    ]
)

_LUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("team", T.StringType()),
        T.StructField("pod", T.StringType()),
    ]
)


def _write_lut(spark, path, version):
    rows = [
        ("src0", f"team-a-{version}", f"pod-0-{version}"),
        ("src1", f"team-b-{version}", f"pod-1-{version}"),
    ]
    spark.createDataFrame(rows, _LUT_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)


def test_lut_mutation_between_batches(spark, tmp_path):
    inp = str(tmp_path / "in")
    lut = str(tmp_path / "lut")
    out = str(tmp_path / "out")
    os.makedirs(inp, exist_ok=True)

    # wave 1: ids 0..9, store version v1
    spark.createDataFrame(
        [(i, f"src{i % 2}") for i in range(10)], _SCHEMA
    ).coalesce(1).write.mode("append").parquet(inp)
    _write_lut(spark, lut, "v1")
    run_dynamic_enrich(spark, inp, lut, out, schema=_SCHEMA)

    # the watch fires: store mutates, THEN wave 2 arrives (ids 10..19)
    _write_lut(spark, lut, "v2")
    spark.createDataFrame(
        [(i, f"src{i % 2}") for i in range(10, 20)], _SCHEMA
    ).coalesce(1).write.mode("append").parquet(inp)
    run_dynamic_enrich(spark, inp, lut, out, schema=_SCHEMA)

    got = spark.read.parquet(f"{out}/data")
    assert got.count() == 20
    # wave-1 rows saw v1 metadata, wave-2 rows saw v2 — per-row, not global
    v_of = {
        r["id"]: (r["team"], r["pod"]) for r in got.collect()
    }
    for i in range(10):
        assert v_of[i] == (f"team-{'ab'[i % 2]}-v1", f"pod-{i % 2}-v1")
    for i in range(10, 20):
        assert v_of[i] == (f"team-{'ab'[i % 2]}-v2", f"pod-{i % 2}-v2")
    # exactly-once across the two drains: no wave-1 row re-enriched
    assert got.where(F.col("id") < 10).where(
        F.col("team").endswith("v2")
    ).count() == 0


def test_lut_miss_yields_nulls(spark, tmp_path):
    inp = str(tmp_path / "in2")
    lut = str(tmp_path / "lut2")
    out = str(tmp_path / "out2")
    spark.createDataFrame(
        [(1, "src0"), (2, "src-unknown")], _SCHEMA
    ).coalesce(1).write.mode("append").parquet(inp)
    _write_lut(spark, lut, "v1")
    run_dynamic_enrich(spark, inp, lut, out, schema=_SCHEMA)
    got = {r["id"]: r["team"] for r in spark.read.parquet(f"{out}/data").collect()}
    assert got[1] == "team-a-v1"
    assert got[2] is None  # GetPod miss → null enrich columns
