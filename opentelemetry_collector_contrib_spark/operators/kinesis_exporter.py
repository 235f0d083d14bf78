"""AWS Kinesis exporter parity — log records → PutRecords entries
(marshal per ResourceLogs, compress, validate, chunk).

Reference behavior (`exporter/awskinesisexporter/internal/`):

- one Kinesis record per ResourceLogs slice: the batch marshaller
  copies each resource group into a fresh ``plog.Logs`` and marshals
  it whole (`batch/encode_marshaler.go:29-58`) — encodings for logs
  are otlp_proto / otlp_json (`batch/encode.go`);
- ``AddRecord`` (`batch/batch.go:79-98`): compress first (flate /
  gzip / zlib at BestSpeed, or noop — `compress/compresser.go:31-62`),
  then reject keys of length 0 or > 256 and records of length 0 or
  > 1 MiB (configurable, clamped to 1 MiB); rejected records are
  skipped with a joined error, the rest proceed;
- ``Chunk`` (`batch/batch.go:100-117`): the record list splits into
  PutRecords calls of at most 500 (configurable, clamped to 500)
  preserving order;
- partition key: the reference uses ``uuid.NewString()`` per record
  (`key/key.go:14-16`, `exporter.go` wires key.Randomized).

Divergences (documented):
- the partition key is pinned to ``md5(resource-json)`` hex (32
  chars) — deterministic and rerun-stable while preserving the
  uniform spread a random uuid gives at the shard level; callers can
  supply any other key column;
- record order (and therefore chunk membership) is pinned to the
  sorted (partition_key, scope_name) order — the reference's order
  is Go's resource iteration order, which has no stable meaning over
  a distributed DataFrame;
- Python's zlib/gzip (level 1) emits a valid DEFLATE stream that
  round-trips with Go's output but is not byte-identical (different
  encoder implementations); the ``none`` path is byte-exact.

Spark shape: marshal is the same one-exchange (resource, scope)
groupBy the kafka exporter uses; compress/validate is a zero-shuffle
pandas stage. Chunk assignment orders the marshaled RECORDS (one per
resource group — cardinality = distinct resources, not log rows), a
sink-side assembly whose window over that small set is deliberate.
"""

from __future__ import annotations

import gzip as _gzip
import zlib as _zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from ..functions.otlp_proto import encode_logs

__all__ = [
    "MAX_BATCHED_RECORDS",
    "MAX_RECORD_SIZE",
    "compress_record",
    "kinesis_put_records",
]

MAX_RECORD_SIZE = 1 << 20  # 1 MiB
MAX_BATCHED_RECORDS = 500


def compress_record(data: bytes, fmt: str) -> bytes:
    """`compress/compresser.go:31-84` (BestSpeed levels). ``none`` is
    byte-exact; the deflate family round-trips but is not
    byte-identical to Go's encoder (documented)."""
    if fmt in ("none", "noop"):
        return data
    if fmt == "gzip":
        return _gzip.compress(data, compresslevel=1, mtime=0)
    if fmt == "zlib":
        return _zlib.compress(data, level=1)
    if fmt == "flate":
        co = _zlib.compressobj(level=1, wbits=-15)
        return co.compress(data) + co.flush()
    raise ValueError(f"unknown compression format: {fmt}")


_REC_SCHEMA = T.StructType(
    [
        T.StructField("partition_key", T.StringType()),
        T.StructField("scope_name", T.StringType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("size", T.IntegerType()),
    ]
)


def kinesis_put_records(
    df: DataFrame,
    encoding: str = "otlp_json",
    compression: str = "none",
    max_record_size: int = MAX_RECORD_SIZE,
    max_records_per_batch: int = MAX_BATCHED_RECORDS,
) -> DataFrame:
    """Flat log-record rows → PutRecords entries with chunk assignment:
    (partition_key, scope_name, data, size, chunk_id, seq)."""
    max_record_size = min(max_record_size, MAX_RECORD_SIZE)
    max_records_per_batch = min(max_records_per_batch, MAX_BATCHED_RECORDS)
    if encoding not in ("otlp_json", "otlp_proto"):
        raise ValueError(f"unsupported logs encoding {encoding!r}")

    cols = df.columns
    if "scope_name" not in cols:
        df = df.withColumn("scope_name", F.lit(""))
    if "ts" in df.columns and "time_unix_nano" not in df.columns:
        df = df.withColumn(
            "time_unix_nano",
            F.unix_micros(F.col("ts").cast("timestamp")) * 1000,
        )

    use_json = encoding == "otlp_json"

    def marshal_group(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                columns=[f.name for f in _REC_SCHEMA.fields]
            )
        recs = []
        for row in pdf.itertuples(index=False):
            d = dict(zip(pdf.columns, row))
            recs.append(
                {
                    "time_unix_nano": int(d.get("time_unix_nano") or 0),
                    "severity_number": int(d.get("severity_number") or 0),
                    "severity_text": d.get("severity_text") or "",
                    "body": d.get("body"),
                    "attributes": dict(d.get("attributes") or {}),
                    "resource": dict(d.get("resource") or {}),
                    "scope_name": d.get("scope_name") or "",
                    "trace_id": d.get("trace_id") or "",
                    "span_id": d.get("span_id") or "",
                }
            )
        recs.sort(
            key=lambda r: (
                r["trace_id"], r["span_id"],
                r["time_unix_nano"], str(r["body"]),
            )
        )
        if use_json:
            data = _otlp_json_doc(recs)
        else:
            data = encode_logs(recs)
        data = compress_record(data, compression)
        import hashlib

        pkey = hashlib.md5(
            str(pdf["_res_key"].iloc[0]).encode()
        ).hexdigest()
        # AddRecord validation (batch.go:85-93): bad key/size → skipped
        if not (0 < len(pkey) <= 256) or not (
            0 < len(data) <= max_record_size
        ):
            return pd.DataFrame(
                columns=[f.name for f in _REC_SCHEMA.fields]
            )
        return pd.DataFrame(
            [
                {
                    "partition_key": pkey,
                    "scope_name": str(pdf["scope_name"].iloc[0]),
                    "data": data,
                    "size": len(data),
                }
            ]
        )

    records = (
        df.withColumn("_res_key", F.to_json(F.col("resource")))
        .groupBy("_res_key", "scope_name")
        .applyInPandas(marshal_group, _REC_SCHEMA)
    )

    # Chunk(): consecutive runs of max_records_per_batch over the pinned
    # record order. Cardinality here = distinct (resource, scope) groups.
    w = Window.orderBy("partition_key", "scope_name")
    rn = F.row_number().over(w) - 1
    return records.select(
        "partition_key",
        "scope_name",
        "data",
        "size",
        (rn / max_records_per_batch).cast("int").alias("chunk_id"),
        (rn % max_records_per_batch).cast("int").alias("seq"),
    )


def _otlp_json_doc(recs: list[dict]) -> bytes:
    """plog JSON ExportRequest for ONE resource group — the same JSON
    mapping `sources.readers.otlp_json_lines` assembles JVM-side
    (uint64 nanos as strings), built row-side here because the kinesis
    record needs its resource identity kept alongside the bytes."""
    import json

    def kvs(m: dict) -> list:
        return [
            {"key": str(k), "value": {"stringValue": str(v)}}
            for k, v in m.items()
        ]

    first = recs[0]
    doc = {
        "resourceLogs": [
            {
                "resource": {"attributes": kvs(first["resource"])},
                "scopeLogs": [
                    {
                        "scope": {"name": first["scope_name"]},
                        "logRecords": [
                            {
                                "timeUnixNano": str(r["time_unix_nano"]),
                                "severityNumber": r["severity_number"],
                                "severityText": r["severity_text"],
                                "body": {
                                    "stringValue": ""
                                    if r["body"] is None
                                    else str(r["body"])
                                },
                                "attributes": kvs(r["attributes"]),
                                "traceId": r["trace_id"],
                                "spanId": r["span_id"],
                            }
                            for r in recs
                        ],
                    }
                ],
            }
        ]
    }
    return json.dumps(doc, separators=(",", ":")).encode()
