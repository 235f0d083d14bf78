"""AWS CloudWatch receiver parity (log path) — FilterLogEvents
responses → flat log records.

Reference behavior (`receiver/awscloudwatchreceiver/logs.go:230-288`):

- per event: a nil timestamp, event id, or message skips the event
  (logged); the log stream defaults to the sentinel
  ``THIS IS INVALID STREAM`` when absent;
- records group per (log group, log stream) resource with attrs
  ``aws.region``, ``cloudwatch.log.group.name``,
  ``cloudwatch.log.stream``; each record carries timestamp =
  epoch-ms → ns, observed = now (pinned), body = the raw message,
  and the ``id`` attribute;
- the polling/API half (FilterLogEvents pagination, group
  autodiscovery limits) is host-specific; the translation half here
  is faithful and the poll loop composes with the repo's
  checkpointed readers like the other API receivers.

Spark shape: zero-shuffle ``mapInPandas`` over event rows
(columns: ``timestamp_ms``, ``event_id``, ``message``,
``log_stream`` nullable, plus a ``log_group`` column).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T

__all__ = ["NO_STREAM_NAME", "cloudwatch_log_records"]

NO_STREAM_NAME = "THIS IS INVALID STREAM"

_SCHEMA = T.StructType(
    [
        T.StructField("time_unix_nano", T.LongType()),
        T.StructField("observed_time_unix_nano", T.LongType()),
        T.StructField("body", T.StringType()),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType())),
        T.StructField("resource", T.MapType(T.StringType(), T.StringType())),
    ]
)


def cloudwatch_log_records(
    df: DataFrame,
    region: str,
    log_group_col: str = "log_group",
    observed_ns: int = 0,
) -> DataFrame:
    """FilterLogEvents event rows → flat records. Zero-shuffle."""

    def nz(v):
        if v is None or (isinstance(v, float) and v != v):
            return None
        return v

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                ts = nz(row.get("timestamp_ms"))
                eid = nz(row.get("event_id"))
                msg = nz(row.get("message"))
                if ts is None or eid is None or msg is None:
                    continue  # nil timestamp/id/message skips the event
                stream = nz(row.get("log_stream"))
                out.append(
                    {
                        "time_unix_nano": int(ts) * 1_000_000,
                        "observed_time_unix_nano": observed_ns,
                        "body": str(msg),
                        "attributes": {"id": str(eid)},
                        "resource": {
                            "aws.region": region,
                            "cloudwatch.log.group.name": str(
                                nz(row.get(log_group_col)) or ""
                            ),
                            "cloudwatch.log.stream": (
                                str(stream)
                                if stream is not None
                                else NO_STREAM_NAME
                            ),
                        },
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in _SCHEMA.fields]
            )

    return df.mapInPandas(gen, _SCHEMA)
