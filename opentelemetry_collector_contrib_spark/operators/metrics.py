"""Metric-state processors — per-stream running state as window functions.

The reference keeps per-stream in-memory state maps with staleness eviction:
- deltatocumulative: running sum per stream (`processor/
  deltatocumulativeprocessor/internal/streams/streams.go:19-37`)
- cumulativetodelta: diff vs previous point (`processor/cumulativetodeltaprocessor`)
- deltatorate: delta / interval (`processor/deltatorateprocessor`)
- interval: last value per interval (`processor/intervalprocessor`)
- spanmetrics-style histogram: explicit-bound bucket counts
  (`connector/spanmetricsconnector`)

In Spark the "state map" is a `Window.partitionBy(stream).orderBy(ts)` —
state lives in the shuffle, scales with streams × points, and needs no
eviction (batch) or uses watermarks (streaming).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _stream_window(stream_cols: list[str], ts_col: str) -> Window:
    return Window.partitionBy(*stream_cols).orderBy(ts_col)


def delta_to_cumulative(
    df: DataFrame, stream_cols: list[str], ts_col: str, value_col: str, out: str = "cumulative"
) -> DataFrame:
    w = _stream_window(stream_cols, ts_col).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out, F.sum(value_col).over(w))


def cumulative_to_delta(
    df: DataFrame, stream_cols: list[str], ts_col: str, value_col: str, out: str = "delta"
) -> DataFrame:
    """First point of a stream has no delta (the reference drops it —
    emitted here as null for the caller to filter)."""
    w = _stream_window(stream_cols, ts_col)
    prev = F.lag(value_col).over(w)
    return df.withColumn(out, F.col(value_col) - prev)


def delta_to_rate(
    df: DataFrame, stream_cols: list[str], ts_col: str, value_col: str, out: str = "rate_per_s"
) -> DataFrame:
    w = _stream_window(stream_cols, ts_col)
    dt = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    return df.withColumn(out, F.when(dt > 0, F.col(value_col) / dt))


def interval_last(
    df: DataFrame, stream_cols: list[str], ts_col: str, interval: str = "1 hour"
) -> DataFrame:
    """Last value per (stream, interval) — intervalprocessor emit-on-tick."""
    win = F.window(ts_col, interval).alias("w")
    others = [c for c in df.columns if c not in stream_cols]
    latest = F.max(F.struct(F.col(ts_col).alias("__ts"), *[F.col(c).alias(c) for c in others])).alias("__last")
    out = df.groupBy(win, *stream_cols).agg(latest)
    keep = [F.col("w.start").alias("window_start"), *stream_cols]
    keep += [F.col(f"__last.{c}").alias(c) for c in others]
    return out.select(*keep)


def histogram_buckets(
    df: DataFrame,
    dims: list[str],
    value_col: str,
    bounds: list[float],
    out_prefix: str = "le_",
) -> DataFrame:
    """Explicit-bound histogram (spanmetrics RED-style): one count column per
    bucket bound plus +Inf, cumulative-bucket semantics like OTLP."""
    aggs = []
    for b in bounds:
        name = f"{out_prefix}{b}".replace(".", "_")
        aggs.append(
            F.count(F.when(F.col(value_col) <= b, 1)).alias(name)
        )
    aggs.append(F.count(F.lit(1)).alias(f"{out_prefix}inf"))
    aggs.append(F.sum(value_col).alias("value_sum"))
    return df.groupBy(*dims).agg(*aggs)
