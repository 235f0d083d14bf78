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


def expo_histogram(
    df: DataFrame,
    dims: list[str],
    value_col: str,
) -> DataFrame:
    """OTel exponential histogram at scale 0 (base-2 buckets) over a
    non-negative integer value column — (dims..., bucket_idx, cnt,
    bucket_min, bucket_max).

    The OTLP exponential histogram (metrics data model §ExponentialHistogram;
    the reference ships deltatocumulative/exponentialhistogram support)
    assigns v to bucket k with 2^k < v <= 2^(k+1). At scale 0 over integers
    that index is EXACT in integer arithmetic: k = bit_length(v-1) - 1
    (v=1 -> -1, the spec's (1/2, 1] bucket; v=2 -> 0; v=3,4 -> 1), so no
    libm log2 — the same bit-portability discipline as the HLL rho. Zeros
    land in the spec's zero bucket (bucket_idx NULL replaced by -99 so the
    column stays int). One vocab-of-buckets-bounded exchange (<= 64 distinct
    indexes per dim cell); map-side partial agg collapses first.
    """
    from .sketches import bitlen_case_sql

    v = F.col(value_col).cast("long")
    idx = (
        F.when(v <= 0, F.lit(-99))
        .otherwise(F.expr(bitlen_case_sql(f"({value_col} - 1)", bits=40)) - 1)
        .cast("int")
    )
    return (
        df.select(*dims, v.alias("__v"), idx.alias("bucket_idx"))
        .groupBy(*dims, "bucket_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("cnt"),
            F.min("__v").alias("bucket_min"),
            F.max("__v").alias("bucket_max"),
        )
    )
