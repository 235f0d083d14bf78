"""Redaction processor — `processor/redactionprocessor/processor.go:83-175`.

Reference semantics: allowed/denied attribute keys, blocked-value regexes
masked in place, plus summary bookkeeping attrs (`redaction.masked.count`).
All column-level here: map_filter for key policies, regexp_replace for value
masking — no shuffle, fused into the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def mask_values(df: DataFrame, field: str, pattern: str, repl: str = "****") -> DataFrame:
    """Mask every substring matching pattern in a string column."""
    return df.withColumn(field, F.regexp_replace(F.col(field), pattern, repl))


def allow_keys(df: DataFrame, map_field: str, allowed: list[str]) -> DataFrame:
    """Keep only allowed keys in a map column (allow-list policy)."""
    arr = F.array(*[F.lit(k) for k in allowed])
    return df.withColumn(
        map_field, F.map_filter(F.col(map_field), lambda k, _v: F.array_contains(arr, k))
    )


def deny_keys(df: DataFrame, map_field: str, denied: list[str]) -> DataFrame:
    """Drop denied keys from a map column (deny-list policy)."""
    arr = F.array(*[F.lit(k) for k in denied])
    return df.withColumn(
        map_field, F.map_filter(F.col(map_field), lambda k, _v: ~F.array_contains(arr, k))
    )


def mask_map_values(
    df: DataFrame, map_field: str, pattern: str, repl: str = "****", count_attr: str | None = None
) -> DataFrame:
    """Mask map values matching a blocked-value regex; optionally record the
    masked-key count (`redaction.masked.count` analog)."""
    m = F.col(map_field)
    if count_attr:
        masked_ct = F.size(F.map_filter(m, lambda _k, v: v.rlike(pattern)))
        df = df.withColumn(count_attr, masked_ct)
    return df.withColumn(
        map_field, F.transform_values(m, lambda _k, v: F.regexp_replace(v, pattern, repl))
    )
