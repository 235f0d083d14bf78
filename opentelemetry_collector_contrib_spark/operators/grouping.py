"""Batch re-grouping operators.

- ``group_by_attrs`` — groupbyattrs processor (`processor/
  groupbyattrsprocessor/processor.go:61-99,174-190`): records regroup under
  the resource identified by the listed attributes; in columnar form the
  attrs are promoted to top-level columns and the frame repartitions on
  them, which is exactly what downstream per-resource operators need
  co-located.
- ``resource_detection`` — resourcedetection processor
  (`processor/resourcedetectionprocessor/resourcedetection_processor.go:29-74`):
  environment detected once at start → constant columns.
- ``load_balance`` — loadbalancing exporter (`exporter/
  loadbalancingexporter`): consistent-hash spread over N backends.
- ``batch_per_attr_writes`` — pkg/batchperresourceattr: each output file
  single-valued in the attr → partitionBy on write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_by_attrs(df: DataFrame, keys: list[str], map_col: str = "attributes") -> DataFrame:
    """Promote map keys to columns and co-locate rows by them (the shuffle IS
    the regroup; find-or-create ResourceLogs compaction is free in columns)."""
    out = df
    for k in keys:
        if k not in out.columns:
            out = out.withColumn(k, F.col(map_col).getItem(k))
    return out.repartition(*[F.col(k) for k in keys])


def resource_detection(df: DataFrame, resource_attrs: dict[str, str]) -> DataFrame:
    """Stamp detected environment attributes as constant columns."""
    for k, v in resource_attrs.items():
        df = df.withColumn(k, F.lit(v))
    return df


def load_balance(df: DataFrame, key: str, num_backends: int, out: str = "backend") -> DataFrame:
    """Deterministic consistent-hash assignment to backends; repartitioning
    on the backend id mirrors one-connection-per-backend delivery."""
    return df.withColumn(
        out, F.pmod(F.xxhash64(F.col(key)), F.lit(num_backends)).cast("int")
    )


def batch_per_attr_writes(df: DataFrame, attr: str, path: str, fmt: str = "parquet") -> None:
    """One directory per attribute value (batchperresourceattr +
    grouping_file_exporter semantics), single write job."""
    df.write.format(fmt).mode("overwrite").partitionBy(attr).save(path)
