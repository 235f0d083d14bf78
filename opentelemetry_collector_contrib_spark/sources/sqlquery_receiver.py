"""SQL query receiver parity (log path) — incremental log collection
from a SQL-queryable table with tracking-column resume.

Reference behavior (`receiver/sqlqueryreceiver/logs_receiver.go:200-330`):

- each collect runs the configured SQL; when a ``tracking_column`` is
  set, the query is parameterized with the current tracking value
  (the canonical shape is ``... WHERE track > ? ORDER BY track``);
- one log record per (logs config, row) — configs outer, rows inner —
  with ``Body`` = the row's ``body_column`` value AS A STRING (the
  reference's rows are StringMaps) and ObservedTimestamp = now
  (pinned via ``observed_ns`` here);
- after a collect, the tracking value becomes the LAST row's tracking
  column value and is persisted to the storage extension under
  ``<receiver id>.trackingValue``; on start the stored value wins
  over ``tracking_start_value`` (`:257-271`);
- with no storage client the tracking value still advances in memory
  for the lifetime of the receiver.

Divergences (documented): "last row's value" is replayed as
``max(tracking_column)`` over the collected rows — identical for the
canonical ascending query, and the only order-independent meaning
over a distributed result. The database is any Spark-SQL-queryable
relation (JDBC, Iceberg, parquet view) — ``spark.sql`` parameter
binding replaces the driver's ``?`` placeholder.

Spark shape: the query IS the scan (predicate pushdown reaches the
source; an Iceberg/JDBC relation prunes on the tracking predicate);
record assembly is a pure select per logs config; the tracking
aggregate is one JVM ``max``. The store write is a driver-side
atomic rename, same discipline as ``plans/checkpoint``.
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["SqlQueryLogsReceiver"]


class SqlQueryLogsReceiver:
    """One configured query of the sqlquery receiver's ``logs`` kind."""

    def __init__(
        self,
        spark: SparkSession,
        sql: str,
        body_columns: list[str],
        receiver_id: str = "sqlquery",
        tracking_column: str = "",
        tracking_start_value: str = "",
        store_dir: Optional[str] = None,
    ):
        if not body_columns:
            raise ValueError("at least one logs body_column is required")
        self.spark = spark
        self.sql = sql
        self.body_columns = list(body_columns)
        self.tracking_column = tracking_column
        self.tracking_start_value = tracking_start_value
        self.store_dir = store_dir
        self.store_key = f"{receiver_id}.trackingValue"
        self.tracking_value = tracking_start_value

    # -- storage extension analog (atomic rename, torn-write safe) -----
    def _store_path(self) -> Optional[str]:
        if self.store_dir is None:
            return None
        return os.path.join(self.store_dir, self.store_key)

    def start(self) -> None:
        """`retrieveTrackingValue` (`logs_receiver.go:257-271`): stored
        value wins, else the configured start value."""
        self.tracking_value = self.tracking_start_value
        path = self._store_path()
        if path and os.path.exists(path):
            with open(path, "r", encoding="utf-8") as f:
                self.tracking_value = f.read()

    def _persist(self) -> None:
        path = self._store_path()
        if path is None:
            return
        os.makedirs(self.store_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.store_dir)
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            f.write(self.tracking_value)
        os.replace(tmp, path)

    # -- one collect ---------------------------------------------------
    def collect(self, observed_ns: int = 0) -> DataFrame:
        """`collect` (`logs_receiver.go:274-303`): run the query with
        the current tracking value bound, emit one record per
        (logs config, row), advance + persist the tracking value."""
        args = {}
        if self.tracking_column:
            args["tracking_value"] = self.tracking_value
        rows = self.spark.sql(self.sql, args=args) if args else (
            self.spark.sql(self.sql)
        )
        parts = []
        for i, body_col in enumerate(self.body_columns):
            parts.append(
                rows.select(
                    F.lit(i).cast("int").alias("logs_config_index"),
                    F.col(body_col).cast("string").alias("body"),
                    F.lit(observed_ns).cast("long").alias(
                        "observed_time_unix_nano"
                    ),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)

        if self.tracking_column:
            row = rows.agg(
                F.max(F.col(self.tracking_column)).alias("_t")
            ).collect()[0]
            if row["_t"] is not None:
                # last-row value of the canonical ascending query ==
                # max over the result (documented)
                self.tracking_value = str(row["_t"])
                self._persist()
        return out
