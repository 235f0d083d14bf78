"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship parse→enrich→route→aggregate over sf0.001.
queries()    — one callable per implemented operator (driver runs at sf0.01).
oracle_sql() — DuckDB-equivalent SQL per query for the dual-engine check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opentelemetry_collector_contrib_spark.driver_queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from opentelemetry_collector_contrib_spark.driver_queries import _q_agg_counts

    return _q_agg_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in REGISTRY}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.sql for q in REGISTRY if q.sql is not None}
