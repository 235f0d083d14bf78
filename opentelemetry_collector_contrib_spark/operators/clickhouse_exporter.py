"""ClickHouse exporter parity (log path) — flat log records → the
exact row shape the reference's prepared INSERT binds, plus the DDL
strings it issues at startup.

Reference behavior (`exporter/clickhouseexporter/exporter_logs.go`):

- one INSERT row per log record with the 15 bound columns in order
  ``Timestamp, TraceId, SpanId, TraceFlags, SeverityText,
  SeverityNumber, ServiceName, Body, ResourceSchemaUrl,
  ResourceAttributes, ScopeSchemaUrl, ScopeName, ScopeVersion,
  ScopeAttributes, LogAttributes`` (`exporter_logs.go:88-105`);
  attribute maps go through ``Value.AsString`` (`:120-127`) — this
  rebuild's flat schema is already string-typed upstream;
- ``ServiceName`` is the resource's ``service.name``. The reference
  declares ``var serviceName`` OUTSIDE the resource loop
  (`exporter_logs.go:69-77`), so a resource without ``service.name``
  silently reuses the previous resource's value within a batch —
  an iteration-order-dependent quirk this rebuild does NOT copy: a
  missing ``service.name`` maps to "" deterministically (documented
  divergence; order-dependent output has no stable meaning over a
  distributed DataFrame);
- DDL: ``CREATE TABLE IF NOT EXISTS`` with DateTime64(9), ZSTD
  codecs, bloom-filter/tokenbf indexes, ``PARTITION BY
  toDate(Timestamp)``, ``ORDER BY (ServiceName, SeverityText,
  toUnixTimestamp(Timestamp), TraceId)`` (`exporter_logs.go:129-160`);
  engine/cluster/TTL fragments from the config
  (`config.go:151-170`, `factory.go:125-143`), byte-identical
  rendering including the Sprintf spacing;
- ``CREATE DATABASE IF NOT EXISTS`` is issued only for non-default
  databases (`exporter_logs.go:211-229`).

Spark shape: the row mapping is a pure JVM-side ``select`` (wholly
codegen, zero Python); the natural 100 TB sink is
``rows.write.jdbc(...)`` / the ClickHouse Spark connector with
``Timestamp`` bound from the ns column — partitioning by
``toDate(Timestamp)`` mirrors the table's PARTITION BY so ClickHouse
parts load append-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "INSERT_COLUMNS",
    "clickhouse_log_rows",
    "generate_ttl_expr",
    "render_create_database_sql",
    "render_create_logs_table_sql",
    "render_insert_logs_sql",
]

INSERT_COLUMNS = [
    "Timestamp",
    "TraceId",
    "SpanId",
    "TraceFlags",
    "SeverityText",
    "SeverityNumber",
    "ServiceName",
    "Body",
    "ResourceSchemaUrl",
    "ResourceAttributes",
    "ScopeSchemaUrl",
    "ScopeName",
    "ScopeVersion",
    "ScopeAttributes",
    "LogAttributes",
]

_CREATE_LOGS_TABLE_SQL = """
CREATE TABLE IF NOT EXISTS %s %s (
     Timestamp DateTime64(9) CODEC(Delta, ZSTD(1)),
     TraceId String CODEC(ZSTD(1)),
     SpanId String CODEC(ZSTD(1)),
     TraceFlags UInt32 CODEC(ZSTD(1)),
     SeverityText LowCardinality(String) CODEC(ZSTD(1)),
     SeverityNumber Int32 CODEC(ZSTD(1)),
     ServiceName LowCardinality(String) CODEC(ZSTD(1)),
     Body String CODEC(ZSTD(1)),
     ResourceSchemaUrl String CODEC(ZSTD(1)),
     ResourceAttributes Map(LowCardinality(String), String) CODEC(ZSTD(1)),
     ScopeSchemaUrl String CODEC(ZSTD(1)),
     ScopeName String CODEC(ZSTD(1)),
     ScopeVersion String CODEC(ZSTD(1)),
     ScopeAttributes Map(LowCardinality(String), String) CODEC(ZSTD(1)),
     LogAttributes Map(LowCardinality(String), String) CODEC(ZSTD(1)),
     INDEX idx_trace_id TraceId TYPE bloom_filter(0.001) GRANULARITY 1,
     INDEX idx_res_attr_key mapKeys(ResourceAttributes) TYPE bloom_filter(0.01) GRANULARITY 1,
     INDEX idx_res_attr_value mapValues(ResourceAttributes) TYPE bloom_filter(0.01) GRANULARITY 1,
     INDEX idx_scope_attr_key mapKeys(ScopeAttributes) TYPE bloom_filter(0.01) GRANULARITY 1,
     INDEX idx_scope_attr_value mapValues(ScopeAttributes) TYPE bloom_filter(0.01) GRANULARITY 1,
     INDEX idx_log_attr_key mapKeys(LogAttributes) TYPE bloom_filter(0.01) GRANULARITY 1,
     INDEX idx_log_attr_value mapValues(LogAttributes) TYPE bloom_filter(0.01) GRANULARITY 1,
     INDEX idx_body Body TYPE tokenbf_v1(32768, 3, 0) GRANULARITY 1
) ENGINE = %s
%s
PARTITION BY toDate(Timestamp)
ORDER BY (ServiceName, SeverityText, toUnixTimestamp(Timestamp), TraceId)
SETTINGS index_granularity=8192, ttl_only_drop_parts = 1;
"""

_INSERT_LOGS_SQL = """INSERT INTO %s (
                        Timestamp,
                        TraceId,
                        SpanId,
                        TraceFlags,
                        SeverityText,
                        SeverityNumber,
                        ServiceName,
                        Body,
                        ResourceSchemaUrl,
                        ResourceAttributes,
                        ScopeSchemaUrl,
                        ScopeName,
                        ScopeVersion,
                        ScopeAttributes,
                        LogAttributes
                        ) VALUES (
                                  ?,
                                  ?,
                                  ?,
                                  ?,
                                  ?,
                                  ?,
                                  ?,
                                  ?,
                                  ?,
                                  ?,
                                  ?,
                                  ?,
                                  ?,
                                  ?,
                                  ?
                                  )"""

_DAY_S = 24 * 3600


def generate_ttl_expr(
    ttl_days: int = 0, ttl_seconds: int = 0, time_field: str = "Timestamp"
) -> str:
    """`factory.go:125-143`: deprecated ttl_days wins; a duration picks
    the coarsest exact unit (day → hour → minute → second)."""
    if ttl_days > 0:
        return f"TTL toDateTime({time_field}) + toIntervalDay({ttl_days})"
    if ttl_seconds > 0:
        if ttl_seconds % _DAY_S == 0:
            return (
                f"TTL toDateTime({time_field}) "
                f"+ toIntervalDay({ttl_seconds // _DAY_S})"
            )
        if ttl_seconds % 3600 == 0:
            return (
                f"TTL toDateTime({time_field}) "
                f"+ toIntervalHour({ttl_seconds // 3600})"
            )
        if ttl_seconds % 60 == 0:
            return (
                f"TTL toDateTime({time_field}) "
                f"+ toIntervalMinute({ttl_seconds // 60})"
            )
        return f"TTL toDateTime({time_field}) + toIntervalSecond({ttl_seconds})"
    return ""


def _cluster_string(cluster_name: str) -> str:
    return f"ON CLUSTER {cluster_name}" if cluster_name else ""


def _engine_string(engine_name: str, engine_params: str) -> str:
    if not engine_name:
        return "MergeTree()"
    return f"{engine_name}({engine_params})"


def render_create_logs_table_sql(
    table: str = "otel_logs",
    cluster_name: str = "",
    engine_name: str = "",
    engine_params: str = "",
    ttl_days: int = 0,
    ttl_seconds: int = 0,
) -> str:
    """`renderCreateLogsTableSQL` (`exporter_logs.go:246-249`) —
    byte-identical rendering, including the double space an empty
    cluster string leaves after the table name."""
    return _CREATE_LOGS_TABLE_SQL % (
        table,
        _cluster_string(cluster_name),
        _engine_string(engine_name, engine_params),
        generate_ttl_expr(ttl_days, ttl_seconds),
    )


def render_insert_logs_sql(table: str = "otel_logs") -> str:
    return _INSERT_LOGS_SQL % table


def render_create_database_sql(
    database: str, cluster_name: str = ""
) -> str | None:
    """`createDatabase` (`exporter_logs.go:211-229`): None for the
    default database (no statement is issued)."""
    if database == "default":
        return None
    return f"CREATE DATABASE IF NOT EXISTS {database} {_cluster_string(cluster_name)}"


def clickhouse_log_rows(df: DataFrame) -> DataFrame:
    """Flat log-record rows → the 15 INSERT-bound columns, in the
    reference's bind order. Pure codegen select (no Python).

    Expects the repo's flat-record columns; absent ones bind their
    pdata zero value. ``Timestamp`` stays the ns-precision integer —
    a DateTime64(9) bind preserves exactly this value."""

    def col_or(name: str, default):
        if name in df.columns:
            return F.col(name)
        return default

    empty_map = F.create_map().cast("map<string,string>")
    return df.select(
        F.coalesce(col_or("time_unix_nano", F.lit(0)).cast("long"), F.lit(0))
        .alias("Timestamp"),
        F.coalesce(col_or("trace_id", F.lit("")), F.lit("")).alias("TraceId"),
        F.coalesce(col_or("span_id", F.lit("")), F.lit("")).alias("SpanId"),
        F.coalesce(col_or("flags", F.lit(0)).cast("int"), F.lit(0))
        .alias("TraceFlags"),
        F.coalesce(col_or("severity_text", F.lit("")), F.lit(""))
        .alias("SeverityText"),
        F.coalesce(col_or("severity_number", F.lit(0)).cast("int"), F.lit(0))
        .alias("SeverityNumber"),
        F.coalesce(
            col_or("resource", empty_map)["service.name"], F.lit("")
        ).alias("ServiceName"),
        F.coalesce(col_or("body", F.lit("")), F.lit("")).alias("Body"),
        F.coalesce(col_or("resource_schema_url", F.lit("")), F.lit(""))
        .alias("ResourceSchemaUrl"),
        F.coalesce(col_or("resource", empty_map), empty_map)
        .alias("ResourceAttributes"),
        F.coalesce(col_or("scope_schema_url", F.lit("")), F.lit(""))
        .alias("ScopeSchemaUrl"),
        F.coalesce(col_or("scope_name", F.lit("")), F.lit(""))
        .alias("ScopeName"),
        F.coalesce(col_or("scope_version", F.lit("")), F.lit(""))
        .alias("ScopeVersion"),
        F.coalesce(col_or("scope_attributes", empty_map), empty_map)
        .alias("ScopeAttributes"),
        F.coalesce(col_or("attributes", empty_map), empty_map)
        .alias("LogAttributes"),
    )
