"""clickhouseexporter (log path).

Reference semantics under test: `exporter/clickhouseexporter/
exporter_logs.go` (15-column INSERT bind order, DDL rendering incl.
Sprintf spacing), `config.go:151-170` (engine/cluster strings),
`factory.go:125-143` (TTL expression unit selection)."""

from opentelemetry_collector_contrib_spark.operators.clickhouse_exporter import (
    INSERT_COLUMNS,
    clickhouse_log_rows,
    generate_ttl_expr,
    render_create_database_sql,
    render_create_logs_table_sql,
    render_insert_logs_sql,
)


def test_create_table_rendering():
    ddl = render_create_logs_table_sql()
    # empty cluster string leaves the Sprintf double space
    assert ddl.startswith("\nCREATE TABLE IF NOT EXISTS otel_logs  (")
    assert "Timestamp DateTime64(9) CODEC(Delta, ZSTD(1))" in ddl
    assert "INDEX idx_body Body TYPE tokenbf_v1(32768, 3, 0) GRANULARITY 1" in ddl
    # default engine, empty TTL leaves a blank line before PARTITION BY
    assert ") ENGINE = MergeTree()\n\nPARTITION BY toDate(Timestamp)" in ddl
    assert (
        "ORDER BY (ServiceName, SeverityText, toUnixTimestamp(Timestamp), "
        "TraceId)" in ddl
    )
    assert "SETTINGS index_granularity=8192, ttl_only_drop_parts = 1;" in ddl

    ddl2 = render_create_logs_table_sql(
        table="db.logs", cluster_name="c1",
        engine_name="ReplicatedMergeTree", engine_params="'/x', 'y'",
        ttl_days=3,
    )
    assert "CREATE TABLE IF NOT EXISTS db.logs ON CLUSTER c1 (" in ddl2
    assert (
        ") ENGINE = ReplicatedMergeTree('/x', 'y')\n"
        "TTL toDateTime(Timestamp) + toIntervalDay(3)\n"
        "PARTITION BY toDate(Timestamp)" in ddl2
    )


def test_ttl_expr_units():
    assert generate_ttl_expr() == ""
    # deprecated ttl_days wins
    assert generate_ttl_expr(ttl_days=2, ttl_seconds=3600).endswith(
        "toIntervalDay(2)"
    )
    assert generate_ttl_expr(ttl_seconds=48 * 3600).endswith("toIntervalDay(2)")
    assert generate_ttl_expr(ttl_seconds=2 * 3600).endswith("toIntervalHour(2)")
    assert generate_ttl_expr(ttl_seconds=120).endswith("toIntervalMinute(2)")
    assert generate_ttl_expr(ttl_seconds=45).endswith("toIntervalSecond(45)")


def test_insert_and_database_sql():
    ins = render_insert_logs_sql("otel_logs")
    assert ins.startswith("INSERT INTO otel_logs (")
    assert ins.count("?") == 15
    assert render_create_database_sql("default") is None
    assert (
        render_create_database_sql("otel", "c1")
        == "CREATE DATABASE IF NOT EXISTS otel ON CLUSTER c1"
    )


def test_log_rows_mapping(spark):
    df = spark.createDataFrame(
        [
            (
                1704067200_000000001, "aa" * 16, "bb" * 8, 1, "Info", 9,
                "evt", {"service.name": "svc", "team": "core"},
                {"k": "v"}, "lib", "1.0",
            ),
            (None, None, None, None, None, None, None, None, None, None, None),
        ],
        "time_unix_nano long, trace_id string, span_id string, flags int, "
        "severity_text string, severity_number int, body string, "
        "resource map<string,string>, attributes map<string,string>, "
        "scope_name string, scope_version string",
    )
    rows = clickhouse_log_rows(df).collect()
    assert clickhouse_log_rows(df).columns == INSERT_COLUMNS
    r = rows[0]
    assert r["Timestamp"] == 1704067200_000000001
    assert r["ServiceName"] == "svc"
    assert r["ResourceAttributes"] == {"service.name": "svc", "team": "core"}
    assert r["LogAttributes"] == {"k": "v"}
    assert r["ScopeName"] == "lib" and r["ScopeVersion"] == "1.0"
    z = rows[1]
    # pdata zero values for null/absent inputs
    assert z["Timestamp"] == 0 and z["TraceId"] == "" and z["TraceFlags"] == 0
    assert z["ServiceName"] == "" and z["ResourceAttributes"] == {}
    assert z["ScopeSchemaUrl"] == "" and z["LogAttributes"] == {}
