"""cassandraexporter (log path).

Reference semantics under test: `exporter/cassandraexporter/
constants.go` (DDL/insert strings), `helper.go:8-17` (per-value
json.Marshal quirk), `exporter_logs.go:113-146` (bind columns)."""

from opentelemetry_collector_contrib_spark.operators.cassandra_exporter import (
    cassandra_log_rows,
    render_create_database_sql,
    render_create_log_table_sql,
    render_insert_log_sql,
)

TS = 1704067200_000000000


def test_ddl_rendering():
    assert render_create_database_sql("otel", "SimpleStrategy", 3) == (
        "CREATE KEYSPACE IF NOT EXISTS otel WITH REPLICATION = "
        "{ 'class' : 'SimpleStrategy', 'replication_factor' : 3 };"
    )
    ddl = render_create_log_table_sql("otel", "logs", "LZ4Compressor")
    assert ddl.startswith("CREATE TABLE IF NOT EXISTS otel.logs (")
    assert "PRIMARY KEY (SpanId, SeverityNumber)" in ddl
    assert ddl.endswith("WITH COMPRESSION = {'class': 'LZ4Compressor'}")
    ins = render_insert_log_sql("otel", "logs")
    assert ins.startswith("INSERT INTO otel.logs (timestamp, traceid")
    assert ins.count("?") == 9


def test_log_rows_json_marshal_quirk(spark):
    df = spark.createDataFrame(
        [
            (TS, "hello <x>", 9, "Info", 1, "ab" * 16, "cd" * 8,
             {"team": "core"}, {"k": "v"}),
            (None, None, None, None, None, None, None, None, None),
        ],
        "time_unix_nano long, body string, severity_number int, "
        "severity_text string, flags int, trace_id string, "
        "span_id string, resource map<string,string>, "
        "attributes map<string,string>",
    )
    rows = cassandra_log_rows(df).collect()
    r = {x["timestamp"]: x for x in rows}[TS]
    # string values bind in their JSON form — quoted, HTML-escaped
    assert r["body"] == '"hello \\u003cx\\u003e"'
    assert r["resourceattributes"] == {"team": '"core"'}
    assert r["logattributes"] == {"k": '"v"'}
    assert r["traceid"] == "ab" * 16 and r["traceflags"] == 1
    z = {x["timestamp"]: x for x in rows}[0]
    assert z["body"] == "null"  # json.Marshal(nil)
    assert z["resourceattributes"] == {} and z["severitynumber"] == 0
