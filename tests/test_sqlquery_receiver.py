"""sqlqueryreceiver (log path).

Reference semantics under test: `receiver/sqlqueryreceiver/
logs_receiver.go:200-330` — per-(config,row) records with string
bodies, tracking-column incremental collects, stored-value-wins
resume, in-memory advance without storage."""

import os

from opentelemetry_collector_contrib_spark.sources.sqlquery_receiver import (
    SqlQueryLogsReceiver,
)

SQL = (
    "SELECT * FROM sqlq_logs WHERE id > CAST(:tracking_value AS BIGINT) "
    "ORDER BY id"
)


def _seed(spark, rows):
    spark.createDataFrame(rows, "id long, body string, extra string") \
        .createOrReplaceTempView("sqlq_logs")


def test_incremental_collects(spark, tmp_path):
    _seed(spark, [(1, "a", "x"), (2, "b", "y")])
    r = SqlQueryLogsReceiver(
        spark, SQL, ["body"], tracking_column="id",
        tracking_start_value="0", store_dir=str(tmp_path),
    )
    r.start()
    first = r.collect(observed_ns=42)
    got = sorted((x["body"], x["observed_time_unix_nano"])
                 for x in first.collect())
    assert got == [("a", 42), ("b", 42)]
    assert r.tracking_value == "2"

    # new rows appear; only they are collected
    _seed(spark, [(1, "a", "x"), (2, "b", "y"), (3, "c", "z")])
    second = r.collect(observed_ns=43)
    assert [x["body"] for x in second.collect()] == ["c"]
    assert r.tracking_value == "3"

    # empty collect: tracking value unchanged (max over zero rows)
    third = r.collect()
    assert third.count() == 0 and r.tracking_value == "3"


def test_resume_from_store_and_config_fallback(spark, tmp_path):
    _seed(spark, [(1, "a", "x"), (2, "b", "y")])
    r = SqlQueryLogsReceiver(
        spark, SQL, ["body"], tracking_column="id",
        tracking_start_value="0", store_dir=str(tmp_path),
    )
    r.start()
    r.collect()
    assert os.path.exists(os.path.join(str(tmp_path),
                                       "sqlquery.trackingValue"))

    # a NEW receiver instance resumes from the stored value
    r2 = SqlQueryLogsReceiver(
        spark, SQL, ["body"], tracking_column="id",
        tracking_start_value="0", store_dir=str(tmp_path),
    )
    r2.start()
    assert r2.tracking_value == "2"
    assert r2.collect().count() == 0

    # without storage the config start value applies
    r3 = SqlQueryLogsReceiver(
        spark, SQL, ["body"], tracking_column="id",
        tracking_start_value="1",
    )
    r3.start()
    assert [x["body"] for x in r3.collect().collect()] == ["b"]


def test_multiple_logs_configs_and_string_bodies(spark):
    _seed(spark, [(1, "a", "x"), (2, "b", "y")])
    r = SqlQueryLogsReceiver(
        spark, "SELECT * FROM sqlq_logs ORDER BY id", ["body", "extra"],
    )
    r.start()
    rows = r.collect().collect()
    # configs outer, rows inner
    assert [(x["logs_config_index"], x["body"]) for x in
            sorted(rows, key=lambda x: (x["logs_config_index"], x["body"]))
            ] == [(0, "a"), (0, "b"), (1, "x"), (1, "y")]
