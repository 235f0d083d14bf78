"""awscloudwatchreceiver (log path).

Reference semantics under test:
`receiver/awscloudwatchreceiver/logs.go:230-288` — nil-field event
skips, stream sentinel, resource attrs, ms→ns timestamps."""

from opentelemetry_collector_contrib_spark.sources.cloudwatch_receiver import (
    NO_STREAM_NAME,
    cloudwatch_log_records,
)

MS = 1704067200000


def test_cloudwatch_records(spark):
    df = spark.createDataFrame(
        [
            (MS, "e1", "msg one", "stream-a", "/aws/lambda/fn"),
            (MS + 1, "e2", "msg two", None, "/aws/lambda/fn"),
            (None, "e3", "skip: no ts", "s", "/g"),
            (MS, None, "skip: no id", "s", "/g"),
            (MS, "e5", None, "s", "/g"),
        ],
        "timestamp_ms long, event_id string, message string, "
        "log_stream string, log_group string",
    )
    rows = {r["body"]: r for r in
            cloudwatch_log_records(df, region="us-east-1",
                                   observed_ns=7).collect()}
    assert set(rows) == {"msg one", "msg two"}
    r = rows["msg one"]
    assert r["time_unix_nano"] == MS * 10**6
    assert r["observed_time_unix_nano"] == 7
    assert r["attributes"] == {"id": "e1"}
    assert r["resource"] == {
        "aws.region": "us-east-1",
        "cloudwatch.log.group.name": "/aws/lambda/fn",
        "cloudwatch.log.stream": "stream-a",
    }
    # absent stream → the reference's sentinel
    assert rows["msg two"]["resource"]["cloudwatch.log.stream"] == \
        NO_STREAM_NAME
