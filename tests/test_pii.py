"""PII scrub: masking semantics, counts, pattern-order independence."""

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.pii import (
    PII_PATTERNS,
    pii_scrub,
)


def test_pii_scrub_masks_and_counts(spark):
    rows = [
        (1, "mail a.b+c@ex-ample.co.uk then 192.168.0.1 done"),
        (2, "card 4111-1111-1111-1234 ssn 321-54-9876"),
        (3, "call +44 123-456-7890 or +1 555-010-0042"),
        (4, "no pii here, just 1234 and example.com text"),
        (5, "two mails x@y.io z@w.ai and ip 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {r["id"]: r for r in pii_scrub(df, "text").collect()}

    assert out[1]["text"] == "mail <EMAIL> then <IPV4> done"
    assert out[1]["n_email"] == 1 and out[1]["n_ipv4"] == 1

    assert out[2]["text"] == "card <CARD> ssn <SSN>"
    assert out[2]["n_card"] == 1 and out[2]["n_ssn"] == 1
    # the ssn pattern must not fire inside the card's digit runs
    assert out[2]["n_ssn"] == 1

    assert out[3]["text"] == "call <PHONE> or <PHONE>"
    assert out[3]["n_phone"] == 2

    # bare domain without local-part@ is NOT an email; bare digits not a card
    assert out[4]["text"] == rows[3][1]
    assert all(out[4][f"n_{k}"] == 0 for k in PII_PATTERNS)

    assert out[5]["n_email"] == 2 and out[5]["n_ipv4"] == 1


def test_pii_scrub_kind_subset_and_out_col(spark):
    df = spark.createDataFrame([(1, "a@b.co at 10.0.0.1")], ["id", "text"])
    out = pii_scrub(df, "text", kinds=["ipv4"], out_col="clean").collect()[0]
    assert out["text"] == "a@b.co at 10.0.0.1"  # original preserved
    assert out["clean"] == "a@b.co at <IPV4>"
    assert out["n_ipv4"] == 1 and "n_email" not in out.asDict()


def test_pii_scrub_zero_shuffle_plan(spark):
    df = spark.createDataFrame([(1, "a@b.co")], ["id", "text"])
    plan = pii_scrub(df, "text")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
