"""Config-driven pipeline — mirrors the reference's YAML configs end to end
(routingconnector testdata/config_logs.yaml + countconnector golden shapes)."""

import pytest
from pyspark.sql import Row

from opentelemetry_collector_contrib_spark.operators.attributes import Action
from opentelemetry_collector_contrib_spark.operators.transform_processor import StatementGroup
from opentelemetry_collector_contrib_spark.plans.config_pipeline import (
    ConfigPipeline,
    PipelineConfig,
)


@pytest.fixture(scope="module")
def logs(spark):
    rows = []
    for i in range(100):
        rows.append(
            Row(
                body=f"msg {i}",
                severity_number=17 if i % 5 == 0 else 9,
                n_tok=10 + i,
                attributes={"tier": "prod" if i % 2 == 0 else "dev", "region": "eu" if i % 3 == 0 else "us"},
            )
        )
    return spark.createDataFrame(
        rows,
        "body string, severity_number int, n_tok int, attributes map<string,string>",
    )


def test_full_config_pipeline(spark, logs):
    cfg = PipelineConfig(
        transform_groups=[
            StatementGroup(
                statements=['set(attributes["flagged"], "1")'],
                conditions=["severity_number >= 17"],
            )
        ],
        filter_conditions=['body == "msg 13"'],
        attribute_actions=[Action("upsert", "env", value="test")],
        route_table=[
            ("acme", 'route() where attributes["tier"] == "prod"'),
            ("globex", 'route() where attributes["region"] == "eu" and n_tok > 50'),
        ],
        match_once=True,
        count_metrics=[
            ("log_record_count", None),
            ("error_count", "severity_number >= 17"),
        ],
        count_dims=["route"],
    )
    pipe = ConfigPipeline(cfg)
    routed, aggs = pipe.run(logs, spark)
    rows = routed.collect()
    assert len(rows) == 99  # one filtered out
    assert all(r.attributes["env"] == "test" for r in rows)
    flagged = [r for r in rows if "flagged" in r.attributes]
    assert flagged and all(r.severity_number >= 17 for r in flagged)

    by_route = {r.route: r for r in aggs.collect()}
    assert set(by_route) == {"acme", "globex", "default"}
    total = sum(r.log_record_count for r in by_route.values())
    assert total == 99
    errs = sum(r.error_count for r in by_route.values())
    assert errs == len(flagged) - (1 if 13 % 5 == 0 else 0)
    # acme = even i (tier prod), first-match-wins
    assert by_route["acme"].log_record_count == 50


def test_multicast_mode(spark, logs):
    cfg = PipelineConfig(
        route_table=[
            ("a", 'route() where attributes["tier"] == "prod"'),
            ("b", 'route() where attributes["region"] == "eu"'),
        ],
        match_once=False,
    )
    routed, _ = ConfigPipeline(cfg).run(logs, spark)
    # rows matching both conditions appear twice
    from collections import Counter

    c = Counter(r.body for r in routed.collect())
    assert max(c.values()) == 2
    assert sum(c.values()) > 100


def test_bad_config_fails_fast(spark):
    with pytest.raises((SyntaxError, ValueError)):
        ConfigPipeline(PipelineConfig(route_table=[("x", 'set(body, "y")')]))
    with pytest.raises((SyntaxError, ValueError)):
        ConfigPipeline(PipelineConfig(filter_conditions=["body ==="]))


def test_unmatched_drop_mode(spark, logs):
    """default_route=None = reference with no default_pipelines
    (routingconnector/logs.go:95-98): unmatched rows are dropped, matched
    rows keep their route; same for multicast (empty match array explodes
    to nothing)."""
    from pyspark.sql import functions as F
    from opentelemetry_collector_contrib_spark.operators.router import (
        Route, route_match_once, route_multicast,
    )

    routes = [Route("errors", F.col("severity_number") >= 17)]
    once = route_match_once(logs, routes, default_route=None)
    assert once.filter(F.col("severity_number") < 17).count() == 0
    n_err = logs.filter(F.col("severity_number") >= 17).count()
    assert once.count() == n_err > 0
    assert {r.route for r in once.select("route").distinct().collect()} == {"errors"}

    multi = route_multicast(logs, routes, default_route=None)
    assert multi.count() == n_err
