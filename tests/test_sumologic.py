"""sumologicprocessor log-path subprocessors — goldens hand-derived from
`processor/sumologicprocessor/*_test.go` behavior."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from opentelemetry_collector_contrib_spark.operators.sumologic import (
    _nest_one,
    add_cloud_namespace,
    aggregate_attributes,
    convert_log_fields,
    nest_attributes,
    sumologic_process,
    translate_attributes,
)

MAP = T.MapType(T.StringType(), T.StringType())


def res_df(spark, rows):
    return spark.createDataFrame(
        [(r,) for r in rows], T.StructType([T.StructField("resource", MAP)])
    )


def test_cloud_namespace(spark):
    out = add_cloud_namespace(res_df(spark, [
        {"cloud.platform": "aws_ec2"},
        {"cloud.platform": "aws_ecs"},
        {"cloud.platform": "aws_elastic_beanstalk"},
        {"cloud.platform": "gcp_compute_engine"},
        {"other": "x"},
        {"cloud.platform": "aws_ec2", "cloud.namespace": "old"},  # PutStr overwrites
    ])).collect()
    got = [dict(r.resource).get("cloud.namespace") for r in out]
    assert got == ["aws/ec2", "ecs", "ElasticBeanstalk", None, None, "aws/ec2"]


def test_translate_attributes(spark):
    out = translate_attributes(res_df(spark, [
        {"cloud.account.id": "42", "untouched": "u"},
        # sumo key already present in the ORIGINAL map -> rename skipped
        {"host.name": "h1", "host": "existing"},
    ])).collect()
    assert dict(out[0].resource) == {"AccountId": "42", "untouched": "u"}
    assert dict(out[1].resource) == {"host.name": "h1", "host": "existing"}


def test_translate_attributes_first_wins(spark):
    # two sources -> same sumo key: first in MAP ORDER wins (pcommon maps
    # are insertion-ordered; create_map pins the order python dicts lose)
    df = spark.range(1).select(
        F.create_map(
            F.lit("k8s.service.name"), F.lit("svc-k8s"),
            F.lit("service.name"), F.lit("svc-otel"),
        ).alias("resource")
    )
    out = translate_attributes(df).collect()
    assert dict(out[0].resource) == {"service": "svc-k8s"}


def test_aggregate_attributes(spark):
    df = spark.createDataFrame(
        [({"pod_a": "1", "pod_b": "2", "node_x": "3", "keep": "4"},)],
        T.StructType([T.StructField("attributes", MAP)]),
    )
    out = aggregate_attributes(
        df, [("pods", ["pod_"]), ("nodes", ["node_"])], attr_cols=("attributes",)
    ).collect()[0]
    attrs = dict(out.attributes)
    assert attrs["keep"] == "4"
    assert json.loads(attrs["pods"]) == {"a": "1", "b": "2"}
    assert json.loads(attrs["nodes"]) == {"x": "3"}
    assert "pod_a" not in attrs and "node_x" not in attrs


def test_aggregate_attributes_upserts_existing_target_key(spark):
    """A pre-existing attribute named exactly like the aggregate target
    is OVERWRITTEN (the reference's PutEmptyMap upsert) — regression for
    the DUPLICATED_MAP_KEY map_concat failure."""
    df = spark.createDataFrame(
        [({"pods": "old", "pod_a": "1"},)],
        T.StructType([T.StructField("attributes", MAP)]),
    )
    out = aggregate_attributes(
        df, [("pods", ["pod_"])], attr_cols=("attributes",)
    ).collect()[0]
    attrs = dict(out.attributes)
    assert json.loads(attrs["pods"]) == {"a": "1"}  # upserted, not "old"
    assert "pod_a" not in attrs


def test_aggregate_attributes_no_match_no_key(spark):
    df = spark.createDataFrame(
        [({"keep": "1"},)], T.StructType([T.StructField("attributes", MAP)])
    )
    out = aggregate_attributes(df, [("pods", ["pod_"])], attr_cols=("attributes",))
    assert dict(out.collect()[0].attributes) == {"keep": "1"}


def test_nest_one_basic():
    got = _nest_one(
        {"kubernetes.container.name": "c", "kubernetes.host": "h", "plain": "p"},
        ".", (), (), False,
    )
    assert json.loads(got) == {
        "kubernetes": {"container": {"name": "c"}, "host": "h"},
        "plain": "p",
    }


def test_nest_one_scalar_map_conflicts():
    # scalar first, then deeper key -> scalar parks under ""
    got = json.loads(_nest_one({"a": "v1", "a.b": "v2"}, ".", (), (), False))
    assert got == {"a": {"": "v1", "b": "v2"}}
    # deeper key first, then scalar landing on the map node
    got = json.loads(_nest_one({"a.b": "v1", "a": "v2"}, ".", (), (), False))
    assert got == {"a": {"b": "v1", "": "v2"}}


def test_nest_one_include_exclude():
    got = json.loads(_nest_one(
        {"k8s.pod.name": "p", "host.name": "h"}, ".", ("k8s.",), (), False
    ))
    assert got == {"k8s": {"pod": {"name": "p"}}, "host.name": "h"}
    got = json.loads(_nest_one(
        {"k8s.pod.name": "p", "host.name": "h"}, ".", (), ("host",), False
    ))
    assert got == {"k8s": {"pod": {"name": "p"}}, "host.name": "h"}


def test_nest_one_squash():
    got = json.loads(_nest_one(
        {"a.b.c": "C", "a.b.d": "D"}, ".", (), (), True
    ))
    assert got == {"a.b": {"c": "C", "d": "D"}}


def test_nest_attributes_distributed(spark):
    df = spark.createDataFrame(
        [({"x.y": "1", "x.z": "2"},), ({"p": "q"},)],
        T.StructType([T.StructField("attributes", MAP)]),
    )
    out = nest_attributes(df).orderBy(F.col("attributes_nested")).collect()
    assert json.loads(out[1].attributes_nested) == {"x": {"y": "1", "z": "2"}}
    assert json.loads(out[0].attributes_nested) == {"p": "q"}


def test_convert_log_fields(spark):
    schema = T.StructType([
        T.StructField("severity_number", T.IntegerType()),
        T.StructField("severity_text", T.StringType()),
        T.StructField("span_id", T.StringType()),
        T.StructField("trace_id", T.StringType()),
        T.StructField("attributes", MAP),
    ])
    df = spark.createDataFrame([
        (9, "info", "0102030405060708", "0102030405060708090a0b0c0d0e0f10", {}),
        (0, "warn", None, None, {}),
        (17, "err", "", "", {"loglevel": "KEEP"}),
    ], schema)
    out = [dict(r.attributes) for r in convert_log_fields(df).collect()]
    assert out[0]["loglevel"] == "INFO"
    assert out[0]["severitytext"] == "info"
    assert out[0]["spanid"] == "0102030405060708"
    assert "loglevel" not in out[1]  # unspecified severity -> no loglevel
    assert out[1]["severitytext"] == "warn"
    assert out[1]["spanid"] == ""  # empty id renders ''
    assert out[2]["loglevel"] == "KEEP"  # present -> untouched


def test_sumologic_chain_and_plan(spark):
    df = spark.createDataFrame(
        [({"cloud.platform": "aws_ec2", "host.name": "h"}, {"pod_x": "1"})],
        T.StructType([
            T.StructField("resource", MAP), T.StructField("attributes", MAP),
        ]),
    )
    out = sumologic_process(df, aggregate=[("pods", ["pod_"])])
    row = out.collect()[0]
    res = dict(row.resource)
    assert res["cloud.namespace"] == "aws/ec2"
    assert res["aws_service"] == "aws_ec2"
    assert res["host"] == "h"
    assert json.loads(dict(row.attributes)["pods"]) == {"x": "1"}
    # everything except nesting is a pure map: no Exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
