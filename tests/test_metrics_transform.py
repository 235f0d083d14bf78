"""metricstransform + metricsgeneration processor semantics.

Goldens are hand-derived from the reference's operation definitions
(`processor/metricstransformprocessor/operation_*.go`,
`processor/metricsgenerationprocessor/utils.go`)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opentelemetry_collector_contrib_spark.operators.metrics_transform import (
    FP,
    DP_COLS,
    GenerationRule,
    MetricFilter,
    Operation,
    Transform,
    generate_metrics,
    metrics_transform,
)

SCHEMA = T.StructType(
    [
        T.StructField("metric_name", T.StringType()),
        T.StructField("unit", T.StringType()),
        T.StructField("metric_type", T.StringType()),
        T.StructField("temporality", T.StringType()),
        T.StructField("monotonic", T.BooleanType()),
        T.StructField("value_type", T.StringType()),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType())),
        T.StructField("start_time_unix", T.LongType()),
        T.StructField("time_unix", T.LongType()),
        T.StructField("value", T.LongType()),
    ]
)


def dp(name, value, attrs=None, ts=100, start=0, mtype="gauge", temp="", unit="1", mono=False):
    return (name, unit, mtype, temp, mono, "int", attrs or {}, start, ts, value)


def mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def rows(df):
    return sorted(
        (
            r.metric_name, r.unit, r.metric_type, r.temporality, r.value_type,
            tuple(sorted((r.attributes or {}).items())), r.start_time_unix,
            r.time_unix, r.value,
        )
        for r in df.collect()
    )


def test_update_rename_and_label_ops(spark):
    df = mk(spark, [
        dp("system.cpu.usage", 10, {"state": "idle", "cpu": "0"}),
        dp("system.cpu.usage", 20, {"state": "used", "cpu": "1"}),
        dp("other", 5, {"state": "idle"}),
    ])
    out = metrics_transform(df, [Transform(
        include=MetricFilter("system.cpu.usage"),
        action="update",
        new_name="cpu.usage",
        operations=[
            Operation("update_label", label="state", new_label="cpu_state",
                      value_actions={"used": "busy"}),
            Operation("add_label", new_label="host", new_value="h1"),
        ],
    )])
    got = rows(out)
    assert (
        "cpu.usage", "1", "gauge", "", "int",
        (("cpu", "0"), ("cpu_state", "idle"), ("host", "h1")), 0, 100, 10,
    ) in got
    assert (
        "cpu.usage", "1", "gauge", "", "int",
        (("cpu", "1"), ("cpu_state", "busy"), ("host", "h1")), 0, 100, 20,
    ) in got
    # untouched non-matching metric
    assert ("other", "1", "gauge", "", "int", (("state", "idle"),), 0, 100, 5) in got
    assert out.count() == 3


def test_insert_appends_copy(spark):
    df = mk(spark, [dp("m", 7, {"a": "x"})])
    out = metrics_transform(df, [Transform(
        include=MetricFilter("m"), action="insert", new_name="m.copy",
        operations=[Operation("scale_value", scale_num=3)],
    )])
    got = rows(out)
    assert len(got) == 2
    assert ("m", "1", "gauge", "", "int", (("a", "x"),), 0, 100, 7) in got
    assert ("m.copy", "1", "gauge", "", "int", (("a", "x"),), 0, 100, 21) in got


def test_insert_regexp_expand_name(spark):
    df = mk(spark, [dp("pre.alpha.post", 1), dp("pre.beta.post", 2)])
    out = metrics_transform(df, [Transform(
        include=MetricFilter(r"^pre\.(?P<mid>[a-z]+)\.post$", "regexp"),
        action="insert", new_name="new.${mid}",
    )])
    names = sorted(r.metric_name for r in out.collect())
    assert names == ["new.alpha", "new.beta", "pre.alpha.post", "pre.beta.post"]


def test_delete_label_value_drops_dps(spark):
    df = mk(spark, [dp("m", 1, {"k": "drop"}), dp("m", 2, {"k": "keep"})])
    out = metrics_transform(df, [Transform(
        include=MetricFilter("m"), action="update",
        operations=[Operation("delete_label_value", label="k", label_value="drop")],
    )])
    assert [r.value for r in out.collect()] == [2]


def test_scale_int_floor(spark):
    df = mk(spark, [dp("m", 7)])
    out = metrics_transform(df, [Transform(
        include=MetricFilter("m"), action="update",
        operations=[Operation("scale_value", scale_num=1, scale_den=2)],
    )])
    assert out.collect()[0].value == 3  # floor(7/2), Go int64(3.5)=3


def test_toggle_scalar_datatype(spark):
    df = mk(spark, [dp("m", 7), dp("n", 1)])
    out = metrics_transform(df, [Transform(
        include=MetricFilter("m"), action="update",
        operations=[Operation("toggle_scalar_data_type")],
    )])
    got = {r.metric_name: r.value_type for r in out.collect()}
    assert got == {"m": "double", "n": "int"}


def test_aggregate_labels_sum_and_mean(spark):
    df = mk(spark, [
        dp("m", 10, {"keep": "a", "drop": "x"}),
        dp("m", 20, {"keep": "a", "drop": "y"}),
        dp("m", 5, {"keep": "b", "drop": "x"}),
    ])
    out = metrics_transform(df, [Transform(
        include=MetricFilter("m"), action="update",
        operations=[Operation("aggregate_labels", label_set=["keep"],
                              aggregation_type="sum")],
    )])
    got = {tuple(sorted(r.attributes.items())): r.value for r in out.collect()}
    assert got == {(("keep", "a"),): 30, (("keep", "b"),): 5}

    out_mean = metrics_transform(df, [Transform(
        include=MetricFilter("m"), action="update",
        operations=[Operation("aggregate_labels", label_set=["keep"],
                              aggregation_type="mean")],
    )])
    got = {tuple(sorted(r.attributes.items())): r.value for r in out_mean.collect()}
    assert got == {(("keep", "a"),): 15, (("keep", "b"),): 5}


def test_aggregate_labels_mean_integer_division(spark):
    # Go: dp.SetIntValue(dp.IntValue() / int64(dps.Len())) — truncating
    df = mk(spark, [dp("m", 5, {"d": "x"}), dp("m", 4, {"d": "y"})])
    out = metrics_transform(df, [Transform(
        include=MetricFilter("m"), action="update",
        operations=[Operation("aggregate_labels", label_set=[], aggregation_type="mean")],
    )])
    assert out.collect()[0].value == 4  # (5+4)//2


def test_aggregate_label_values(spark):
    df = mk(spark, [
        dp("m", 1, {"env": "dev1"}), dp("m", 2, {"env": "dev2"}),
        dp("m", 4, {"env": "prod"}),
    ])
    out = metrics_transform(df, [Transform(
        include=MetricFilter("m"), action="update",
        operations=[Operation("aggregate_label_values", label="env",
                              aggregated_values=["dev1", "dev2"],
                              new_value="dev", aggregation_type="sum")],
    )])
    got = {r.attributes["env"]: r.value for r in out.collect()}
    assert got == {"dev": 3, "prod": 4}


def test_delta_sum_groups_on_start_time(spark):
    df = mk(spark, [
        dp("m", 1, {"d": "x"}, start=10, mtype="sum", temp="delta"),
        dp("m", 2, {"d": "y"}, start=20, mtype="sum", temp="delta"),
        dp("m", 4, {"d": "z"}, start=20, mtype="sum", temp="delta"),
    ])
    out = metrics_transform(df, [Transform(
        include=MetricFilter("m"), action="update",
        operations=[Operation("aggregate_labels", label_set=[], aggregation_type="sum")],
    )])
    got = sorted((r.start_time_unix, r.value) for r in out.collect())
    assert got == [(10, 1), (20, 6)]  # delta temporality keys on start ts


def test_combine_with_submatch_labels(spark):
    df = mk(spark, [
        dp("mtr_read_total", 3, {"disk": "d0"}),
        dp("mtr_write_total", 5, {"disk": "d0"}),
        dp("untouched", 9),
    ])
    out = metrics_transform(df, [Transform(
        include=MetricFilter(r"^mtr_(?P<op>[a-z]+)_total$", "regexp"),
        action="combine", new_name="mtr.ops", aggregation_type="sum",
        submatch_case="upper",
    )])
    got = rows(out)
    assert ("untouched", "1", "gauge", "", "int", (), 0, 100, 9) in got
    combined = [g for g in got if g[0] == "mtr.ops"]
    assert sorted(c[5] for c in combined) == [
        (("disk", "d0"), ("op", "READ")), (("disk", "d0"), ("op", "WRITE")),
    ]


def test_combine_incompatible_units_raises(spark):
    df = mk(spark, [dp("a_x", 1, unit="s"), dp("a_y", 1, unit="ms")])
    with pytest.raises(ValueError, match="cannot be combined"):
        metrics_transform(df, [Transform(
            include=MetricFilter("^a_", "regexp"),
            action="combine", new_name="a", aggregation_type="sum",
        )]).collect()


def test_group_action_stamps_resource_labels(spark):
    df = mk(spark, [dp("m", 1), dp("other", 2)])
    out = metrics_transform(df, [Transform(
        include=MetricFilter("m"), action="group",
        group_resource_labels={"pool": "gpu"},
    )])
    got = {r.metric_name: dict(r.attributes or {}) for r in out.collect()}
    assert got == {"m": {"resource.pool": "gpu"}, "other": {}}


def test_group_action_overwrites_colliding_label(spark):
    """A datapoint already carrying the stamped resource label key is
    overwritten (resource PutStr upsert) — regression for the
    DUPLICATED_MAP_KEY map_concat failure."""
    df = mk(spark, [dp("m", 1, {"resource.pool": "old", "keep": "k"})])
    out = metrics_transform(df, [Transform(
        include=MetricFilter("m"), action="group",
        group_resource_labels={"pool": "gpu"},
    )])
    (row,) = out.collect()
    attrs = dict(row.attributes)
    assert attrs["resource.pool"] == "gpu" and attrs["keep"] == "k"


def test_label_matchers_gate_metric_level(spark):
    # matchMetric = any-dp match -> ALL dps of the metric transform
    df = mk(spark, [
        dp("m", 1, {"env": "prod"}), dp("m", 2, {"env": "dev"}),
        dp("n", 3, {"env": "dev"}),
    ])
    out = metrics_transform(df, [Transform(
        include=MetricFilter("m", match_labels={"env": "prod"}),
        action="update", new_name="m2",
    )])
    got = sorted((r.metric_name, r.value) for r in out.collect())
    assert got == [("m2", 1), ("m2", 2), ("n", 3)]


def test_generate_calculate_and_scale(spark):
    df = mk(spark, [
        dp("mem.used", 30, ts=100),
        dp("mem.used", 60, ts=200),
        dp("mem.total", 100, ts=100),
        dp("mem.total", 120, ts=200),  # NOT first -> ignored as operand2
    ])
    out = generate_metrics(df, [
        GenerationRule("mem.utilization", unit="%", rule_type="calculate",
                       metric1="mem.used", metric2="mem.total", operation="percent"),
        GenerationRule("mem.used.mib", rule_type="scale", metric1="mem.used",
                       scale_num=1, scale_den=3),
    ])
    got = {(r.metric_name, r.time_unix): r.value for r in out.collect()}
    # operand2 = FIRST mem.total point = 100
    assert got[("mem.utilization", 100)] == 30 * 100 * FP // 100
    assert got[("mem.utilization", 200)] == 60 * 100 * FP // 100
    assert got[("mem.used.mib", 100)] == 10
    assert got[("mem.used.mib", 200)] == 20
    assert out.count() == 4 + 2 + 2  # originals pass through


def test_generate_skips_nonpositive_operand2_and_missing(spark):
    df = mk(spark, [dp("a", 5), dp("z", 0)])
    out = generate_metrics(df, [
        GenerationRule("g1", rule_type="calculate", metric1="a", metric2="z",
                       operation="divide"),     # operand2 <= 0 -> skipped
        GenerationRule("g2", rule_type="calculate", metric1="a",
                       metric2="missing", operation="add"),  # metric2 missing
    ])
    assert sorted(r.metric_name for r in out.collect()) == ["a", "z"]


def test_generate_per_group(spark):
    df = mk(spark, [
        dp("used", 10, {"host": "h1"}),
        dp("used", 10, {"host": "h2"}),
        dp("cap", 20, {"host": "h1"}),
        dp("cap", 40, {"host": "h2"}),
    ]).withColumn("host", F.col("attributes").getItem("host"))
    out = generate_metrics(df, [
        GenerationRule("util", rule_type="calculate", metric1="used",
                       metric2="cap", operation="divide"),
    ], group_cols=["host"])
    got = {r.host: r.value for r in out.collect() if r.metric_name == "util"}
    assert got == {"h1": 10 * FP // 20, "h2": 10 * FP // 40}


def test_no_shuffle_for_pure_ops(spark):
    """update/insert/scale/label ops are pure maps — no Exchange in plan."""
    df = mk(spark, [dp("m", 1)])
    out = metrics_transform(df, [Transform(
        include=MetricFilter("m"), action="update", new_name="m2",
        operations=[Operation("scale_value", scale_num=2),
                    Operation("add_label", new_label="x", new_value="y")],
    )])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
