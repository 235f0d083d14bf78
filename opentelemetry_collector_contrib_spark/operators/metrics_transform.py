"""metricstransform + metricsgeneration processors over a flat datapoint table.

Reference semantics:
- metricstransform: `processor/metricstransformprocessor/
  metrics_transform_processor_otlp.go:229-297` (update/insert/combine/group
  action loop), `operation_*.go` (the seven operations),
  `operation_aggregate_labels.go:160-210` (merge rules: sum/mean/min/max,
  int mean = integer division, merged start_time = min),
  `metrics_transform_processor.go:82-90` (submatch case).
- metricsgeneration: `processor/metricsgenerationprocessor/processor.go:41-74`
  (calculate rules skip when metric2 is missing or its first-point value
  <= 0), `utils.go:26-41` (operand2 = value of the FIRST data point of
  metric2), `utils.go:92-117` (add/subtract/multiply/divide/percent,
  divide-by-zero -> 0).

Data model — one row per NUMBER data point (the natural Spark layout of
pmetric; ResourceMetrics/ScopeMetrics nesting becomes plain columns):

    metric_name string, unit string, metric_type string ('gauge'|'sum'),
    temporality string (''|'delta'|'cumulative'), monotonic boolean,
    value_type string ('int'|'double'), attributes map<string,string>,
    start_time_unix long, time_unix long, value long

Values are integer fixed-point (the repo-wide oracle-exactness
discipline); the reference's float64 generated gauges become integer
fixed-point columns with an explicit denominator (documented divergence —
`FP` below). Everything except the aggregate operations is pure Column
codegen; aggregations are one groupBy whose key includes the canonical
sorted attribute entries (maps aren't groupable in Spark — array<struct>
is, and `array_sort(map_entries(m))` is a canonical form of m).

Scale is a rational `scale_num/scale_den` with floor division instead of
the reference's `int64(float64(v) * scale)` (exact where the float
product is exact; bit-stable cross-engine where it is not).
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# fixed-point denominator for generated divide/percent values
FP = 1_000_000

DP_COLS = [
    "metric_name", "unit", "metric_type", "temporality", "monotonic",
    "value_type", "attributes", "start_time_unix", "time_unix", "value",
]


# ---------------------------------------------------------------------------
# config surface (mirrors processor/metricstransformprocessor/config.go)
# ---------------------------------------------------------------------------


@dataclass
class MetricFilter:
    """include filter — strict or regexp on the metric name, plus optional
    per-label matchers (`experimental_match_labels`): a present key must
    match; an absent key passes only if the matcher accepts ''
    (`metrics_transform_processor_otlp.go:214-227`)."""

    include: str
    match_type: str = "strict"  # strict | regexp
    match_labels: dict[str, str] | None = None
    label_match_type: str = "strict"  # strict | regexp

    def name_match(self) -> Column:
        if self.match_type == "strict":
            return F.col("metric_name") == F.lit(self.include)
        # Go FindStringSubmatchIndex = unanchored search, like rlike
        return F.col("metric_name").rlike(_java_pattern(self.include))

    def attrs_match(self, attrs: Column | str = "attributes") -> Column:
        attrs = F.col(attrs) if isinstance(attrs, str) else attrs
        cond = F.lit(True)
        for k, v in (self.match_labels or {}).items():
            got = attrs.getItem(k)
            if self.label_match_type == "strict":
                ok_present = got == F.lit(v)
                ok_absent = F.lit(v == "")
            else:
                pat = _java_pattern(v)
                ok_present = got.rlike(pat)
                ok_absent = F.lit(bool(_re.search(v, "")))
            cond = cond & F.when(got.isNull(), ok_absent).otherwise(ok_present)
        return cond


@dataclass
class Operation:
    action: str
    label: str = ""
    new_label: str = ""
    label_value: str = ""
    new_value: str = ""
    value_actions: dict[str, str] | None = None
    label_set: list[str] | None = None
    aggregated_values: list[str] | None = None
    aggregation_type: str = "sum"  # sum | mean | min | max
    scale_num: int = 1
    scale_den: int = 1


@dataclass
class Transform:
    include: MetricFilter
    action: str  # update | insert | combine | group
    new_name: str = ""
    aggregation_type: str = "sum"
    submatch_case: str = ""  # '' | lower | upper
    group_resource_labels: dict[str, str] | None = None
    operations: list[Operation] = field(default_factory=list)


def _java_pattern(go_pattern: str) -> str:
    """Go (?P<name>…) → Java (?<name>…); patterns must otherwise stay in
    the Java∩RE2 subset (repo oracle discipline)."""
    return go_pattern.replace("(?P<", "(?<")


def _expand_name(template: str, pattern: str, name_col: Column) -> Column:
    """Go regexp ExpandString over the metric name: $1/${1}/$name/${name}
    refer to capture groups of `pattern`; unmatched groups expand to ''
    (`metrics_transform_processor_otlp.go:93-97`)."""
    gidx = _re.compile(pattern).groupindex
    jpat = _java_pattern(pattern)
    parts: list[Column] = []
    pos = 0
    for m in _re.finditer(r"\$(\d+|[A-Za-z_]\w*|\{\w+\})", template):
        if m.start() > pos:
            parts.append(F.lit(template[pos:m.start()]))
        ref = m.group(1).strip("{}")
        idx = int(ref) if ref.isdigit() else gidx.get(ref, 0)
        parts.append(F.regexp_extract(name_col, jpat, idx))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit(template)
    return F.concat(*parts) if len(parts) > 1 else parts[0]


# ---------------------------------------------------------------------------
# data-point-level operations (pure Column forms)
# ---------------------------------------------------------------------------


def _remap_value(attrs: Column, key: str, mapping: dict[str, str]) -> Column:
    got = attrs.getItem(key)
    out = got
    for old, new in mapping.items():
        out = F.when(got == F.lit(old), F.lit(new)).otherwise(out)
    return out


def _update_label(df: DataFrame, op: Operation, flt: MetricFilter, gate: Column) -> DataFrame:
    """operation_update_label.go: rename op.label to op.new_label and/or
    remap its value per value_actions; per-dp attr matchers gate it."""
    attrs = F.col("attributes")
    dpgate = gate & flt.attrs_match() & attrs.getItem(op.label).isNotNull()
    key = op.new_label or op.label
    val = attrs.getItem(op.label)
    if op.value_actions:
        val = _remap_value(attrs, op.label, op.value_actions)
    updated = F.map_concat(
        F.map_filter(attrs, lambda k, _: (k != F.lit(op.label)) & (k != F.lit(key))),
        F.map_from_arrays(F.array(F.lit(key)), F.array(val)),
    )
    return df.withColumn("attributes", F.when(dpgate, updated).otherwise(attrs))


def _add_label(df: DataFrame, op: Operation, gate: Column) -> DataFrame:
    """operation_add_label.go: put only if absent."""
    attrs = F.col("attributes")
    dpgate = gate & attrs.getItem(op.new_label).isNull()
    added = F.map_concat(
        attrs, F.map_from_arrays(F.array(F.lit(op.new_label)), F.array(F.lit(op.new_value)))
    )
    return df.withColumn("attributes", F.when(dpgate, added).otherwise(attrs))


def _delete_label_value(df: DataFrame, op: Operation, gate: Column) -> DataFrame:
    """operation_delete_label_value.go: drop dps carrying label==value."""
    hit = gate & (F.col("attributes").getItem(op.label) == F.lit(op.label_value))
    return df.filter(~F.coalesce(hit, F.lit(False)))


def _scale_value(df: DataFrame, op: Operation, flt: MetricFilter, gate: Column) -> DataFrame:
    """operation_scale_value.go with rational scale: floor(v*num/den)."""
    dpgate = gate & flt.attrs_match()
    scaled = F.floor(F.col("value") * F.lit(op.scale_num) / F.lit(op.scale_den)).cast("long")
    return df.withColumn("value", F.when(dpgate, scaled).otherwise(F.col("value")))


def _toggle_type(df: DataFrame, gate: Column) -> DataFrame:
    """operation_toggle_scalar_datatype.go — int<->double tag flip (values
    are repo-wide integer fixed-point, so the long payload is preserved;
    Go's int64(float64) round-trip is exact for the same range)."""
    flipped = F.when(F.col("value_type") == "int", F.lit("double")).otherwise(F.lit("int"))
    return df.withColumn(
        "value_type", F.when(gate, flipped).otherwise(F.col("value_type"))
    )


def _canonical_attrs() -> Column:
    return F.array_sort(F.map_entries(F.col("attributes")))


def _aggregate(df: DataFrame, agg_type: str, gate_col: str) -> DataFrame:
    """Merge data points that share (metric identity, attributes, ts[,
    start_ts when delta]) — `operation_aggregate_labels.go:86-100,160-210`.
    Gauge groups ignore start time; delta sums key on it. Int mean is
    integer division (Go `dp.IntValue() / int64(dps.Len())`), merged
    start_time is the min. Rows outside the gate pass through untouched;
    the gate column is preserved (merged rows stay gated True) so later
    operations in the same transform keep addressing them."""
    hit = df.filter(F.col(gate_col))
    miss = df.filter(~F.col(gate_col))
    start_key = F.when(
        (F.col("metric_type") != "gauge") & (F.col("temporality") == "delta"),
        F.col("start_time_unix"),
    ).alias("__start_key")
    vals = {
        "sum": F.sum("value"),
        "mean": F.floor(F.sum("value") / F.count(F.lit(1))).cast("long"),
        "min": F.min("value"),
        "max": F.max("value"),
    }
    if agg_type not in vals:
        raise ValueError(f"unknown aggregation_type {agg_type!r}")
    merged = (
        hit.groupBy(
            "metric_name", "unit", "metric_type", "temporality", "monotonic",
            "value_type", _canonical_attrs().alias("__attrs"),
            F.col("time_unix"), start_key,
        )
        .agg(
            vals[agg_type].alias("value"),
            F.min("start_time_unix").alias("start_time_unix"),
        )
        .select(
            "metric_name", "unit", "metric_type", "temporality", "monotonic",
            "value_type", F.map_from_entries("__attrs").alias("attributes"),
            "start_time_unix", "time_unix", "value",
            F.lit(True).alias(gate_col),
        )
    )
    keep_cols = DP_COLS + [gate_col]
    return miss.select(keep_cols).unionByName(merged.select(keep_cols))


def _aggregate_labels(df: DataFrame, op: Operation, gate_col: str) -> DataFrame:
    """operation_aggregate_labels.go: keep ONLY label_set keys, then merge."""
    gate = F.col(gate_col)
    keep = sorted(set(op.label_set or []))
    if keep:
        keys = F.array(*[F.lit(k) for k in keep])
        filtered = F.map_filter(F.col("attributes"), lambda k, _: F.array_contains(keys, k))
    else:
        filtered = F.map_filter(F.col("attributes"), lambda k, _: F.lit(False))
    out = df.withColumn(
        "attributes", F.when(gate, filtered).otherwise(F.col("attributes"))
    )
    return _aggregate(out, op.aggregation_type, gate_col)


def _aggregate_label_values(df: DataFrame, op: Operation, gate_col: str) -> DataFrame:
    """operation_aggregate_label_values.go: values in aggregated_values
    collapse to new_value, then merge."""
    attrs = F.col("attributes")
    mapping = {v: op.new_value for v in (op.aggregated_values or [])}
    hit = F.col(gate_col) & attrs.getItem(op.label).isNotNull()
    remapped = F.map_concat(
        F.map_filter(attrs, lambda k, _: k != F.lit(op.label)),
        F.map_from_arrays(
            F.array(F.lit(op.label)), F.array(_remap_value(attrs, op.label, mapping))
        ),
    )
    out = df.withColumn("attributes", F.when(hit, remapped).otherwise(attrs))
    return _aggregate(out, op.aggregation_type, gate_col)


def _apply_operations(df: DataFrame, t: Transform, gate: Column) -> DataFrame:
    """transformMetric: optional rename, then operations in order. The gate
    is MATERIALIZED first (`__tgate`) — rename mutates metric_name, and a
    lazy gate expression over the renamed column would stop matching."""
    df = df.withColumn("__tgate", gate)
    gate = F.col("__tgate")
    if t.new_name:
        if t.include.match_type == "regexp":
            new = _expand_name(t.new_name, t.include.include, F.col("metric_name"))
        else:
            new = F.lit(t.new_name)
        df = df.withColumn(
            "metric_name", F.when(gate, new).otherwise(F.col("metric_name"))
        )
    for op in t.operations:
        if op.action == "update_label":
            df = _update_label(df, op, t.include, gate)
        elif op.action == "add_label":
            df = _add_label(df, op, gate)
        elif op.action == "delete_label_value":
            df = _delete_label_value(df, op, gate)
        elif op.action == "scale_value":
            df = _scale_value(df, op, t.include, gate)
        elif op.action == "toggle_scalar_data_type":
            df = _toggle_type(df, gate)
        elif op.action == "aggregate_labels":
            df = _aggregate_labels(df, op, "__tgate")
        elif op.action == "aggregate_label_values":
            df = _aggregate_label_values(df, op, "__tgate")
        else:
            raise ValueError(f"unknown operation {op.action!r}")
    return df.drop("__tgate")


def _metric_gate(df: DataFrame, flt: MetricFilter) -> Column:
    """matchMetric = name match AND any-dp-attrs match
    (`metrics_transform_processor_otlp.go:105-118`): metric-granularity,
    so partially matching metrics are matched as a whole. A window any()
    over the metric name lifts the dp predicate to metric granularity;
    skipped entirely when there are no label matchers."""
    name_ok = flt.name_match()
    if not flt.match_labels:
        return name_ok
    w = Window.partitionBy("metric_name")
    any_dp = F.max(flt.attrs_match().cast("int")).over(w) == 1
    return name_ok & any_dp


def metrics_transform(df: DataFrame, transforms: list[Transform]) -> DataFrame:
    """The processor loop (`metrics_transform_processor_otlp.go:229-297`),
    transforms applied sequentially:

    - update: ops applied in place to matched metrics.
    - insert: matched dps (dp-level attr extraction, like
      extractMatchedMetric) are copied, renamed/transformed, appended.
    - combine: matched metrics are REMOVED, re-labeled from regexp
      submatches, merged into one metric named new_name.
    - group: matched metrics move to a new resource group — flat-table
      analog: group_resource_labels entries are stamped into `attributes`
      with a `resource.` prefix (partial-metric extraction drops unmatched
      dps of matched metrics, like extractAndRemoveMatchedMetrics).
    """
    for t in transforms:
        if t.action == "update":
            gate = _metric_gate(df, t.include)
            df = _apply_operations(df, t, gate)
        elif t.action == "insert":
            picked = df.filter(t.include.name_match() & t.include.attrs_match())
            inserted = _apply_operations(picked, t, F.lit(True))
            df = df.select(DP_COLS).unionByName(inserted.select(DP_COLS))
        elif t.action == "combine":
            df = _combine(df, t)
            if t.operations:
                # transformMetric also runs on the combined metric (:257)
                post = Transform(
                    include=MetricFilter(
                        t.new_name, "strict",
                        t.include.match_labels, t.include.label_match_type,
                    ),
                    action="update",
                    operations=t.operations,
                )
                df = _apply_operations(df, post, _metric_gate(df, post.include))
        elif t.action == "group":
            hit = t.include.name_match()
            dropped = df.filter(~(hit & ~t.include.attrs_match()))  # partial extraction drops unmatched dps
            # pre-filter any colliding keys: the reference's resource
            # PutStr upserts, and map_concat throws on duplicates
            _stamp_keys = [
                f"resource.{k}" for k in (t.group_resource_labels or {})
            ]
            stamp = F.map_concat(
                F.map_filter(
                    F.col("attributes"),
                    lambda k, _: ~k.isin(*_stamp_keys)
                    if _stamp_keys
                    else F.lit(True),
                ),
                F.map_from_arrays(
                    F.array(*[F.lit(k) for k in _stamp_keys]),
                    F.array(*[F.lit(v) for v in (t.group_resource_labels or {}).values()]),
                ),
            ) if t.group_resource_labels else F.col("attributes")
            df = dropped.withColumn(
                "attributes", F.when(hit, stamp).otherwise(F.col("attributes"))
            )
        else:
            raise ValueError(f"unknown transform action {t.action!r}")
    return df


def _combine(df: DataFrame, t: Transform) -> DataFrame:
    """Combine action: submatch capture groups become labels on every dp of
    each matched metric (named groups, or `$i` for unnamed; submatch_case
    upper/lower; empty submatches are NOT set —
    `metrics_transform_processor_otlp.go:399-436`), then one grouped merge.

    canBeCombined's type/unit/temporality compatibility check
    (`:313-358`) is enforced with a bounded metadata agg (distinct
    (type, unit, temporality, monotonic) tuples over matched rows — a
    driver-side guard on a handful of rows, not a data collect)."""
    hit = t.include.name_match()
    matched = df.filter(hit)
    rest = df.filter(~hit)
    meta = matched.select("metric_type", "unit", "temporality", "monotonic").distinct().collect()
    if len(meta) > 1:
        raise ValueError(f"metrics cannot be combined: incompatible {sorted(map(tuple, meta))}")
    if not meta:
        return df
    pattern = t.include.include
    gidx = _re.compile(pattern).groupindex
    n_groups = _re.compile(pattern).groups
    jpat = _java_pattern(pattern)
    idx_to_name = {v: k for k, v in gidx.items()}
    out = matched
    for i in range(1, n_groups + 1):
        label = idx_to_name.get(i, f"${i}")
        sub = F.regexp_extract(F.col("metric_name"), jpat, i)
        if t.submatch_case == "lower":
            sub = F.lower(sub)
        elif t.submatch_case == "upper":
            sub = F.upper(sub)
        stamped = F.map_concat(
            F.map_filter(F.col("attributes"), lambda k, _: k != F.lit(label)),
            F.map_from_arrays(F.array(F.lit(label)), F.array(sub)),
        )
        out = out.withColumn(
            "attributes", F.when(sub != "", stamped).otherwise(F.col("attributes"))
        )
    out = out.withColumn("metric_name", F.lit(t.new_name)).withColumn("__gate", F.lit(True))
    combined = _aggregate(out, t.aggregation_type, "__gate")
    return rest.select(DP_COLS).unionByName(combined.select(DP_COLS))


# ---------------------------------------------------------------------------
# metricsgeneration
# ---------------------------------------------------------------------------


@dataclass
class GenerationRule:
    name: str
    unit: str = ""
    rule_type: str = "calculate"  # calculate | scale
    metric1: str = ""
    metric2: str = ""
    operation: str = "add"  # add|subtract|multiply|divide|percent
    scale_num: int = 1
    scale_den: int = 1


def generate_metrics(
    df: DataFrame,
    rules: list[GenerationRule],
    group_cols: list[str] | None = None,
    order_col: str = "time_unix",
    id_col: str | None = None,
) -> DataFrame:
    """metricsgeneration processor over flat gauge dps. Per resource group
    (`group_cols`; [] = one global group) and rule: operand2 is the value
    of metric2's FIRST data point (`utils.go:26-41` — pdata slice order;
    table analog: min (order_col[, id_col]) — deterministic), the rule is
    skipped when metric1/metric2 are absent or operand2 <= 0
    (`processor.go:50-66`), and one generated dp is appended per metric1 dp.

    divide/percent emit integer fixed-point (×FP denominator, floor) where
    the reference emits float64 — the repo's bit-exactness discipline;
    divide-by-zero can't reach the kernel (operand2 <= 0 already skipped,
    matching calculateValue's 0-guard). One broadcast join per rule batch:
    operand2 is a group-count-bounded aggregate, never a data shuffle."""
    group_cols = group_cols or []
    order_key = F.struct(
        F.col(order_col), *( [F.col(id_col)] if id_col else [] ), F.col("value")
    )
    firsts = (
        df.groupBy(*group_cols, "metric_name")
        .agg(F.min(order_key).getField("value").alias("__first_value"))
    )
    outs = [df]
    for rule in rules:
        m1 = df.filter(F.col("metric_name") == rule.metric1)
        if rule.rule_type == "scale":
            gen = m1.withColumn(
                "value",
                F.floor(F.col("value") * F.lit(rule.scale_num) / F.lit(rule.scale_den)).cast("long"),
            )
        else:
            op2 = firsts.filter(
                (F.col("metric_name") == rule.metric2) & (F.col("__first_value") > 0)
            ).select(*group_cols, F.col("__first_value").alias("__op2"))
            joined = (
                m1.join(F.broadcast(op2), on=group_cols, how="inner")
                if group_cols
                else m1.crossJoin(F.broadcast(op2))
            )
            v1, v2 = F.col("value"), F.col("__op2")
            expr = {
                "add": v1 + v2,
                "subtract": v1 - v2,
                "multiply": v1 * v2,
                "divide": F.floor(v1 * F.lit(FP) / v2).cast("long"),
                "percent": F.floor(v1 * F.lit(100 * FP) / v2).cast("long"),
            }[rule.operation]
            gen = joined.withColumn("value", expr.cast("long")).drop("__op2")
        gen = (
            gen.withColumn("metric_name", F.lit(rule.name))
            .withColumn("unit", F.lit(rule.unit))
            .withColumn("metric_type", F.lit("gauge"))
            .withColumn("temporality", F.lit(""))
            .withColumn("value_type", F.lit("int" if rule.rule_type == "scale" or rule.operation in ("add", "subtract", "multiply") else "double"))
        )
        outs.append(gen.select(df.columns))
    res = outs[0]
    for g in outs[1:]:
        res = res.unionByName(g)
    return res
