"""sumologicprocessor — the log-path subprocessors, in reference order.

Reference: `processor/sumologicprocessor/processor.go:31-55` runs
cloud_namespace → translate_attributes → (telegraf: metrics) → nesting →
aggregate_attributes → log_fields_conversion → (docker: metrics); the
logs path is the five implemented here.

- cloud_namespace (`cloud_namespace_processor.go:66-80`): stamp
  `cloud.namespace` for the three AWS platforms.
- translate_attributes (`translate_attributes_processor.go:20-42,88-113`):
  OTel→Sumo resource-attribute renames; a rename is SKIPPED when the Sumo
  key already exists in the ORIGINAL map, and when two sources map to the
  same Sumo key the first (map order) wins.
- nest_attributes (`nesting_processor.go:120-292`): split keys on the
  separator into a nested object; scalar/map conflicts park the scalar
  under the "" key; optional single-child squashing. Arbitrary-depth tree
  building isn't expressible as a static-schema Column, so this is the
  one Arrow-batched pandas stage (per-row pure, zero-shuffle); the nested
  result renders as a compact JSON string column.
- aggregate_attributes (`aggregate_attributes_processor.go:110-165`):
  prefix-matched keys are removed and collected (per-prefix pass order,
  map order within a pass) under one new attribute as a JSON object;
  duplicate trimmed keys keep the first position / last value (pcommon
  upsert semantics).
- log_fields_conversion (`log_fields_conversion_processor.go:94-115`):
  add loglevel/severitytext/spanid/traceid attributes when absent.

Everything except nesting is pure Column codegen over the
map<string,string> attribute columns — zero exchanges, composes into any
scan stage at 100 TB.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# translate_attributes_processor.go:20-42
ATTRIBUTE_TRANSLATIONS = {
    "cloud.account.id": "AccountId",
    "cloud.availability_zone": "AvailabilityZone",
    "cloud.platform": "aws_service",
    "cloud.region": "Region",
    "host.id": "InstanceId",
    "host.name": "host",
    "host.type": "InstanceType",
    "k8s.cluster.name": "Cluster",
    "k8s.container.name": "container",
    "k8s.daemonset.name": "daemonset",
    "k8s.deployment.name": "deployment",
    "k8s.namespace.name": "namespace",
    "k8s.node.name": "node",
    "k8s.service.name": "service",
    "k8s.pod.hostname": "host",
    "k8s.pod.name": "pod",
    "k8s.pod.uid": "pod_id",
    "k8s.replicaset.name": "replicaset",
    "k8s.statefulset.name": "statefulset",
    "service.name": "service",
    "log.file.path_resolved": "_sourceName",
}

# cloud_namespace_processor.go:19-24 (semconv v1.6.1 platform values)
CLOUD_NAMESPACES = {
    "aws_ec2": "aws/ec2",
    "aws_ecs": "ecs",
    "aws_elastic_beanstalk": "ElasticBeanstalk",
}

# plog severity numbers 1..24 → sumo loglevel names
SEVERITY_LEVELS = [
    "TRACE", "TRACE2", "TRACE3", "TRACE4",
    "DEBUG", "DEBUG2", "DEBUG3", "DEBUG4",
    "INFO", "INFO2", "INFO3", "INFO4",
    "WARN", "WARN2", "WARN3", "WARN4",
    "ERROR", "ERROR2", "ERROR3", "ERROR4",
    "FATAL", "FATAL2", "FATAL3", "FATAL4",
]


def _put(attrs: Column, key: str, value: Column) -> Column:
    """pcommon PutStr analog: upsert keeping first position on replace is
    not needed here — callers only put ABSENT keys or overwrite whole
    values where the reference PutStr order change is unobservable in a
    map<string,string> column."""
    return F.map_concat(
        F.map_filter(attrs, lambda k, _: k != F.lit(key)),
        F.map_from_arrays(F.array(F.lit(key)), F.array(value.cast("string"))),
    )


def add_cloud_namespace(df: DataFrame, resource_col: str = "resource") -> DataFrame:
    """cloud.namespace for AWS EC2/ECS/Beanstalk platforms — PutStr, so an
    existing cloud.namespace IS overwritten when the platform matches."""
    attrs = F.col(resource_col)
    platform = attrs.getItem("cloud.platform")
    ns = F.lit(None).cast("string")
    for plat, namespace in CLOUD_NAMESPACES.items():
        ns = F.when(platform == F.lit(plat), F.lit(namespace)).otherwise(ns)
    return df.withColumn(
        resource_col,
        F.when(ns.isNotNull(), _put(attrs, "cloud.namespace", ns)).otherwise(attrs),
    )


def translate_attributes(df: DataFrame, resource_col: str = "resource") -> DataFrame:
    """OTel→Sumo renames with the reference's two guards: the rename is
    skipped when the Sumo key exists in the ORIGINAL map, and among
    entries renaming to the same target the FIRST (map order) wins —
    first-position dedup over the renamed entry array."""
    attrs = F.col(resource_col)
    orig_keys = F.map_keys(attrs)

    def new_key(e: Column) -> Column:
        k = e.getField("key")
        out = k
        for ot, sumo in ATTRIBUTE_TRANSLATIONS.items():
            out = (
                F.when(
                    (k == F.lit(ot)) & ~F.array_contains(orig_keys, F.lit(sumo)),
                    F.lit(sumo),
                ).otherwise(out)
            )
        return out

    renamed = F.transform(
        F.map_entries(attrs),
        lambda e: F.struct(new_key(e).alias("key"), e.getField("value").alias("value")),
    )
    # keep the first occurrence of each (possibly colliding) new key
    return (
        df.withColumn("__renamed", renamed)
        .withColumn(resource_col, F.map_from_entries(F.expr(
            "filter(__renamed, (e, i) -> i = 0 OR NOT exists("
            "slice(__renamed, 1, i), p -> p.key = e.key))"
        )))
        .drop("__renamed")
    )


def aggregate_attributes(
    df: DataFrame,
    pairs: list[tuple[str, list[str]]],
    attr_cols: tuple[str, ...] = ("resource", "attributes"),
) -> DataFrame:
    """For each (attribute, prefixes): move prefix-matched keys (scanned
    per prefix, map order within each pass) under `attribute` as a JSON
    object with the prefixes trimmed. Trimmed-key collisions keep first
    position / last value (pcommon PutEmpty upsert). Pure codegen."""
    for col in attr_cols:
        if col not in df.columns:
            continue
        for attribute, prefixes in pairs:
            attrs = F.col(col)
            entries = F.map_entries(attrs)
            matched_any = F.lit(False)
            per_prefix = []
            # closure factories: extra lambda params would receive the
            # higher-order function's index argument in pyspark
            def make_pred(p: str, earlier: list[str]):
                def pred(e):
                    # Go removes matched keys from the map before the next
                    # prefix pass — earlier-prefix matches must not re-match
                    c = e.getField("key").startswith(p)
                    for q in earlier:
                        c = c & ~e.getField("key").startswith(q)
                    return c

                return pred

            def make_trim(p: str):
                return lambda e: F.struct(
                    F.substring(
                        e.getField("key"), len(p) + 1, 1_000_000
                    ).alias("key"),
                    e.getField("value").alias("value"),
                )

            for j, p in enumerate(prefixes):
                hit = F.filter(entries, make_pred(p, prefixes[:j]))
                trimmed = F.transform(hit, make_trim(p))
                per_prefix.append(trimmed)
                matched_any = matched_any | (F.size(hit) > 0)
            agg = per_prefix[0]
            for t in per_prefix[1:]:
                agg = F.concat(agg, t)
            df = df.withColumn("__agg", agg)
            # first-position / last-value upsert, then compact JSON render
            first_pos = F.expr(
                "filter(__agg, (e, i) -> i = 0 OR NOT exists("
                "slice(__agg, 1, i), p -> p.key = e.key))"
            )
            upserted = F.transform(
                first_pos,
                lambda e: F.struct(
                    e.getField("key").alias("key"),
                    F.element_at(
                        F.filter(
                            F.col("__agg"),
                            lambda x: x.getField("key") == e.getField("key"),
                        ),
                        -1,
                    ).getField("value").alias("value"),
                ),
            )
            # drop a pre-existing key equal to the target: the reference
            # UPSERTS (PutEmptyMap overwrites); keeping it would make
            # map_concat throw DUPLICATED_MAP_KEY under Spark's default
            # EXCEPTION dedup policy
            remaining = F.filter(
                entries, lambda e: e.getField("key") != F.lit(attribute)
            )
            for p in prefixes:
                remaining = F.filter(
                    remaining, lambda e: ~e.getField("key").startswith(p)
                )
            new_attrs = F.when(
                matched_any,
                F.map_concat(
                    F.map_from_entries(remaining),
                    F.map_from_arrays(
                        F.array(F.lit(attribute)),
                        F.array(F.to_json(F.map_from_entries(upserted))),
                    ),
                ),
            ).otherwise(attrs)
            df = df.withColumn(col, new_attrs).drop("__agg")
    return df


def _nest_one(attrs: dict, separator: str, include: tuple, exclude: tuple, squash: bool) -> str:
    """Python replay of NestingProcessor.processAttributes over one map —
    the Go algorithm verbatim, incl. the ""-key scalar/map conflict rule."""

    def should(k: str) -> bool:
        if include and not any(k.startswith(p) for p in include):
            return False
        if exclude and any(k.startswith(p) for p in exclude):
            return False
        return True

    new_map: dict = {}
    for k, v in attrs.items():
        if not should(k):
            new_map[k] = v
            continue
        keys = k.split(separator)
        container: dict = new_map
        landed: dict | None = None
        for i, part in enumerate(keys):
            last = i == len(keys) - 1
            if part in container:
                nxt = container[part]
                if isinstance(nxt, dict):
                    if last:
                        landed = nxt
                        break
                    container = nxt
                else:
                    if last:
                        # loop ends on a scalar slot — Go copies v into it
                        container[part] = v
                        break
                    # descending through a scalar: it becomes {"" : scalar}
                    conv = {"": nxt}
                    container[part] = conv
                    container = conv
            else:
                if last:
                    container[part] = v
                    break
                container[part] = {}
                container = container[part]
        if landed is not None:
            # landed on an existing map node: a map value merges, a scalar
            # parks under "" (`nesting_processor.go:167-180`)
            if isinstance(v, dict):
                landed.update(v)
            else:
                landed[""] = v

    def squash_value(value):
        if not isinstance(value, dict):
            return "", value
        if len(value) == 1:
            (k, v), = value.items()
            suffix, v2 = squash_value(v)
            key = k if suffix == "" else k + separator + suffix
            return key, v2
        out = {}
        for k, v in value.items():
            suffix, v2 = squash_value(v)
            out[k if suffix == "" else k + separator + suffix] = v2
        return "", out

    if squash:
        suffix, squashed = squash_value(new_map)
        new_map = {suffix: squashed} if suffix != "" else squashed

    return json.dumps(new_map, ensure_ascii=False, separators=(",", ":"))


def nest_attributes(
    df: DataFrame,
    separator: str = ".",
    include: tuple = (),
    exclude: tuple = (),
    squash_single_values: bool = False,
    attr_col: str = "attributes",
    out_col: str = "attributes_nested",
) -> DataFrame:
    """Nested-object rendering of a flat attribute map as a JSON string
    column — Arrow-batched mapInPandas (per-row pure, zero-shuffle)."""
    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.StringType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[out_col] = [
                _nest_one(
                    dict(m) if m is not None else {},
                    separator, include, exclude, squash_single_values,
                )
                for m in pdf[attr_col]
            ]
            yield pdf

    return df.mapInPandas(gen, schema)


def convert_log_fields(
    df: DataFrame,
    severity_number_col: str = "severity_number",
    severity_text_col: str = "severity_text",
    span_id_col: str = "span_id",
    trace_id_col: str = "trace_id",
    attr_col: str = "attributes",
) -> DataFrame:
    """log_fields_conversion: loglevel (24-level name, only when severity
    number != 0), severitytext, spanid, traceid — each only when the
    attribute is absent; empty ids render as ''."""
    attrs = F.col(attr_col)
    level = F.lit(None).cast("string")
    for i, name in enumerate(SEVERITY_LEVELS, start=1):
        level = F.when(F.col(severity_number_col) == i, F.lit(name)).otherwise(level)

    def put_absent(cur: Column, key: str, value: Column) -> Column:
        return F.when(
            cur.getItem(key).isNull() & value.isNotNull(), _put_on(cur, key, value)
        ).otherwise(cur)

    def _put_on(cur: Column, key: str, value: Column) -> Column:
        return F.map_concat(
            F.map_filter(cur, lambda k, _: k != F.lit(key)),
            F.map_from_arrays(F.array(F.lit(key)), F.array(value.cast("string"))),
        )

    out = attrs
    out = put_absent(out, "loglevel", level)
    out = put_absent(out, "severitytext", F.col(severity_text_col))
    out = put_absent(out, "spanid", F.coalesce(F.col(span_id_col), F.lit("")))
    out = put_absent(out, "traceid", F.coalesce(F.col(trace_id_col), F.lit("")))
    return df.withColumn(attr_col, out)


def sumologic_process(
    df: DataFrame,
    *,
    add_cloud_namespace_enabled: bool = True,
    translate_attributes_enabled: bool = True,
    nest: dict | None = None,
    aggregate: list[tuple[str, list[str]]] | None = None,
    log_fields: bool = False,
    resource_col: str = "resource",
    attr_col: str = "attributes",
) -> DataFrame:
    """The subprocessor chain in reference order (`processor.go:31-55`)."""
    if add_cloud_namespace_enabled and resource_col in df.columns:
        df = add_cloud_namespace(df, resource_col)
    if translate_attributes_enabled and resource_col in df.columns:
        df = translate_attributes(df, resource_col)
    if nest:
        df = nest_attributes(df, attr_col=attr_col, **nest)
    if aggregate:
        df = aggregate_attributes(df, aggregate, attr_cols=(resource_col, attr_col))
    if log_fields:
        df = convert_log_fields(df, attr_col=attr_col)
    return df
