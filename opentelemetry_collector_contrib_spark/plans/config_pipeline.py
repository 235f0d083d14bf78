"""Collector-config-driven pipeline assembly.

The "switching user" surface: a config object shaped like the reference's
YAML (receivers → processors → connectors → exporters) builds the whole
DataFrame pipeline. Mirrors:

- transform processor ``log_statements`` groups (`processor/
  transformprocessor/config.go:27-29`)
- filter processor ``log_record`` conditions (`processor/filterprocessor`)
- attributes actions (`processor/attributesprocessor`)
- routing connector table + default + match_once (`connector/
  routingconnector/config.go:22-66`)
- count connector metrics {conditions, attribute dims, default_value}
  (`connector/countconnector/config.go:43-120`)

Everything parses/compiles at build time (config errors fail fast, like
``Config.Validate``), then ``run`` applies the stages in collector order.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.attributes import Action, apply_attributes
from ..operators.count_connector import CountMetric, count_logs
from ..operators.filter_processor import filter_logs_ottl
from ..operators.router import routes_from_ottl, route_match_once, route_multicast
from ..operators.transform_processor import StatementGroup, TransformProcessor
from ..ottl import compile_condition


@dataclass
class PipelineConfig:
    # processors, applied in order
    transform_groups: list[StatementGroup] = field(default_factory=list)
    filter_conditions: list[str] = field(default_factory=list)  # OTTL, ORed, drop-on-match
    attribute_actions: list[Action] = field(default_factory=list)
    # routing connector
    route_table: list[tuple[str, str]] = field(default_factory=list)  # (name, "route() where ...")
    match_once: bool = True
    # count connector: (metric_name, ottl_condition_or_None)
    count_metrics: list[tuple[str, str | None]] = field(default_factory=list)
    count_dims: list[str] = field(default_factory=list)
    count_defaults: dict[str, str] = field(default_factory=dict)


class ConfigPipeline:
    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        # fail-fast compilation (Config.Validate analog)
        self.transform = TransformProcessor(cfg.transform_groups) if cfg.transform_groups else None
        self.routes = routes_from_ottl(cfg.route_table) if cfg.route_table else []
        self.metrics = [
            CountMetric(name, compile_condition(cond) if cond else None)
            for name, cond in cfg.count_metrics
        ] or None
        # pre-parse filter conditions for fail-fast
        for c in cfg.filter_conditions:
            compile_condition(c)

    def run(self, df: DataFrame, spark: SparkSession) -> tuple[DataFrame, DataFrame | None]:
        cfg = self.cfg
        if self.transform is not None:
            df = self.transform.process(df)
        if cfg.filter_conditions:
            df = filter_logs_ottl(df, cfg.filter_conditions)
        if cfg.attribute_actions:
            df = apply_attributes(df, cfg.attribute_actions)
        routed = df
        if self.routes:
            routed = (
                route_match_once(df, self.routes)
                if cfg.match_once
                else route_multicast(df, self.routes)
            )
        aggs = None
        if cfg.count_dims:
            aggs = count_logs(
                routed, cfg.count_dims, self.metrics, attr_defaults=cfg.count_defaults
            )
        return routed, aggs
