"""Honeycomb marker exporter parity — log records matching OTTL
conditions → marker POST requests.

Reference behavior
(`exporter/honeycombmarkerexporter/logs_exporter.go:79-140`):

- each configured marker carries OTTL log conditions (ORed, standard
  log funcs, PropagateError); every record is evaluated against every
  marker, and each match produces one POST;
- request body = Go json.Marshal of ``{"type": <marker type>
  [, "message": attrs[message_key].AsString()]
  [, "url": attrs[url_key].AsString()]}`` — keys present only when
  the attribute exists (map marshal → sorted keys);
- target path = ``/1/markers/<dataset_slug>`` with the slug
  defaulting to ``__all__``.

Spark shape: condition evaluation reuses the repo's OTTL compiler —
each marker compiles ONCE to a Column predicate (Catalyst, not a
per-record interpreter), so the match scan is pure codegen; only the
request-JSON assembly is a map (and even that is a JVM ``concat``).
One pass per marker over the DataFrame, no shuffles.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from ..ottl import compile_condition
from ..ottl.compiler import LogContext

__all__ = ["Marker", "honeycomb_markers"]


@dataclass
class Marker:
    type: str
    rules: list[str] = field(default_factory=list)
    message_key: str = "message"
    url_key: str = "url"
    dataset_slug: str = ""


def _jstr(col):
    # Go-JSON string escaping for the small attr payloads: the OTTL
    # values here are attribute strings; quote + escape backslash/quote
    # (HTML-escape divergence is irrelevant for the marker keys the
    # reference reads, but apply the < family for parity anyway)
    s = F.regexp_replace(col, r"\\", r"\\\\")
    s = F.regexp_replace(s, '"', '\\\\"')
    s = F.regexp_replace(s, "<", "\\\\u003c")
    s = F.regexp_replace(s, ">", "\\\\u003e")
    s = F.regexp_replace(s, "&", "\\\\u0026")
    return F.concat(F.lit('"'), s, F.lit('"'))


def honeycomb_markers(
    df: DataFrame,
    markers: list[Marker],
    ctx: LogContext | None = None,
) -> DataFrame:
    """Match every record against every marker; one output row per
    match: (marker_type, dataset_slug, url_path, request_json)."""
    outs = []
    for m in markers:
        cond = None
        for rule in m.rules:
            cc = F.coalesce(
                compile_condition(rule, ctx, schema=df.schema),
                F.lit(False),
            )
            cond = cc if cond is None else (cond | cc)
        if cond is None:
            continue
        slug = m.dataset_slug or "__all__"
        msg = F.col("attributes")[m.message_key]
        url = F.col("attributes")[m.url_key]
        # json.Marshal(map[string]string) sorts keys:
        # message < type < url
        body = F.concat(
            F.lit("{"),
            F.when(
                msg.isNotNull(),
                F.concat(F.lit('"message":'), _jstr(msg), F.lit(",")),
            ).otherwise(F.lit("")),
            F.lit('"type":'), _jstr(F.lit(m.type)),
            F.when(
                url.isNotNull(),
                F.concat(F.lit(',"url":'), _jstr(url)),
            ).otherwise(F.lit("")),
            F.lit("}"),
        )
        outs.append(
            df.filter(cond).select(
                F.lit(m.type).alias("marker_type"),
                F.lit(slug).alias("dataset_slug"),
                F.lit(f"/1/markers/{slug}").alias("url_path"),
                body.alias("request_json"),
            )
        )
    if not outs:
        return df.sparkSession.createDataFrame(
            [],
            "marker_type string, dataset_slug string, url_path string, "
            "request_json string",
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out
