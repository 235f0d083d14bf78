"""Filter processor — `processor/filterprocessor/logs.go:29-106`.

Reference: drop log records matching any of a list of OTTL conditions
(ORed — ConditionSequence with logicOperation OR, `parser.go:332-361`), or
the legacy include/exclude matchers (strict/regexp on body / severity /
attributes, plus min_severity). All become one `df.filter(~cond)`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..ottl import compile_condition
from ..ottl.compiler import LogContext


def filter_logs_ottl(
    df: DataFrame, conditions: list[str], ctx: LogContext | None = None
) -> DataFrame:
    """Drop rows where ANY condition matches (filterprocessor semantics:
    match → drop)."""
    if not conditions:
        return df
    cond = None
    for c in conditions:
        cc = F.coalesce(compile_condition(c, ctx, schema=df.schema), F.lit(False))
        cond = cc if cond is None else (cond | cc)
    return df.filter(~cond)


def filter_logs_legacy(
    df: DataFrame,
    include_body_regex: str | None = None,
    exclude_body_regex: str | None = None,
    min_severity: int | None = None,
    body_col: str = "body",
    severity_col: str = "severity_number",
) -> DataFrame:
    """Legacy match properties (`internal/filter/filterlog/filterlog.go:30-140`):
    include = keep only matches; exclude = drop matches; min_severity keeps
    records at or above the threshold."""
    out = df
    if include_body_regex is not None:
        out = out.filter(F.col(body_col).rlike(include_body_regex))
    if exclude_body_regex is not None:
        out = out.filter(~F.coalesce(F.col(body_col).rlike(exclude_body_regex), F.lit(False)))
    if min_severity is not None:
        out = out.filter(F.col(severity_col) >= min_severity)
    return out
