"""Transform processor — `processor/transformprocessor`.

Reference config: ``log_statements: [{context, conditions, statements}]``;
each group's conditions gate the group (ORed), then statements run in order
(`internal/logs/processor.go:24-59`, `internal/common/logs.go:101-130`).
Statements parse at config-validation time (`config.go:63-70`) — mirrored
here: parse errors surface when the TransformProcessor is constructed, not
at execution.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ottl import compile_condition
from ..ottl.compiler import Compiler, LogContext
from ..ottl.parser import parse_condition, parse_statement


@dataclass
class StatementGroup:
    statements: list[str]
    conditions: list[str] = field(default_factory=list)  # ORed gate


class TransformProcessor:
    def __init__(self, groups: list[StatementGroup], ctx: LogContext | None = None):
        self.ctx = ctx or LogContext()
        self.compiled = []
        for g in groups:
            # fail fast at build time (Config.Validate analog)
            conds = [parse_condition(c) for c in g.conditions]
            stmts = [parse_statement(s) for s in g.statements]
            self.compiled.append((conds, stmts))

    def process(self, df: DataFrame) -> DataFrame:
        c = Compiler(self.ctx, schema=df.schema)
        for conds, stmts in self.compiled:
            gate = None
            for cond_ast in conds:
                cc = F.coalesce(c.condition(cond_ast), F.lit(False))
                gate = cc if gate is None else (gate | cc)
            for stmt in stmts:
                df = c.statement(df, stmt, extra_cond=gate)
        return df
