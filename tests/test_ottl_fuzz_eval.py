"""Fuzz equivalence: random OTTL arithmetic/comparison expressions must
evaluate identically in the Column compiler and a reference Python
evaluator. All expressions evaluate in ONE Spark job (each compiled to a
column of a single select)."""

import random

import pytest
from pyspark.sql import Row, functions as F

from opentelemetry_collector_contrib_spark.ottl import parse_condition
from opentelemetry_collector_contrib_spark.ottl.compiler import Compiler
from opentelemetry_collector_contrib_spark.ottl.parser import parse_statement
from opentelemetry_collector_contrib_spark.functions.hashing import (
    SAMPLER_BUCKETS,
    sampler_keep_col,
)

ROW = {"a": 7, "b": 3, "c": 12, "flag": True, "s": "hello"}


def _gen_arith(rng: random.Random, depth: int = 0) -> str:
    if depth >= 2 or rng.random() < 0.4:
        choice = rng.random()
        if choice < 0.5:
            return str(rng.randint(0, 20))
        return rng.choice(["a", "b", "c"])
    op = rng.choice(["+", "-", "*"])
    return f"({_gen_arith(rng, depth + 1)} {op} {_gen_arith(rng, depth + 1)})"


def _gen_cond(rng: random.Random) -> str:
    cmp = rng.choice(["==", "!=", "<", "<=", ">", ">="])
    base = f"{_gen_arith(rng)} {cmp} {_gen_arith(rng)}"
    if rng.random() < 0.3:
        base = f"not ({base})"
    if rng.random() < 0.3:
        base = f"({base}) {rng.choice(['and', 'or'])} ({_gen_cond_simple(rng)})"
    return base


def _gen_cond_simple(rng: random.Random) -> str:
    cmp = rng.choice(["==", "<", ">"])
    return f"{_gen_arith(rng)} {cmp} {_gen_arith(rng)}"


def _py_eval(expr: str) -> object:
    safe = expr.replace(" and ", " and ").replace(" or ", " or ")
    return eval(safe, {"__builtins__": {}}, ROW)  # noqa: S307 — test-local


def test_arithmetic_fuzz_equivalence(spark):
    rng = random.Random(424242)
    exprs = [_gen_arith(rng) for _ in range(60)]
    df = spark.createDataFrame([Row(**ROW)])
    c = Compiler()
    cols = []
    for i, e in enumerate(exprs):
        stmt = parse_statement(f"set(x, {e})")
        val = c.value(stmt.editor.args[1])
        col = val if not isinstance(val, (int, float)) else F.lit(val)
        cols.append(col.cast("long").alias(f"e{i}"))
    row = df.select(*cols).collect()[0]
    for i, e in enumerate(exprs):
        assert row[f"e{i}"] == _py_eval(e), f"expr {e!r}: spark={row[f'e{i}']}"


def test_condition_fuzz_equivalence(spark):
    rng = random.Random(77)
    conds = [_gen_cond(rng) for _ in range(60)]
    df = spark.createDataFrame([Row(**ROW)])
    c = Compiler()
    cols = []
    for i, e in enumerate(conds):
        cols.append(c.condition(parse_condition(e)).alias(f"c{i}"))
    row = df.select(*cols).collect()[0]
    for i, e in enumerate(conds):
        want = bool(_py_eval(e))
        assert row[f"c{i}"] == want, f"cond {e!r}: spark={row[f'c{i}']} py={want}"


def test_sampler_rate_converges(spark):
    n = 100_000
    df = spark.range(n)
    for pct in (10.0, 25.0, 75.0):
        kept = df.filter(sampler_keep_col(F.col("id"), pct)).count()
        assert abs(kept / n - pct / 100) < 0.01, (pct, kept)
