"""Record-level transformers — stanza `pkg/stanza/operator/transformer/*`.

Each is a thin declarative DataFrame projection; Catalyst folds chains of
these into a single whole-stage-codegen'd select, which is the entire point
of rebuilding the per-record Go interpreters as column expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def add(df: DataFrame, field: str, value) -> DataFrame:
    """`transformer/add/transformer.go:27` — set field to literal or Column
    (Column ≈ the reference's EXPR(...))."""
    col = value if isinstance(value, Column) else F.lit(value)
    return df.withColumn(field, col)


def move(df: DataFrame, src: str, dst: str) -> DataFrame:
    """`transformer/move/transformer.go:21`."""
    return df.withColumn(dst, F.col(src)).drop(src)


def copy(df: DataFrame, src: str, dst: str) -> DataFrame:
    """`transformer/copy/transformer.go:22`."""
    return df.withColumn(dst, F.col(src))


def remove(df: DataFrame, *fields: str) -> DataFrame:
    """`transformer/remove/transformer.go:23`."""
    return df.drop(*fields)


def retain(df: DataFrame, *fields: str) -> DataFrame:
    """`transformer/retain/transformer.go:22` — keep listed fields only."""
    return df.select(*fields)


def flatten(df: DataFrame, struct_field: str) -> DataFrame:
    """`transformer/flatten/transformer.go:22` — hoist one nesting level."""
    cols = [c for c in df.columns if c != struct_field]
    return df.select(*cols, F.col(f"{struct_field}.*"))


def assign_keys(df: DataFrame, list_field: str, keys: list[str], parse_to: str) -> DataFrame:
    """`transformer/assignkeys/transformer.go:21` — zip values with names."""
    keys_arr = F.array(*[F.lit(k) for k in keys])
    vals = F.slice(F.col(list_field), 1, len(keys))
    return df.withColumn(parse_to, F.map_from_arrays(keys_arr, vals))


def unquote(df: DataFrame, field: str) -> DataFrame:
    """`transformer/unquote/transformer.go:19` — strip wrapping quotes."""
    c = F.col(field)
    stripped = F.regexp_replace(c, r'^"(.*)"$', r"$1")
    return df.withColumn(field, stripped)


def filter_drop(df: DataFrame, cond: Column, drop_ratio: float = 1.0) -> DataFrame:
    """`transformer/filter/transformer.go:26-56` — DROP rows matching cond.

    drop_ratio < 1.0 drops only that fraction of matches (the reference draws
    a random cutoff in [0,1000); we keep Spark's rand() with a fixed seed so
    retries of a task are deterministic).
    """
    if drop_ratio >= 1.0:
        return df.filter(~F.coalesce(cond, F.lit(False)))
    return df.filter(
        ~F.coalesce(cond, F.lit(False)) | (F.rand(seed=7) >= F.lit(drop_ratio))
    )


def noop(df: DataFrame) -> DataFrame:
    return df
