"""Attributes processor — `internal/coreinternal/attraction/attraction.go`.

Action semantics (attraction.go:106-137, engine 167-340):
- insert : set only if key absent
- update : set only if key present
- upsert : set unconditionally
- delete : remove key
- hash   : SHA-256 the value in place (hasher.go:29-60 — SHA1 legacy mode
           exists in the reference; we implement SHA-256, the default)
- extract: regex with named groups over the value → new attributes fan-out
           (attraction.go:409+)
- convert: cast value type (int/double/string)

Values come from a literal, another attribute (`from_attribute`), or context.
Everything compiles to map-column expressions — one withColumn per action,
fused by Catalyst into a single projection.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _empty_map() -> Column:
    return F.create_map().cast("map<string,string>")


def _m(col: str) -> Column:
    return F.coalesce(F.col(col), _empty_map())


def _set_key(m: Column, key: str, value: Column) -> Column:
    cleaned = F.map_filter(m, lambda k, _v: k != F.lit(key))
    return F.map_concat(cleaned, F.create_map(F.lit(key), value.cast("string")))


@dataclass
class Action:
    action: str  # insert|update|upsert|delete|hash|extract|convert
    key: str
    value: object | None = None  # literal
    from_attribute: str | None = None
    pattern: str | None = None  # for extract
    converted_type: str | None = None  # for convert: int|double|string


def apply_attributes(
    df: DataFrame, actions: list[Action], map_col: str = "attributes", cond: Column | None = None
) -> DataFrame:
    """Apply the action list in order (the reference iterates actions per
    record; we fold them into successive map expressions)."""
    for a in actions:
        df = _apply_one(df, a, map_col, cond)
    return df


def _value_col(a: Action, m: Column) -> Column:
    if a.from_attribute is not None:
        return m.getItem(a.from_attribute)
    return F.lit(a.value).cast("string")


def _apply_one(df: DataFrame, a: Action, map_col: str, cond: Column | None) -> DataFrame:
    m = _m(map_col)
    has = F.map_contains_key(m, a.key)

    if a.action == "insert":
        new = F.when(has, m).otherwise(_set_key(m, a.key, _value_col(a, m)))
    elif a.action == "update":
        new = F.when(has, _set_key(m, a.key, _value_col(a, m))).otherwise(m)
    elif a.action == "upsert":
        new = _set_key(m, a.key, _value_col(a, m))
    elif a.action == "delete":
        new = F.map_filter(m, lambda k, _v: k != F.lit(a.key))
    elif a.action == "hash":
        new = F.when(
            has, _set_key(m, a.key, F.sha2(m.getItem(a.key), 256))
        ).otherwise(m)
    elif a.action == "extract":
        new = _extract(m, a.key, a.pattern)
    elif a.action == "convert":
        cur = m.getItem(a.key)
        if a.converted_type == "int":
            conv = cur.cast("double").cast("long").cast("string")
        elif a.converted_type == "double":
            conv = cur.cast("double").cast("string")
        else:
            conv = cur.cast("string")
        new = F.when(has & conv.isNotNull(), _set_key(m, a.key, conv)).otherwise(m)
    else:
        raise ValueError(f"unknown attributes action {a.action!r}")

    if cond is not None:
        new = F.when(F.coalesce(cond, F.lit(False)), new).otherwise(m)
    return df.withColumn(map_col, new)


def _extract(m: Column, key: str, pattern: str) -> Column:
    """Named groups of pattern applied to m[key] → new entries; the source
    attribute is kept (reference keeps it too)."""
    group_index = re.compile(pattern).groupindex
    if not group_index:
        raise ValueError("extract requires named capture groups")
    jvm_pat = re.sub(r"\(\?P<[^>]+>", "(", pattern)
    src = m.getItem(key)
    matched = src.rlike(jvm_pat)
    out = m
    # true group indices (not position among named groups): unnamed groups
    # in the pattern still consume an index, matching the reference's
    # SubexpNames walk (attributesprocessor extract semantics)
    for n, idx in group_index.items():
        v = F.regexp_extract(src, jvm_pat, idx)
        out = F.when(matched, _set_key(out, n, v)).otherwise(out)
    return out
