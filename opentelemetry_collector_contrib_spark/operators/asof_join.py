"""As-of join — an operator Spark lacks natively (prompt §custom operators).

For each left row, attach the most recent right row with the same key and
``right.ts <= left.ts`` (backward as-of). Implemented as the union-tag
trick: tag both sides, union, sort within key by (ts, tag), and carry the
last seen right values forward with a window — ONE shuffle on the key, no
range-join explosion, no per-row Python. This is the scalable plan shape
(the naive inequality join is O(n·m) per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Returns left columns + value_cols{suffix} (null when no prior right
    row exists). Right-side ties at equal ts: the right row sorts BEFORE the
    left row (tag order), so an exactly-simultaneous right row matches."""
    lcols = left.columns
    l = left.select(
        *lcols, F.lit(1).alias("__tag"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__r_{v}") for v in value_cols],
    )
    r = right.select(
        *[F.col(c) for c in key_cols],
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in key_cols and c != ts_col],
        F.lit(0).alias("__tag"),
        *[F.col(v).alias(f"__r_{v}") for v in value_cols],
    ).select(*l.columns)  # align column order

    u = l.unionByName(r)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "*",
        *[
            F.last(F.col(f"__r_{v}"), ignorenulls=True).over(w).alias(f"{v}{suffix}")
            for v in value_cols
        ],
    )
    return carried.filter(F.col("__tag") == 1).drop(
        "__tag", *[f"__r_{v}" for v in value_cols]
    )
