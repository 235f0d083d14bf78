"""Range (interval) join — the second join shape Spark lacks natively
(beside `asof_join.py`).

Attach every interval [start, end) that contains a point's timestamp.
The naive plan is an inequality join — Catalyst can only run it as a
BroadcastNestedLoopJoin, O(points × intervals). The scalable shape bins
time: each interval explodes to the fixed-width bins it overlaps, each
point maps to its ONE bin, and the pair space collapses to an equi-join
on the bin id plus a residual start/end filter. Because a point owns
exactly one bin, a (point, interval) match is produced exactly once — no
dedup pass. Cost scales with Σ interval_len/bin_width, tunable; the
equi-join shuffles by bin id (or broadcasts when the interval side is
small). Same recipe as Databricks' range-join bin hints, built from
stock operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
    broadcast_intervals: bool = True,
) -> DataFrame:
    """points × intervals on start <= point_ts < end (numeric columns,
    e.g. unix seconds). `how='left'` keeps pointless rows with null
    interval columns. Intervals where end <= start produce nothing."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    p = points.withColumn("__bin", F.floor(F.col(point_ts) / bin_width))
    s, e = F.col(start_col), F.col(end_col)
    iv = intervals.filter(e > s).withColumn(
        "__bin",
        F.explode(
            F.sequence(F.floor(s / bin_width), F.floor((e - 1) / bin_width))
        ),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    cond = (
        (p["__bin"] == iv["__bin"])
        & (iv[start_col] <= p[point_ts])
        & (p[point_ts] < iv[end_col])
    )
    joined = p.join(iv, cond, how)
    return joined.drop(p["__bin"]).drop(iv["__bin"])
