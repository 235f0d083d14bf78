"""Count-min sketch over token streams — bounded-memory frequency
estimates for vocab audits at corpus scale.

The exact `textstats.token_frequencies` aggregate is vocab-bounded, which
is fine for BPE vocabs; a CMS bounds state at d×w counters REGARDLESS of
key cardinality (URLs, n-grams, user ids) — the standard heavy-hitter
sketch (Cormode & Muthukrishnan 2005). Unlike most sketches, CMS is
DETERMINISTIC given its hash functions: est(x) = min_r counts[r][h_r(x)],
every value an int64 — so the dual-engine oracle replays the whole sketch
exactly with the same mix32 probes. est(x) ≥ true(x) always (collisions
only add), with ε·N overcount at the usual d=⌈ln 1/δ⌉, w=⌈e/ε⌉ bounds.

Physical shape: the sketch build is one groupBy over (row, bucket) —
map-side partial agg collapses each partition to ≤ d·w rows, so the
exchange carries ~d·w·partitions counters, independent of corpus size.
Estimation broadcast-joins the (≤ d·w row) sketch to the queried keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import mix32_col

CMS_DEPTH = 4
CMS_WIDTH = 1024


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    weight_col: str | None = None,
) -> DataFrame:
    """(r, bucket, cnt) sketch rows — ≤ depth×width of them. Each input key
    occurrence (optionally weighted) increments one bucket per row r, with
    bucket = mix32(key, seed=r+1) % width."""
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    (mix32_col(F.col(key_col), seed=r + 1) % F.lit(width)).alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    ).alias("__rb")
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    return (
        df.select(rows, w.alias("__w"))
        .select("__rb.r", "__rb.bucket", "__w")
        .groupBy("r", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """keys + est column: min over the sketch's d probes. Keys absent from
    the stream estimate ≥ 0 (whatever collided into their buckets)."""
    probed = keys.withColumn(
        "__rb",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (mix32_col(F.col(key_col), seed=r + 1) % F.lit(width)).alias(
                            "bucket"
                        ),
                    )
                    for r in range(depth)
                ]
            )
        ),
    ).select(*keys.columns, F.col("__rb.r").alias("r"), F.col("__rb.bucket").alias("bucket"))
    j = probed.join(F.broadcast(sketch), on=["r", "bucket"], how="left")
    return (
        j.groupBy(*keys.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
