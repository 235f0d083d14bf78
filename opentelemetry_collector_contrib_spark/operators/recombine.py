"""Recombine (multiline) — `transformer/recombine/transformer.go:95-246`.

Reference semantics: batch consecutive entries per source key; a boundary
regex marks `is_first_entry` (or `is_last_entry`); matched batches are
concatenated on `combine_field` joined by `combine_with`; flush on boundary /
max_batch_size / max_log_size / force_flush_timeout.

Batch restatement: within each source, order rows by a monotonic column
(file offset analog), assign a segment id = running count of boundary
matches, then group by (source, segment). Two implementations:

- ``recombine`` — pure DataFrame: window running-sum + groupBy. The window
  shuffles by source once and sorts within partitions; Catalyst handles
  spill. Preferred at scale (no Python).
- ``recombine_pandas`` — applyInPandas segmentation, demonstrating the
  custom-stateful-operator escape hatch (and honoring max_batch_size which
  the window form also supports via batch splitting).

Processing-time flush semantics (force_flush_timeout, ticker at timeout/5 —
transformer.go:58-81) only exist in streaming; see streaming/ for the
session-window analog.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def recombine(
    df: DataFrame,
    source_col: str,
    order_col: str,
    combine_col: str,
    is_first_regex: str,
    combine_with: str = "\n",
    max_batch_size: int | None = None,
) -> DataFrame:
    """Returns (source, segment_id, n_lines, combined)."""
    w = Window.partitionBy(source_col).orderBy(order_col)
    boundary = F.col(combine_col).rlike(is_first_regex).cast("int")
    segmented = df.withColumn("segment_id", F.sum(boundary).over(w).cast("string"))
    if max_batch_size is not None:
        # flush-on-max_batch_size: split oversized segments by position
        w2 = Window.partitionBy(source_col, "segment_id").orderBy(order_col)
        pos = F.row_number().over(w2) - 1
        segmented = segmented.withColumn(
            "segment_id",
            F.concat_ws(
                "#",
                F.col("segment_id"),
                F.floor(pos / max_batch_size).cast("string"),
            ),
        )
    return (
        segmented.groupBy(source_col, "segment_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(combine_col).alias("v")))
                ).getField("v"),
                combine_with,
            ).alias("combined"),
        )
    )


def recombine_pandas(
    df: DataFrame,
    source_col: str,
    order_col: str,
    combine_col: str,
    is_first_regex: str,
    combine_with: str = "\n",
) -> DataFrame:
    """applyInPandas variant — per-source segmentation in one pass (the
    stateful-operator escape hatch for semantics a window can't express)."""
    import re

    out_schema = (
        f"{source_col} string, segment_id string, n_lines long, combined string"
    )

    def seg(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        pat = re.compile(is_first_regex)
        seg_ids = pdf[combine_col].map(lambda s: 1 if pat.search(str(s)) else 0).cumsum()
        grouped = pdf.groupby(seg_ids)
        rows = []
        for sid, g in grouped:
            rows.append(
                {
                    source_col: key[0],
                    "segment_id": str(sid),
                    "n_lines": len(g),
                    "combined": combine_with.join(g[combine_col].astype(str)),
                }
            )
        return pd.DataFrame(rows)

    return df.groupBy(source_col).applyInPandas(seg, schema=out_schema)
