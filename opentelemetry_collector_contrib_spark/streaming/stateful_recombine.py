"""Streaming recombine — stateful multiline assembly across micro-batches.

Batch recombine (operators/recombine.py) segments within one frame; a
stream delivers a logical entry's lines across micro-batches, so the
in-progress segment must live in **group state** keyed by source — exactly
the reference's per-source batch map with force_flush_timeout
(`transformer/recombine/transformer.go:95-246`: flush on boundary match,
max_batch_size, or ticker).

``applyInPandasWithState`` holds (pending lines, count, last offset) per
source; a boundary line flushes the pending segment; a processing-time
timeout flushes stragglers — the ticker-at-timeout/5 analog. State size is
bounded by max_batch_size per source (max_sources eviction is the state
store's TTL at scale).
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("combined", T.StringType()),
        T.StructField("n_lines", T.IntegerType()),
        T.StructField("flushed_by", T.StringType()),  # boundary|timeout|size
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("pending", T.StringType()),
        T.StructField("n_lines", T.IntegerType()),
    ]
)


def stateful_recombine(
    df: DataFrame,
    is_first_regex: str,
    combine_with: str = "\n",
    max_batch_size: int = 1000,
    flush_timeout_ms: int = 5000,
    source_col: str = "source",
    order_col: str = "offset",
    line_col: str = "line",
) -> DataFrame:
    """Input stream of (source, offset, line) → stream of combined entries."""
    import re

    pat = re.compile(is_first_regex)

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (source,) = key
        if state.hasTimedOut:
            if state.exists:
                pending, n = state.get
                state.remove()
                if pending:
                    yield pd.DataFrame(
                        {"source": [source], "combined": [pending],
                         "n_lines": [n], "flushed_by": ["timeout"]}
                    )
            return

        pending, n = state.get if state.exists else ("", 0)
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(order_col)
            for line in pdf[line_col].astype(str):
                boundary = bool(pat.search(line))
                if boundary and n > 0:
                    out_rows.append((source, pending, n, "boundary"))
                    pending, n = "", 0
                pending = line if n == 0 else pending + combine_with + line
                n += 1
                if n >= max_batch_size:
                    out_rows.append((source, pending, n, "size"))
                    pending, n = "", 0
        state.update((pending, n))
        state.setTimeoutDuration(flush_timeout_ms)
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["source", "combined", "n_lines", "flushed_by"]
            )

    return (
        df.groupBy(source_col)
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
