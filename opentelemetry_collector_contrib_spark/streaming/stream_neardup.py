"""Streaming near-duplicate suppression — stateful MinHash-LSH over a
continuous ingest.

The batch path (operators/dedup.py: minhash_signature → lsh_candidate_pairs
→ connected_components) needs the whole corpus; a stream must decide
"have I seen something like this?" per micro-batch with BOUNDED state.
This operator holds one state row per occupied LSH bucket — the classic
streaming-LSH dedup cache: a document is near-novel iff it is the first
arrival in EVERY band bucket its signature hashes to; any collision with
an earlier arrival marks it a near-duplicate of that first document.

Semantics vs batch: identical candidate generation (same signature kernel,
same banding), but tie-breaking is ARRIVAL order (within a micro-batch,
``order_col`` order — deterministic) instead of global doc_id order, and
state is evicted after ``ttl_ms`` of group inactivity (the reference's
bounded dedup-cache TTL analog; an evicted bucket treats the next arrival
as first). Batch=streaming equivalence therefore holds exactly when
arrival order == id order and the TTL never fires — which is what the
equivalence test pins.

State size: one (first_doc_id) row per OCCUPIED bucket ≤ min(docs·bands,
bucket space), evicted by TTL — the same watermark-bounded-state story as
``streaming_dedup``'s dropDuplicatesWithinWatermark, but for NEAR-dups.

Physical shape: signature kernel per micro-batch (Arrow, no per-row
Python) → explode to bands (map-only) → ONE stateful exchange keyed by
(band, band signature) → per-doc verdict re-aggregate in the sink's
foreachBatch. Nothing but (id, band-key) rows cross the wire.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

BAND_SCHEMA = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("s0", T.LongType()),
        T.StructField("s1", T.LongType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("first_doc_id", T.StringType()),
        T.StructField("is_first", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("first_doc_id", T.StringType())])


def band_rows(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    num_perms: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """(id, band, s0, s1) — exploded LSH band keys, batch or streaming.

    Reuses the batch Arrow MinHash kernel (bit-identical signatures), so
    a streaming run and a batch run bucket identically. Docs with empty
    token arrays (null signature) are dropped, matching the batch path's
    null-rejecting bucket join.
    """
    from ..operators.dedup import minhash_signature

    assert rows_per_band == 2, "band key schema is fixed at 2 rows/band"
    sig = minhash_signature(df, tokens_col, num_perms=num_perms)
    bands = num_perms // rows_per_band
    entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.col(f"mh{2 * b}").cast("long").alias("s0"),
                F.col(f"mh{2 * b + 1}").cast("long").alias("s1"),
            )
            for b in range(bands)
        ]
    )
    return (
        sig.filter(F.col("mh0").isNotNull())
        .select(F.col(id_col).alias("doc_id"), F.explode(entries).alias("e"))
        .select("doc_id", "e.band", "e.s0", "e.s1")
    )


def streaming_neardup_bands(
    stream: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    num_perms: int = 8,
    ttl_ms: int | None = 600_000,
) -> DataFrame:
    """Streaming (id, band-key) rows → per-band first/duplicate verdicts.

    One applyInPandasWithState exchange keyed by the band bucket; state is
    the bucket's first-arrival doc id, TTL-evicted after ``ttl_ms`` of
    inactivity. ``ttl_ms=None`` disables the timeout — state is unbounded
    but an availableNow drain terminates after the data batches
    (processing-time timeouts schedule extra no-data batches that keep an
    availableNow query alive; use None for bounded drains/tests, a TTL
    for continuous ingest).
    """
    rows = band_rows(stream, id_col, tokens_col, num_perms=num_perms)

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        band, s0, s1 = key
        if state.hasTimedOut:
            state.remove()
            return
        (first,) = state.get if state.exists else (None,)
        out = []
        # Materialize the whole group before deciding first-arrival: pdfs is
        # an iterator of Arrow CHUNKS, and a heavy-duplicate bucket spans
        # several. Sorting per chunk would make "first" the min of the first
        # chunk only — dependent on upstream chunk boundaries — breaking the
        # documented in-batch determinism (first = min doc_id per bucket)
        # and the batch=streaming equivalence the oracle pins.
        chunks = [pdf["doc_id"] for pdf in pdfs]
        docs = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        for doc in docs.sort_values():
            if first is None:
                first = doc
                out.append((band, s0, s1, doc, doc, True))
            else:
                out.append((band, s0, s1, doc, first, False))
        state.update((first,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if out:
            yield pd.DataFrame(out, columns=[f.name for f in BAND_SCHEMA])

    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return rows.groupBy("band", "s0", "s1").applyInPandasWithState(
        fn,
        outputStructType=BAND_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


def neardup_verdicts(band_df: DataFrame) -> DataFrame:
    """Per-doc verdict from per-band rows (the foreachBatch half):
    (doc_id, n_bands, is_dup, dup_of) — dup iff ANY band collided with an
    earlier arrival; dup_of = the smallest such first-arrival id."""
    return band_df.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_bands"),
        F.max(~F.col("is_first")).alias("is_dup"),
        F.min(F.when(~F.col("is_first"), F.col("first_doc_id"))).alias("dup_of"),
    )
