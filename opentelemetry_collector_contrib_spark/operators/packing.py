"""Sequence packing for LLM training data.

The standard pretraining layout job: concatenate every document's tokens in
a deterministic order within a shard, then cut the stream into fixed-length
training sequences (no padding waste, documents span chunk boundaries —
GPT-style packing). Beyond the reference collector's scope; first-class for
a 100 TB training-data pipeline.

Physical shape (verified via explain): ONE exchange total. The per-shard
offset window shuffles by shard (sorting doc-count rows, not tokens);
tokens then explode with their global position, and the (shard, chunk)
groupBy is exchange-free — Catalyst recognizes HashPartitioning(shard)
already satisfies ClusteredDistribution(shard, chunk) and elides the
second shuffle. That is the minimum data movement any packing job needs
(every token must reach its output chunk exactly once).

Skew note: a hot shard serializes its doc-offset window; for 45 %-hot
shards apply the same two-level prefix-sum used by
``operators.recombine(skew_chunk=...)`` — per-doc-range chunk counts roll
up in a tiny window, ranges offset independently. The token shuffle itself
is balanced by (shard, chunk), which is uniform regardless of shard skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import mix32_col


def pack_sequences(
    df: DataFrame,
    shard_col: str,
    order_col: str,
    tokens_col: str,
    seq_len: int = 2048,
    drop_last: bool = False,
) -> DataFrame:
    """Pack per-document token arrays into fixed-length sequences per shard.

    Returns (shard, chunk_id, n_tokens, tokens) where tokens is the packed
    array in stream order; the final partial chunk is kept unless
    drop_last. Deterministic: documents concatenate in order_col order, so
    a rerun (or another engine — see the DuckDB oracle in driver_queries)
    produces identical chunks."""
    n_tok = F.size(F.col(tokens_col))
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum(n_tok).over(w), F.lit(0)).alias("__off")
    exploded = (
        df.select(F.col(shard_col), F.col(order_col), off, F.col(tokens_col))
        .select(
            shard_col,
            "__off",
            F.posexplode(F.col(tokens_col)).alias("__i", "__tok"),
        )
        .select(
            shard_col,
            (F.col("__off") + F.col("__i")).alias("__gpos"),
            "__tok",
        )
    )
    packed = (
        exploded.withColumn("chunk_id", F.floor(F.col("__gpos") / seq_len))
        .groupBy(shard_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            F.array_sort(
                F.collect_list(F.struct(F.col("__gpos").alias("g"), F.col("__tok").alias("t")))
            ).getField("t").alias("tokens"),
        )
    )
    if drop_last:
        packed = packed.filter(F.col("n_tokens") == seq_len)
    return packed


def deterministic_shuffle(
    df: DataFrame,
    key: Column,
    num_shards: int,
    seed: int = 0,
    shard_out: str = "shard_id",
    pos_out: str = "pos",
) -> DataFrame:
    """Deterministic global shuffle for training-data layout: every row gets
    a pseudo-random shard and a stable position within it, reproducible
    across reruns, cluster sizes, and engines (the pre-training requirement:
    the data order IS part of the training run's spec).

    shard = mix32(key, seed) mod num_shards; pos = rank within the shard by
    (mix32, key) — the key tiebreak makes positions total even when two keys
    collide in the 32-bit mix. ONE shuffle (hash by shard); the per-shard
    window sorts shard-sized slices. At 100 TB, num_shards is chosen so a
    shard fits an output file (e.g. 1e5 shards of ~1 GB) — the sort is
    per-shard, never global."""
    mixed = mix32_col(key, seed)
    w = Window.partitionBy(shard_out).orderBy("__mix", key)
    return (
        df.withColumn("__mix", mixed)
        .withColumn(shard_out, F.pmod(F.col("__mix"), F.lit(num_shards)).cast("int"))
        .withColumn(pos_out, (F.row_number().over(w) - 1).cast("long"))
        .drop("__mix")
    )


def chunk_documents(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping sliding-window chunking — the RAG / long-context
    preprocessing step (split each document into `window`-token chunks
    every `stride` tokens, overlap = window − stride, keep provenance):
    chunk k of a doc covers tokens [k·stride+1, k·stride+window]. A doc of
    length L yields K = 1 chunk if L ≤ window else ⌈(L−window)/stride⌉+1
    (the last chunk may be shorter — the tail is kept, standard RAG
    practice). Empty docs yield no chunks.

    Pure array expressions + posexplode, zero shuffles: per-row compute
    only, so it composes into any scan stage at 100 TB. Contrast with
    ``pack_sequences`` (concat-then-chunk across docs, for pretraining
    batches): chunking preserves doc boundaries and provenance.
    """
    t = F.col(tokens_col)
    ln = F.size(t)
    # ceil((L-window)/stride) in pure integer arithmetic (positive operands
    # → div truncation == floor; no float division to misround)
    k = F.when(ln <= window, F.lit(1)).otherwise(
        F.expr(
            f"cast((size({tokens_col}) - {window} + {stride} - 1) div {stride} as int) + 1"
        )
    )
    from pyspark.sql import types as T

    chunks = F.when(
        ln > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.slice(t, i * stride + 1, window),
        ),
    ).otherwise(F.array().cast(T.ArrayType(df.schema[tokens_col].dataType)))
    return df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk_tokens"),
    ).withColumn("chunk_len", F.size("chunk_tokens").cast("int"))
