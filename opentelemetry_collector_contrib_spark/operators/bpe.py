"""Distributed BPE tokenizer training over token arrays.

Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units", §3.2) learns a merge table by repeatedly
(1) counting adjacent symbol pairs over the whole corpus, (2) picking the
most frequent pair, (3) rewriting every sequence with the merged symbol.
Every LLM tokenizer (GPT-2/3/4, LLaMA) ships a merge table learned this
way; training it IS a corpus-scale data job, so it belongs in this
engine as a first-class distributed operator rather than a single-node
preprocessing script.

Spark shape, per merge step:
- pair counting: explode adjacent (a, b) pairs → groupBy(a, b) count —
  ONE exchange bounded by |distinct observed pairs| ≤ min(V², corpus
  tokens); map-side partial agg collapses each partition first.
- argmax: orderBy(count desc, a, b).limit(1) — TakeOrderedAndProject of
  the vocab-bounded aggregate; the single winning row comes to the
  driver (the same bounded driver-side step as IVF centroid training).
  Tie-break (count desc, a asc, b asc) is total, so training is
  deterministic and the DuckDB oracle replays the identical choice.
- rewrite: a pure-JVM `aggregate` fold per row — greedy leftmost merge,
  correct on overlapping runs (a==b: "aaaa" → [new, new]) because the
  fold consumes the pending 'a' exactly when the next token is 'b'.
  Zero Python; map-only (no shuffle). The fold appends via concat, so a
  row costs O(L·copy) — fine at L≈10³; a mapInPandas kernel is the
  drop-in if sequences are much longer.
- lineage: each step localCheckpoints the rewritten corpus (the
  connected-components recipe) so K steps don't nest K fold expressions
  into one codegen unit and the argmax job doesn't recompute history.

At 10^12 sequences each step is one scan + one vocab-bounded exchange —
the canonical distributed-BPE cost (K full passes); the merge table
itself is K rows of driver state, broadcast implicitly as literals in
the next step's rewrite expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def adjacent_pair_counts(df: DataFrame, tokens_col: str = "tokens") -> DataFrame:
    """(a, b, cnt) counts of adjacent token pairs across the corpus."""
    pairs = F.expr(
        f"transform(slice({tokens_col}, 1, greatest(size({tokens_col}) - 1, 0)), "
        f"(x, i) -> struct(x as a, {tokens_col}[i + 1] as b))"
    )
    return (
        df.filter(F.size(F.col(tokens_col)) >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def apply_merge(tokens_col: str, a: int, b: int, new_id: int) -> Column:
    """Greedy leftmost rewrite of every (a, b) adjacency to new_id.

    Pure-JVM fold: the accumulator carries the output built so far plus a
    one-token lookahead flag ("holding an unconsumed a"). Greedy leftmost
    matches the reference BPE behavior on runs: with a == b, "aaa" →
    [new_id, a], "aaaa" → [new_id, new_id].
    """
    return F.expr(
        f"""aggregate(
  {tokens_col},
  struct(cast(array() as array<int>) as out, false as ha),
  (acc, x) -> CASE
    WHEN acc.ha AND x = {b} THEN
      struct(concat(acc.out, array(cast({new_id} as int))) as out, false as ha)
    WHEN x = {a} THEN
      struct(CASE WHEN acc.ha THEN concat(acc.out, array(cast({a} as int)))
                  ELSE acc.out END as out, true as ha)
    ELSE
      struct(CASE WHEN acc.ha THEN concat(acc.out, array(cast({a} as int), x))
                  ELSE concat(acc.out, array(x)) END as out, false as ha)
  END,
  acc -> CASE WHEN acc.ha THEN concat(acc.out, array(cast({a} as int)))
              ELSE acc.out END)"""
    )


def bpe_learn(
    df: DataFrame,
    tokens_col: str = "tokens",
    num_merges: int = 8,
    new_id_start: int = 50257,
    checkpoint: bool = True,
) -> tuple[list[dict], DataFrame]:
    """Learn ``num_merges`` BPE merges; return (merge table, rewritten df).

    Merge rows: {step, a, b, new_id, cnt} with new_id = new_id_start +
    step. Stops early if no adjacency remains. The returned DataFrame is
    the corpus after all merges (the encoded training set).
    """
    merges: list[dict] = []
    cur = df
    prev = None
    for step in range(num_merges):
        best = (
            adjacent_pair_counts(cur, tokens_col)
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = int(best[0]["a"]), int(best[0]["b"]), int(best[0]["cnt"])
        new_id = new_id_start + step
        merges.append({"step": step, "a": a, "b": b, "new_id": new_id, "cnt": cnt})
        cur = cur.withColumn(tokens_col, apply_merge(tokens_col, a, b, new_id))
        if checkpoint:
            cur = cur.localCheckpoint(eager=True)
            if prev is not None:
                prev.unpersist()
            prev = cur
    return merges, cur


def bpe_apply(
    df: DataFrame, merges: list[dict], tokens_col: str = "tokens"
) -> DataFrame:
    """Encode a corpus with an already-learned merge table (priority =
    learned order, exactly how BPE inference applies merges)."""
    cur = df
    for m in merges:
        cur = cur.withColumn(
            tokens_col, apply_merge(tokens_col, m["a"], m["b"], m["new_id"])
        )
    return cur
