"""Bigram language-model fluency scoring for corpus curation.

CCNet (Wenzek et al. 2020, §4.3) and the LLaMA/GPT-3 data pipelines gate
CommonCrawl with the perplexity of a small LM trained on target-domain
text (Wikipedia), bucketing documents into head/middle/tail by score.
This is that component in DataFrame form: train an add-one-smoothed
BIGRAM model on an in-domain subset, score every document with it, and
bucket by the score.

Exactness discipline (the repo's oracle rule — no floats summed in
nondeterministic order): instead of summing log-probabilities (libm `ln`
is not bit-specified across engines), each bigram scores the FIXED-POINT
smoothed transition probability

    w(a→b) = floor( (c(a,b) + 1) * scale / (c(a) + V) )

— an integer in [0, scale] — and a document's score is the integer sum /
integer mean of its bigram weights. That is a monotone per-transition
fluency signal (high = the corpus LM finds every transition likely), the
same quantity CCNet thresholds, just aggregated arithmetically instead of
geometrically so the result is bit-exact in any engine. All terms are
non-negative, so Spark's `DIV` (truncate) and DuckDB's `//` (floor) agree.

Overflow bound (documented, not hoped): (c(a,b)+1)·scale must stay under
2^63 — with scale = 2^20 that allows c(a,b) up to 2^42 ≈ 4.4e12
occurrences of a single bigram, beyond a 10^12-token corpus.

Physical shape, sized for 10^12 sequences:
- training: one exchange bounded by |observed bigrams| ≤ min(V², corpus
  tokens) — map-side partial agg collapses each partition to its distinct
  bigrams before the shuffle; context counts c(a) derive from the bigram
  table (an aggregate OF THE COUNT TABLE, not a second corpus pass).
- scoring: explode to (doc, a, b), two broadcast joins (bigram weights,
  context counts), per-doc re-aggregate — the partial agg collapses to
  ~one row per doc before the exchange, so the score shuffle moves
  doc-count rows, not token-count rows. Zero Python anywhere.
- the broadcast of the bigram table is the stated scale knob: it is
  vocab-bounded, not corpus-bounded, and `min_count` prunes the tail
  (pruned bigrams fall back to the unseen-smoothing weight, identically
  in both engines). For vocabularies whose bigram table outgrows a
  broadcast, pass broadcast_weights=False to shuffle-hash join on the
  packed key instead.

Reference anchor: the reference collector has no LM gate; this is a
training-data-pipeline addition (prompt requirement) following CCNet
§4.3's train-on-target-domain / score-the-crawl split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1 << 20


def bigram_counts(
    df: DataFrame,
    tokens_col: str = "tokens",
    vocab: int = 50257,
    min_count: int = 1,
) -> DataFrame:
    """(g, c_ab) — packed-key bigram counts over token arrays.

    g = a * vocab + b packs the transition into one int64 equi-join /
    group key (the rep_stats n-gram packing). One corpus exchange,
    bounded by distinct observed bigrams.
    """
    t = F.col(tokens_col)
    grams = F.expr(
        f"transform(slice({tokens_col}, 1, greatest(size({tokens_col}) - 1, 0)), "
        f"(x, i) -> cast(x as bigint) * {vocab} + {tokens_col}[i + 1])"
    )
    ex = df.filter(F.size(t) >= 2).select(F.explode(grams).alias("g"))
    agg = ex.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    if min_count > 1:
        agg = agg.filter(F.col("c_ab") >= min_count)
    return agg


def context_counts(bigrams: DataFrame, vocab: int = 50257) -> DataFrame:
    """(a, c_a) — context totals derived from the bigram count table.

    c(a) = Σ_b c(a,b) = occurrences of a as a bigram LEFT element; an
    aggregate of the vocab-bounded count table, not a second corpus scan.
    Only exact when the bigram table is unpruned (min_count=1) — train
    with min_count=1 and prune only the broadcast copy if needed.
    """
    return bigrams.groupBy(
        (F.col("g") / vocab).cast("long").alias("a")
    ).agg(F.sum("c_ab").alias("c_a"))


def lm_score(
    docs: DataFrame,
    bigrams: DataFrame,
    contexts: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    vocab: int = 50257,
    scale: int = SCALE,
    head_min: int | None = None,
    tail_max: int | None = None,
    broadcast_weights: bool = True,
) -> DataFrame:
    """(id, n_big, score_sum, score_mean[, bucket]) per document.

    score_sum = Σ over adjacent pairs of floor((c_ab+1)·scale/(c_a+V));
    unseen bigram → c_ab = 0, unseen context → c_a = 0 (pure add-one
    smoothing, floor(scale/V) ≥ 0) — so every position scores and docs
    never drop. Docs with < 2 tokens have no transitions and are excluded
    (no mean exists), same rule in the SQL oracle. With head_min/tail_max
    set, adds CCNet's head/middle/tail bucket on score_mean.
    """
    t = F.col(tokens_col)
    grams = F.expr(
        f"transform(slice({tokens_col}, 1, greatest(size({tokens_col}) - 1, 0)), "
        f"(x, i) -> cast(x as bigint) * {vocab} + {tokens_col}[i + 1])"
    )
    ex = docs.filter(F.size(t) >= 2).select(
        F.col(id_col), F.explode(grams).alias("g")
    ).withColumn("a", (F.col("g") / vocab).cast("long"))

    bg = F.broadcast(bigrams) if broadcast_weights else bigrams.hint("shuffle_hash")
    # contexts is ≤ vocab rows BY CONSTRUCTION (one per distinct left
    # element) — always broadcastable, even when the bigram table is not
    cx = F.broadcast(contexts)
    j = ex.join(bg, on="g", how="left").join(cx, on="a", how="left")
    w = F.expr(
        f"(coalesce(c_ab, 0) + 1) * cast({scale} as bigint)"
        f" DIV (coalesce(c_a, 0) + {vocab})"
    )
    sc = j.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_big"),
        F.sum(w).alias("score_sum"),
    )
    out = sc.select(
        id_col, "n_big", "score_sum",
        F.expr("score_sum DIV n_big").alias("score_mean"),
    )
    if head_min is not None and tail_max is not None:
        out = out.withColumn(
            "bucket",
            F.when(F.col("score_mean") >= head_min, F.lit("head"))
            .when(F.col("score_mean") <= tail_max, F.lit("tail"))
            .otherwise(F.lit("middle")),
        )
    return out
