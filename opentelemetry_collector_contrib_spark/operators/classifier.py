"""Hashed-token linear quality classifier for corpus curation.

The GPT-3 / LLaMA / CCNet pipelines gate CommonCrawl with a linear
classifier over hashed n-gram features trained on a "high-quality" vs
"rest" split (GPT-3 appendix A; CCNet §4.2). This is that component in
DataFrame form, with INTEGER weights so the dual-engine oracle can replay
training and scoring bit-exactly:

  weight(token) = floor((pos(token) + 1) * scale / (n(token) + 2))

— a Laplace-smoothed P(label=1 | token) in fixed-point (scale = 1e6).
A document's score is the sum of its token weights; score/n_tok is the
mean posterior in fixed-point, thresholded for the keep gate. Training is
ONE vocab-bounded shuffle (map-side partial agg); scoring explodes tokens,
broadcast-joins the (vocab-sized) weight table and re-aggregates per doc —
since a doc's tokens start colocated, the partial agg collapses to ~one
row per doc before the exchange, so the score shuffle moves doc-count
rows, not token-count rows. Both stages survive 10^12 sequences: the only
global state is the weight table, bounded by |vocab|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def train_token_classifier(
    df: DataFrame,
    tokens_col: str = "tokens",
    label_col: str = "label",
    scale: int = SCALE,
) -> DataFrame:
    """(token, weight) — fixed-point smoothed P(label=1 | token).

    Integer floor division end to end (all terms ≥ 0, so Spark's DIV
    (truncate) and DuckDB's // (floor) agree); weights land in [0, scale].
    """
    ex = df.select(
        F.explode(F.col(tokens_col)).alias("token"),
        F.col(label_col).cast("long").alias("y"),
    )
    agg = ex.groupBy("token").agg(
        F.sum("y").alias("pos"), F.count(F.lit(1)).alias("n")
    )
    weight = F.expr(f"(pos + 1) * CAST({scale} AS BIGINT) DIV (n + 2)")
    return agg.select("token", weight.alias("weight"))


def score_documents(
    docs: DataFrame,
    weights: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    threshold: int = SCALE // 2,
    default_weight: int | None = None,
) -> DataFrame:
    """(id, n_tok, score_sum, score_mean, keep) per document.

    Tokens absent from the weight table score ``default_weight`` (the
    uninformative prior scale/2) — None drops them from the sum instead
    (inner-join semantics; fine when scoring the training corpus itself).
    Docs with zero scored tokens disappear (no mean exists) — same rule in
    the SQL oracle.
    """
    ex = docs.select(F.col(id_col), F.explode(F.col(tokens_col)).alias("token"))
    how = "inner" if default_weight is None else "left"
    j = ex.join(F.broadcast(weights), on="token", how=how)
    w = F.col("weight")
    if default_weight is not None:
        w = F.coalesce(w, F.lit(default_weight).cast("long"))
    sc = j.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_tok"),
        F.sum(w).alias("score_sum"),
    )
    mean = F.expr("score_sum DIV n_tok")
    return sc.select(
        id_col,
        "n_tok",
        "score_sum",
        mean.alias("score_mean"),
        (mean >= F.lit(threshold)).alias("keep"),
    )
