"""Full-text ranked retrieval over token arrays — BM25 top-k.

A training-data pipeline needs keyword search over the corpus (targeted
audits: "show me the docs that mention this benchmark answer", quality
spot-checks, contamination forensics). This is the classic inverted-index
BM25 (Robertson & Walker 1994; the Okapi weighting every search engine
ships) expressed as a DataFrame plan:

- the posting-list explode is prefiltered to the query's terms BEFORE any
  shuffle (an `isin` literal set the optimizer pushes into the scan
  projection), so the exchanged data is |matching postings|, not |corpus
  tokens|;
- corpus stats (N, total token count) are a tiny aggregate broadcast back;
- per-(doc,term) tf is one exchange of (doc, term) pairs;
- ranking is TakeOrderedAndProject (orderBy+limit), never a global sort.

Cross-engine exactness (the repo's oracle discipline, no floats summed in
nondeterministic order): every per-term quantity is a ratio of int64s
evaluated in ONE IEEE double division/multiplication chain — int64→double
conversion and double mul/div are bit-exact operations specified by IEEE
754, identical in Spark and DuckDB — then floored to an int64 fixed-point
term score. Only INTEGERS are ever summed across rows, so aggregation
order cannot change the result.

BM25 constants are rationals: k1 = K1N/K1D (default 6/5 = 1.2), b = BN/BD
(default 3/4 = 0.75). The idf uses the log-free monotone surrogate
(N - df + 1/2)/(df + 1/2) — exact as the int64 ratio (2(N-df)+1)/(2df+1);
documented divergence from the ln() form: same ordering for a single-term
query, mildly flatter mixing across terms, and it keeps the entire score
reproducible to the last bit in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# fixed-point scale for the per-term score floor
SCORE_SCALE = 1 << 20
K1N, K1D = 6, 5   # k1 = 1.2
BN, BD = 3, 4     # b = 0.75


def bm25_topk(
    df: DataFrame,
    query_terms: list[int],
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    k: int = 10,
) -> DataFrame:
    """Top-k documents by fixed-point BM25 against a bag of query term ids.

    Returns (id, score_q, n_terms, rank): score_q is the integer
    fixed-point BM25 (sum over matched terms of
    floor(SCORE_SCALE · idf_t · tf_part_td)), n_terms the number of
    distinct query terms matched. Ties break by id ascending.
    """
    terms = sorted(set(int(t) for t in query_terms))
    t = F.col(tokens_col)

    # corpus stats: one tiny agg, broadcast back (N docs, total tokens)
    stats = df.agg(
        F.count(F.lit(1)).cast("long").alias("__n_docs"),
        F.sum(F.size(t)).cast("long").alias("__total_len"),
    )

    # postings restricted to query terms BEFORE the exchange
    postings = (
        df.select(F.col(id_col), F.size(t).cast("long").alias("dl"),
                  F.explode(t).alias("term"))
        .filter(F.col("term").isin(terms))
    )
    tf = postings.groupBy(id_col, "term", "dl").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    # document frequency per term — tiny (≤ |terms| rows), broadcast
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df_t"))

    scored = tf.join(F.broadcast(dfreq), on="term").crossJoin(F.broadcast(stats))

    # idf surrogate = (2(N-df)+1) / (2df+1); tf part in one rational:
    #   tf·(k1+1) / (tf + k1(1-b) + k1·b·dl·N/DL)
    # multiplied through by K1D·BD·DL to clear denominators:
    #   num = tf·(K1N+K1D)·BD·DL,  den = tf·K1D·BD·DL + K1N·(BD-BN)·DL + K1N·BN·dl·N
    n_docs, total = F.col("__n_docs"), F.col("__total_len")
    idf = (
        (F.lit(2) * (n_docs - F.col("df_t")) + F.lit(1)).cast("double")
        / (F.lit(2) * F.col("df_t") + F.lit(1)).cast("double")
    )
    num = (F.col("tf") * F.lit((K1N + K1D) * BD) * total).cast("double")
    den = (
        F.col("tf") * F.lit(K1D * BD) * total
        + F.lit(K1N * (BD - BN)) * total
        + F.lit(K1N * BN) * F.col("dl") * n_docs
    ).cast("double")
    term_score = F.floor(idf * (num / den) * F.lit(float(SCORE_SCALE))).cast("long")

    per_doc = scored.groupBy(id_col).agg(
        F.sum(term_score).alias("score_q"),
        F.count(F.lit(1)).cast("int").alias("n_terms"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject (no global sort);
    # the row_number window then ranks only the k surviving rows. The
    # partition key is a constant-valued but non-foldable expression (id % 1
    # = 0; a plain lit() gets constant-folded out of the partition spec),
    # which keeps WindowExec's "no partition defined" warning out of the
    # logs — the window input is already bounded at k rows either way.
    topk = per_doc.orderBy(F.col("score_q").desc(), F.col(id_col)).limit(k)
    w_rank = F.row_number().over(
        Window.partitionBy(F.pmod(F.col(id_col), F.lit(1)))
        .orderBy(F.col("score_q").desc(), F.col(id_col))
    )
    return topk.select(id_col, "score_q", "n_terms", w_rank.cast("int").alias("rank"))
